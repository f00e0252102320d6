package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType, StringType, StructType, TimestampNTZType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

import graft.versioned.Partitioning

/** Catalog functions the graft `FunctionCatalog` serves.
  *
  * `bucket(n, col)` is the one that matters: Spark's storage-partitioned
  * join machinery resolves a `bucket` TRANSFORM reported in a scan's
  * `KeyGroupedPartitioning` by loading this function from the table's
  * catalog and comparing bound instances by `canonicalName` — without it
  * two bucket-partitioned graft tables could never co-partition-join.
  * The bound function computes the exact write-side bucket
  * (width-normalized XxHash64, seed 42 — see
  * [[graft.versioned.Partitioning.partitionColumn]]), so runtime
  * evaluation (partially-clustered SPJ, literal pushdown) agrees
  * bit-for-bit with where rows actually live.
  */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, col): pmod(xxhash64(width-normalized col), numBuckets)"

  override def bind(inputType: StructType): BoundFunction = {
    if (inputType.fields.length != 2 ||
        inputType.fields(0).dataType != IntegerType)
      throw new UnsupportedOperationException(
        s"bucket expects (int numBuckets, col), got $inputType")
    val srcType = inputType.fields(1).dataType
    new ScalarFunction[Integer] {
      override def inputTypes(): Array[DataType] = Array(IntegerType, srcType)
      override def resultType(): DataType = IntegerType
      override def name(): String = "bucket"
      // equality anchor for SPJ compatibility checks: same canonical name
      // + same numBuckets literal => same partitioning
      override def canonicalName(): String = "graft.bucket"
      override def isResultNullable: Boolean = false
      override def produceResult(input: InternalRow): Integer = {
        val n = input.getInt(0)
        val v = if (input.isNullAt(1)) null else input.get(1, srcType)
        Partitioning.bucketOfCatalyst(v, srcType, n)
      }
    }
  }
}

/** `years/months/days/hours(col)` — the temporal partition transforms as
  * loadable catalog functions. Spark resolves a transform named in a
  * write's `RequiresDistributionAndOrdering` (or a scan's
  * `KeyGroupedPartitioning`) against the table catalog's
  * FunctionCatalog; serving these lets the NATIVE partitioned batch
  * write request clustering + ordering on its real partition
  * expressions instead of falling back to an internal shuffle. The
  * result is the exact directory STRING the write side produces
  * ([[Partitioning.partitionColumn]]'s `date_format` under the
  * catalog's UTC-session contract), so sorting by it is sorting by
  * partition directory, and the formats sort lexically in time order.
  */
final class GraftTemporalFunction(fname: String, pattern: String)
    extends UnboundFunction {
  override def name(): String = fname
  override def description(): String =
    s"$fname(col): UTC date_format(col, '$pattern') — partition dir value"

  override def bind(inputType: StructType): BoundFunction = {
    if (inputType.fields.length != 1)
      throw new UnsupportedOperationException(
        s"$fname expects (date/timestamp col), got $inputType")
    val srcType = inputType.fields(0).dataType
    if (!Seq(DateType, TimestampType, TimestampNTZType).contains(srcType))
      throw new UnsupportedOperationException(
        s"$fname expects a date/timestamp source, got $srcType")
    new ScalarFunction[UTF8String] {
      // the bound function ships to executors inside shuffle
      // partitioning expressions; DateTimeFormatter is not serializable
      @transient private lazy val fmt =
        java.time.format.DateTimeFormatter.ofPattern(pattern)
      override def inputTypes(): Array[DataType] = Array(srcType)
      override def resultType(): DataType = StringType
      override def name(): String = fname
      override def canonicalName(): String = s"graft.$fname"
      override def produceResult(input: InternalRow): UTF8String = {
        if (input.isNullAt(0)) return null
        val ldt = srcType match {
          // catalyst internals: DateType = days since epoch,
          // Timestamp[NTZ]Type = micros since epoch (UTC per contract)
          case DateType =>
            java.time.LocalDate.ofEpochDay(input.getInt(0).toLong).atStartOfDay
          case _ =>
            val micros = input.getLong(0)
            java.time.LocalDateTime.ofEpochSecond(
              java.lang.Math.floorDiv(micros, 1000000L),
              (java.lang.Math.floorMod(micros, 1000000L) * 1000L).toInt,
              java.time.ZoneOffset.UTC)
        }
        UTF8String.fromString(ldt.format(fmt))
      }
    }
  }
}

/** `truncate(width, col)` — integral floor-to-width (LONG result) or
  * string prefix, matching [[Partitioning.partitionColumn]] bit for bit.
  */
object GraftTruncateFunction extends UnboundFunction {
  override def name(): String = "truncate"
  override def description(): String =
    "truncate(width, col): col - pmod(col, width) for integrals; prefix for strings"

  override def bind(inputType: StructType): BoundFunction = {
    if (inputType.fields.length != 2 ||
        inputType.fields(0).dataType != IntegerType)
      throw new UnsupportedOperationException(
        s"truncate expects (int width, col), got $inputType")
    val srcType = inputType.fields(1).dataType
    srcType match {
      case StringType =>
        new ScalarFunction[UTF8String] {
          override def inputTypes(): Array[DataType] = Array(IntegerType, srcType)
          override def resultType(): DataType = StringType
          override def name(): String = "truncate"
          override def canonicalName(): String = "graft.truncate"
          override def produceResult(input: InternalRow): UTF8String =
            if (input.isNullAt(1)) null
            else input.getUTF8String(1).substringSQL(1, input.getInt(0))
        }
      case dt if Partitioning.integralTruncate(dt) =>
        new ScalarFunction[java.lang.Long] {
          override def inputTypes(): Array[DataType] = Array(IntegerType, srcType)
          override def resultType(): DataType = LongType
          override def name(): String = "truncate"
          override def canonicalName(): String = "graft.truncate"
          override def produceResult(input: InternalRow): java.lang.Long = {
            if (input.isNullAt(1)) return null
            val w = input.getInt(0).toLong
            val v = input.get(1, srcType).asInstanceOf[Number].longValue()
            v - java.lang.Math.floorMod(v, w)
          }
        }
      case other => throw new UnsupportedOperationException(
        s"truncate needs an integral or string source, got $other")
    }
  }
}

object GraftFunctions {
  /** Every transform the partition spec supports, by function name. */
  val transforms: Map[String, UnboundFunction] = Map(
    "bucket" -> GraftBucketFunction,
    "truncate" -> GraftTruncateFunction,
    "years" -> new GraftTemporalFunction("years", "yyyy"),
    "months" -> new GraftTemporalFunction("months", "yyyy-MM"),
    "days" -> new GraftTemporalFunction("days", "yyyy-MM-dd"),
    "hours" -> new GraftTemporalFunction("hours", "yyyy-MM-dd-HH"))
}
