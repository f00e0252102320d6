package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

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
