package graft.versioned

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Literal => CatalystLiteral, XxHash64}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources
import org.apache.spark.sql.types._

/** Partition-transform support for graft tables: identity and bucket
  * transforms (the two Iceberg transforms that matter most for layout
  * control), written as hive-style `__p_<field>=<value>` directories so
  * the data columns themselves stay inside the files.
  *
  * At 100 TB partition pruning is the single biggest scan-reduction
  * lever: a filter on a partition source column eliminates whole
  * directories of files before min/max stats are even consulted, and a
  * bucket spec turns an equality lookup into a 1/N-of-the-table scan
  * regardless of value clustering.
  */
object Partitioning {

  /** Marker hive uses for a null partition value in a directory name. */
  val NullMarker = "__HIVE_DEFAULT_PARTITION__"

  private val DirPrefix = "__p_"

  def dirColName(pf: PartitionField): String = DirPrefix + pf.name

  /** Bucket-hash input normalization: integral sources hash as LONG,
    * floating as DOUBLE (Iceberg's bucket-transform rule). Spark's
    * XxHash64 hashes the 4-byte and 8-byte paths differently, so without
    * this a metadata-only type widening (int->long, float->double) on a
    * bucket source column would silently re-bucket every value — old
    * files would be wrongly pruned and new writes would land in
    * different buckets than equal old values.
    */
  private def bucketHashType(dt: DataType): DataType = dt match {
    case ByteType | ShortType | IntegerType | LongType => LongType
    case FloatType | DoubleType => DoubleType
    case other => other
  }

  /** The write-side partition value column for one spec field. The
    * bucket hash MUST agree bit-for-bit with [[bucketOfLiteral]] (both
    * are Spark's XxHash64, seed 42, over the width-normalized type).
    * `physicalNames` resolves the source column when the write happens
    * under as-written (physical) names; `sourceType` is the column's
    * CURRENT logical type (possibly widened since CREATE).
    */
  def partitionColumn(pf: PartitionField, sourceType: DataType,
      physicalNames: Map[String, String] = Map.empty): Column = {
    val src = col(physicalNames.getOrElse(pf.source, pf.source))
    pf.transform match {
      case "identity" => src
      case "bucket" =>
        val hashed =
          if (bucketHashType(sourceType) == sourceType) src
          else src.cast(bucketHashType(sourceType))
        pmod(xxhash64(hashed), lit(pf.numBuckets.toLong)).cast("int")
      case other =>
        throw new UnsupportedOperationException(s"unknown transform: $other")
    }
  }

  /** Literal-side bucket: same XxHash64(seed=42) Spark applies on the
    * write side, evaluated on the driver during pruning, with the same
    * width normalization as [[partitionColumn]].
    */
  def bucketOfLiteral(v: Any, dt: DataType, numBuckets: Int): Int = {
    val (nv, ndt): (Any, DataType) =
      if (v == null) (v, dt)
      else bucketHashType(dt) match {
        case LongType => (v.asInstanceOf[Number].longValue(), LongType)
        case DoubleType => (v.asInstanceOf[Number].doubleValue(), DoubleType)
        case _ => (v, dt)
      }
    val h = new XxHash64(Seq(CatalystLiteral.create(nv, ndt)))
      .eval(null).asInstanceOf[Long]
    (((h % numBuckets) + numBuckets) % numBuckets).toInt
  }

  /** Parse `__p_x=v` segments out of a written file path (field ->
    * still-escaped value; values we generate are numeric/simple strings).
    */
  def valuesFromPath(path: String): Map[String, String] =
    path.split('/').iterator
      .filter(seg => seg.startsWith(DirPrefix) && seg.contains('='))
      .map { seg =>
        val i = seg.indexOf('=')
        seg.substring(DirPrefix.length, i) -> unescape(seg.substring(i + 1))
      }.toMap

  /** Minimal inverse of Spark's partition-path escaping (%XX codes). */
  private def unescape(s: String): String = {
    if (!s.contains('%')) return s
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length + 1 && i + 3 <= s.length) {
        try {
          sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
          i += 3
        } catch { case _: NumberFormatException => sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Conservative partition-level file pruning: false only when the
    * file's recorded partition values PROVE no row can satisfy `filter`.
    * Unknown shapes / non-partition columns -> keep.
    */
  def mayMatch(f: FileEntry, spec: Seq[PartitionField], schema: StructType,
      filter: sources.Filter): Boolean = {
    if (spec.isEmpty || f.partValues.isEmpty) return true
    filter match {
      case sources.And(l, r) => mayMatch(f, spec, schema, l) && mayMatch(f, spec, schema, r)
      case sources.Or(l, r) => mayMatch(f, spec, schema, l) || mayMatch(f, spec, schema, r)
      case sources.EqualTo(a, v) => testValue(f, spec, schema, a, v)
      case sources.In(a, vs) => vs.exists(v => testValue(f, spec, schema, a, v))
      case sources.GreaterThan(a, v) => identityCmp(f, spec, schema, a, v).forall(_ > 0)
      case sources.GreaterThanOrEqual(a, v) => identityCmp(f, spec, schema, a, v).forall(_ >= 0)
      case sources.LessThan(a, v) => identityCmp(f, spec, schema, a, v).forall(_ < 0)
      case sources.LessThanOrEqual(a, v) => identityCmp(f, spec, schema, a, v).forall(_ <= 0)
      case sources.IsNull(a) =>
        identityField(spec, a).forall(pf => f.partValues.get(pf.name)
          .forall(_ == NullMarker))
      case sources.IsNotNull(a) =>
        identityField(spec, a).forall(pf => f.partValues.get(pf.name)
          .forall(_ != NullMarker))
      case _ => true
    }
  }

  /** Can this file's partition value equal `v` on column `a`? Covers
    * both identity (typed compare) and bucket (literal re-hash).
    */
  private def testValue(f: FileEntry, spec: Seq[PartitionField],
      schema: StructType, a: String, v: Any): Boolean =
    spec.filter(_.source == a).forall {
      case pf if pf.transform == "identity" =>
        stored(f, pf) match {
          case Some(NullMarker) => false // stored null never equals a literal
          case Some(s) => typedCmp(schema, a, s, v).forall(_ == 0)
          case None => true
        }
      case pf if pf.transform == "bucket" =>
        stored(f, pf) match {
          case Some(NullMarker) => false
          case Some(s) =>
            schema.fields.find(_.name == a).forall(fd =>
              s.toInt == bucketOfLiteral(v, fd.dataType, pf.numBuckets))
          case None => true
        }
      case _ => true
    }

  /** cmp(storedIdentityValue, literal) for range filters — None when the
    * column has no identity partition field, the value is null, or the
    * type is not comparable as a string (caller keeps the file).
    */
  private def identityCmp(f: FileEntry, spec: Seq[PartitionField],
      schema: StructType, a: String, v: Any): Option[Int] =
    for {
      pf <- identityField(spec, a)
      s <- stored(f, pf) if s != NullMarker
      c <- TableOps.statsComparator(
        schema.fields.find(_.name == a).map(_.dataType).getOrElse(NullType))
    } yield c(s, v)

  private def typedCmp(schema: StructType, a: String, s: String, v: Any): Option[Int] =
    schema.fields.find(_.name == a)
      .flatMap(fd => TableOps.statsComparator(fd.dataType))
      .map(c => c(s, v))

  private def identityField(spec: Seq[PartitionField], a: String): Option[PartitionField] =
    spec.find(pf => pf.source == a && pf.transform == "identity")

  private def stored(f: FileEntry, pf: PartitionField): Option[String] =
    f.partValues.get(pf.name)
}
