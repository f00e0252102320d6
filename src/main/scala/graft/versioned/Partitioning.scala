package graft.versioned

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Literal => CatalystLiteral, XxHash64}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources
import org.apache.spark.sql.types._

/** Partition-transform support for graft tables — the Iceberg transform
  * set: identity, bucket(n), years/months/days/hours, truncate(w) —
  * written as hive-style `__p_<field>=<value>` directories so the data
  * columns themselves stay inside the files.
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
  /** Source types the truncate transform floors numerically (vs string
    * prefix) — shared with the SQL-exposed `truncate` catalog function.
    */
  def integralTruncate(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def bucketHashType(dt: DataType): DataType = dt match {
    case ByteType | ShortType | IntegerType | LongType => LongType
    case FloatType | DoubleType => DoubleType
    case other => other
  }

  /** Directory-value format per temporal transform (session tz is UTC by
    * the catalog contract, so instants and NTZ values format identically).
    * The formats sort LEXICALLY in time order, which is what lets range
    * filters prune directories with plain string compares.
    */
  private val TemporalFmt = Map(
    "years" -> "yyyy", "months" -> "yyyy-MM",
    "days" -> "yyyy-MM-dd", "hours" -> "yyyy-MM-dd-HH")

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
      case t if TemporalFmt.contains(t) =>
        date_format(src, TemporalFmt(t))
      case "truncate" => sourceType match {
        case ByteType | ShortType | IntegerType | LongType =>
          (src - pmod(src, lit(pf.numBuckets))).cast("long")
        case StringType => substring(src, 1, pf.numBuckets)
        case other => throw new UnsupportedOperationException(
          s"truncate transform needs an integral or string source, got $other")
      }
      case other =>
        throw new UnsupportedOperationException(s"unknown transform: $other")
    }
  }

  /** Literal -> UTC LocalDateTime for temporal-transform pruning. Covers
    * every value shape Spark's v1 filters use for timestamp/date columns.
    */
  private def toUtcDateTime(v: Any): Option[java.time.LocalDateTime] = v match {
    case t: java.sql.Timestamp =>
      Some(java.time.LocalDateTime.ofInstant(t.toInstant, java.time.ZoneOffset.UTC))
    case i: java.time.Instant =>
      Some(java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC))
    case l: java.time.LocalDateTime => Some(l)
    case d: java.sql.Date => Some(d.toLocalDate.atStartOfDay)
    case d: java.time.LocalDate => Some(d.atStartOfDay)
    case s: String =>
      scala.util.Try(java.time.LocalDateTime.parse(s.replace(' ', 'T'))).toOption
        .orElse(scala.util.Try(java.time.LocalDate.parse(s).atStartOfDay).toOption)
    case _ => None
  }

  /** The directory value a literal lands in under `transform` — the
    * floor of the literal. None when the literal shape is unknown
    * (caller keeps the file).
    */
  private[graft] def floorOfLiteral(v: Any, pf: PartitionField): Option[String] =
    pf.transform match {
      case t if TemporalFmt.contains(t) => toUtcDateTime(v).map(dt =>
        dt.format(java.time.format.DateTimeFormatter.ofPattern(TemporalFmt(t))))
      case "truncate" => v match {
        case n: Number =>
          val w = pf.numBuckets
          Some((n.longValue() - java.lang.Math.floorMod(n.longValue(), w.toLong)).toString)
        case s: String => Some(s.take(pf.numBuckets))
        case _ => None
      }
      case _ => None
    }

  /** Literal-side bucket: same XxHash64(seed=42) Spark applies on the
    * write side, evaluated on the driver during pruning, with the same
    * width normalization as [[partitionColumn]]. `v` is an EXTERNAL JVM
    * value (as carried by v1 `sources.Filter` literals).
    */
  def bucketOfLiteral(v: Any, dt: DataType, numBuckets: Int): Int =
    bucketOf(v, dt, numBuckets, CatalystLiteral.create(_, _))

  /** Same bucket for a CATALYST-internal value (UTF8String, Int, …) —
    * used by the SQL-exposed `bucket` ScalarFunction that backs
    * storage-partitioned join key comparison.
    */
  def bucketOfCatalyst(v: Any, dt: DataType, numBuckets: Int): Int =
    bucketOf(v, dt, numBuckets, new CatalystLiteral(_, _))

  private def bucketOf(v: Any, dt: DataType, numBuckets: Int,
      lit: (Any, DataType) => CatalystLiteral): Int = {
    val (nv, ndt): (Any, DataType) =
      if (v == null) (v, dt)
      else bucketHashType(dt) match {
        case LongType => (v.asInstanceOf[Number].longValue(), LongType)
        case DoubleType => (v.asInstanceOf[Number].doubleValue(), DoubleType)
        case _ => (v, dt)
      }
    val h = new XxHash64(Seq(lit(nv, ndt))).eval(null).asInstanceOf[Long]
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
    filter match {
      case _: sources.AlwaysFalse => return false // constant-false: no file matches
      case _ => ()
    }
    if (spec.isEmpty || f.partValues.isEmpty) return true
    filter match {
      case sources.And(l, r) => mayMatch(f, spec, schema, l) && mayMatch(f, spec, schema, r)
      case sources.Or(l, r) => mayMatch(f, spec, schema, l) || mayMatch(f, spec, schema, r)
      // a NULL literal comparison is never TRUE (three-valued logic):
      // no partition holds matching rows, and the transform evaluators
      // below must never dereference it (an upsert source's null key
      // would NPE). IS NULL has its own case; EqualNullSafe is not a
      // pushed shape here.
      case sources.EqualTo(_, null) => false
      case sources.GreaterThan(_, null) => false
      case sources.GreaterThanOrEqual(_, null) => false
      case sources.LessThan(_, null) => false
      case sources.LessThanOrEqual(_, null) => false
      case sources.EqualTo(a, v) => testValue(f, spec, schema, a, v)
      case sources.In(a, vs) => vs.exists(v =>
        v != null && testValue(f, spec, schema, a, v))
      // range filters: identity compares EXACT values (s>v etc.); floor
      // transforms (days/months/years/hours, numeric truncate) compare
      // against the literal's floor — a file whose dir value equals the
      // floor may still straddle the bound, so those keep on equality
      case sources.GreaterThan(a, v) =>
        boundCmp(f, spec, schema, a, v).forall { case (c, exact) =>
          if (exact) c > 0 else c >= 0 }
      case sources.GreaterThanOrEqual(a, v) =>
        boundCmp(f, spec, schema, a, v).forall(_._1 >= 0)
      case sources.LessThan(a, v) =>
        boundCmp(f, spec, schema, a, v).forall { case (c, exact) =>
          if (exact) c < 0 else c <= 0 }
      case sources.LessThanOrEqual(a, v) =>
        boundCmp(f, spec, schema, a, v).forall(_._1 <= 0)
      // IS NULL / IS NOT NULL via partition dirs — with two carve-outs:
      //  - bucket: Spark's xxhash64 of a NULL input returns the seed, so
      //    null rows land in bucket pmod(seed, n), NEVER the null-marker
      //    dir; bucket fields prove nothing about nulls
      //  - string-typed sources: Spark's dynamic-partition writer maps
      //    the EMPTY STRING to the same marker as null, so a marker dir
      //    may hold non-null (empty) values and a non-marker dir proves
      //    the absence of nulls but not the converse
      case sources.IsNull(a) =>
        spec.filter(pf => pf.source == a && pf.transform != "bucket")
          .forall(pf => stored(f, pf).forall(_ == NullMarker))
      case sources.IsNotNull(a) =>
        spec.filter(pf => pf.source == a && pf.transform != "bucket" &&
            !stringSourced(schema, a))
          .forall(pf => stored(f, pf).forall(_ != NullMarker))
      case _ => true
    }
  }

  private def stringSourced(schema: StructType, a: String): Boolean =
    schema.fields.find(_.name == a).exists(_.dataType == StringType)

  /** Can this file's partition value equal `v` on column `a`? Identity
    * compares typed values, bucket re-hashes the literal, temporal /
    * truncate transforms compare the literal's floor. The hive null
    * marker also covers EMPTY-STRING partition values (Spark writes both
    * the same way), so a marker dir can still match a literal whose
    * transformed value is the empty string.
    */
  private def testValue(f: FileEntry, spec: Seq[PartitionField],
      schema: StructType, a: String, v: Any): Boolean =
    spec.filter(_.source == a).forall { pf =>
      def literalDir: Option[String] = pf.transform match {
        case "identity" => v match {
          case s: String => Some(s)
          case _ => None // non-string identity: marker == null, never a literal
        }
        case _ => floorOfLiteral(v, pf)
      }
      stored(f, pf) match {
        case Some(NullMarker) =>
          // marker holds nulls AND empty-string-valued rows
          pf.transform != "bucket" && literalDir.contains("")
        case Some(s) => pf.transform match {
          case "identity" => typedCmp(schema, a, s, v).forall(_ == 0)
          case "bucket" =>
            schema.fields.find(_.name == a).forall(fd =>
              s.toInt == bucketOfLiteral(v, fd.dataType, pf.numBuckets))
          case _ => floorOfLiteral(v, pf).forall(_ == s)
        }
        case None => true
      }
    }

  /** cmp(stored partition value, bound(literal)) for range filters, plus
    * whether the compare is EXACT (identity) or floor-grained. None when
    * no usable partition field / unknown literal (caller keeps the file).
    */
  private def boundCmp(f: FileEntry, spec: Seq[PartitionField],
      schema: StructType, a: String, v: Any): Option[(Int, Boolean)] =
    spec.filter(pf => pf.source == a && pf.transform != "bucket")
      .flatMap { pf =>
        stored(f, pf).filter(_ != NullMarker).flatMap { s =>
          pf.transform match {
            case "identity" => typedCmp(schema, a, s, v).map((_, true))
            case t if TemporalFmt.contains(t) =>
              floorOfLiteral(v, pf).map(fv => (s.compareTo(fv), false))
            case "truncate" => v match {
              case _: Number => floorOfLiteral(v, pf).map(fv =>
                (java.lang.Long.compare(s.toLong, fv.toLong), false))
              case _ => None // string truncate: prefix ranges stay conservative
            }
            case _ => None
          }
        }
      }.headOption

  private def typedCmp(schema: StructType, a: String, s: String, v: Any): Option[Int] =
    schema.fields.find(_.name == a)
      .flatMap(fd => TableOps.statsComparator(fd.dataType))
      .flatMap(c => c(s, v))

  private def stored(f: FileEntry, pf: PartitionField): Option[String] =
    f.partValues.get(pf.name)
}
