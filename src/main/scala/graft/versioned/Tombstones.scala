package graft.versioned

import org.apache.spark.sql.Column
import org.apache.spark.sql.sources
import org.apache.spark.sql.types._

/** Merge-on-read DELETE: predicate tombstones.
  *
  * A MoR `DELETE FROM t WHERE p` commits NO data rewrite — it appends a
  * tombstone `(seq, p)` to the table snapshot's properties. Readers
  * apply `NOT p` to every file whose commit sequence is LOWER than the
  * tombstone's (newer files — later inserts — are untouched, exactly
  * SQL's semantics); compaction materializes surviving rows and the
  * tombstone is dropped once no file it applies to remains. At 100 TB
  * this turns a selective DELETE from a multi-file rewrite into an O(1)
  * metadata commit — the write-amplification trade Iceberg's
  * merge-on-read position/equality deletes make, expressed here as
  * re-checkable predicates instead of row files (re-checkable means
  * commit-time conflict handling is free: re-applying the predicate on
  * a rebased head IS the delete's semantics).
  *
  * Storage: inside `Snapshot.props` (`graft.mor.tombstones` — a JSON
  * list of `{seq, f}`; `graft.mor.lastseq` — the table's commit
  * sequence counter), so every existing snapshot-threading path carries
  * tombstones forward without signature changes.
  *
  * Predicates are stored over PHYSICAL column names (rename-proof) with
  * values as strings re-typed against the CURRENT schema at read time
  * (type-widening-proof). Only exactly re-evaluable filter shapes are
  * accepted ([[FilterJson.toJson]]); anything else falls back to
  * copy-on-write.
  */
final case class Tombstone(seq: Long, filter: sources.Filter)

object Tombstones {
  /** Table property selecting DELETE's write path. */
  val ModeProp = "graft.delete.mode"
  /** Table property selecting UPDATE's write path (Scala API; SQL UPDATE
    * stays group-based CoW — Spark plans that rewrite itself).
    */
  val UpdateModeProp = "graft.update.mode"
  val MergeOnRead = "merge-on-read"
  /** Snapshot property: JSON list of tombstones. */
  val TombProp = "graft.mor.tombstones"
  /** Snapshot property: last assigned commit sequence for this table. */
  val SeqProp = "graft.mor.lastseq"

  def morEnabled(snap: Snapshot): Boolean =
    snap.properties.get(ModeProp).contains(MergeOnRead)

  def lastSeq(props: Map[String, String]): Long =
    props.get(SeqProp).flatMap(_.toLongOption).getOrElse(0L)

  /** Live tombstones of a snapshot (empty when none / unparsable —
    * unparsable cannot happen for tombstones this code wrote, and a
    * loud failure beats silently resurrecting rows, so parse errors
    * THROW rather than default to empty).
    */
  def of(snap: Snapshot): Seq[Tombstone] = ofProps(snap.properties)

  def ofProps(props: Map[String, String]): Seq[Tombstone] =
    props.get(TombProp) match {
      case None => Nil
      case Some(json) =>
        Json.readAny(json).asInstanceOf[Seq[Any]].map { x =>
          val m = x.asInstanceOf[Map[String, Any]]
          val seq = m("seq").asInstanceOf[Number].longValue()
          val f = FilterJson.fromJson(m("f").asInstanceOf[Map[String, Any]])
          Tombstone(seq, f)
        }
    }

  private def write(tombs: Seq[Tombstone]): String =
    Json.write(tombs.map(t => Map(
      "seq" -> t.seq, "f" -> FilterJson.toJson(t.filter).get)))

  /** Props with one more tombstone appended at sequence `seq` (which
    * must be `lastSeq + 1`; the caller stamps no files in the same
    * commit).
    */
  def append(props: Map[String, String], seq: Long,
      physFilter: sources.Filter): Map[String, String] = {
    require(FilterJson.toJson(physFilter).isDefined,
      s"not a MoR-serializable predicate: $physFilter")
    props +
      (TombProp -> write(ofProps(props) :+ Tombstone(seq, physFilter))) +
      (SeqProp -> seq.toString)
  }

  /** Tombstones that can affect `f`: committed after it AND not
    * disproven by its min/max stats (`physSchema` = schema under
    * physical names — tombstone filters and file stats are both keyed
    * physically) AND — when the repo `root` is supplied and `f` carries
    * bloom sidecars — not disproven by the blooms. A point MoR DELETE
    * on a bloomed column then dirties only the file(s) that might hold
    * the row: every other file keeps the columnar fast path, metadata
    * aggregates stay answerable, and compaction rewrites almost
    * nothing. Sound in both directions (bloom "absent" is a proof), and
    * deterministic across call sites: sidecars are immutable, so every
    * caller that passes `data` sees the same applicability.
    */
  def applicable(tombs: Seq[Tombstone], f: FileEntry,
      physSchema: StructType,
      data: Option[DestIO] = None): Seq[Tombstone] = {
    lazy val blooms =
      data.filter(_ => f.bloomColsList.nonEmpty).map(Blooms.load(_, f))
    tombs.filter(t => t.seq > f.seqNo &&
      TableOps.statsMayMatch(f, physSchema, t.filter) &&
      blooms.forall(b => Blooms.mayMatch(physSchema, t.filter, () => b)))
  }

  /** Any live file affected by any tombstone? (The "is this snapshot
    * readable by the plain fast path" test.)
    */
  def dirty(snap: Snapshot, physSchema: StructType,
      data: Option[DestIO] = None): Boolean = {
    val tombs = of(snap)
    tombs.nonEmpty && snap.files.exists(f =>
      applicable(tombs, f, physSchema, data).nonEmpty)
  }

  /** Split `files` into (clean, dirtyGroups): files in a dirty group
    * share the same applicable tombstone set, so one scan + one
    * predicate serves the whole group. Takes pre-parsed tombstones so
    * callers on the planning hot path parse the property JSON once.
    */
  def split(tombs: Seq[Tombstone], physSchema: StructType, files: Seq[FileEntry],
      data: Option[DestIO] = None)
      : (Seq[FileEntry], Seq[(Seq[FileEntry], Seq[Tombstone])]) = {
    if (tombs.isEmpty) (files, Nil)
    else {
      val keyed = files.map(f => (f, applicable(tombs, f, physSchema, data)))
      val (cleanK, dirtyK) = keyed.partition(_._2.isEmpty)
      val groups = dirtyK.groupBy(_._2.map(_.seq))
        .toSeq.sortBy(_._1.mkString(","))
        .map { case (_, fs) => (fs.map(_._1), fs.head._2) }
      (cleanK.map(_._1), groups)
    }
  }

  /** DataFrame keep-predicate for a dirty group: rows survive when NO
    * applicable tombstone's predicate is true (null = not matched =
    * kept, SQL DELETE semantics).
    */
  def keepColumn(tombs: Seq[Tombstone]): Column = {
    import org.apache.spark.sql.functions.{coalesce, lit, not}
    tombs.map(t => not(coalesce(
      TableOps.filterToColumn(t.filter).getOrElse(
        throw new IllegalStateException(s"unevaluable tombstone: ${t.filter}")),
      lit(false)))).reduce(_ && _)
  }

  /** Serialized filter trees for shipping to executors (each string is
    * one tombstone's predicate as JSON).
    */
  def filterJsons(tombs: Seq[Tombstone]): Seq[String] =
    tombs.map(t => Json.write(FilterJson.toJson(t.filter).get))

  /** Conflict-check identity of a snapshot's tombstone set. Includes the
    * PREDICATE, not just the seq: CALL revert/rollback rewinds the
    * lastseq counter, so a different delete can reuse a seq number —
    * comparing bare seqs would let a rewrite computed against the old
    * predicate slip past the concurrent-MoR-delete check.
    */
  def signature(snap: Snapshot): Set[(Long, String)] =
    of(snap).map(t => (t.seq, Json.write(FilterJson.toJson(t.filter).get))).toSet

  /** Drop tombstones no file needs anymore (everything they applied to
    * was compacted/rewritten away). Called on every snapshot write, so
    * a full rewrite naturally retires its tombstones.
    */
  def prune(props: Map[String, String], files: Seq[FileEntry],
      physSchema: StructType,
      data: Option[DestIO] = None): Map[String, String] =
    props.get(TombProp) match {
      case None => props
      case Some(_) =>
        val tombs = ofProps(props)
        val kept = tombs.filter(t => files.exists(f =>
          applicable(Seq(t), f, physSchema, data).nonEmpty))
        if (kept.size == tombs.size) props
        else if (kept.isEmpty) props - TombProp
        else props + (TombProp -> write(kept))
    }
}

/** Exact JSON (de)serialization for the v1 filter subset a merge-on-read
  * tombstone may carry. Columns are stored by (physical) name; scalar
  * values as strings tagged with a type family, re-typed against the
  * current column type on read so metadata-only type widening keeps old
  * tombstones valid.
  */
object FilterJson {

  /** Serializable check + encode. None -> caller must use copy-on-write. */
  def toJson(f: sources.Filter): Option[Map[String, Any]] = f match {
    case sources.EqualTo(a, v) => scalar("eq", a, v)
    case sources.GreaterThan(a, v) => scalar("gt", a, v)
    case sources.GreaterThanOrEqual(a, v) => scalar("ge", a, v)
    case sources.LessThan(a, v) => scalar("lt", a, v)
    case sources.LessThanOrEqual(a, v) => scalar("le", a, v)
    case sources.In(a, vs) =>
      val encoded = vs.toSeq.map(encode)
      if (encoded.exists(_.isEmpty) || encoded.isEmpty) None
      else Some(Map("op" -> "in", "c" -> a,
        "t" -> encoded.head.get._1, "vs" -> encoded.map(_.get._2)))
    case sources.IsNull(a) => Some(Map("op" -> "isnull", "c" -> a))
    case sources.IsNotNull(a) => Some(Map("op" -> "isnotnull", "c" -> a))
    case sources.StringStartsWith(a, v) =>
      Some(Map("op" -> "sw", "c" -> a, "v" -> v))
    case sources.StringEndsWith(a, v) =>
      Some(Map("op" -> "ew", "c" -> a, "v" -> v))
    case sources.StringContains(a, v) =>
      Some(Map("op" -> "ct", "c" -> a, "v" -> v))
    case sources.Not(c) => toJson(c).map(x => Map("op" -> "not", "x" -> x))
    case sources.And(l, r) =>
      for (a <- toJson(l); b <- toJson(r))
        yield Map("op" -> "and", "l" -> a, "r" -> b)
    case sources.Or(l, r) =>
      for (a <- toJson(l); b <- toJson(r))
        yield Map("op" -> "or", "l" -> a, "r" -> b)
    case _ => None // EqualNullSafe/AlwaysTrue/... -> copy-on-write
  }

  private def scalar(op: String, c: String, v: Any): Option[Map[String, Any]] =
    encode(v).map { case (t, s) => Map("op" -> op, "c" -> c, "t" -> t, "v" -> s) }

  /** (type family tag, string form). The tag records what the literal
    * WAS; decoding re-types against the current column type within the
    * same family.
    */
  private def encode(v: Any): Option[(String, String)] = v match {
    case null => None // EqualTo(col, null) is never-true in SQL; don't persist it
    case b: java.lang.Boolean => Some(("bool", b.toString))
    case n @ (_: java.lang.Byte | _: java.lang.Short | _: java.lang.Integer |
              _: java.lang.Long) =>
      Some(("int", n.asInstanceOf[Number].longValue().toString))
    case n @ (_: java.lang.Float | _: java.lang.Double) =>
      Some(("float", n.asInstanceOf[Number].doubleValue().toString))
    case s: String => Some(("str", s))
    case s: org.apache.spark.unsafe.types.UTF8String => Some(("str", s.toString))
    case d: java.sql.Date => Some(("date", d.toLocalDate.toString))
    case d: java.time.LocalDate => Some(("date", d.toString))
    case t: java.sql.Timestamp =>
      Some(("ts", (t.toInstant.getEpochSecond * 1000000L +
        t.toInstant.getNano / 1000).toString))
    case i: java.time.Instant =>
      Some(("ts", (i.getEpochSecond * 1000000L + i.getNano / 1000).toString))
    case l: java.time.LocalDateTime =>
      val i = l.toInstant(java.time.ZoneOffset.UTC)
      Some(("ts", (i.getEpochSecond * 1000000L + i.getNano / 1000).toString))
    case _ => None // decimals, binary, arrays: copy-on-write
  }

  /** Decode to a v1 filter carrying external JVM values (the shapes
    * [[TableOps.filterToColumn]] and Literal.create both accept).
    */
  def fromJson(m: Map[String, Any]): sources.Filter = {
    def c = m("c").asInstanceOf[String]
    def sub(k: String) = fromJson(m(k).asInstanceOf[Map[String, Any]])
    def v: Any = decode(m("t").asInstanceOf[String], m("v").asInstanceOf[String])
    m("op").asInstanceOf[String] match {
      case "eq" => sources.EqualTo(c, v)
      case "gt" => sources.GreaterThan(c, v)
      case "ge" => sources.GreaterThanOrEqual(c, v)
      case "lt" => sources.LessThan(c, v)
      case "le" => sources.LessThanOrEqual(c, v)
      case "in" =>
        val t = m("t").asInstanceOf[String]
        val vs = m("vs").asInstanceOf[Seq[Any]]
          .map(x => decode(t, x.asInstanceOf[String]))
        sources.In(c, vs.toArray)
      case "isnull" => sources.IsNull(c)
      case "isnotnull" => sources.IsNotNull(c)
      case "sw" => sources.StringStartsWith(c, m("v").asInstanceOf[String])
      case "ew" => sources.StringEndsWith(c, m("v").asInstanceOf[String])
      case "ct" => sources.StringContains(c, m("v").asInstanceOf[String])
      case "not" => sources.Not(sub("x"))
      case "and" => sources.And(sub("l"), sub("r"))
      case "or" => sources.Or(sub("l"), sub("r"))
      case other => throw new IllegalStateException(s"bad tombstone op: $other")
    }
  }

  private def decode(t: String, s: String): Any = t match {
    case "bool" => java.lang.Boolean.valueOf(s)
    case "int" => java.lang.Long.valueOf(s) // widest integral; comparisons cast
    case "float" => java.lang.Double.valueOf(s)
    case "str" => s
    case "date" => java.sql.Date.valueOf(s)
    case "ts" =>
      val us = s.toLong
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        us / 1000000L, (us % 1000000L) * 1000L))
  }

  /** Column names referenced by a serialized filter (DROP COLUMN guard). */
  def columns(f: sources.Filter): Set[String] = f match {
    case sources.Not(c) => columns(c)
    case sources.And(l, r) => columns(l) ++ columns(r)
    case sources.Or(l, r) => columns(l) ++ columns(r)
    case other => other.references.toSet
  }
}
