package graft.versioned

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.{ClassTagExtensions, DefaultScalaModule}

/** On-disk metadata model for the graft versioned table format
  * (SURVEY.md §3). Everything is an immutable JSON object; only branch
  * ref files advance, via a set-if-absent protocol that mirrors the
  * reference's optimistic commit (LakeFSTableOperations.java:115-147).
  *
  * Layout under `<catalogRoot>/<repo>/`:
  * {{{
  *   refs/<branch>/v{N}      text: commit id; head = max N; each vN is
  *                           published atomically with fail-if-exists
  *   commits/<cid>.json      Commit (content-addressed, immutable)
  *   snapshots/<sid>.json    Snapshot (schema + data-file list + stats)
  *   data/<uuid>/part-N.parquet   immutable data files
  * }}}
  */
object Json {
  val mapper: ObjectMapper with ClassTagExtensions =
    new ObjectMapper with ClassTagExtensions
  mapper.registerModule(DefaultScalaModule)
  mapper.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
  def write(v: Any): String = mapper.writeValueAsString(v)
  def read[T: Manifest](s: String): T = mapper.readValue[T](s)

  /** Untyped read: JSON -> Map[String, Any] / Seq[Any] / String / Long /
    * Double / Boolean / null (jackson-scala cannot bind nested generic
    * targets like Seq[Map[String, Any]] through Manifests).
    */
  def readAny(s: String): Any = fromNode(mapper.readTree(s))

  private def fromNode(n: com.fasterxml.jackson.databind.JsonNode): Any = {
    import scala.jdk.CollectionConverters._
    if (n.isObject)
      n.fields().asScala.map(e => e.getKey -> fromNode(e.getValue)).toMap
    else if (n.isArray) n.elements().asScala.map(fromNode).toSeq
    else if (n.isTextual) n.asText()
    else if (n.isIntegralNumber) n.asLong()
    else if (n.isFloatingPointNumber) n.asDouble()
    else if (n.isBoolean) n.asBoolean()
    else null
  }
}

/** One field of a table's partition spec (Iceberg-transform analog —
  * the reference's users get partition specs through the Iceberg
  * metadata the adapter serves, LakeFSTableOperations.java:36).
  *
  * @param name      partition field name (directory key)
  * @param transform "identity" | "bucket"
  * @param source    source data column
  * @param numBuckets bucket count (bucket transform only)
  */
final case class PartitionField(
    name: String,
    transform: String,
    source: String,
    numBuckets: Int = 0)

/** One immutable parquet data file with per-column min/max stats (as
  * strings, typed via the snapshot schema) for scan-time file pruning —
  * at 100 TB, pruning by stats is what turns a selective DELETE/SELECT
  * from a full-table scan into a few-file rewrite. Partitioned tables
  * additionally record the file's partition values (field name ->
  * string value), pruned BEFORE stats are consulted.
  *
  * @param path  relative to the repo root
  */
final case class FileEntry(
    path: String,
    rows: Long,
    min: Map[String, String],
    max: Map[String, String],
    partitionValues: Option[Map[String, String]] = None,
    bytes: Option[Long] = None,
    seq: Option[Long] = None,
    bloomCols: Option[Seq[String]] = None,
    nulls: Option[Map[String, Long]] = None,
    ndv: Option[Map[String, Long]] = None) {
  /** Physical columns with a bloom sidecar (`<path>.bloom`) — advertised
    * here so planning never probes the filesystem for absent sidecars.
    */
  def bloomColsList: Seq[String] = Option(bloomCols).flatten.getOrElse(Nil)
  def partValues: Map[String, String] =
    Option(partitionValues).flatten.getOrElse(Map.empty)
  /** On-disk size; falls back to a rows-based guess for pre-`bytes`
    * snapshots (used only for planner statistics, never correctness).
    * jackson-scala materializes small JSON numbers as boxed Integers
    * inside Option despite the declared Long — widen via Number.
    */
  def sizeBytes(bytesPerRow: Long): Long =
    exactBytes.getOrElse(rows * bytesPerRow)
  /** The EXACT on-disk length recorded at write time (None for
    * pre-`bytes` snapshots) — callers needing truth (external readers
    * plan range reads from it) use this and stat the file only on
    * None, instead of an unconditional per-file IO call.
    */
  def exactBytes: Option[Long] =
    Option(bytes).flatten.asInstanceOf[Option[Any]] match {
      case Some(n: Number) => Some(n.longValue())
      case _ => None
    }
  /** Commit sequence at which the file was added (merge-on-read delete
    * ordering: a tombstone applies to every file with a LOWER seq).
    * Legacy/unstamped files read as 0 — they predate any tombstone, so
    * "every tombstone applies" is exactly right. Same jackson boxing
    * caveat as `bytes`.
    */
  def seqNo: Long = Option(seq).flatten.asInstanceOf[Option[Any]] match {
    case Some(n: Number) => n.longValue()
    case _ => 0L
  }
  /** Per-physical-column null counts / approx distinct counts recorded
    * at write time (CBO column statistics). Same jackson boxing caveat
    * as `bytes`; absent for pre-stat snapshots → None (planner falls
    * back to row-count-only estimates, never guesses).
    */
  private def longMap(o: Option[Map[String, Long]]): Map[String, Long] =
    // erase the value type BEFORE destructuring: a typed (String, Long)
    // pattern match would unbox jackson's Integers and throw
    Option(o).flatten.getOrElse(Map.empty).asInstanceOf[Map[String, Any]]
      .map { case (k, v) => k -> v.asInstanceOf[Number].longValue() }
  def nullCounts: Map[String, Long] = longMap(nulls)
  def ndvCounts: Map[String, Long] = longMap(ndv)
}

/** One segment of a large snapshot's file list, stored out-of-line as an
  * immutable, content-addressed object under `snapshots/manifests/`
  * (the Iceberg manifest-file idea: a commit that touches K of N files
  * rewrites O(K) metadata bytes, not O(N)). Chunk boundaries are
  * content-defined (cut decided by a hash of each entry's path,
  * [[Manifests.isCut]]), so appends and deletes only perturb the chunks
  * they touch — every other chunk re-hashes to the same object and is
  * reused byte-for-byte. Branches and successive commits therefore share
  * manifest objects structurally, like git tree objects.
  *
  * @param path       repo-root-relative manifest object path
  * @param count      number of [[FileEntry]] rows in the object
  * @param rows       total data rows across those entries
  * @param partitions distinct partition tuples covered, recorded only
  *                   when few (≤ [[Manifests.PartSummaryMax]]) — lets a
  *                   partition-pruned plan skip loading whole manifests;
  *                   None = unknown, must load
  */
final case class ManifestRef(
    path: String,
    count: Int,
    rows: Long,
    partitions: Option[Seq[Map[String, String]]] = None)

/** Immutable table snapshot: schema (Spark StructType JSON) + file list
  * + optional partition spec (set at CREATE TABLE, immutable after)
  * + optional logical->physical column-name mapping.
  *
  * The file list is stored inline for small tables and segmented into
  * content-addressed [[ManifestRef]] objects past
  * `graft.manifest.inline.max` entries; [[GraftRepo.snapshot]]
  * re-materializes `files` on load either way, so everything downstream
  * of a loaded snapshot sees one flat list.
  *
  * Name mapping is how RENAME COLUMN stays metadata-only (the Delta
  * column-mapping idea, the same stability Iceberg gets from field
  * IDs): the PHYSICAL name a column was first written under never
  * changes; renames only rebind the logical name. Data files and their
  * min/max stats are always keyed by physical name, so every file ever
  * written stays readable and prunable after any number of renames.
  */
final case class Snapshot(
    id: String,
    table: String,
    schemaJson: String,
    files: Seq[FileEntry],
    partitionBy: Option[Seq[PartitionField]] = None,
    physicalNames: Option[Map[String, String]] = None,
    props: Option[Map[String, String]] = None,
    retired: Option[Seq[String]] = None,
    manifests: Option[Seq[ManifestRef]] = None) {
  /** Manifest segments backing `files`, empty for inline snapshots. A
    * loaded snapshot carries BOTH: refs for structural/GC inspection,
    * the materialized list for planning.
    */
  def manifestRefs: Seq[ManifestRef] =
    Option(manifests).flatten.getOrElse(Nil)
  def partitionFields: Seq[PartitionField] =
    Option(partitionBy).flatten.getOrElse(Nil)
  /** logical -> physical; identity for never-renamed columns. */
  def nameMapping: Map[String, String] =
    Option(physicalNames).flatten.getOrElse(Map.empty)
  def physicalName(logical: String): String =
    nameMapping.getOrElse(logical, logical)
  /** User table properties (TBLPROPERTIES). */
  def properties: Map[String, String] = Option(props).flatten.getOrElse(Map.empty)
  /** Physical names of DROPPED columns: old files still hold their
    * bytes, so a later ADD COLUMN with such a name must get a fresh
    * physical name or the dead bytes would resurface instead of nulls
    * (the invariant Iceberg gets from never-reused field ids).
    */
  def retiredNames: Set[String] = Option(retired).flatten.getOrElse(Nil).toSet
}

/** Immutable commit: full table map of the repo at a point in time.
  * `tables` maps "db/table" -> snapshot id; `namespaces` maps db ->
  * properties. Branch = chain of commits; merge commits have 2 parents.
  */
/** A versioned SQL view definition, stored IN the commit like a table
  * pointer: branch create copies it for free, merge three-ways it, and
  * reading a branch resolves the view against that branch's state.
  * `namespace` records the creation-time resolution context; the BRANCH
  * segment is rebound to the reading branch at load, so a view written
  * with relative table references follows the branch it is read on
  * (fully-qualified references stay pinned — the author's choice).
  */
final case class ViewDef(
    sql: String,
    catalog: String,
    namespace: Seq[String],
    schemaJson: String,
    queryColumnNames: Seq[String] = Nil,
    columnAliases: Seq[String] = Nil,
    columnComments: Seq[String] = Nil,
    properties: Map[String, String] = Map.empty,
    // namespace-shape marker: 2 = canonical [repo, branch, db...]
    // (every current writer), 0 = pre-marker entry whose shape must be
    // ref-sniffed at serve time (legacy [branch, db...] possible)
    nsForm: Int = 0)

final case class Commit(
    id: String,
    parents: Seq[String],
    ts: Long,
    message: String,
    tables: Map[String, String],
    namespaces: Map[String, Map[String, String]],
    views: Option[Map[String, ViewDef]] = None,
    trees: Option[Seq[Trees.TreeRef]] = None,
    marker: Option[String] = None,
    // generation number: 0 for a root, 1 + max(parent generations)
    // otherwise — strictly greater than every ancestor's, which lets
    // mergeBase walk in descending-generation order and STOP at the
    // common-ancestry closure instead of walking both histories to the
    // roots. None on commits written before the field existed (and on
    // their descendants — a commit carries a generation only when ALL
    // its parents do, so gen-present implies gen-present all the way
    // down); mergeBase falls back to the exhaustive walk there.
    gen: Option[Long] = None) {
  def viewMap: Map[String, ViewDef] = Option(views).flatten.getOrElse(Map.empty)
  /** Null-safe, box-safe generation accessor (jackson erases the
    * Option's Long — the runtime value can be a boxed Integer). */
  def genOpt: Option[Long] =
    Option(gen).flatten.asInstanceOf[Option[Any]]
      .map { case n: Number => n.longValue() }
  /** STRUCTURAL machine-readable classification of what the commit did
    * ([[Commit.CompactMarker]] for rewrite-only compactions) — stamped
    * by the operation itself, never derived from the free-text
    * `message`: incremental consumers (Iceberg export's `replace`
    * summaries) drop a mis-classified commit's rows silently, so a
    * user-typed message must not be able to forge one.
    */
  def markerOpt: Option[String] = Option(marker).flatten
  /** Tree segments backing `tables` (Trees.scala), empty when inline. A
    * loaded commit carries refs for GC inspection plus a lazy `tables`
    * map whose point lookups read one chunk.
    */
  def treeRefs: Seq[Trees.TreeRef] = Option(trees).flatten.getOrElse(Nil)
}

object Commit {
  /** [[Commit.marker]] value of a compaction: files rewritten, LOGICAL
    * rows unchanged — the one commit shape incremental consumers may
    * safely skip. */
  val CompactMarker = "compact"
}

/** Commit was rejected because the branch head moved (stale base). */
final class CommitConflictException(msg: String) extends RuntimeException(msg)

/** Both sides of a merge changed the same table since the merge base. */
final class MergeConflictException(msg: String) extends RuntimeException(msg)
