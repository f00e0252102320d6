package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.sources
import org.apache.spark.sql.types.StructType

import graft.versioned.{FileEntry, GraftRepo, Json, Snapshot, TableOps}

/** Stream offset: a (snapshot id, file index) pair. `idx` counts files
  * consumed from the snapshot's deterministic stream order
  * ([[GraftMicroBatchStream.ordered]]); `snap == ""` means "nothing
  * consumed yet". Offsets are replayable as long as the referenced
  * snapshot metadata exists — `CALL expire_snapshots` with an age guard
  * shorter than consumer lag breaks resumability (same retention
  * contract as Delta/Iceberg streaming reads).
  */
final case class GraftStreamOffset(snap: String, idx: Int) extends Offset {
  override def json(): String = Json.write(Map("snap" -> snap, "idx" -> idx))
}

/** Native DSv2 micro-batch source over a graft table's commit log.
  *
  * Each trigger resolves the BRANCH HEAD snapshot from repo metadata and
  * emits the files not yet consumed — a directory is never listed
  * (the file-glob alternative, [[TableOps.readStreamAppends]], re-lists
  * the whole table path every trigger: O(total files) per batch at
  * 100 TB, vs O(|snapshot metadata|) here, which the consumer already
  * pays once per commit). Admission control (`maxFilesPerTrigger`)
  * bounds each batch for backlogged consumers; offsets are exactly-once
  * across restarts because they name an immutable (snapshot, index)
  * position, not a wall-clock or listing state.
  *
  * Semantics: APPEND stream of raw committed files, the contract of
  * Iceberg/Delta table streaming without CDF —
  *  - merge-on-read DELETE commits no files, so nothing is re-emitted
  *    (and nothing is retracted);
  *  - CoW rewrites (UPDATE/DELETE/compaction) add files whose rows
  *    RE-emit; restrict to append-only tables when exactly-once ROW
  *    semantics matter.
  *
  * Mid-stream schema changes keep the stream-start schema (physical
  * names never change, so older and newer files both decode); restart
  * the query to pick up evolved columns.
  */
final class GraftMicroBatchStream(
    repo: GraftRepo,
    branch: String,
    key: String,
    startSnap: Snapshot,
    schema: StructType,
    required: StructType,
    pushed: Array[sources.Filter],
    maxFilesPerTrigger: Option[Int],
    startFromLatest: Boolean) extends MicroBatchStream
    with SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.ReportsSourceMetrics {

  // logical->physical resolution is pinned at stream start: physical
  // as-written names NEVER change (rename is metadata-only), so this
  // mapping stays valid for every file the stream will ever see
  private val mapping = startSnap.nameMapping
  private val physSchema = TableOps.toPhysical(schema, mapping)
  private val physRequired = TableOps.toPhysical(required, mapping)
  private val physFilters = pushed.map(TableOps.renameFilter(_, mapping))

  private def headSnap: Snapshot = {
    val c = repo.headCommit(branch)
    val id = c.tables.getOrElse(key, throw new NoSuchElementException(
      s"streaming source: table $key no longer exists on branch '$branch'"))
    repo.snapshot(id)
  }

  /** Deterministic stream order: (commit sequence, path). Append-only
    * growth extends the order at the tail, so a consumed prefix stays a
    * prefix; rewrites shift positions, which the path-set difference in
    * [[planInputPartitions]] absorbs (consumption is tracked by PATH,
    * the index is just a compact cursor into an immutable snapshot).
    */
  private def ordered(s: Snapshot): IndexedSeq[FileEntry] =
    s.files.sortBy(f => (f.seqNo, f.path)).toIndexedSeq

  private def offsetOf(o: Offset): GraftStreamOffset = o match {
    case g: GraftStreamOffset => g
    case other => parse(other.json())
  }

  private def parse(json: String): GraftStreamOffset = {
    val m = Json.readAny(json).asInstanceOf[Map[String, Any]]
    GraftStreamOffset(m("snap").asInstanceOf[String],
      m("idx").asInstanceOf[Number].intValue())
  }

  /** Paths consumed at an offset — the first `idx` files of the offset
    * snapshot's stream order. Replayable: snapshots are immutable.
    */
  private def consumedPaths(o: GraftStreamOffset): Set[String] =
    if (o.snap.isEmpty) Set.empty
    else {
      val s = if (o.snap == startSnap.id) startSnap else repo.snapshot(o.snap)
      ordered(s).take(o.idx).iterator.map(_.path).toSet
    }

  override def initialOffset(): Offset =
    if (startFromLatest) GraftStreamOffset(startSnap.id, startSnap.files.size)
    else GraftStreamOffset("", 0)

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "GraftMicroBatchStream uses latestOffset(Offset, ReadLimit)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = headSnap
    val consumed = consumedPaths(offsetOf(start))
    val all = ordered(s)
    val cap = limit match {
      case f: ReadMaxFiles => f.maxFiles()
      case _ => Int.MaxValue
    }
    var idx = 0
    var admitted = 0
    while (idx < all.size && admitted < cap) {
      if (!consumed(all(idx).path)) admitted += 1
      idx += 1
    }
    // absorb already-consumed trailing files so a caught-up offset is
    // exactly (head, |files|) — keeps offsets canonical across triggers
    while (idx < all.size && consumed(all(idx).path)) idx += 1
    if (admitted == 0) start else GraftStreamOffset(s.id, idx)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val endO = offsetOf(end)
    if (endO.snap.isEmpty) return Array.empty
    val endSnap = if (endO.snap == startSnap.id) startSnap else repo.snapshot(endO.snap)
    val consumed = consumedPaths(offsetOf(start))
    val batch = ordered(endSnap).take(endO.idx).filterNot(f => consumed(f.path))
    // static pushed-filter stats pruning: a pruned file is still CONSUMED
    // (offsets advance by position), it just isn't read
    val live = batch.filter(f => physFilters.forall(pf =>
      TableOps.statsMayMatch(f, physSchema, pf)))
    if (live.isEmpty) return Array.empty
    scanFor(live).toBatch.planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    scanFor(Nil).toBatch.createReaderFactory()

  private def scanFor(files: Seq[FileEntry]) =
    graftbridge.ParquetReadBridge.scan(
      SparkSession.active,
      files.map(f => new org.apache.hadoop.fs.Path(repo.dataLocation(f.path))),
      physSchema, physRequired, physFilters)

  /** Backlog visibility in StreamingQueryProgress.sources[i].metrics:
    * files/bytes committed to the table but not yet consumed — how far
    * behind the head a rate-limited consumer is (all from snapshot
    * metadata, no listing).
    */
  override def metrics(latestConsumed: java.util.Optional[Offset])
      : java.util.Map[String, String] = {
    val consumed =
      if (latestConsumed.isPresent) consumedPaths(offsetOf(latestConsumed.get))
      else Set.empty[String]
    val behind = ordered(headSnap).filterNot(f => consumed(f.path))
    java.util.Map.of(
      "filesBehindHead", behind.size.toString,
      "bytesBehindHead", behind.map(_.sizeBytes(bytesPerRow = 64L)).sum.toString)
  }

  override def deserializeOffset(json: String): Offset = parse(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"GraftMicroBatchStream($key@$branch)"
}
