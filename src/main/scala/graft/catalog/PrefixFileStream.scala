package graft.catalog

import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl}

/** Shared offset/admission machinery for graft's prefix-consuming
  * micro-batch streams ([[GraftMicroBatchStream]] over a table's commit
  * log, [[IcebergChangesMicroBatchStream]] over an external Iceberg
  * table). Both share one design: consumption is a PREFIX of a
  * deterministic MONOTONE file order inside an immutable snapshot named
  * by a token (graft snapshot id / Iceberg metadata location). An offset
  * is (token, idx); the consumed set is the order's first `idx` paths;
  * admission walks the CURRENT token's order, counting only
  * not-yet-consumed paths against the rate cap and absorbing consumed
  * trailing files so a caught-up offset is canonical. Keeping the loop
  * here means the subtle parts (prefix invariant, trailing absorption,
  * foreign-offset normalization) are fixed in ONE place for both
  * sources.
  */
private[catalog] trait PrefixFileStream[F] extends MicroBatchStream
    with SupportsAdmissionControl {

  protected def startFromLatest: Boolean
  protected def maxFilesPerTrigger: Option[Int]
  protected def pathOf(f: F): String
  /** The deterministic monotone file order of the snapshot `token` names
    * (consumed sets must be prefixes of every LATER token's order).
    */
  protected def orderedAt(token: String): IndexedSeq[F]
  /** Head token, resolved fresh every trigger. */
  protected def currentToken: String
  /** Token used by a startFrom=latest initial offset (defaults to the
    * head; the graft stream pins its scan-time snapshot instead).
    */
  protected def initialToken: String = currentToken
  protected def mkOffset(token: String, idx: Int): Offset
  /** (token, idx) of an offset, normalizing foreign (checkpoint-
    * deserialized) representations.
    */
  protected def tokenIdx(o: Offset): (String, Int)

  /** Paths consumed at an offset — the first `idx` files of the offset
    * token's order. Replayable: the named snapshot is immutable.
    */
  protected final def consumedPaths(o: Offset): Set[String] = {
    val (token, idx) = tokenIdx(o)
    if (token.isEmpty) Set.empty
    else orderedAt(token).take(idx).iterator.map(pathOf).toSet
  }

  final override def initialOffset(): Offset =
    if (!startFromLatest) mkOffset("", 0)
    else {
      val t = initialToken
      mkOffset(t, orderedAt(t).size)
    }

  final override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles)
      .getOrElse(ReadLimit.allAvailable())

  final override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      s"$toString uses latestOffset(Offset, ReadLimit)")

  final override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    // the START token's order materializes BEFORE the head's: subclasses
    // anchoring per-stream state on the first-seen token (the
    // iceberg-changes rewrite guard) must observe the checkpointed
    // position, not the head, as the stream's resume point
    val consumed = consumedPaths(start)
    val t = currentToken
    val all = orderedAt(t)
    val cap = limit match {
      case f: ReadMaxFiles => f.maxFiles()
      case _ => Int.MaxValue
    }
    var idx = 0
    var admitted = 0
    while (idx < all.size && admitted < cap) {
      if (!consumed(pathOf(all(idx)))) admitted += 1
      idx += 1
    }
    // absorb already-consumed trailing files so a caught-up offset is
    // exactly (head, |files|) — keeps offsets canonical across triggers
    while (idx < all.size && consumed(pathOf(all(idx)))) idx += 1
    if (admitted == 0) start else mkOffset(t, idx)
  }

  /** The not-yet-consumed files of the batch (start, end] — the shared
    * core of each subclass's `planInputPartitions`.
    */
  protected final def batchFiles(start: Offset, end: Offset): IndexedSeq[F] = {
    val (token, idx) = tokenIdx(end)
    if (token.isEmpty) return IndexedSeq.empty
    val consumed = consumedPaths(start)
    orderedAt(token).take(idx).filterNot(f => consumed(pathOf(f)))
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
