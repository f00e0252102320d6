package graft.operators

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.time.Instant
import java.util.UUID
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.Q

/** Structured Streaming pack (SURVEY.md §2.4) over the `events` table.
  *
  * Each query replays the events parquet as a file-source stream
  * (AvailableNow-style synchronous run into a memory sink) — the same
  * code runs unchanged against a live stream at scale; only the source/
  * sink bindings differ. Event-time correctness (not arrival-time) is
  * the design point: watermarks bound state, so a 100 TB/day stream
  * holds only in-flight windows/sessions in the state store.
  *
  * Deterministic end-of-stream flushing: sessionization emits on
  * event-time timeout, which requires the watermark to pass the last
  * session's gap. The stream is staged as [events file, sentinel
  * file(s)] with deterministic file order, so the far-future sentinel
  * events advance the watermark and close all real sessions — making
  * the result complete, deterministic, and DuckDB-oracle-checkable
  * (see [[readStaged]] for the batch grouping).
  */
object Streaming {

  private val eventSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // raw parquet NANOS (legacy nanosAsLong)
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Per-dataset-dir (tsIsNanos, max event µs) — both are properties of
    * the immutable testdata parquet, so every sentinel-staging query in
    * the JVM shares one footer sniff + one max-ts aggregation job
    * instead of paying them per stream (bench fixed-cost trim).
    */
  private val eventMetaCache =
    scala.collection.concurrent.TrieMap.empty[(String, Long, Long), (Boolean, Long)]

  private def eventMeta(s: SparkSession, d: String): (Boolean, Long) = {
    // key carries the file's identity (mtime + size): a regenerated
    // events.parquet at the same path — different scale or ts encoding
    // — must not serve stale sentinel timestamps from the cache
    val f = Paths.get(s"$d/events.parquet")
    val key = (d, Files.getLastModifiedTime(f).toMillis, Files.size(f))
    eventMetaCache.getOrElseUpdate(key, {
      val tsIsNanos = s.read.parquet(s"$d/events.parquet")
        .schema("ts").dataType == LongType
      val maxUs = graft.Tables.events(s, d)
        .agg(unix_micros(max(col("ts").cast(TimestampType))))
        .head().getLong(0)
      (tsIsNanos, maxUs)
    })
  }

  /** Stage `events.parquet` (+ optional far-future sentinels) into a
    * fresh stream dir — shared by every source that reads it (the
    * stream-stream join reads ONE staged dir from both sides).
    */
  // staged dirs hold a full copy of events.parquet each — without
  // cleanup, repeated verify/bench rounds leak one per streaming query
  // into /tmp until the disk fills. Each dir is associated with ITS
  // query explicitly: stageStream returns the dir and the caller passes
  // it into runToTable, which reclaims exactly those dirs when the
  // query stops (the memory sink holds the results, so the files are
  // dead the moment the query terminates). The JVM shutdown hook is
  // only the backstop for queries that never reach runToTable (an
  // exception between staging and start). A long-lived session running
  // many streaming queries therefore holds at most the in-flight
  // copies, not one per query ever run.
  private val stagedDirs = java.util.Collections.synchronizedList(
    new java.util.ArrayList[java.nio.file.Path]())

  private def deleteStaged(dir: java.nio.file.Path): Unit =
    try
      scala.util.Using.resource(Files.walk(dir))(
        _.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => { Files.deleteIfExists(p); () }))
    catch { case _: Exception => () } // best-effort cleanup

  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    stagedDirs.forEach(deleteStaged)))

  private def stageStream(s: SparkSession, d: String, sentinel: Boolean,
      sentinels: Int = 1,
      sentinelTypes: Seq[String] = Seq("sentinel")): java.nio.file.Path = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val (tsIsNanos, maxUs) = eventMeta(s, d)
    val dir = Files.createTempDirectory("graft-stream")
    stagedDirs.add(dir)
    Files.copy(Paths.get(s"$d/events.parquet"), dir.resolve("0_events.parquet"),
      StandardCopyOption.COPY_ATTRIBUTES)
    if (sentinel) {
      import s.implicits._
      // events far past every real timestamp; filtered back out
      // downstream (negative user_id/event_id mark them — remove them
      // AFTER the stream completes: a filter in the STREAMING plan gets
      // pushed below the EventTimeWatermark node by Catalyst, and a
      // sentinel dropped pre-watermark advances nothing). Queries that
      // pre-filter the stream on event_type pass `sentinelTypes` so one
      // sentinel survives each branch's pushed filter. More than one
      // sentinel BATCH is needed by operators whose state flush happens
      // on the batch AFTER a watermark bump (stream-stream outer joins
      // emit evictions while processing data, so the bump batch itself
      // still sees the old watermark). All sentinel batches write in
      // ONE partitioned job (a file per batch index), not a job each.
      val stage = dir.resolve("z_sentinels")
      val base = (1 to sentinels).flatMap { i =>
        sentinelTypes.zipWithIndex.map { case (t, j) =>
          (i, -1L - j, maxUs + i * 86400L * 1000000L, -1L - j, t, 0.0, "{}")
        }
      }.toDF("b", "event_id", "ts", "user_id", "event_type", "value", "props")
      val typed =
        if (tsIsNanos) base.withColumn("ts", col("ts") * 1000L)
        else base.withColumn("ts",
          timestamp_micros(col("ts")).cast(TimestampNTZType))
      typed.coalesce(1).write.partitionBy("b").parquet(stage.toString)
      (1 to sentinels).foreach { i =>
        val out = dir.resolve(s"${i}_sentinel.parquet")
        scala.util.Using.resource(Files.list(stage.resolve(s"b=$i")))(
          _.iterator().asScala
            .filter(_.toString.endsWith(".parquet"))
            .foreach(p => Files.move(p, out)))
        // explicit strictly-increasing mtimes: the file source orders
        // batches by modification time, and the one-job sentinel write
        // gives every batch's file the same ms timestamp — ties would
        // let sentinel 2 overtake sentinel 1
        Files.setLastModifiedTime(out, java.nio.file.attribute.FileTime
          .fromMillis(System.currentTimeMillis() + i * 2000L))
      }
    }
    dir
  }

  /** File-source stream over a staged dir, `ts` normalized to µs
    * TIMESTAMP (LTZ: watermarks require TIMESTAMP; session tz is UTC so
    * the instant equals the NTZ oracle view — outputs cast back).
    */
  private def readStaged(s: SparkSession, d: String,
      dir: java.nio.file.Path): DataFrame = {
    val (tsIsNanos, _) = eventMeta(s, d)
    val schema =
      if (tsIsNanos) eventSchema
      else StructType(eventSchema.map(f =>
        if (f.name == "ts") f.copy(dataType = TimestampNTZType) else f))
    // 2 files per trigger: the DATA file and the FIRST sentinel share a
    // micro-batch (the watermark advances at end-of-batch either way, so
    // all data rows process under the previous watermark exactly as
    // before, and the bump is visible from the next batch on) — one
    // whole stateful micro-batch saved per sentinel stream. Flush
    // semantics are unchanged: operators that emit on a post-bump DATA
    // batch get sentinel 2 as its own batch, and single-sentinel
    // streams flush in the engine's no-data micro-batch.
    val raw = s.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "2")
      .parquet(dir.toString)
    if (tsIsNanos) raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw.withColumn("ts", col("ts").cast(TimestampType))
  }

  /** Stage + read in one step (single-source queries): the stream plus
    * the dir it reads — the caller hands the dir to [[runToTable]] so
    * reclamation is tied to exactly this query's staging.
    */
  private def eventStream(s: SparkSession, d: String, sentinel: Boolean,
      sentinels: Int = 1,
      sentinelTypes: Seq[String] = Seq("sentinel"))
      : (DataFrame, java.nio.file.Path) = {
    val dir = stageStream(s, d, sentinel, sentinels, sentinelTypes)
    (readStaged(s, d, dir), dir)
  }

  /** Run a streaming DataFrame synchronously into a memory sink. The
    * stateful shuffle width is pinned to 4 for the run: state-store
    * commit cost scales with partition count, and these replays hold
    * hundreds of keys, not millions (a real deployment sizes this to
    * keys/partition instead).
    */
  private def runToTable(s: SparkSession, df: DataFrame, mode: OutputMode,
      staged: Seq[java.nio.file.Path] = Nil): DataFrame = {
    val name = "st_" + UUID.randomUUID().toString.replace("-", "").take(10)
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
      try q.processAllAvailable() finally q.stop()
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", prev)
      // the query is stopped: the dirs staged FOR IT (passed by the
      // caller — never some other query's pending staging) are dead —
      // reclaim now instead of waiting for JVM exit
      staged.foreach { dir => deleteStaged(dir); stagedDirs.remove(dir) }
    }
    s.table(name)
  }

  /** Tumbling 1h event-time window agg with a watermark. Complete mode:
    * every window emits at end of replay. DECIMAL-summed value for
    * order-independent oracle parity.
    */
  private def windowAgg(s: SparkSession, d: String): DataFrame = {
    val (stream, dir) = eventStream(s, d, sentinel = false)
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    runToTable(s, agg, OutputMode.Complete(), Seq(dir))
      .select(col("w.start").cast(TimestampNTZType).as("ws"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("ws"), col("event_type"))
  }

  /** Sliding 2h window / 1h slide: each event lands in two windows; the
    * DuckDB oracle replays that by unioning the two window starts per
    * event.
    */
  private def slidingAgg(s: SparkSession, d: String): DataFrame = {
    val (stream, dir) = eventStream(s, d, sentinel = false)
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    runToTable(s, agg, OutputMode.Complete(), Seq(dir))
      .select(col("w.start").cast(TimestampNTZType).as("ws"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("ws"), col("event_type"))
  }

  /** Stream-static enrichment join: the event stream joins the static
    * customer dimension (broadcast per micro-batch — no stream state),
    * then aggregates per nation. The standard dimension-enrichment shape:
    * at 100 TB/day the stream only shuffles for the final agg.
    */
  private def staticJoin(s: SparkSession, d: String): DataFrame = {
    val dim = graft.Tables.customer(s, d)
      .select(col("c_custkey"), col("c_nationkey"))
    val (stream, dir) = eventStream(s, d, sentinel = false)
    val agg = stream
      .join(dim, col("user_id") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    runToTable(s, agg, OutputMode.Complete(), Seq(dir))
      .orderBy(col("c_nationkey"))
  }

  // not `private`: encoder codegen instantiates these from generated code
  case class Ev(user_id: Long, ts: Instant)
  case class SessionState(start: Long, end: Long, n: Long) // µs epoch
  case class Session(user_id: Long, session_start: Instant,
      session_end: Instant, n_events: Long)

  private val GapUs = 30L * 60 * 1000 * 1000

  private def toUs(t: Instant): Long =
    t.getEpochSecond * 1000000L + t.getNano / 1000
  private def fromUs(us: Long): Instant =
    Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
      Math.floorMod(us, 1000000L) * 1000)

  /** Gap-based sessionization (30 min) via flatMapGroupsWithState with
    * event-time timeout — closed sessions emit as the watermark passes
    * their gap; the sentinel batch closes the final open sessions.
    * State per user is one open session: O(active users), not O(events).
    */
  private def sessionize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (raw, dir) = eventStream(s, d, sentinel = true)
    val stream = raw
      .withWatermark("ts", "0 seconds")
      .select(col("user_id"), col("ts"))
      .as[Ev]

    val sessions = stream
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, events: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(Session(uid, fromUs(st.start), fromUs(st.end), st.n))
          } else {
            val sorted = events.map(e => toUs(e.ts)).toIndexedSeq.sorted
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { t =>
              cur match {
                case Some(st) if t - st.end <= GapUs =>
                  cur = Some(st.copy(end = t, n = st.n + 1))
                case Some(st) =>
                  closed ::= Session(uid, fromUs(st.start), fromUs(st.end), st.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { st =>
              state.update(st)
              // GroupState event-time timeouts are in epoch MILLIS
              state.setTimeoutTimestamp(st.end / 1000 + GapUs / 1000 + 1)
            }
            closed.reverseIterator
          }
      }
    runToTable(s, sessions.toDF(), OutputMode.Append(), Seq(dir))
      .filter(col("user_id") >= 0)
      .select(col("user_id"),
        col("session_start").cast(TimestampNTZType).as("session_start"),
        col("session_end").cast(TimestampNTZType).as("session_end"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_start"))
  }

  /** Stream-stream interval join: per user, each click joins purchases
    * landing within the following hour. Both sides carry watermarks and
    * the join condition bounds event-time distance, so Spark's
    * symmetric-hash join keeps only one watermark-window of state per
    * side — the attribution-join shape that holds at 100 TB/day (state
    * is O(in-flight window), never O(stream)). Inner matches emit as
    * soon as both rows arrive; the watermark only drives state eviction.
    */
  private def streamJoin(s: SparkSession, d: String): DataFrame = {
    // two INDEPENDENT file sources (not two filters of one stream):
    // mirrors a real deployment's separate topics
    val (clickStream, clickDir) = eventStream(s, d, sentinel = false)
    val clicks = clickStream
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val (purchaseStream, purchaseDir) = eventStream(s, d, sentinel = false)
    val purchases = purchaseStream
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
    runToTable(s, joined, OutputMode.Append(), Seq(clickDir, purchaseDir))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts").cast(TimestampNTZType).as("click_ts"),
        col("purchase_ts").cast(TimestampNTZType).as("purchase_ts"))
      .orderBy(col("user_id"), col("click_id"), col("purchase_id"))
  }

  /** Stream-stream LEFT OUTER interval join: like [[streamJoin]], but a
    * click with no purchase in its hour still emits — null-padded — once
    * the global watermark passes its join window (outer-row emission is
    * watermark-gated: only then can "no match" be known final). State
    * stays O(in-flight window) per side, exactly as the inner join. The
    * far-future sentinel event rides BOTH sources to push the final
    * watermark past every real window (the same flush trick
    * [[sessionize]] uses); the event-type filters run AFTER the
    * withWatermark node so the sentinel still advances event time
    * before being dropped from the join inputs.
    */
  private def streamOuterJoin(s: SparkSession, d: String): DataFrame = {
    // typed sentinels: the event_type filters are pushed BELOW the
    // watermark node, so each side needs a far-future event of its own
    // type to keep advancing event time (see eventStream); the click
    // sentinels carry user_id -1 / the purchase ones -2, so they never
    // join a real row and the static post-stream filter removes them
    // ONE staged dir read by both sides: the copies, sentinel writes
    // and max-ts probe are paid once, not per join input
    val dir = stageStream(s, d, sentinel = true, sentinels = 2,
      sentinelTypes = Seq("click", "purchase"))
    val clicks = readStaged(s, d, dir)
      .withWatermark("ts", "1 hour")
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val purchases = readStaged(s, d, dir)
      .withWatermark("ts", "1 hour")
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"),
      "leftOuter")
    runToTable(s, joined, OutputMode.Append(), Seq(dir))
      .filter(col("user_id") >= 0) // static filter: sentinel rows out
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts").cast(TimestampNTZType).as("click_ts"),
        col("purchase_ts").cast(TimestampNTZType).as("purchase_ts"))
      .orderBy(col("user_id"), col("click_id"),
        col("purchase_id").asc_nulls_first)
  }

  /** Native session windows (session_window + watermark): same 30-min-gap
    * semantics as [[sessionize]] but expressed with Spark's built-in
    * session-window aggregation — state merging, gap tracking and
    * emission are the engine's own implementation (vs the custom
    * flatMapGroupsWithState variant, which exists for semantics Spark
    * can't express natively). Same DuckDB gap-islands oracle.
    */
  private def sessionWindow(s: SparkSession, d: String): DataFrame = {
    val (stream, dir) = eventStream(s, d, sentinel = true)
    val agg = stream
      .withWatermark("ts", "0 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
    runToTable(s, agg, OutputMode.Append(), Seq(dir))
      .filter(col("user_id") >= 0) // drop the sentinel flush row
      .select(col("user_id"),
        col("w.start").cast(TimestampNTZType).as("session_start"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_start"))
  }

  /** Streaming exact dedup on (user_id, event_type) within the watermark
    * (dropDuplicates keyed state) — output is the distinct key set.
    */
  private def dedupStream(s: SparkSession, d: String): DataFrame = {
    val (stream, dir) = eventStream(s, d, sentinel = false)
    val dedup = stream
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("event_type"), col("ts"))
      .dropDuplicates("user_id", "event_type")
    runToTable(s, dedup, OutputMode.Append(), Seq(dir))
      .select(col("user_id"), col("event_type"))
      .orderBy(col("user_id"), col("event_type"))
  }

  /** CONTINUOUS ingestion dedup — the streaming marriage of
    * dd_incr_persist, THE production shape for a training-data
    * pipeline that never stops ingesting: a document stream runs
    * through `foreachBatch(Dedup.indexAdmit)` against the PERSISTED
    * near-dup index, so each micro-batch screens against corpus + every
    * earlier batch's admissions and appends its own in ONE atomic
    * commit (exactly-once admission per doc id via the clash guard —
    * a replayed batch refuses loudly instead of double-admitting).
    * Batch cost is O(batch · matched postings), corpus-independent —
    * the same proof-gated screen/admit kernels the daily cycle uses.
    * Membership mirrors dd_incr_persist (corpus %100 ∈ [10,19], batch 1
    * %100=5, batch 2 %100=0) so the DuckDB oracle replays the exact
    * sequential admission with exact Jaccard.
    */
  private def dedupPersistStream(s: SparkSession, d: String): DataFrame = {
    val t = 0.9
    // corpus index from the shared per-JVM template (same slice and
    // threshold as dd_incr_persist — built once, byte-copied here)
    val (cat, repo) = Dedup.copiedCorpusIndex(s, d)
    val docs = graft.Tables.documents(s, d).select(col("doc_id"), col("text"))
    // stage the ingestion batches as files with strictly-increasing
    // mtimes (shared staging helper — see GateScratch.stageParquetBatch)
    val dir = GateScratch.register(
      Files.createTempDirectory("graft-stream-docs"))
    GateScratch.stageParquetBatch(dir, "b1",
      docs.filter(col("doc_id") % 100 === 5), 0L)
    GateScratch.stageParquetBatch(dir, "b2",
      docs.filter(col("doc_id") % 100 === 0), 2000L)
    val q = s.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Dedup.indexAdmit(s, cat, repo, "main", batch, t)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    // every admitted ingest id = stored docs beyond the corpus slice
    s.table(s"$cat.r.main.dd.docs")
      .filter(!(col("doc_id") % 100).between(10, 19))
      .select(col("doc_id").as("admitted_id"))
      .orderBy(col("admitted_id"))
  }

  val all: Seq[Q] = Seq(
    Q(
      "st_dedup_persist",
      """WITH w AS (SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS ws
        |           FROM documents),
        |cp AS (SELECT * FROM w WHERE doc_id % 100 BETWEEN 10 AND 19),
        |b1 AS (SELECT * FROM w WHERE doc_id % 100 = 5),
        |b2 AS (SELECT * FROM w WHERE doc_id % 100 = 0),
        |dup1 AS (
        |  SELECT DISTINCT d.doc_id FROM b1 d JOIN cp c ON
        |    round(CAST(len(list_intersect(d.ws, c.ws)) AS DOUBLE) /
        |          len(list_distinct(list_concat(d.ws, c.ws))), 6) >= 0.9),
        |a1 AS (SELECT * FROM b1 WHERE doc_id NOT IN (SELECT doc_id FROM dup1)),
        |full1 AS (SELECT * FROM cp UNION ALL SELECT * FROM a1),
        |dup2 AS (
        |  SELECT DISTINCT d.doc_id FROM b2 d JOIN full1 c ON
        |    round(CAST(len(list_intersect(d.ws, c.ws)) AS DOUBLE) /
        |          len(list_distinct(list_concat(d.ws, c.ws))), 6) >= 0.9),
        |a2 AS (SELECT doc_id FROM b2 WHERE doc_id NOT IN (SELECT doc_id FROM dup2))
        |SELECT doc_id AS admitted_id
        |FROM (SELECT doc_id FROM a1 UNION ALL SELECT doc_id FROM a2)
        |ORDER BY admitted_id""".stripMargin
    )(dedupPersistStream),
    // CONTINUOUS embedding ingestion into the persisted ANN index —
    // the sim_ann_persist analog of st_dedup_persist; implementation +
    // rationale live with the index (Similarity.annPersistStream)
    Q(
      "st_ann_persist",
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, true AS recall_ok,
        |       true AS drift_logged
        |FROM embeddings WHERE vec_id % 50 = 0""".stripMargin
    )(Similarity.annPersistStream),
    Q(
      "st_window_agg",
      """SELECT date_trunc('hour', ts) AS ws, event_type,
        |       count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin
    )(windowAgg),
    Q(
      "st_sliding_agg",
      """SELECT ws, event_type, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM (
        |  SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS ws, event_type, value FROM events
        |  UNION ALL
        |  SELECT date_trunc('hour', ts) AS ws, event_type, value FROM events)
        |GROUP BY ws, event_type
        |ORDER BY ws, event_type""".stripMargin
    )(slidingAgg),
    Q(
      "st_static_join",
      """SELECT c.c_nationkey, count(*) AS n_events,
        |       CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY c.c_nationkey ORDER BY c.c_nationkey""".stripMargin
    )(staticJoin),
    Q(
      "st_sessionize",
      """WITH o AS (
        |  SELECT user_id, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |g AS (SELECT user_id, ts,
        |             sum(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sid
        |      FROM o)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        |       count(*) AS n_events
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin
    )(sessionize),
    Q(
      "st_dedup_stream",
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin
    )(dedupStream),
    Q(
      "st_session_window",
      """WITH o AS (
        |  SELECT user_id, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |g AS (SELECT user_id, ts,
        |             sum(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sid
        |      FROM o)
        |SELECT user_id, min(ts) AS session_start, count(*) AS n_events
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin
    )(sessionWindow),
    Q(
      "st_stream_join",
      """SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id,
        |       a.ts AS click_ts, b.ts AS purchase_ts
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND a.event_type = 'click' AND b.event_type = 'purchase'
        | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
        |ORDER BY a.user_id, click_id, purchase_id""".stripMargin
    )(streamJoin),
    Q(
      "st_stream_outer",
      """SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id,
        |       a.ts AS click_ts, b.ts AS purchase_ts
        |FROM (SELECT * FROM events WHERE event_type = 'click') a
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
        |  ON a.user_id = b.user_id
        | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
        |ORDER BY a.user_id, click_id, purchase_id ASC NULLS FIRST""".stripMargin
    )(streamOuterJoin)
  )
}
