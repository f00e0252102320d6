package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.scalatest.matchers.should.Matchers

import graft.operators.Dedup
import graft.versioned.GraftRepo

/** The PERSISTED incremental-dedup index (Dedup.indexInit / indexScreen
  * / indexAdmit): corpus postings live in graft tables, built once;
  * each batch screens against the stored index and its admissions are
  * appended — docs + postings — in ONE atomic commit.
  *
  * The corpus text exists ONLY as a local Seq in this spec and is
  * never written anywhere as text: after init, screening CANNOT
  * re-tokenize the corpus even in principle — everything it knows
  * comes from the stored tables. That makes the batch-2 rejections
  * (one against an ORIGINAL corpus doc, one against a BATCH-1
  * admission) positive proof of index reuse, not just absence of
  * rebuild work.
  */
class DedupIncrementalSpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {

  private val catRoot = Files.createTempDirectory("graft-ddincr")

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.catalog.gd", classOf[graft.catalog.GraftCatalog].getName)
    .config("spark.sql.catalog.gd.root", catRoot.toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val t = 0.9

  // disjoint 40-token docs: doc i's tokens are tok_i_0 .. tok_i_39, so
  // the only near-dups are the ones this spec constructs deliberately
  private def docText(i: Long): String =
    (0 until 40).map(j => s"tok_${i}_$j").mkString(" ")
  /** One token replaced → |a∩b|=39, |a∪b|=41, J≈0.951 ≥ 0.9. */
  private def nearDupOf(i: Long): String =
    ((0 until 39).map(j => s"tok_${i}_$j") :+ "mutant").mkString(" ")

  private def df(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def screen(batch: Seq[(Long, String)]) =
    Dedup.indexScreen(spark, "gd", "r", "main", df(batch), t)
      .collect().map(_.getLong(0)).toSet

  private def historyLen(table: String): Long =
    spark.sql(s"SELECT count(*) FROM gd.r.main.dd.$table.history")
      .head().getLong(0)

  test("init → screen → atomic admit → batch 2 sees batch 1's admissions") {
    spark.sql("CREATE NAMESPACE gd.r")
    spark.sql("CREATE NAMESPACE gd.r.main.dd")
    val repo = GraftRepo.open(catRoot.resolve("r"))
    val corpus = (0L until 300L).map(i => (i, docText(i)))
    Dedup.indexInit(spark, "gd", repo, "main", df(corpus), t)

    // (each CREATE TABLE commits once; init's seed append is ONE more
    // commit shared by all three tables)
    val (hDocs, hPost, hFreq) =
      (historyLen("docs"), historyLen("postings"), historyLen("dfreq"))
    spark.sql("SELECT count(*) FROM gd.r.main.dd.docs")
      .head().getLong(0) shouldBe 300L

    // batch 1: one near-dup of corpus doc 5 (rejected), two fresh docs
    val batch1 = Seq((10001L, nearDupOf(5)),
      (10002L, docText(90001L)), (10003L, docText(90002L)))
    screen(batch1) shouldBe Set(10002L, 10003L)

    val postingsBefore =
      spark.sql("SELECT count(*) FROM gd.r.main.dd.postings").head().getLong(0)
    val admitted = Dedup.indexAdmit(spark, "gd", repo, "main", df(batch1), t)
      .collect().map(_.getLong(0)).toSet
    admitted shouldBe Set(10002L, 10003L)

    // exactly ONE commit landed on BOTH tables; dfreq stays frozen
    historyLen("docs") shouldBe hDocs + 1L
    historyLen("postings") shouldBe hPost + 1L
    historyLen("dfreq") shouldBe hFreq
    spark.sql("SELECT count(*) FROM gd.r.main.dd.docs")
      .head().getLong(0) shouldBe 302L
    // a 40-token doc at t=0.9 carries 40 - ceil(36) + 1 = 5 prefix toks
    spark.sql("SELECT count(*) FROM gd.r.main.dd.postings")
      .head().getLong(0) shouldBe postingsBefore + 10L

    // batch 2: near-dup of a BATCH-1 ADMISSION (the amortization
    // proof: caught only if admitted postings joined the index), a
    // near-dup of an ORIGINAL corpus doc, and a fresh doc
    val batch2 = Seq((20001L, nearDupOf(90001L)), // ≈ doc 10002
      (20002L, nearDupOf(7)), (20003L, docText(90003L)))
    screen(batch2) shouldBe Set(20003L)

    // screening does NOT rebuild: the only Window (the delta's prefix
    // ranking) runs inside the pre-materialized candidate stage, so
    // the final plan carries NONE — a rebuild would window
    // corpus+delta postings together and surface here. (The stronger
    // no-rebuild proof is the shuffle-volume test below: screen bytes
    // don't grow with corpus size.)
    val plan = Dedup.indexScreen(spark, "gd", "r", "main", df(batch2), t)
      .queryExecution.executedPlan.toString
    plan.split("Window", -1).length - 1 shouldBe 0

    // id reuse refuses loudly: a delta doc_id already admitted would
    // self-match at J=1.0 in the verify dict and be silently rejected
    val e = intercept[IllegalArgumentException](
      screen(Seq((10002L, docText(99999L)))))
    e.getMessage should include("10002")
  }

  test("indexCompact bin-packs the accreted admission files; a " +
    "post-compaction screen is bit-identical") {
    spark.sql("CREATE NAMESPACE gd.r3")
    spark.sql("CREATE NAMESPACE gd.r3.main.dd")
    val repo = GraftRepo.open(catRoot.resolve("r3"))
    val corpus = (0L until 100L).map(i => (i, docText(i)))
    Dedup.indexInit(spark, "gd", repo, "main", df(corpus), t)

    // four daily admissions: each atomic append accretes a small file
    // set per table
    (0 until 4).foreach { b =>
      val batch = (0 until 3).map(j =>
        (30000L + b * 10 + j, docText(80000L + b * 10 + j)))
      Dedup.indexAdmit(spark, "gd", repo, "main", df(batch), t)
    }
    def files(key: String): Int =
      repo.snapshot(repo.headCommit("main").tables(key)).files.size
    val (docsBefore, postBefore) = (files("dd/docs"), files("dd/postings"))

    // a screen with a near-dup of an ADMITTED doc and a fresh doc
    val probe = Seq((40001L, nearDupOf(80000L)), (40002L, docText(70001L)))
    val preScreen = Dedup.indexScreen(spark, "gd", "r3", "main", df(probe), t)
      .collect().map(_.getLong(0)).toSet
    preScreen shouldBe Set(40002L)

    val (before, after) = Dedup.indexCompact(spark, repo, "main")
    before shouldBe (docsBefore + postBefore)
    after should be < before
    files("dd/docs") should be < docsBefore
    files("dd/postings") should be < postBefore

    // bit-identical screen over the compacted layout
    Dedup.indexScreen(spark, "gd", "r3", "main", df(probe), t)
      .collect().map(_.getLong(0)).toSet shouldBe preScreen

    // the compaction commits carry the structural marker (incremental
    // consumers of a synced index skip them as 'replace')
    repo.headCommit("main").markerOpt shouldBe
      Some(graft.versioned.Commit.CompactMarker)
  }

  test("indexScreen SHUFFLE volume tracks the DELTA, not the corpus: " +
    "an 8x corpus screens the same fixed batch with near-identical " +
    "shuffle-read bytes — the stored index is pruned to the delta's " +
    "vocabulary before any shuffle, so the daily op stays O(delta · " +
    "matched postings) by construction") {
    def build(ns: String, n: Long): Unit = {
      spark.sql(s"CREATE NAMESPACE gd.$ns")
      spark.sql(s"CREATE NAMESPACE gd.$ns.main.dd")
      val repo = GraftRepo.open(catRoot.resolve(ns))
      Dedup.indexInit(spark, "gd", repo, "main",
        df((0L until n).map(i => (i, docText(i)))), t)
    }
    build("rs", 400L)
    build("rl", 3200L)
    // the SAME delta against both: ten fresh docs + one near-dup of
    // corpus doc 3 (present in both corpora, so one real candidate
    // pair and one verify-partner read exist each time)
    val delta = (50000L until 50010L).map(i => (i, docText(i))) :+
      ((60000L, nearDupOf(3)))
    def shuffleBytes[A](f: => A): (A, Long) = {
      val total = new java.util.concurrent.atomic.AtomicLong()
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) total.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
      }
      spark.sparkContext.addSparkListener(l)
      try {
        val got = f
        org.apache.spark.graftbridge.TestListenerBridge
          .drain(spark.sparkContext)
        (got, total.get())
      } finally spark.sparkContext.removeSparkListener(l)
    }
    def screenBytes(ns: String): (Set[Long], Long) = shuffleBytes {
      Dedup.indexScreen(spark, "gd", ns, "main", df(delta), t)
        .collect().map(_.getLong(0)).toSet
    }
    val (gotS, bytesS) = screenBytes("rs")
    val (gotL, bytesL) = screenBytes("rl")
    val fresh = (50000L until 50010L).toSet
    gotS shouldBe fresh // the near-dup is rejected, fresh docs admitted
    gotL shouldBe fresh
    // the 8x corpus must NOT show up in the screen's shuffle: before
    // the r14 prune, the token-count aggregate shuffled EVERY stored
    // posting (~8x bytes here); pruned, both screens shuffle the same
    // delta-sized data (generous 3x slack + 64 KiB absolute floor for
    // framework jitter)
    withClue(s"small=$bytesS large=$bytesL: ") {
      bytesL should be <= math.max(3L * bytesS, bytesS + (64L << 10))
    }
    // the ADMIT half of the daily cycle (screen + atomic postings
    // append) tracks the delta too: the admitted docs' postings rank
    // against dfreq pruned via a broadcast semi — the stored table is
    // scanned column-pruned, never shuffled — so the same fixed batch
    // admits into the 8x corpus at ~1x shuffle bytes (r15)
    val admitDelta = (70000L until 70010L).map(i => (i, docText(i)))
    def admitBytes(ns: String): (Long, Long) = shuffleBytes {
      Dedup.indexAdmit(spark, "gd", GraftRepo.open(catRoot.resolve(ns)),
        "main", df(admitDelta), t).count()
    }
    val (admS, aBytesS) = admitBytes("rs")
    val (admL, aBytesL) = admitBytes("rl")
    admS shouldBe 10L
    admL shouldBe 10L
    withClue(s"admit small=$aBytesS large=$aBytesL: ") {
      aBytesL should be <= math.max(3L * aBytesS, aBytesS + (64L << 10))
    }
  }

  test("clash guard dispatches on the delta's DOC COUNT, not its " +
    "vocabulary: a many-docs/few-tokens delta (doc count above the " +
    "broadcast cap, vocab below it) still screens and still detects " +
    "id clashes on the keyed path") {
    spark.sql("CREATE NAMESPACE gd.cg")
    spark.sql("CREATE NAMESPACE gd.cg.main.dd")
    val repo = GraftRepo.open(catRoot.resolve("cg"))
    Dedup.indexInit(spark, "gd", repo, "main",
      df((0L until 20L).map(i => (i, docText(i)))), t)
    spark.conf.set("spark.graft.dedup.broadcastKeysMax", "8")
    try {
      // 12 docs over a 7-token vocabulary: the vocab dispatch says
      // broadcast (7 <= 8) but the doc-id set must NOT ride it (12 > 8)
      val delta = (100L until 112L).map(i =>
        (i, s"alpha beta gamma delta epsilon zeta tok${i % 2}"))
      Dedup.indexScreen(spark, "gd", "cg", "main", df(delta), t)
        .collect().map(_.getLong(0)).toSet shouldBe
        (100L until 112L).toSet
      // a corpus id smuggled into the same shape still refuses loudly
      val ex = intercept[IllegalArgumentException] {
        Dedup.indexScreen(spark, "gd", "cg", "main",
          df(delta :+ ((3L, "alpha beta gamma"))), t).collect()
      }
      ex.getMessage should include ("already present")
    } finally spark.conf.unset("spark.graft.dedup.broadcastKeysMax")
  }

  test("frozen order keeps exact recall across batches: screen results " +
    "equal a from-scratch exact Jaccard recompute") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE gd.r2")
    spark.sql("CREATE NAMESPACE gd.r2.main.dd")
    val repo = GraftRepo.open(catRoot.resolve("r2"))
    // overlapping vocabulary this time: docs share a 120-token pool, so
    // dfreq is non-trivial and batch tokens mix seen/unseen
    def text(seed: Long): String =
      (0 until 40).map(j => s"w${(seed * 7 + j * 13) % 120}").distinct
        .mkString(" ")
    val corpus = (0L until 200L).map(i => (i, text(i)))
    Dedup.indexInit(spark, "gd", repo, "main", df(corpus), t)

    val batch = (500L until 540L).map(i =>
      if (i % 5 == 0) (i, corpus((i % 200L).toInt)._2) // exact copies → dups
      else (i, text(i * 31 + 3)))
    val got = Dedup.indexScreen(spark, "gd", "r2", "main", df(batch), t)
      .collect().map(_.getLong(0)).toSet

    // oracle: exact Jaccard of every (batch, corpus) pair
    val want = batch.filter { case (id, tx) =>
      val ws = tx.split(" ").toSet
      !corpus.exists { case (_, ctx) =>
        val cs = ctx.split(" ").toSet
        ws.intersect(cs).size.toDouble / ws.union(cs).size >= t
      }
    }.map(_._1).toSet
    got shouldBe want
  }

  test("indexRetire: ONE atomic tombstone commit removes a doc from docs " +
    "AND postings — a retired near-duplicate stops blocking admission, " +
    "its id becomes appendable again, and compaction materializes the " +
    "removal physically with screens unchanged") {
    import org.apache.spark.sql.functions._
    spark.sql("CREATE NAMESPACE gd.rret")
    spark.sql("CREATE NAMESPACE gd.rret.main.dd")
    val repo = GraftRepo.open(catRoot.resolve("rret"))
    val corpus = (0L until 50L).map(i => (i, docText(i)))
    Dedup.indexInit(spark, "gd", repo, "main", df(corpus), t)

    // doc 100 is a near-dup of CORPUS doc 7 → blocked
    val probe = Seq((100L, nearDupOf(7L)))
    Dedup.indexScreen(spark, "gd", "rret", "main", df(probe), t)
      .collect() shouldBe empty

    val commitsBefore =
      spark.sql("SELECT count(*) FROM gd.rret.main.dd.docs.history")
        .head().getLong(0)
    Dedup.indexRetire(spark, repo, "main", Seq(7L))
    // one commit covers BOTH tables (atomic multi-table tombstone)
    spark.sql("SELECT count(*) FROM gd.rret.main.dd.docs.history")
      .head().getLong(0) shouldBe commitsBefore + 1
    spark.table("gd.rret.main.dd.docs")
      .filter(col("doc_id") === 7L).count() shouldBe 0L
    spark.table("gd.rret.main.dd.postings")
      .filter(col("doc_id") === 7L).count() shouldBe 0L

    // the retired doc no longer blocks admission — and the freed id is
    // re-admittable (the clash guard reads the tombstone-aware scan)
    Dedup.indexScreen(spark, "gd", "rret", "main", df(probe), t)
      .collect().map(_.getLong(0)).toSet shouldBe Set(100L)
    Dedup.indexAdmit(spark, "gd", repo, "main",
      df(Seq((7L, docText(90007L)))), t)
      .collect().map(_.getLong(0)).toSet shouldBe Set(7L)

    // compaction materializes the tombstone: rewritten files hold no
    // trace of the ORIGINAL doc 7 (the re-admitted 90007-text one
    // stays), and a post-compaction screen is bit-identical
    Dedup.indexCompact(spark, repo, "main")
    graft.versioned.Tombstones.of(repo.snapshot(
      repo.headCommit("main").tables("dd/docs"))) shouldBe empty
    spark.table("gd.rret.main.dd.docs")
      .filter(col("doc_id") === 7L).count() shouldBe 1L
    Dedup.indexScreen(spark, "gd", "rret", "main",
      df(Seq((101L, nearDupOf(8L)), (102L, docText(70102L)))), t)
      .collect().map(_.getLong(0)).toSet shouldBe Set(102L)
  }

  test("MINHASH mode: init → screen → atomic admit → batch 2 sees " +
    "batch 1's admissions; retire unblocks and frees the id; compact " +
    "materializes the tombstone with screens unchanged") {
    import org.apache.spark.sql.functions._
    spark.sql("CREATE NAMESPACE gd.mh")
    spark.sql("CREATE NAMESPACE gd.mh.main.dd")
    val repo = GraftRepo.open(catRoot.resolve("mh"))
    val corpus = (0L until 300L).map(i => (i, docText(i)))
    Dedup.indexInit(spark, "gd", repo, "main", df(corpus), t, "minhash")
    // self-describing sketch tables: 8 band rows per doc, meta stored
    spark.table("gd.mh.main.dd.meta").head().getString(0) shouldBe "minhash"
    spark.sql("SELECT count(*) FROM gd.mh.main.dd.bands")
      .head().getLong(0) shouldBe 2400L

    def mhScreen(batch: Seq[(Long, String)]) =
      Dedup.indexScreen(spark, "gd", "mh", "main", df(batch), t)
        .collect().map(_.getLong(0)).toSet

    // batch 1: one near-dup of corpus doc 5 (rejected), two fresh docs
    val batch1 = Seq((10001L, nearDupOf(5)),
      (10002L, docText(90001L)), (10003L, docText(90002L)))
    mhScreen(batch1) shouldBe Set(10002L, 10003L)
    val bandsBefore =
      spark.sql("SELECT count(*) FROM gd.mh.main.dd.bands").head().getLong(0)
    Dedup.indexAdmit(spark, "gd", repo, "main", df(batch1), t)
      .collect().map(_.getLong(0)).toSet shouldBe Set(10002L, 10003L)
    // admitted docs' band rows joined the index atomically: 8 per doc
    spark.sql("SELECT count(*) FROM gd.mh.main.dd.bands")
      .head().getLong(0) shouldBe bandsBefore + 16L
    // batch 2: a near-dup of a BATCH-1 ADMISSION (index-reuse proof),
    // a near-dup of an ORIGINAL corpus doc, and a fresh doc
    mhScreen(Seq((20001L, nearDupOf(90001L)), (20002L, nearDupOf(7)),
      (20003L, docText(90003L)))) shouldBe Set(20003L)
    // id reuse refuses loudly (same clash guard as PPJoin mode)
    val e = intercept[IllegalArgumentException](
      mhScreen(Seq((10002L, docText(99999L)))))
    e.getMessage should include("10002")

    // retire: one atomic tombstone over docs AND bands; the near-dup
    // stops blocking, the id frees up, compaction materializes it
    mhScreen(Seq((30001L, nearDupOf(9L)))) shouldBe empty
    Dedup.indexRetire(spark, repo, "main", Seq(9L))
    spark.table("gd.mh.main.dd.bands")
      .filter(col("doc_id") === 9L).count() shouldBe 0L
    mhScreen(Seq((30001L, nearDupOf(9L)))) shouldBe Set(30001L)
    Dedup.indexCompact(spark, repo, "main")
    graft.versioned.Tombstones.of(repo.snapshot(
      repo.headCommit("main").tables("dd/bands"))) shouldBe empty
    mhScreen(Seq((30002L, nearDupOf(9L)), (30003L, docText(70303L)))) shouldBe
      Set(30002L, 30003L)
  }

  test("MINHASH-mode indexScreen SHUFFLE volume tracks the DELTA, not " +
    "the corpus: an 8x corpus screens the same fixed batch at ~1x " +
    "shuffle-read bytes — the stored bands table is pruned to the " +
    "delta's (band, bh) keys before any shuffle") {
    def build(ns: String, n: Long): Unit = {
      spark.sql(s"CREATE NAMESPACE gd.$ns")
      spark.sql(s"CREATE NAMESPACE gd.$ns.main.dd")
      val repo = GraftRepo.open(catRoot.resolve(ns))
      Dedup.indexInit(spark, "gd", repo, "main",
        df((0L until n).map(i => (i, docText(i)))), t, "minhash")
    }
    build("mhs", 400L)
    build("mhl", 3200L)
    val delta = (50000L until 50010L).map(i => (i, docText(i))) :+
      ((60000L, nearDupOf(3)))
    def shuffleBytes[A](f: => A): (A, Long) = {
      val total = new java.util.concurrent.atomic.AtomicLong()
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) total.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
      }
      spark.sparkContext.addSparkListener(l)
      try {
        val got = f
        org.apache.spark.graftbridge.TestListenerBridge
          .drain(spark.sparkContext)
        (got, total.get())
      } finally spark.sparkContext.removeSparkListener(l)
    }
    def screenBytes(ns: String): (Set[Long], Long) = shuffleBytes {
      Dedup.indexScreen(spark, "gd", ns, "main", df(delta), t)
        .collect().map(_.getLong(0)).toSet
    }
    val (gotS, bytesS) = screenBytes("mhs")
    val (gotL, bytesL) = screenBytes("mhl")
    val fresh = (50000L until 50010L).toSet
    gotS shouldBe fresh
    gotL shouldBe fresh
    withClue(s"small=$bytesS large=$bytesL: ") {
      bytesL should be <= math.max(3L * bytesS, bytesS + (64L << 10))
    }
  }

  test("STREAMING admission composes with the MINHASH sketch mode: " +
    "foreachBatch(indexAdmit) against a minhash-mode index screens " +
    "each micro-batch against corpus + earlier batches' admissions " +
    "(the st_dedup_persist shape is mode-agnostic)") {
    import org.apache.spark.sql.functions._
    spark.sql("CREATE NAMESPACE gd.mhst")
    spark.sql("CREATE NAMESPACE gd.mhst.main.dd")
    val repo = GraftRepo.open(catRoot.resolve("mhst"))
    Dedup.indexInit(spark, "gd", repo, "main",
      df((0L until 200L).map(i => (i, docText(i)))), t, "minhash")

    // batch 1: a near-dup of corpus doc 3 (rejected) + two fresh docs;
    // batch 2: a near-dup of a BATCH-1 ADMISSION (the cross-batch
    // index-reuse proof — only the stored sketch can reject it) + fresh
    val b1 = df(Seq((10001L, nearDupOf(3)),
      (10002L, docText(90001L)), (10003L, docText(90002L))))
    val b2 = df(Seq((20001L, nearDupOf(90001L)), (20002L, docText(90003L))))
    val dir = graft.operators.GateScratch.register(
      Files.createTempDirectory("graft-mhst-docs"))
    graft.operators.GateScratch.stageParquetBatch(dir, "b1", b1, 0L)
    graft.operators.GateScratch.stageParquetBatch(dir, "b2", b2, 2000L)
    val q = spark.readStream
      .schema(b1.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Dedup.indexAdmit(spark, "gd", repo, "main", batch, t)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    // only the fresh docs were admitted, in stream order
    spark.table("gd.mhst.main.dd.docs")
      .filter(col("doc_id") >= 10000L).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet shouldBe
      Set(10002L, 10003L, 20002L)
    // each admission carried its 8 band rows in the same atomic commit
    spark.table("gd.mhst.main.dd.bands")
      .filter(col("doc_id") >= 10000L).count() shouldBe 24L
  }
}
