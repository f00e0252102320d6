package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.scalatest.matchers.should.Matchers

/** The `iceberg-changes` streaming source
  * ([[graft.catalog.IcebergChangesMicroBatchStream]]): continuous
  * consumption of an external Iceberg table — here a live sync-mode
  * export dest, the produce→sync→stream loop end to end.
  */
class IcebergStreamSpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.catalog.g", classOf[graft.catalog.GraftCatalog].getName)
    .config("spark.sql.catalog.g.root",
      Files.createTempDirectory("graft-ices").toString)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def sql(q: String) = spark.sql(q)

  test("streams a live sync dest: existing rows, then rows of later " +
    "sync emissions, exactly once; admission control bounds batches") {
    sql("CREATE NAMESPACE g.ics1")
    sql("CREATE NAMESPACE g.ics1.main.db")
    sql("CREATE TABLE g.ics1.main.db.t (id INT, v STRING)")
    sql("INSERT INTO g.ics1.main.db.t VALUES (1, 'a'), (2, 'b')")
    val dest = Files.createTempDirectory("ice-stream")
    sql(s"CALL g.system.iceberg_export('ics1', 'main', 'db.t', '$dest', " +
      "sync => true)")

    val q = spark.readStream.format("iceberg-changes")
      .option("maxFilesPerTrigger", "1")
      .load(dest.toString)
      .writeStream.format("memory").queryName("ice_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      spark.table("ice_stream").count() shouldBe 2
      // a later commit re-emits metadata (new version + hint) with NO
      // further CALL; the stream follows the hint
      sql("INSERT INTO g.ics1.main.db.t VALUES (3, 'c'), (4, 'd')")
      sql("INSERT INTO g.ics1.main.db.t VALUES (5, 'e')")
      q.processAllAvailable()
      spark.table("ice_stream").select("id").collect()
        .map(_.getInt(0)).sorted shouldBe Array(1, 2, 3, 4, 5)
      // exactly once: no row emitted twice across the version hops
      spark.table("ice_stream").count() shouldBe 5
      // maxFilesPerTrigger=1 → every non-empty batch reads one file
      q.recentProgress.filter(_.numInputRows > 0)
        .foreach(_.sources.head.numInputRows should be <= 2L)
    } finally q.stop()
  }

  test("restart from checkpoint resumes exactly once across new " +
    "sync emissions") {
    sql("CREATE NAMESPACE g.ics2")
    sql("CREATE NAMESPACE g.ics2.main.db")
    sql("CREATE TABLE g.ics2.main.db.t (id INT, v STRING)")
    sql("INSERT INTO g.ics2.main.db.t VALUES (1, 'a'), (2, 'b')")
    val dest = Files.createTempDirectory("ice-stream-ck")
    sql(s"CALL g.system.iceberg_export('ics2', 'main', 'db.t', '$dest', " +
      "sync => true)")
    val ckpt = Files.createTempDirectory("ice-stream-ckpt").toString
    val out = Files.createTempDirectory("ice-stream-out").toString
    def run(): Unit = {
      val q = spark.readStream.format("iceberg-changes").load(dest.toString)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    spark.read.parquet(out).count() shouldBe 2
    sql("INSERT INTO g.ics2.main.db.t VALUES (3, 'c')")
    run() // second incarnation picks up only the new emission
    spark.read.parquet(out).select("id").collect()
      .map(_.getInt(0)).sorted shouldBe Array(1, 2, 3)
  }

  test("restart replay is bounded by the order log: only versions past " +
    "the checkpoint re-plan metadata, not all retained versions") {
    sql("CREATE NAMESPACE g.ics6")
    sql("CREATE NAMESPACE g.ics6.main.db")
    sql("CREATE TABLE g.ics6.main.db.t (id INT)")
    sql("INSERT INTO g.ics6.main.db.t VALUES (0)")
    val dest = Files.createTempDirectory("ice-stream-log")
    sql(s"CALL g.system.iceberg_export('ics6', 'main', 'db.t', '$dest', " +
      "sync => true)")
    // 20 more sync emissions → 21 retained metadata versions
    (1 to 20).foreach(i => sql(s"INSERT INTO g.ics6.main.db.t VALUES ($i)"))
    val ckpt = Files.createTempDirectory("ice-stream-log-ckpt").toString
    val out = Files.createTempDirectory("ice-stream-log-out").toString
    def run(): Unit = {
      val q = spark.readStream.format("iceberg-changes").load(dest.toString)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    spark.read.parquet(out).count() shouldBe 21
    // two more emissions while the stream is down
    sql("INSERT INTO g.ics6.main.db.t VALUES (21)")
    sql("INSERT INTO g.ics6.main.db.t VALUES (22)")
    val counter = graft.catalog.IcebergChangesMicroBatchStream.replayedVersions
    counter.set(0)
    run()
    spark.read.parquet(out).select("id").collect()
      .map(_.getInt(0)).sorted shouldBe (0 to 22).toArray
    // the 21 pre-checkpoint versions restored from the order log; only
    // the versions past the checkpoint re-planned their metadata
    counter.get() should be <= 4
  }

  test("a compaction past the stream's resume point refuses loudly " +
    "(path-tracked consumption would re-emit rewritten rows)") {
    sql("CREATE NAMESPACE g.ics4")
    sql("CREATE NAMESPACE g.ics4.main.db")
    sql("CREATE TABLE g.ics4.main.db.t (id INT, v STRING)")
    sql("INSERT INTO g.ics4.main.db.t VALUES (1, 'a')")
    sql("INSERT INTO g.ics4.main.db.t VALUES (2, 'b')")
    val dest = Files.createTempDirectory("ice-stream-compact")
    sql(s"CALL g.system.iceberg_export('ics4', 'main', 'db.t', '$dest', " +
      "sync => true)")
    val q = spark.readStream.format("iceberg-changes").load(dest.toString)
      .writeStream.format("memory").queryName("ice_stream_compact")
      .outputMode("append").start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try {
        q.processAllAvailable()
        spark.table("ice_stream_compact").count() shouldBe 2
        // a compaction rewrites both consumed files to one new path; the
        // sync re-emission carries it as a 'replace' snapshot
        sql("CALL g.system.compact('ics4', 'main', 'db.t')")
        q.processAllAvailable()
      } finally q.stop()
    }
    e.getMessage should (include("removed") and include("rewritten"))
    // no silent re-emission happened before the refusal
    spark.table("ice_stream_compact").count() shouldBe 2
  }

  test("a copy-on-write rewrite past the resume point refuses even " +
    "under skipDeletes; one BEFORE stream start streams fine") {
    sql("CREATE NAMESPACE g.ics5")
    sql("CREATE NAMESPACE g.ics5.main.db")
    sql("CREATE TABLE g.ics5.main.db.t (id INT, v STRING)")
    sql("INSERT INTO g.ics5.main.db.t VALUES (1, 'a'), (2, 'b')")
    // CoW delete BEFORE export/stream start: safe — the initial batch is
    // the current live set
    sql("DELETE FROM g.ics5.main.db.t WHERE id = 2")
    val dest = Files.createTempDirectory("ice-stream-cow")
    sql(s"CALL g.system.iceberg_export('ics5', 'main', 'db.t', '$dest', " +
      "sync => true)")
    val q = spark.readStream.format("iceberg-changes")
      .option("skipDeletes", "true").load(dest.toString)
      .writeStream.format("memory").queryName("ice_stream_cow")
      .outputMode("append").start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try {
        q.processAllAvailable()
        spark.table("ice_stream_cow").select("id").collect()
          .map(_.getInt(0)) shouldBe Array(1)
        sql("INSERT INTO g.ics5.main.db.t VALUES (3, 'c')")
        q.processAllAvailable()
        spark.table("ice_stream_cow").count() shouldBe 2
        // CoW update rewrites the file holding id=1 — an overwrite
        // snapshot that removed live data files
        sql("UPDATE g.ics5.main.db.t SET v = 'z' WHERE id = 1")
        q.processAllAvailable()
      } finally q.stop()
    }
    e.getMessage should (include("removed") and
      include("live data file"))
    spark.table("ice_stream_cow").count() shouldBe 2
  }

  test("cdc=true streams retractions from a MoR-writing dest; every " +
    "batch nets to graft's own changesBetween for the same commit " +
    "range, and a compaction nets to zero rows") {
    sql("CREATE NAMESPACE g.ics7")
    sql("CREATE NAMESPACE g.ics7.main.db")
    sql("CREATE TABLE g.ics7.main.db.t (id INT, v STRING) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    sql("INSERT INTO g.ics7.main.db.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val dest = Files.createTempDirectory("ice-stream-cdc")
    sql(s"CALL g.system.iceberg_export('ics7', 'main', 'db.t', '$dest', " +
      "sync => true)")
    val repo = graft.versioned.GraftRepo.open(java.nio.file.Paths.get(
      spark.conf.get("spark.sql.catalog.g.root"), "ics7"))

    val q = spark.readStream.format("iceberg-changes")
      .option("cdc", "true").load(dest.toString)
      .writeStream.format("memory").queryName("ice_cdc")
      .outputMode("append").start()
    try {
      def rows(): Seq[(Int, String, String)] =
        spark.table("ice_cdc").collect()
          .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
      def oracle(fromCommit: String): Seq[(Int, String, String)] =
        graft.versioned.TableOps.changesBetween(spark, repo,
          fromCommit, "main", "db/t").collect()
          .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
      // multiset delta of the accumulating memory sink
      def delta(before: Seq[(Int, String, String)]) = {
        val b = scala.collection.mutable.Buffer(before: _*)
        rows().filterNot(r => { val i = b.indexOf(r); if (i >= 0) b.remove(i); i >= 0 })
      }
      q.processAllAvailable()
      rows().sorted shouldBe Seq((1, "a", "insert"), (2, "b", "insert"),
        (3, "c", "insert"))

      // MoR delete streams as a retraction
      var pre = repo.headCommit("main").id
      var before = rows()
      sql("DELETE FROM g.ics7.main.db.t WHERE id = 2")
      q.processAllAvailable()
      delta(before).sorted shouldBe oracle(pre).sorted
      delta(before).sorted shouldBe Seq((2, "b", "delete"))

      // MoR update streams as delete + insert of the modified row only
      pre = repo.headCommit("main").id
      before = rows()
      sql("UPDATE g.ics7.main.db.t SET v = 'z' WHERE id = 3")
      q.processAllAvailable()
      delta(before).sorted shouldBe oracle(pre).sorted
      delta(before).sorted shouldBe Seq((3, "c", "delete"), (3, "z", "insert"))

      // append streams as inserts
      pre = repo.headCommit("main").id
      before = rows()
      sql("INSERT INTO g.ics7.main.db.t VALUES (4, 'd')")
      q.processAllAvailable()
      delta(before).sorted shouldBe oracle(pre).sorted
      delta(before).sorted shouldBe Seq((4, "d", "insert"))

      // a compaction rewrites files but preserves logical rows — the
      // CDC diff nets to ZERO (where the append-only mode refuses)
      before = rows()
      sql("CALL g.system.compact('ics7', 'main', 'db.t')")
      q.processAllAvailable()
      delta(before) shouldBe empty
    } finally q.stop()
  }

  test("cdc=true resumes from the checkpoint exactly once") {
    sql("CREATE NAMESPACE g.ics8")
    sql("CREATE NAMESPACE g.ics8.main.db")
    sql("CREATE TABLE g.ics8.main.db.t (id INT) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    sql("INSERT INTO g.ics8.main.db.t VALUES (1), (2), (3)")
    val dest = Files.createTempDirectory("ice-stream-cdc-ck")
    sql(s"CALL g.system.iceberg_export('ics8', 'main', 'db.t', '$dest', " +
      "sync => true)")
    val ckpt = Files.createTempDirectory("ice-cdc-ckpt").toString
    val out = Files.createTempDirectory("ice-cdc-out").toString
    def run(): Unit = {
      val q = spark.readStream.format("iceberg-changes")
        .option("cdc", "true").load(dest.toString)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    spark.read.parquet(out).count() shouldBe 3
    sql("DELETE FROM g.ics8.main.db.t WHERE id = 1")
    run()
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    got.count(_ == ((1, "insert"))) shouldBe 1
    got.count(_ == ((1, "delete"))) shouldBe 1
    got.size shouldBe 4
  }

  test("cdc=true rate-caps with maxVersionsPerTrigger: a backlogged " +
    "consumer walks the backlog in bounded strides, exactly once") {
    sql("CREATE NAMESPACE g.ics10")
    sql("CREATE NAMESPACE g.ics10.main.db")
    sql("CREATE TABLE g.ics10.main.db.t (id INT)")
    sql("INSERT INTO g.ics10.main.db.t VALUES (0)")
    val dest = Files.createTempDirectory("ice-cdc-rate")
    sql(s"CALL g.system.iceberg_export('ics10', 'main', 'db.t', '$dest', " +
      "sync => true)")
    (1 to 5).foreach(i => sql(s"INSERT INTO g.ics10.main.db.t VALUES ($i)"))
    // 6 retained versions; stride 2 → the backlog needs >= 3 batches
    val q = spark.readStream.format("iceberg-changes")
      .option("cdc", "true").option("maxVersionsPerTrigger", "2")
      .load(dest.toString)
      .writeStream.format("memory").queryName("ice_cdc_rate")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      spark.table("ice_cdc_rate").select("id").collect()
        .map(_.getInt(0)).sorted shouldBe (0 to 5).toArray
      q.recentProgress.count(_.numInputRows > 0) should be >= 3
    } finally q.stop()
  }

  test("cdc=true refuses an append-mode checkpoint (a partially " +
    "consumed file offset would silently drop rows) and rejects " +
    "append-only options") {
    sql("CREATE NAMESPACE g.ics9")
    sql("CREATE NAMESPACE g.ics9.main.db")
    sql("CREATE TABLE g.ics9.main.db.t (id INT)")
    sql("INSERT INTO g.ics9.main.db.t VALUES (1), (2)")
    val dest = Files.createTempDirectory("ice-stream-mix")
    sql(s"CALL g.system.iceberg_export('ics9', 'main', 'db.t', '$dest', " +
      "sync => true)")
    val ckpt = Files.createTempDirectory("ice-mix-ckpt").toString
    val out = Files.createTempDirectory("ice-mix-out").toString
    val q = spark.readStream.format("iceberg-changes").load(dest.toString)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    sql("INSERT INTO g.ics9.main.db.t VALUES (3)")
    val q2 = spark.readStream.format("iceberg-changes")
      .option("cdc", "true").load(dest.toString)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q2.processAllAvailable() finally q2.stop()
    }
    e.getMessage should include("append-mode")

    val e2 = intercept[Exception] {
      val q3 = spark.readStream.format("iceberg-changes")
        .option("cdc", "true").option("maxFilesPerTrigger", "1")
        .load(dest.toString)
        .writeStream.format("memory").queryName("ice_mix_bad")
        .outputMode("append").start()
      try q3.processAllAvailable() finally q3.stop()
    }
    e2.getMessage should include("not supported with cdc=true")
  }

  test("a dest with delete files refuses by default; skipDeletes=true " +
    "opts into raw-append semantics") {
    sql("CREATE NAMESPACE g.ics3")
    sql("CREATE NAMESPACE g.ics3.main.db")
    sql("CREATE TABLE g.ics3.main.db.t (id INT, v STRING) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    sql("INSERT INTO g.ics3.main.db.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    sql("DELETE FROM g.ics3.main.db.t WHERE id >= 3") // positional MoR
    val dest = Files.createTempDirectory("ice-stream-del")
    sql(s"CALL g.system.iceberg_export('ics3', 'main', 'db.t', '$dest')")

    val q = spark.readStream.format("iceberg-changes").load(dest.toString)
      .writeStream.format("memory").queryName("ice_stream_del")
      .outputMode("append").start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q.processAllAvailable() finally q.stop()
    }
    e.getMessage should include("delete file")

    val q2 = spark.readStream.format("iceberg-changes")
      .option("skipDeletes", "true").load(dest.toString)
      .writeStream.format("memory").queryName("ice_stream_raw")
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      // raw-append: deletes ignored, all committed rows emitted
      spark.table("ice_stream_raw").count() shouldBe 3
    } finally q2.stop()
  }
}
