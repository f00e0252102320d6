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
