package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.scalatest.matchers.should.Matchers

/** The native DSv2 micro-batch source ([[graft.catalog.GraftMicroBatchStream]]):
  * commit-snapshot offsets (no directory listing), admission control,
  * exactly-once restart from checkpoint, metadata-only commits emit
  * nothing.
  */
class StreamSourceSpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.catalog.g", classOf[graft.catalog.GraftCatalog].getName)
    .config("spark.sql.catalog.g.root", Files.createTempDirectory("graft-ss").toString)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def sql(q: String) = spark.sql(q)

  private def setup(repo: String, rows: Seq[(Int, String)]*): String = {
    sql(s"CREATE NAMESPACE g.$repo")
    sql(s"CREATE NAMESPACE g.$repo.main.db")
    sql(s"CREATE TABLE g.$repo.main.db.t (id INT, v STRING)")
    rows.foreach { batch =>
      sql(s"INSERT INTO g.$repo.main.db.t VALUES " +
        batch.map { case (i, s) => s"($i, '$s')" }.mkString(", "))
    }
    s"g.$repo.main.db.t"
  }

  test("graft-changes CDC stream: retractions for MoR + CoW deletes, " +
    "delete+insert for updates, zero rows for compaction; every batch " +
    "nets to changesBetween for the same commit range") {
    sql("CREATE NAMESPACE g.cdc1")
    sql("CREATE NAMESPACE g.cdc1.main.db")
    sql("CREATE TABLE g.cdc1.main.db.t (id INT, v STRING) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    sql("INSERT INTO g.cdc1.main.db.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val root = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.catalog.g.root"), "cdc1")
    val repo = graft.versioned.GraftRepo.open(root)
    val q = spark.readStream.format("graft-changes")
      .option("table", "db.t").load(root.toString)
      .writeStream.format("memory").queryName("graft_cdc")
      .outputMode("append").start()
    try {
      def rows(): Seq[(Int, String, String)] =
        spark.table("graft_cdc").collect()
          .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
      def oracle(fromCommit: String): Seq[(Int, String, String)] =
        graft.versioned.TableOps.changesBetween(spark, repo,
          fromCommit, "main", "db/t").collect()
          .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
      def delta(before: Seq[(Int, String, String)]) = {
        val b = scala.collection.mutable.Buffer(before: _*)
        rows().filterNot(r => { val i = b.indexOf(r); if (i >= 0) b.remove(i); i >= 0 })
      }
      q.processAllAvailable()
      rows().sorted shouldBe Seq((1, "a", "insert"), (2, "b", "insert"),
        (3, "c", "insert"))

      var pre = repo.headCommit("main").id
      var before = rows()
      sql("DELETE FROM g.cdc1.main.db.t WHERE id = 2") // MoR tombstone
      q.processAllAvailable()
      delta(before).sorted shouldBe oracle(pre).sorted
      delta(before).sorted shouldBe Seq((2, "b", "delete"))

      pre = repo.headCommit("main").id
      before = rows()
      sql("UPDATE g.cdc1.main.db.t SET v = 'z' WHERE id = 3")
      q.processAllAvailable()
      delta(before).sorted shouldBe oracle(pre).sorted
      delta(before).sorted shouldBe Seq((3, "c", "delete"), (3, "z", "insert"))

      before = rows()
      sql("CALL g.system.compact('cdc1', 'main', 'db.t')")
      q.processAllAvailable()
      delta(before) shouldBe empty
    } finally q.stop()
  }

  test("graft-changes rate-caps with maxCommitsPerTrigger: bounded " +
    "strides over a commit backlog, exactly once") {
    sql("CREATE NAMESPACE g.cdc3")
    sql("CREATE NAMESPACE g.cdc3.main.db")
    sql("CREATE TABLE g.cdc3.main.db.t (id INT)")
    (0 to 5).foreach(i => sql(s"INSERT INTO g.cdc3.main.db.t VALUES ($i)"))
    val root = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.catalog.g.root"), "cdc3")
    val q = spark.readStream.format("graft-changes")
      .option("table", "db.t").option("maxCommitsPerTrigger", "2")
      .load(root.toString)
      .writeStream.format("memory").queryName("graft_cdc_rate")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      spark.table("graft_cdc_rate").select("id").collect()
        .map(_.getInt(0)).sorted shouldBe (0 to 5).toArray
      q.recentProgress.count(_.numInputRows > 0) should be >= 3
    } finally q.stop()
  }

  test("graft-changes CDC stream resumes from checkpoint exactly once") {
    sql("CREATE NAMESPACE g.cdc2")
    sql("CREATE NAMESPACE g.cdc2.main.db")
    sql("CREATE TABLE g.cdc2.main.db.t (id INT)")
    sql("INSERT INTO g.cdc2.main.db.t VALUES (1), (2), (3)")
    val root = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.catalog.g.root"), "cdc2")
    val ckpt = Files.createTempDirectory("graft-cdc-ckpt").toString
    val out = Files.createTempDirectory("graft-cdc-out").toString
    def run(): Unit = {
      val q = spark.readStream.format("graft-changes")
        .option("table", "db.t").load(root.toString)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    spark.read.parquet(out).count() shouldBe 3
    sql("DELETE FROM g.cdc2.main.db.t WHERE id = 1") // CoW rewrite
    run()
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    got.count(_ == ((1, "insert"))) shouldBe 1
    got.count(_ == ((1, "delete"))) shouldBe 1
    got.size shouldBe 4
  }

  test("streams existing commits, then live appends — via readStream.table") {
    val t = setup("s1", Seq((1, "a"), (2, "b")), Seq((3, "c")))
    val q = spark.readStream.table(t)
      .writeStream.format("memory").queryName("ss_basic")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      spark.table("ss_basic").count() shouldBe 3
      sql(s"INSERT INTO $t VALUES (4, 'd'), (5, 'e')")
      q.processAllAvailable()
      spark.table("ss_basic").select("id").collect().map(_.getInt(0)).sorted shouldBe
        Array(1, 2, 3, 4, 5)
    } finally q.stop()
  }

  test("maxFilesPerTrigger bounds each microbatch (admission control)") {
    val t = setup("s2", Seq((1, "a")), Seq((2, "b")), Seq((3, "c")))
    val q = spark.readStream.option("maxFilesPerTrigger", "1").table(t)
      .writeStream.format("memory").queryName("ss_rate")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      spark.table("ss_rate").count() shouldBe 3
      // three separate single-file commits -> at least 3 non-empty batches
      q.recentProgress.count(_.numInputRows > 0) should be >= 3
      q.recentProgress.filter(_.numInputRows > 0)
        .foreach(_.numInputRows should be <= 1L)
    } finally q.stop()
  }

  test("restart from checkpoint resumes exactly-once (no re-emission)") {
    val t = setup("s3", Seq((1, "a"), (2, "b")))
    val ckpt = Files.createTempDirectory("graft-ss-ckpt").toString
    val out = Files.createTempDirectory("graft-ss-out").toString
    def run(): Unit = {
      val q = spark.readStream.table(t)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    spark.read.parquet(out).count() shouldBe 2
    sql(s"INSERT INTO $t VALUES (3, 'c')")
    // same checkpoint: the restarted query appends ONLY the new commit —
    // total row count proves no re-emission of batches 0..n
    run()
    spark.read.parquet(out).select("id").collect()
      .map(_.getInt(0)).sorted shouldBe Array(1, 2, 3)
  }

  test("startFrom=latest skips history, streams only new commits") {
    val t = setup("s4", Seq((1, "old")), Seq((2, "old")))
    val q = spark.readStream.option("startFrom", "latest").table(t)
      .writeStream.format("memory").queryName("ss_latest")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      spark.table("ss_latest").count() shouldBe 0
      sql(s"INSERT INTO $t VALUES (3, 'new')")
      q.processAllAvailable()
      spark.table("ss_latest").select("v").collect().map(_.getString(0)) shouldBe
        Array("new")
    } finally q.stop()
  }

  test("merge-on-read DELETE (metadata-only commit) emits nothing") {
    val t = setup("s5", Seq((1, "a"), (2, "b")))
    sql(s"ALTER TABLE $t SET TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    val q = spark.readStream.table(t)
      .writeStream.format("memory").queryName("ss_mor")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      spark.table("ss_mor").count() shouldBe 2
      sql(s"DELETE FROM $t WHERE id = 1") // tombstone: no files added
      q.processAllAvailable()
      spark.table("ss_mor").count() shouldBe 2 // nothing re-emitted or retracted
      // the batch read sees the delete
      sql(s"SELECT id FROM $t").collect().map(_.getInt(0)) shouldBe Array(2)
    } finally q.stop()
  }

  test("table as streaming hub: writeStream sink commits feed the native source") {
    import graft.versioned.{GraftRepo, TableOps}
    // producer: a rate-limited file stream of rows lands in the graft
    // table through the exactly-once foreachBatch sink; consumer: the
    // native micro-batch source picks up each commit — the table is the
    // durable, versioned buffer between two streaming jobs
    val t = setup("s7", Seq((1, "seed")))
    val repo = GraftRepo.open(java.nio.file.Paths.get(
      spark.conf.get("spark.sql.catalog.g.root"), "s7"))
    val consumer = spark.readStream.table(t)
      .writeStream.format("memory").queryName("ss_hub")
      .outputMode("append").start()
    val srcDir = Files.createTempDirectory("graft-hub-src")
    import spark.implicits._
    Seq((2, "p1"), (3, "p1")).toDF("id", "v").repartition(1)
      .write.parquet(srcDir.resolve("a").toString)
    val producer = spark.readStream
      .schema("id INT, v STRING").option("maxFilesPerTrigger", "1")
      .parquet(srcDir.toString + "/*")
      .writeStream.foreachBatch(TableOps.streamingAppend(repo, "main", "db/t"))
      .start()
    try {
      producer.processAllAvailable()
      consumer.processAllAvailable()
      spark.table("ss_hub").select("id").collect().map(_.getInt(0)).sorted shouldBe
        Array(1, 2, 3)
      // source metrics expose the backlog (0 once caught up)
      val m = consumer.lastProgress.sources.head.metrics
      m.get("filesBehindHead") shouldBe "0"
    } finally { producer.stop(); consumer.stop() }
  }

  test("streaming a VERSION AS OF reference is rejected") {
    val t = setup("s6", Seq((1, "a")))
    val commitId = sql(s"SELECT commit_id FROM $t.history LIMIT 1")
      .collect().head.getString(0)
    // resolve the table AT a version (branchless, as VERSION AS OF does),
    // then ask its scan to stream — must refuse
    import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, TableCatalog}
    val cat = spark.sessionState.catalogManager.catalog("g")
      .asInstanceOf[TableCatalog]
    val tbl = cat.loadTable(
      Identifier.of(Array("s6", "main", "db"), "t"), commitId)
    val scan = tbl.asInstanceOf[SupportsRead]
      .newScanBuilder(org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
      .build()
    val ex = intercept[UnsupportedOperationException] {
      scan.toMicroBatchStream("/tmp/unused-ckpt")
    }
    ex.getMessage should include("time-travel")
  }
}
