package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.scalatest.matchers.should.Matchers

/** Full engine lifecycle — create/insert/branch/merge/row-level
  * ops/compact/vacuum/streaming-read — parameterized over the metadata
  * IO backend via the catalog's `io` option. The object-store backend
  * routes EVERY metadata operation (exclusive ref commits, snapshot
  * reads, walks, vacuum deletes) through ObjectStoreGraftIO over the
  * Hadoop FileSystem API — the production topology for s3a://-rooted
  * repos, here on the raw local FS so Spark's parquet writers and the
  * metadata plane share one store. Until this spec, the object-store
  * backend was proven at the GraftIO contract level only; this runs
  * the whole TableOps surface against it.
  *
  * The third parameterization ("uri") creates repos whose DATA plane
  * lives at a scheme'd Hadoop-FS URI (`file:/…`, the zero-egress stand-
  * in for `s3a://bucket/…`), DISJOINT from the metadata root: every
  * data byte — Spark parquet reads/writes, CoW staging, compaction,
  * vacuum walk/delete, bloom sidecars — must route through the
  * HadoopDestIO data seam, and the spec asserts the split (parquet
  * under the URI root, none under the metadata root).
  */
class EngineLifecycleSpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {

  private val uriDataBase = Files.createTempDirectory("graft-lc-uridata")

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.catalog.lcl", classOf[graft.catalog.GraftCatalog].getName)
    .config("spark.sql.catalog.lcl.root",
      Files.createTempDirectory("graft-lc-local").toString)
    .config("spark.sql.catalog.los", classOf[graft.catalog.GraftCatalog].getName)
    .config("spark.sql.catalog.los.root",
      Files.createTempDirectory("graft-lc-os").toString)
    .config("spark.sql.catalog.los.io", "hadoop-object-store")
    .config("spark.sql.catalog.uri", classOf[graft.catalog.GraftCatalog].getName)
    .config("spark.sql.catalog.uri.root",
      Files.createTempDirectory("graft-lc-urimeta").toString)
    // Hadoop's rendering of a file URI — single slash, like s3a://…
    .config("spark.sql.catalog.uri.dataRoot",
      "file:" + uriDataBase.toString)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def sql(q: String) = spark.sql(q)
  private def rows(q: String): Seq[Seq[Any]] =
    sql(q).collect().toSeq.map(_.toSeq)

  private def parquetCountUnder(p: java.nio.file.Path): Long =
    if (!Files.isDirectory(p)) 0L
    else scala.util.Using.resource(Files.walk(p))(_.iterator()
      .asScala.count(f => f.toString.endsWith(".parquet")))

  for (cat <- Seq("lcl", "los", "uri")) {
    val backend = cat match {
      case "lcl" => "local FS"
      case "los" => "hadoop object store"
      case _ => "URI data root"
    }

    test(s"[$backend] lifecycle: create/insert/branch/merge/update/delete/" +
      "compact/vacuum/time-travel/stream all run through the backend") {
      sql(s"CREATE NAMESPACE $cat.r")
      sql(s"CREATE NAMESPACE $cat.r.main.db")
      sql(s"CREATE TABLE $cat.r.main.db.t (id INT, v STRING) " +
        "PARTITIONED BY (bucket(4, id))")
      sql(s"INSERT INTO $cat.r.main.db.t SELECT CAST(id AS INT), " +
        "concat('v', id) FROM range(0, 100)")
      rows(s"SELECT count(*) FROM $cat.r.main.db.t").head.head shouldBe 100L

      if (cat == "uri") {
        // the data/metadata split is real: parquet lands under the
        // scheme'd data root, never under the metadata root
        parquetCountUnder(uriDataBase.resolve("r").resolve("data")) should be > 0L
        parquetCountUnder(java.nio.file.Paths.get(
          spark.conf.get(s"spark.sql.catalog.$cat.root"))) shouldBe 0L
      }

      // branch + divergent writes + merge
      sql(s"CALL $cat.system.create_branch('r', 'dev', 'main')")
      sql(s"INSERT INTO $cat.r.dev.db.t VALUES (100, 'dev-only')")
      rows(s"SELECT count(*) FROM $cat.r.dev.db.t").head.head shouldBe 101L
      rows(s"SELECT count(*) FROM $cat.r.main.db.t").head.head shouldBe 100L
      sql(s"CALL $cat.system.merge('r', 'dev', 'main')")
      rows(s"SELECT count(*) FROM $cat.r.main.db.t").head.head shouldBe 101L

      // row-level ops (CoW) + time travel across them
      val beforeUpdate = openRepo(cat).headCommit("main").id
      sql(s"UPDATE $cat.r.main.db.t SET v = 'patched' WHERE id = 7")
      sql(s"DELETE FROM $cat.r.main.db.t WHERE id >= 98 AND id <= 99")
      rows(s"SELECT v FROM $cat.r.main.db.t WHERE id = 7")
        .head.head shouldBe "patched"
      rows(s"SELECT count(*) FROM $cat.r.main.db.t").head.head shouldBe 99L
      rows(s"SELECT count(*) FROM $cat.r.main.db.t VERSION AS OF " +
        s"'$beforeUpdate'").head.head shouldBe 101L

      // MERGE INTO (upsert)
      sql(s"MERGE INTO $cat.r.main.db.t t USING (SELECT 7 AS id, 'merged' AS v " +
        "UNION ALL SELECT 500, 'new') s ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
      rows(s"SELECT v FROM $cat.r.main.db.t WHERE id IN (7, 500) ORDER BY id")
        .map(_.head) shouldBe Seq("merged", "new")

      // compact + vacuum run the maintenance walk/delete paths
      sql(s"CALL $cat.system.compact('r', 'main', 'db.t')")
      rows(s"SELECT count(*) FROM $cat.r.main.db.t").head.head shouldBe 100L
      // orphan a data file on purpose (branch-only insert, then drop the
      // branch): vacuum must physically remove it through the backend
      sql(s"CALL $cat.system.create_branch('r', 'tmp', 'main')")
      sql(s"INSERT INTO $cat.r.tmp.db.t VALUES (900, 'orphan')")
      val uriFilesBeforeVacuum =
        if (cat == "uri")
          parquetCountUnder(uriDataBase.resolve("r").resolve("data"))
        else 0L
      openRepo(cat).dropBranch("tmp")
      sql(s"CALL $cat.system.expire_snapshots('r', 0)")
      sql(s"CALL $cat.system.vacuum('r', 0)")
      rows(s"SELECT count(*) FROM $cat.r.main.db.t").head.head shouldBe 100L
      if (cat == "uri")
        // vacuum's walk/delete ran against the URI store: the dropped
        // branch's file is physically gone from the scheme'd data root
        parquetCountUnder(uriDataBase.resolve("r").resolve("data")) should
          be < uriFilesBeforeVacuum

      // streaming read of the table's append history via the backend
      val q = graft.versioned.TableOps
        .readStreamAppends(spark, openRepo(cat), "db/t")
        .writeStream.format("memory").queryName(s"lc_$cat")
        .option("checkpointLocation",
          Files.createTempDirectory(s"lc-ck-$cat").toString)
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        spark.table(s"lc_$cat").count() should be >= 100L
      } finally q.stop()
    }

    test(s"[$backend] iceberg sync: registration + follower emissions run " +
      "through the backend's GraftIO") {
      sql(s"CREATE NAMESPACE $cat.sy")
      sql(s"CREATE NAMESPACE $cat.sy.main.db")
      sql(s"CREATE TABLE $cat.sy.main.db.s (id INT, v STRING)")
      sql(s"INSERT INTO $cat.sy.main.db.s VALUES (1, 'a')")
      val dest = Files.createTempDirectory(s"lc-sync-$cat")
      sql(s"CALL $cat.system.iceberg_export('sy', 'main', 'db.s', '$dest', " +
        "sync => true)")
      // registration bytes live behind the seam, under the repo root
      val repo = graft.versioned.GraftRepo.open(
        java.nio.file.Paths.get(
          spark.conf.get(s"spark.sql.catalog.$cat.root"), "sy"), ioFor(cat))
      graft.versioned.IcebergSync.registrations(repo)
        .map(_.table) shouldBe Seq("db/s")
      // a later commit drives the follower: dest advances to v2
      sql(s"INSERT INTO $cat.sy.main.db.s VALUES (2, 'b')")
      graft.versioned.IcebergSync.latestVersion(dest) shouldBe 2
      graft.versioned.IcebergImport.read(spark, dest).count() shouldBe 2
      sql(s"CALL $cat.system.iceberg_sync_remove('sy', 'main', 'db.s')")
        .collect().head.getInt(0) shouldBe 1
      sql(s"INSERT INTO $cat.sy.main.db.s VALUES (3, 'c')")
      graft.versioned.IcebergSync.latestVersion(dest) shouldBe 2 // unsubscribed
    }
  }

  test("[URI data root] vacuum at scale: >1k orphan data files removed " +
    "through the data seam's fan-out (shared IO pool, not per-file " +
    "serial driver RPCs), referenced files and sidecars intact") {
    sql("CREATE NAMESPACE uri.vs")
    sql("CREATE NAMESPACE uri.vs.main.db")
    sql("CREATE TABLE uri.vs.main.db.t (id INT)")
    sql("INSERT INTO uri.vs.main.db.t VALUES (CAST(1 AS INT)), (2), (3)")
    val dataDir = uriDataBase.resolve("vs").resolve("data")
    val before = parquetCountUnder(dataDir)
    before should be > 0L
    // fabricate the crashed-writer shape vacuum exists for: orphan
    // parquets (plus bloom sidecars) under the external data root that
    // no snapshot references
    val orphanDir = dataDir.resolve("db").resolve("orphans")
    Files.createDirectories(orphanDir)
    (0 until 1200).foreach { i =>
      Files.write(orphanDir.resolve(f"orph-$i%04d.parquet"),
        Array[Byte](1, 2, 3))
      Files.write(orphanDir.resolve(f"orph-$i%04d.parquet.bloom"),
        Array[Byte](9))
    }
    Thread.sleep(20) // cutoff is strict `<`: let mtimes fall behind it
    val repo = graft.versioned.GraftRepo.open(java.nio.file.Paths.get(
      spark.conf.get("spark.sql.catalog.uri.root"), "vs"))
    repo.vacuum(0L) shouldBe 1200
    parquetCountUnder(dataDir) shouldBe before // orphans gone, table intact
    Files.exists(orphanDir) shouldBe false     // sidecars + empty dir too
    rows("SELECT count(*) FROM uri.vs.main.db.t").head.head shouldBe 3L
  }

  test("[URI data root] DROP NAMESPACE CASCADE sweeps the EXTERNAL data " +
    "plane through the dataIO seam — no orphaned parquet under the URI " +
    "root after the repo is gone") {
    sql("CREATE NAMESPACE uri.dz")
    sql("CREATE NAMESPACE uri.dz.main.db")
    sql("CREATE TABLE uri.dz.main.db.t (id INT)")
    sql("INSERT INTO uri.dz.main.db.t VALUES (CAST(1 AS INT)), (2)")
    parquetCountUnder(uriDataBase.resolve("dz")) should be > 0L
    sql("DROP NAMESPACE uri.dz CASCADE")
    parquetCountUnder(uriDataBase.resolve("dz")) shouldBe 0L
    // the metadata tree is gone too
    java.nio.file.Files.exists(java.nio.file.Paths.get(
      spark.conf.get("spark.sql.catalog.uri.root"), "dz")) shouldBe false
  }

  /** Open the repo the way the backend does — through the same GraftIO
    * the catalog option selected. */
  private def ioFor(cat: String): graft.versioned.GraftIO =
    if (cat == "los") new graft.versioned.ObjectStoreGraftIO(
      graft.versioned.HadoopFsObjectStoreClient.local())
    else graft.versioned.LocalGraftIO.instance

  private def openRepo(cat: String): graft.versioned.GraftRepo =
    graft.versioned.GraftRepo.open(java.nio.file.Paths.get(
      spark.conf.get(s"spark.sql.catalog.$cat.root"), "r"), ioFor(cat))
}
