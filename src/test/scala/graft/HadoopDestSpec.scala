package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.scalatest.matchers.should.Matchers

/** Iceberg export/sync/expire against HADOOP-FS destinations
  * (DestIO.scala): a dest given as a URI with a scheme routes every
  * dest byte — metadata JSON, avro manifests, delete parquet, the
  * retention sweep — through the Hadoop FileSystem for that scheme,
  * the way an `s3a://bucket/table` dest would in production (the
  * reference's FileIO is object-store-native, LakeFSFileIO.java:24).
  * Here the scheme is `file://` over the RAW local FS, so every byte
  * demonstrably took the Hadoop path (no .crc sidecars = not the
  * checksummed default; nio sees the same tree for assertions).
  */
class HadoopDestSpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.catalog.gh", classOf[graft.catalog.GraftCatalog].getName)
    .config("spark.sql.catalog.gh.root",
      Files.createTempDirectory("graft-hdest").toString)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def sql(q: String) = spark.sql(q)

  private def walkNames(root: java.nio.file.Path): Seq[String] =
    scala.util.Using.resource(Files.walk(root))(_.iterator().asScala
      .filter(Files.isRegularFile(_)).map(_.getFileName.toString).toList)

  test("one-shot export to a file:// URI dest: layout via Hadoop FS, " +
    "no .crc sidecars, import reads it back via URI and via nio path") {
    sql("CREATE NAMESPACE gh.h1")
    sql("CREATE NAMESPACE gh.h1.main.db")
    sql("CREATE TABLE gh.h1.main.db.t (id INT, v DOUBLE) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    sql("INSERT INTO gh.h1.main.db.t SELECT CAST(id AS INT), " +
      "CAST(id AS DOUBLE) FROM range(0, 40)")
    sql("DELETE FROM gh.h1.main.db.t WHERE id >= 35") // positional MoR
    val destDir = Files.createTempDirectory("hdest-oneshot")
    val destUri = destDir.toUri.toString.stripSuffix("/") // file:///...
    val out = sql("CALL gh.system.iceberg_export('h1', 'main', 'db.t', " +
      s"'$destUri')").collect().head
    out.getString(0) should startWith("file:") // Hadoop display path
    // layout exists and is clean (raw FS — no .crc checksum sidecars)
    Files.isRegularFile(
      destDir.resolve("metadata").resolve("v1.metadata.json")) shouldBe true
    walkNames(destDir).filter(_.endsWith(".crc")) shouldBe empty
    walkNames(destDir).filter(_.startsWith(".tmp-")) shouldBe empty
    // import via the URI (Hadoop read path) and via nio (same bytes)
    val viaUri = graft.versioned.IcebergImport
      .read(spark, destUri, None).orderBy("id")
    val viaNio = graft.versioned.IcebergImport
      .read(spark, destDir).orderBy("id")
    viaUri.count() shouldBe 35
    viaUri.collect() shouldBe viaNio.collect()
    // embedded manifest-list URI points under the dest (file:/// form)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = om.readTree(Files.readString(
      destDir.resolve("metadata").resolve("v1.metadata.json")))
    meta.get("location").asText() should startWith("file:")
    meta.get("snapshots").get(0).get("manifest-list").asText() should
      startWith("file:")
  }

  test("sync to a file:// URI dest with keep_versions: emissions and " +
    "the retention sweep run through the Hadoop FS") {
    sql("CREATE NAMESPACE gh.h2")
    sql("CREATE NAMESPACE gh.h2.main.db")
    sql("CREATE TABLE gh.h2.main.db.s (id INT, v STRING)")
    sql("INSERT INTO gh.h2.main.db.s VALUES (1, 'a')")
    val destDir = Files.createTempDirectory("hdest-sync")
    val destUri = destDir.toUri.toString.stripSuffix("/")
    sql("CALL gh.system.iceberg_export('h2', 'main', 'db.s', " +
      s"'$destUri', sync => true, keep_versions => 2)")
    (2 to 5).foreach(i =>
      sql(s"INSERT INTO gh.h2.main.db.s VALUES ($i, 'x$i')"))
    // follower emitted v2..v5; retention kept the newest 2
    val versions = scala.util.Using.resource(
      Files.list(destDir.resolve("metadata")))(_.iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.matches("""v\d+\.metadata\.json""")).toList.sorted)
    versions shouldBe Seq("v4.metadata.json", "v5.metadata.json")
    graft.versioned.IcebergImport.read(spark, destUri, None)
      .count() shouldBe 5
    // manual expire through the URI form also works
    sql(s"CALL gh.system.iceberg_export_expire('$destUri', 1, " +
      "older_than_ms => 0)")
    scala.util.Using.resource(
      Files.list(destDir.resolve("metadata")))(_.iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.matches("""v\d+\.metadata\.json""")).toList) shouldBe
      Seq("v5.metadata.json")
    graft.versioned.IcebergImport.read(spark, destUri, None)
      .count() shouldBe 5
  }

  test("segmented snapshot exports chunk manifests through the Hadoop " +
    "dest; a sync re-emission reuses them") {
    val saved = Option(System.getProperty("graft.manifest.inline.max"))
    System.setProperty("graft.manifest.inline.max", "4")
    try {
      sql("CREATE NAMESPACE gh.h3")
      sql("CREATE NAMESPACE gh.h3.main.db")
      sql("CREATE TABLE gh.h3.main.db.c (id INT, v DOUBLE)")
      (0 until 3).foreach(i => sql("INSERT INTO gh.h3.main.db.c SELECT " +
        s"CAST(id AS INT), CAST(id AS DOUBLE) FROM range(${i * 20}, ${i * 20 + 20})"))
      val destDir = Files.createTempDirectory("hdest-chunks")
      val destUri = destDir.toUri.toString.stripSuffix("/")
      sql("CALL gh.system.iceberg_export('h3', 'main', 'db.c', " +
        s"'$destUri', sync => true)")
      def cms: Set[String] = scala.util.Using.resource(
        Files.list(destDir.resolve("metadata")))(_.iterator().asScala
        .map(_.getFileName.toString).filter(_.startsWith("cm-")).toSet)
      val first = cms
      first should not be empty // chunk-aligned manifests took the seam
      // follower emission: every previously written chunk manifest is
      // still referenced/reused (content addressing), only the tail and
      // the new chunk's avro are added
      sql("INSERT INTO gh.h3.main.db.c SELECT CAST(id AS INT), " +
        "CAST(id AS DOUBLE) FROM range(100, 120)")
      val second = cms
      first.intersect(second).size should be >= (first.size - 1)
      graft.versioned.IcebergImport.read(spark, destUri, None)
        .count() shouldBe 80
    } finally saved.fold[AnyRef](
      System.clearProperty("graft.manifest.inline.max"))(
      System.setProperty("graft.manifest.inline.max", _))
  }
}
