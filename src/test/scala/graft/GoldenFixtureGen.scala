package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** One-shot generator for the FROZEN Iceberg export fixture under
  * `src/test/resources/iceberg-golden/` (see GoldenFixtureSpec).
  *
  * The fixture is NOT produced by iceberg-core (unavailable in this
  * offline build — SURVEY §6's no-new-dependencies rule); it is the
  * output of THIS repo's exporter at the time of generation, frozen so
  * any later writer or reader change that silently breaks the
  * committed layouts fails the spec loudly. Paths are fixed absolute
  * (`/tmp/graft-golden-*`) because Iceberg manifests embed full URIs;
  * the spec restores the trees to those exact paths before reading.
  *
  * Regenerate deliberately with:
  * {{{ sbt 'Test/runMain graft.GoldenFixtureGen' }}}
  * then commit the refreshed resource tree.
  */
object GoldenFixtureGen {
  val SrcRoot: Path = Paths.get("/tmp/graft-golden-src")
  val ExportRoot: Path = Paths.get("/tmp/graft-golden-export")

  def deleteTree(p: Path): Unit = if (Files.exists(p)) {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.toList.foreach(deleteTree)
    Files.deleteIfExists(p)
  }

  def copyTree(from: Path, to: Path): Unit = {
    Files.createDirectories(to)
    Files.walk(from).iterator().asScala.foreach { p =>
      val rel = to.resolve(from.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(rel)
      else Files.copy(p, rel,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  def main(args: Array[String]): Unit = {
    deleteTree(SrcRoot); deleteTree(ExportRoot)
    Files.createDirectories(SrcRoot)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.g", classOf[graft.catalog.GraftCatalog].getName)
      .config("spark.sql.catalog.g.root", SrcRoot.toString)
      .getOrCreate()
    try {
      def sql(q: String) = spark.sql(q).collect()
      sql("CREATE NAMESPACE g.gold")
      sql("CREATE NAMESPACE g.gold.main.db")
      sql("CREATE TABLE g.gold.main.db.t (id INT, cat STRING, v DOUBLE) " +
        "PARTITIONED BY (cat) TBLPROPERTIES " +
        "('graft.delete.mode'='merge-on-read')")
      sql("INSERT INTO g.gold.main.db.t SELECT CAST(id AS INT), " +
        "CASE WHEN id % 3 = 0 THEN 'x' WHEN id % 3 = 1 THEN 'y' ELSE 'z' " +
        "END, CAST(id AS DOUBLE) FROM range(0, 30)")
      sql("DELETE FROM g.gold.main.db.t WHERE id < 4")   // range -> positional
      sql("DELETE FROM g.gold.main.db.t WHERE id = 27")  // equality delete
      sql(s"CALL g.system.iceberg_export('gold', 'main', 'db.t', " +
        s"'$ExportRoot')")
      val res = Paths.get("src/test/resources/iceberg-golden")
      deleteTree(res)
      copyTree(SrcRoot, res.resolve("src"))
      copyTree(ExportRoot, res.resolve("export"))
      println(s"[golden] fixture written under $res")
    } finally spark.stop()
  }
}
