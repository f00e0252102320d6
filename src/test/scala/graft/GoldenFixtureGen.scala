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
  // v3 fixture (Puffin deletion vectors + row lineage + history) lives
  // in its OWN trees/resource dir: regenerating one fixture must never
  // silently rewrite the other's frozen bytes
  val V3SrcRoot: Path = Paths.get("/tmp/graft-golden-v3-src")
  val V3ExportRoot: Path = Paths.get("/tmp/graft-golden-v3-export")

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

  /** Regenerates ONLY the fixtures named in args (`v2`, `v3`) — never
    * both implicitly: each committed tree is a freeze of the writer at
    * a point in time, and refreshing one must be a deliberate act that
    * leaves the other's bytes alone.
    */
  def main(args: Array[String]): Unit = {
    val which = if (args.isEmpty) Set("v3") else args.toSet
    if (which("v2")) genV2()
    if (which("v3")) genV3()
  }

  private def session(root: Path): SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.catalog.g", classOf[graft.catalog.GraftCatalog].getName)
    .config("spark.sql.catalog.g.root", root.toString)
    .getOrCreate()

  def genV2(): Unit = {
    deleteTree(SrcRoot); deleteTree(ExportRoot)
    Files.createDirectories(SrcRoot)
    val spark = session(SrcRoot)
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
      println(s"[golden] v2 fixture written under $res")
    } finally spark.stop()
  }

  /** The v3 freeze: a 3-commit history (two appends, then MoR deletes)
    * exported with `format_version => 3, snapshots => 3` — Puffin
    * deletion-vector blobs, row-lineage metadata (next-row-id /
    * first-row-id), DV manifest entries (fields 143/144/145) and an
    * equality delete, all as committed bytes.
    */
  def genV3(): Unit = {
    deleteTree(V3SrcRoot); deleteTree(V3ExportRoot)
    Files.createDirectories(V3SrcRoot)
    val spark = session(V3SrcRoot)
    try {
      def sql(q: String) = spark.sql(q).collect()
      sql("CREATE NAMESPACE g.gold")
      sql("CREATE NAMESPACE g.gold.main.db")
      sql("CREATE TABLE g.gold.main.db.t (id INT, cat STRING, v DOUBLE) " +
        "PARTITIONED BY (cat) TBLPROPERTIES " +
        "('graft.delete.mode'='merge-on-read')")
      sql("INSERT INTO g.gold.main.db.t SELECT CAST(id AS INT), " +
        "CASE WHEN id % 3 = 0 THEN 'x' WHEN id % 3 = 1 THEN 'y' ELSE 'z' " +
        "END, CAST(id AS DOUBLE) FROM range(0, 20)")
      sql("INSERT INTO g.gold.main.db.t SELECT CAST(id AS INT), " +
        "CASE WHEN id % 3 = 0 THEN 'x' WHEN id % 3 = 1 THEN 'y' ELSE 'z' " +
        "END, CAST(id AS DOUBLE) FROM range(20, 30)")
      sql("DELETE FROM g.gold.main.db.t WHERE id < 4")   // range -> DV
      sql("DELETE FROM g.gold.main.db.t WHERE id = 27")  // equality delete
      sql(s"CALL g.system.iceberg_export('gold', 'main', 'db.t', " +
        s"'$V3ExportRoot', snapshots => 4, format_version => 3)")
      val res = Paths.get("src/test/resources/iceberg-golden-v3")
      deleteTree(res)
      copyTree(V3SrcRoot, res.resolve("src"))
      copyTree(V3ExportRoot, res.resolve("export"))
      println(s"[golden] v3 fixture written under $res")
    } finally spark.stop()
  }
}
