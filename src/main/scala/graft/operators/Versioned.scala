package graft.operators

import java.nio.file.Files
import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables => T}
import graft.versioned.{GraftRepo, TableOps}

/** Versioned-catalog operators (SURVEY.md §2.1), driver-facing: each query
  * builds a throwaway graft repo from the testdata `nation` table, runs the
  * git-like flow the reference's tests exercise (branch → DML → merge /
  * diff / time-travel; tests/test_iceberg.py:9-57), and returns the
  * resulting rows — which are SQL-expressible against the original parquet,
  * so every one of these is DuckDB-oracle-checked.
  */
object Versioned {

  /** Fresh repo + registered catalog per invocation (unique name, so the
    * session's catalog cache can never serve a stale root).
    */
  private def freshCatalog(s: SparkSession): (String, java.nio.file.Path) = {
    val cat = "gvc" + UUID.randomUUID().toString.replace("-", "").take(10)
    val root = Files.createTempDirectory(s"graft-$cat")
    s.conf.set(s"spark.sql.catalog.$cat", classOf[graft.catalog.GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root.toString)
    (cat, root)
  }

  /** repo `r` with db.nation loaded from `d` on main, dev branched off. */
  private def setup(s: SparkSession, d: String): (String, GraftRepo) = {
    val (cat, root) = freshCatalog(s)
    val nation = T.nation(s, d)
    s.sql(s"CREATE NAMESPACE $cat.r")
    s.sql(s"CREATE NAMESPACE $cat.r.main.db")
    s.sql(s"CREATE TABLE $cat.r.main.db.nation (${nation.schema.toDDL})")
    nation.writeTo(s"$cat.r.main.db.nation").append()
    s.sql(s"CREATE NAMESPACE $cat.r.dev") // zero-copy branch from main
    (cat, GraftRepo.open(root.resolve("r")))
  }

  /** Create + insert on main, branch dev, read through the DEV branch via
    * SQL — zero-copy equality with the source table.
    */
  private def readBranch(s: SparkSession, d: String): DataFrame = {
    val (cat, _) = setup(s, d)
    s.sql(s"SELECT * FROM $cat.r.dev.db.nation ORDER BY n_nationkey")
  }

  /** DELETE on dev (stats-pruned CoW), then row-level diff main↔dev. */
  private def diffRows(s: SparkSession, d: String): DataFrame = {
    val (cat, repo) = setup(s, d)
    s.sql(s"DELETE FROM $cat.r.dev.db.nation WHERE n_nationkey > 19")
    TableOps.diffRows(s, repo, "main", "dev", "db/nation")
      .select(col("n_nationkey"), col("n_name"), col("side"))
      .orderBy(col("n_nationkey"))
  }

  /** DELETE on main, then read the pre-delete commit via VERSION AS OF. */
  private def timeTravel(s: SparkSession, d: String): DataFrame = {
    val (cat, repo) = setup(s, d)
    val preDelete = repo.headCommit("main").id
    s.sql(s"DELETE FROM $cat.r.main.db.nation WHERE n_nationkey <= 9")
    s.sql(
      s"SELECT * FROM $cat.r.main.db.nation VERSION AS OF '$preDelete' " +
        "ORDER BY n_nationkey")
  }

  /** DELETE + INSERT on dev, 3-way merge into main, read main — mirrors
    * test_multiple_changes_and_merge.
    */
  private def mergeRead(s: SparkSession, d: String): DataFrame = {
    val (cat, repo) = setup(s, d)
    s.sql(s"DELETE FROM $cat.r.dev.db.nation WHERE n_nationkey IN (3, 7)")
    s.sql(s"INSERT INTO $cat.r.dev.db.nation " +
      s"SELECT n_nationkey + 100, n_name, n_regionkey " +
      s"FROM $cat.r.dev.db.nation WHERE n_nationkey < 2")
    repo.merge("dev", "main")
    s.sql(s"SELECT n_nationkey, n_name, n_regionkey FROM $cat.r.main.db.nation " +
      "ORDER BY n_nationkey")
  }

  val all: Seq[Q] = Seq(
    Q(
      "vc_read_branch",
      "SELECT * FROM nation ORDER BY n_nationkey"
    )(readBranch),
    Q(
      "vc_diff_rows",
      """SELECT n_nationkey, n_name, 'only_main' AS side FROM nation
        |WHERE n_nationkey > 19 ORDER BY n_nationkey""".stripMargin
    )(diffRows),
    Q(
      "vc_time_travel",
      "SELECT * FROM nation ORDER BY n_nationkey"
    )(timeTravel),
    Q(
      "vc_merge_read",
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |WHERE n_nationkey NOT IN (3, 7)
        |UNION ALL
        |SELECT n_nationkey + 100, n_name, n_regionkey FROM nation WHERE n_nationkey < 2
        |ORDER BY n_nationkey""".stripMargin
    )(mergeRead)
  )
}
