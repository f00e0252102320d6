package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Identifier, ViewInfo}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.scalatest.matchers.should.Matchers

/** Plain-SQL resolution of versioned views through the
  * GraftViewResolution analyzer rule (graft.GraftExtensions): the way
  * every reference user writes queries — `SELECT … FROM
  * g.repo.branch.db.view` — without the GraftViews.select runner.
  */
class ViewSqlSpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {

  private lazy val spark = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.sql.catalog.gv", classOf[graft.catalog.GraftCatalog].getName)
      .config("spark.sql.catalog.gv.root",
        Files.createTempDirectory("graft-viewsql").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  private def sql(q: String) = spark.sql(q)

  private def createView(ident: Identifier, viewSql: String): Unit = {
    val cat = graft.catalog.GraftViews.viewCatalog(spark, "gv")
    val inferred = org.apache.spark.sql.graftbridge.ViewContextBridge
      .withContext(spark, "gv", ident.namespace()) {
        sql(viewSql).schema
      }
    cat.createView(new ViewInfo(ident, viewSql, "gv", ident.namespace(),
      inferred, inferred.fieldNames, Array.empty, Array.empty,
      java.util.Map.of()))
  }

  test("SELECT over a graft view resolves the stored definition, and the " +
    "view follows the READING branch") {
    sql("CREATE NAMESPACE gv.r")
    sql("CREATE NAMESPACE gv.r.main.db")
    sql("CREATE TABLE gv.r.main.db.t (id INT, v STRING)")
    sql("INSERT INTO gv.r.main.db.t SELECT CAST(id AS INT), concat('v', id) " +
      "FROM range(0, 10)")
    // relative reference: follows whichever branch reads the view
    createView(Identifier.of(Array("r", "main", "db"), "big"),
      "SELECT id, v FROM t WHERE id >= 5")
    sql("SELECT count(*) FROM gv.r.main.db.big").collect()
      .head.getLong(0) shouldBe 5L
    // branch + divergent DML: the SAME view name reads each branch's data
    sql("CALL gv.system.create_branch('r', 'dev', 'main')")
    sql("DELETE FROM gv.r.dev.db.t WHERE id >= 8")
    sql("SELECT count(*) FROM gv.r.dev.db.big").collect()
      .head.getLong(0) shouldBe 3L
    sql("SELECT count(*) FROM gv.r.main.db.big").collect()
      .head.getLong(0) shouldBe 5L
    // joins/aggregates over the view work like any relation
    sql("SELECT max(id) FROM gv.r.dev.db.big b JOIN gv.r.dev.db.t t2 " +
      "USING (id)").collect().head.getInt(0) shouldBe 7
  }

  test("view-references-view resolves recursively, rebound per branch") {
    sql("CREATE NAMESPACE gv.vv")
    sql("CREATE NAMESPACE gv.vv.main.db")
    sql("CREATE TABLE gv.vv.main.db.s (id INT)")
    sql("INSERT INTO gv.vv.main.db.s SELECT CAST(id AS INT) FROM range(0, 20)")
    createView(Identifier.of(Array("vv", "main", "db"), "evens"),
      "SELECT id FROM s WHERE id % 2 = 0")
    // outer view references the INNER VIEW relatively (single part)
    createView(Identifier.of(Array("vv", "main", "db"), "outer"),
      "SELECT id FROM evens WHERE id >= 10")
    sql("SELECT count(*) FROM gv.vv.main.db.outer").collect()
      .head.getLong(0) shouldBe 5L // 10,12,14,16,18
    // on a branch, BOTH levels rebind to the branch's data
    sql("CALL gv.system.create_branch('vv', 'dev', 'main')")
    sql("DELETE FROM gv.vv.dev.db.s WHERE id >= 14")
    sql("SELECT count(*) FROM gv.vv.dev.db.outer").collect()
      .head.getLong(0) shouldBe 2L // 10,12
    sql("SELECT count(*) FROM gv.vv.main.db.outer").collect()
      .head.getLong(0) shouldBe 5L
  }

  test("a graft TABLE five-part reference is untouched by the rule, and a " +
    "view self-join deduplicates attribute ids") {
    sql("CREATE NAMESPACE gv.tj")
    sql("CREATE NAMESPACE gv.tj.main.db")
    sql("CREATE TABLE gv.tj.main.db.t (id INT)")
    sql("INSERT INTO gv.tj.main.db.t VALUES (1), (2), (3)")
    sql("SELECT count(*) FROM gv.tj.main.db.t").collect()
      .head.getLong(0) shouldBe 3L
    createView(Identifier.of(Array("tj", "main", "db"), "w"),
      "SELECT id FROM t")
    sql("SELECT count(*) FROM gv.tj.main.db.w a JOIN gv.tj.main.db.w b " +
      "ON a.id = b.id").collect().head.getLong(0) shouldBe 3L
  }
}
