package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

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
      .sqlWith(spark, "gv", ident.namespace(), viewSql).schema
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

  test("ONE shared session, 8 threads: view resolution never leaks its " +
    "context into concurrent queries and never clobbers a concurrent " +
    "USE — branch-qualified view reads, view-in-view, relative reads " +
    "after USE all stay correct") {
    sql("CREATE NAMESPACE gv.cc")
    sql("CREATE NAMESPACE gv.cc.main.db")
    sql("CREATE TABLE gv.cc.main.db.t (id INT)")
    sql("INSERT INTO gv.cc.main.db.t SELECT CAST(id AS INT) FROM range(0, 10)")
    createView(Identifier.of(Array("cc", "main", "db"), "big"),
      "SELECT id FROM t WHERE id >= 5")
    createView(Identifier.of(Array("cc", "main", "db"), "outer"),
      "SELECT id FROM big WHERE id >= 8")
    sql("CALL gv.system.create_branch('cc', 'dev', 'main')")
    sql("DELETE FROM gv.cc.dev.db.t WHERE id >= 8")
    // main: t=10, big=5, outer=2;  dev: t=8, big=3, outer=0

    val iters = 30
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def check(label: String, q: String, want: Long): Unit = {
      val got = spark.sql(q).collect().head.getLong(0)
      if (got != want) failures.add(s"$label: $q → $got (want $want)")
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val tasks = new java.util.ArrayList[java.util.concurrent.Callable[Unit]]()
      // 7 threads hammer fully-qualified view reads on both branches
      // (each resolution runs the stored SQL under the view's context —
      // the window a shared-CatalogManager swap would leak)
      (0 until 7).foreach { k =>
        tasks.add(() => (0 until iters).foreach { _ =>
          check(s"view-$k", "SELECT count(*) FROM gv.cc.main.db.big", 5L)
          check(s"view-$k", "SELECT count(*) FROM gv.cc.dev.db.big", 3L)
          check(s"view-$k", "SELECT count(*) FROM gv.cc.main.db.outer", 2L)
          check(s"view-$k", "SELECT count(*) FROM gv.cc.dev.db.outer", 0L)
        })
      }
      // 1 thread owns the session context: USE + relative single-part
      // reads (table AND view) that must resolve against ITS namespace
      // even while the other threads are mid-view-resolution
      tasks.add(() => {
        (0 until iters).foreach { _ =>
          spark.sql("USE gv.cc.main.db")
          check("use", "SELECT count(*) FROM t", 10L)
          check("use", "SELECT count(*) FROM big", 5L)
          spark.sql("USE gv.cc.dev.db")
          check("use", "SELECT count(*) FROM t", 8L)
          check("use", "SELECT count(*) FROM big", 3L)
        }
        spark.sql("USE spark_catalog.default")
      })
      pool.invokeAll(tasks).forEach(_.get())
    } finally pool.shutdown()
    failures.asScala.toSeq shouldBe empty
  }
}
