package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.scalatest.matchers.should.Matchers

import graft.versioned.Partitioning

/** Storage-partitioned joins: two graft tables partitioned the same way
  * join with ZERO shuffle when the session opts in via Spark's own
  * `spark.sql.sources.v2.bucketing.enabled` — the DSv2 analog of what
  * Iceberg's preserve-data-grouping gives the reference's users. At
  * 100 TB this deletes both exchanges of a fact-fact equi-join.
  *
  * AQE is disabled in this suite so `executedPlan` is final and plan
  * assertions are direct string checks.
  */
class SpjSpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .config("spark.sql.catalog.g", classOf[graft.catalog.GraftCatalog].getName)
    .config("spark.sql.catalog.g.root", Files.createTempDirectory("graft-spj").toString)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def sql(q: String) = spark.sql(q)

  private def withSpj[T](body: => T): T = {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    // tolerate one side missing some partition values (empty buckets)
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    try body
    finally {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    }
  }

  private def planOf(df: DataFrame): String = {
    df.collect() // materialize so the plan is fully resolved
    df.queryExecution.executedPlan.toString
  }

  test("bucket-partitioned tables join with zero shuffle (SPJ)") {
    sql("CREATE NAMESPACE g.spj1")
    sql("CREATE NAMESPACE g.spj1.main.db")
    sql("CREATE TABLE g.spj1.main.db.fa (id BIGINT, a STRING) PARTITIONED BY (bucket(4, id))")
    sql("CREATE TABLE g.spj1.main.db.fb (id BIGINT, b STRING) PARTITIONED BY (bucket(4, id))")
    sql("INSERT INTO g.spj1.main.db.fa VALUES " +
      (1 to 40).map(i => s"($i, 'a$i')").mkString(", "))
    sql("INSERT INTO g.spj1.main.db.fb VALUES " +
      (11 to 50).map(i => s"($i, 'b$i')").mkString(", "))

    val q = "SELECT fa.id, fa.a, fb.b FROM g.spj1.main.db.fa fa " +
      "JOIN g.spj1.main.db.fb fb ON fa.id = fb.id ORDER BY fa.id"
    // without SPJ: a shuffle on each side of the join
    planOf(sql(q)) should include("Exchange")
    withSpj {
      val df = sql(q)
      val plan = planOf(df)
      // the join itself runs shuffle-free; only the final ORDER BY
      // is allowed a range exchange
      val joinPart = plan.split("TakeOrderedAndProject|Exchange rangepartitioning").last
      joinPart should not include "Exchange hashpartitioning"
      plan should include("SortMergeJoin")
      df.collect().map(_.getLong(0)).toSeq shouldBe (11L to 40L)
    }
  }

  test("identity-partitioned tables join with zero shuffle; results match non-SPJ run") {
    sql("CREATE NAMESPACE g.spj2")
    sql("CREATE NAMESPACE g.spj2.main.db")
    sql("CREATE TABLE g.spj2.main.db.ta (cat INT, x INT) PARTITIONED BY (cat)")
    sql("CREATE TABLE g.spj2.main.db.tb (cat INT, y INT) PARTITIONED BY (cat)")
    sql("INSERT INTO g.spj2.main.db.ta VALUES " +
      (1 to 30).map(i => s"(${i % 5}, $i)").mkString(", "))
    sql("INSERT INTO g.spj2.main.db.tb VALUES " +
      (1 to 30).map(i => s"(${i % 5}, ${i * 100})").mkString(", "))

    val q = "SELECT ta.cat, count(*) AS n, sum(ta.x + tb.y) AS s " +
      "FROM g.spj2.main.db.ta ta JOIN g.spj2.main.db.tb tb ON ta.cat = tb.cat " +
      "GROUP BY ta.cat ORDER BY ta.cat"
    val expected = sql(q).collect().map(_.toSeq).toSeq
    withSpj {
      val df = sql(q)
      val plan = planOf(df)
      // join AND the group-by reuse the key-grouped layout: the only
      // exchange left is the single-row final sort
      plan.linesIterator.count(_.contains("Exchange hashpartitioning")) shouldBe 0
      df.collect().map(_.toSeq).toSeq shouldBe expected
    }
  }

  test("filters still prune under SPJ; runtime group stability holds") {
    withSpj {
      val df = sql("SELECT id, a FROM g.spj1.main.db.fa WHERE id >= 35 ORDER BY id")
      df.collect().map(_.getLong(0)).toSeq shouldBe (35L to 40L)
    }
  }

  test("ineligible layouts fall back cleanly (temporal transform, unpartitioned)") {
    sql("CREATE NAMESPACE g.spj3")
    sql("CREATE NAMESPACE g.spj3.main.db")
    sql("CREATE TABLE g.spj3.main.db.ev (ts TIMESTAMP, v INT) PARTITIONED BY (days(ts))")
    sql("INSERT INTO g.spj3.main.db.ev VALUES " +
      "(TIMESTAMP'2024-01-01 03:00:00', 1), (TIMESTAMP'2024-01-02 04:00:00', 2)")
    sql("CREATE TABLE g.spj3.main.db.plain (id INT, v INT)")
    sql("INSERT INTO g.spj3.main.db.plain VALUES (1, 10), (2, 20)")
    withSpj {
      sql("SELECT v FROM g.spj3.main.db.ev ORDER BY v")
        .collect().map(_.getInt(0)).toSeq shouldBe Seq(1, 2)
      sql("SELECT v FROM g.spj3.main.db.plain ORDER BY v")
        .collect().map(_.getInt(0)).toSeq shouldBe Seq(10, 20)
    }
  }

  test("one side missing partition values entirely still joins correctly (pushPartValues)") {
    sql("CREATE NAMESPACE g.spjm")
    sql("CREATE NAMESPACE g.spjm.main.db")
    sql("CREATE TABLE g.spjm.main.db.ma (cat INT, x INT) PARTITIONED BY (cat)")
    sql("CREATE TABLE g.spjm.main.db.mb (cat INT, y INT) PARTITIONED BY (cat)")
    // ma holds cats {0,1,2}; mb holds cats {1,2,3} — each side misses one
    sql("INSERT INTO g.spjm.main.db.ma VALUES (0, 1), (1, 2), (2, 3)")
    sql("INSERT INTO g.spjm.main.db.mb VALUES (1, 20), (2, 30), (3, 40)")
    val q = "SELECT ma.cat, ma.x, mb.y FROM g.spjm.main.db.ma ma " +
      "JOIN g.spjm.main.db.mb mb ON ma.cat = mb.cat ORDER BY ma.cat"
    val expected = sql(q).collect().map(_.toSeq).toSeq
    withSpj {
      val df = sql(q)
      val plan = planOf(df)
      plan.linesIterator.count(_.contains("Exchange hashpartitioning")) shouldBe 0
      df.collect().map(_.toSeq).toSeq shouldBe expected
    }
    expected.map(_.head) shouldBe Seq(1, 2)
  }

  test("scan without partition columns in output keeps split-per-file reads") {
    withSpj {
      // fa's bucket source (id) is pruned from this scan's output: Spark
      // would discard a KeyGroupedPartitioning anyway, so the scan must
      // NOT collapse to one-task-per-key groups
      val df = sql("SELECT a FROM g.spj1.main.db.fa")
      df.collect().length shouldBe 40
      val scans = df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }
      scans should not be empty
      all(scans.flatMap(_.inputPartitions)) should not be
        a[org.apache.spark.sql.graftbridge.GraftKeyedPartition]
    }
  }

  test("float partition keys are SPJ-ineligible (0.0 vs -0.0)") {
    sql("CREATE NAMESPACE g.spjf")
    sql("CREATE NAMESPACE g.spjf.main.db")
    sql("CREATE TABLE g.spjf.main.db.da (k DOUBLE, a INT) PARTITIONED BY (k)")
    sql("CREATE TABLE g.spjf.main.db.db (k DOUBLE, b INT) PARTITIONED BY (k)")
    sql("INSERT INTO g.spjf.main.db.da VALUES (cast(0.0 as double), 1), (cast(1.5 as double), 2)")
    sql("INSERT INTO g.spjf.main.db.db VALUES (cast(-0.0 as double), 10), (cast(1.5 as double), 20)")
    val q = "SELECT da.k, da.a, db.b FROM g.spjf.main.db.da da " +
      "JOIN g.spjf.main.db.db db ON da.k = db.k ORDER BY da.a"
    val expected = sql(q).collect().map(_.toSeq).toSeq
    withSpj {
      // must fall back to a shuffled join: 0.0 and -0.0 live in different
      // partition dirs but are SQL-equal, so key-aligned zipping would
      // lose their match
      sql(q).collect().map(_.toSeq).toSeq shouldBe expected
    }
    expected.length shouldBe 2
  }

  test("driver query vc_spj_join matches a plain parquet join") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("vc_spj_join")(spark, d)
      .collect().map(_.toSeq).toSeq
    val expected = Tables.customer(spark, d)
      .join(Tables.orders(spark, d), col("c_custkey") === col("o_custkey"))
      .groupBy("c_custkey", "c_name")
      .agg(count(lit(1)).as("n_orders"), min("o_orderkey").as("first_order"))
      .orderBy("c_custkey")
      .collect().map(_.toSeq).toSeq
    got shouldBe expected
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
  }

  test("catalog bucket function agrees with the write-side bucketing") {
    import org.apache.spark.sql.types._
    val bound = graft.catalog.GraftBucketFunction.bind(StructType(Seq(
      StructField("n", IntegerType), StructField("c", LongType))))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Integer]]
    for (v <- Seq(0L, 1L, 5L, -17L, 123456789L)) {
      val viaFn = bound.produceResult(
        org.apache.spark.sql.catalyst.InternalRow(4, v))
      viaFn shouldBe Partitioning.bucketOfLiteral(v, LongType, 4)
      // width normalization: an INT holding the same value buckets identically
      viaFn shouldBe Partitioning.bucketOfLiteral(v.toInt, IntegerType, 4)
    }
    // string sources hash as-is
    val sbound = graft.catalog.GraftBucketFunction.bind(StructType(Seq(
      StructField("n", IntegerType), StructField("c", StringType))))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Integer]]
    sbound.produceResult(org.apache.spark.sql.catalyst.InternalRow(
      8, org.apache.spark.unsafe.types.UTF8String.fromString("abc"))) shouldBe
      Partitioning.bucketOfLiteral("abc", org.apache.spark.sql.types.StringType, 8)
  }
}
