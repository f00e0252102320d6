package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  val sf: String = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import TestSpark._

  // Queries whose result is legitimately empty on the tiny sf0.001 slice
  // (e.g. every customer has at least one order there).
  private val mayBeEmpty = Set("q08_anti_join")

  test("every declared query runs and is non-empty") {
    SparkEntry.allQueries.foreach { q =>
      val df = q.run(spark, sf)
      val n = df.count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned no rows")
    }
  }

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q01 aggregates are internally consistent") {
    val r = SparkEntry.queries("q01_agg")(spark, sf).collect()
    r.foreach { row =>
      val sumQty = row.getAs[Double]("sum_qty")
      val n = row.getAs[Long]("count_order")
      val avgQty = row.getAs[Double]("avg_qty")
      assert(math.abs(sumQty / n - avgQty) < 1e-9)
    }
  }

  test("q07 semi + q08 anti partition the customer table") {
    val nSemi = SparkEntry.queries("q07_semi_join")(spark, sf).count()
    val nAnti = SparkEntry.queries("q08_anti_join")(spark, sf).count()
    val nCust = Tables.customer(spark, sf).count()
    assert(nSemi + nAnti == nCust)
  }

  test("q10 top-k emits at most 3 rows per customer, ranked") {
    val rows = SparkEntry.queries("q10_window_topk")(spark, sf)
      .groupBy("o_custkey").count().collect()
    assert(rows.forall(_.getAs[Long]("count") <= 3))
  }

  test("as-of join attaches the latest preceding order") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q22_asof_join")(spark, sf)
    // every attached order must exist and precede the event
    val o = Tables.orders(spark, sf)
    val bad = out.join(o, out("last_order") === o("o_orderkey"))
      .filter(o("o_orderdate").cast("timestamp_ntz") > col("ts"))
      .count()
    assert(bad == 0)
  }
}
