package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions", classOf[GraftExtensions].getName)
    .getOrCreate()
  val sf: String = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite
    with org.scalatest.matchers.should.Matchers {
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

  test("as-of join: nullable payload values travel atomically per right " +
    "row; inner keeps matched rows whose payload is NULL") {
    import spark.implicits._
    val left = Seq((1L, 10L), (1L, 20L), (2L, 7L)).toDF("k", "t")
    val right = Seq(
      (1L, 5L, Option.empty[String], Option("b5")),
      (1L, 15L, Option("a15"), Option.empty[String])
    ).toDF("k", "rt", "a", "b")
    val out = operators.AsOfJoin.asOfBackward(
      left, right, "k", "k", "t", "rt", payload = Seq("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)), Option(r.getString(3)))).sortBy(x => (x._1, x._2))
    // t=10 matches right t=5: payload (null, b5) — a NULL payload value
    // must NOT be backfilled from an older row, and inner must KEEP the
    // matched row despite payload.head being null.
    // t=20 matches right t=15: (a15, null) — not (a15, b5) mixed.
    // k=2 has no match: dropped by inner.
    out shouldBe Array(
      (1L, 10L, None, Some("b5")),
      (1L, 20L, Some("a15"), None))
  }

  test("as-of join: forward and tolerance variants on a hand-computed case") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val left = Seq((1L, 10L), (1L, 25L), (2L, 5L)).toDF("k", "t")
    val right = Seq((1L, 8L, "r8"), (1L, 20L, "r20"), (2L, 30L, "r30"))
      .toDF("k", "rt", "v")
    def collect(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, String)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)).getOrElse("-"))).toSet
    // backward: latest right with rt <= t
    collect(operators.AsOfJoin.asOfBackward(left, right, "k", "k", "t", "rt",
      Seq("v"), inner = false)) shouldBe
      Set((1L, 10L, "r8"), (1L, 25L, "r20"), (2L, 5L, "-"))
    // forward: earliest right with rt >= t
    collect(operators.AsOfJoin.asOfForward(left, right, "k", "k", "t", "rt",
      Seq("v"), inner = false)) shouldBe
      Set((1L, 10L, "r20"), (1L, 25L, "-"), (2L, 5L, "r30"))
    // backward with tolerance 3: match at distance 2 kept, distance 5 voided
    collect(operators.AsOfJoin.asOfBackward(left, right, "k", "k", "t", "rt",
      Seq("v"), inner = false, tolerance = Some(lit(3L)))) shouldBe
      Set((1L, 10L, "r8"), (1L, 25L, "-"), (2L, 5L, "-"))
  }

  test("q37 band gate: emitted percentiles are the exact ones; the " +
    "in-query 1% sketch band holds; the sketch really is within band") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q37_approx_quantile")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)),
          r.getDouble(5), r.getBoolean(6))).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.95))")
          .as("pq"),
        expr("percentile(l_quantity, 0.5)").as("qm"))
      .collect().map(r => r.getString(0) ->
        (r.getSeq[Double](1), r.getDouble(2))).toMap
    // independent approx pass: the query's band boolean must agree with
    // a band check recomputed OUTSIDE the query
    val approx = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.95), 10000)")
          .as("pq"),
        expr("approx_percentile(l_quantity, 0.5, 10000)").as("qm"))
      .collect().map(r => r.getString(0) ->
        (r.getSeq[Double](1), r.getDouble(2))).toMap
    exact.keys.foreach { k =>
      val (oq, om, band) = out(k); val (eq, em) = exact(k)
      band shouldBe true
      oq.zip(eq).foreach { case (o, e) =>
        o shouldBe BigDecimal(e).setScale(3,
          BigDecimal.RoundingMode.HALF_UP).toDouble +- 1e-9
      }
      om shouldBe BigDecimal(em).setScale(3,
        BigDecimal.RoundingMode.HALF_UP).toDouble +- 1e-9
      val (aq, am) = approx(k)
      aq.zip(eq).foreach { case (a, e) =>
        math.abs(a - e) / e should be < 0.01
      }
      math.abs(am - em) / em should be < 0.01
    }
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
