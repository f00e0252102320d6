package graft.operators

import graft.{Q, Tables => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational / SQL operator pack (SURVEY.md §2.2), oracle-checked vs DuckDB.
  *
  * Oracle-parity rules (SURVEY.md §4):
  *  - money sums go through DECIMAL(18,2) so the sum is exact and
  *    order-independent, then cast to DOUBLE — bitwise identical in both
  *    engines regardless of aggregation order (a requirement at 100 TB where
  *    partial-agg ordering is nondeterministic).
  *  - every result has a total ORDER BY (ties broken by keys) and identical
  *    column aliases in Spark and SQL.
  *  - int-typed scalars are cast to BIGINT on both sides.
  */
object Relational {

  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  /** Exact, order-independent money sum surfaced as DOUBLE. */
  private def moneySum(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  val all: Seq[Q] = Seq(
    // ---- q01: hash aggregate, TPC-H Q1 shape --------------------------------
    Q(
      "q01_agg",
      """SELECT l_returnflag, l_linestatus,
        |       sum(l_quantity) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
        |       CAST(sum(l_quantity) AS DOUBLE) / count(*) AS avg_qty,
        |       count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
    ) { (s, d) =>
      T.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2000-12-01").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec2(col("l_extendedprice")) * dec2(lit(1) - col("l_discount")))
            .cast(DoubleType).as("sum_disc_price"),
          (sum(col("l_quantity")).cast(DoubleType) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // ---- q02: scan + predicate pushdown + column pruning --------------------
    Q(
      "q02_filter_project",
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
    ) { (s, d) =>
      T.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast(TimestampType) &&
          col("l_discount") > 0.05)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // ---- q03: shuffle joins + agg + deterministic top-k (Q3 shape) ----------
    Q(
      "q03_join_agg",
      """SELECT l_orderkey,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       o_orderdate
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |              JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01' AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin
    ) { (s, d) =>
      val c = T.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = T.orders(s, d).filter(col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
      val l = T.lineitem(s, d).filter(col("l_shipdate") > lit("1998-01-01").cast(TimestampType))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(dec2(col("l_extendedprice")) * dec2(lit(1) - col("l_discount")))
          .cast(DoubleType).as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // ---- q04: broadcast dimension join --------------------------------------
    Q(
      "q04_broadcast_join",
      """SELECT p_brand, count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin
    ) { (s, d) =>
      T.lineitem(s, d)
        .join(broadcast(T.part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("p_brand"))
    },

    // ---- q05: 6-table join (Q5 shape) ---------------------------------------
    Q(
      "q05_multi_join",
      """SELECT n_name,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM region JOIN nation ON n_regionkey = r_regionkey
        |            JOIN customer ON c_nationkey = n_nationkey
        |            JOIN orders ON o_custkey = c_custkey
        |            JOIN lineitem ON l_orderkey = o_orderkey
        |            JOIN supplier ON s_suppkey = l_suppkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin
    ) { (s, d) =>
      val dims = broadcast(
        T.nation(s, d).join(
          broadcast(T.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey")))
      T.lineitem(s, d)
        .join(T.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(T.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(dims, col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(T.supplier(s, d)), col("s_suppkey") === col("l_suppkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec2(col("l_extendedprice")) * dec2(lit(1) - col("l_discount")))
          .cast(DoubleType).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // ---- q06: selective filter + global agg (Q6 shape) ----------------------
    Q(
      "q06_selective",
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin
    ) { (s, d) =>
      T.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("l_shipdate") < lit("1997-01-01").cast(TimestampType) &&
          col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
        .agg(
          sum(dec2(col("l_extendedprice")) * dec2(col("l_discount")))
            .cast(DoubleType).as("revenue"),
          count(lit(1)).as("n"))
    },

    // ---- q07: left-semi (EXISTS) --------------------------------------------
    Q(
      "q07_semi_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin
    ) { (s, d) =>
      T.customer(s, d)
        .join(T.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // ---- q08: left-anti (NOT EXISTS) ----------------------------------------
    Q(
      "q08_anti_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin
    ) { (s, d) =>
      T.customer(s, d)
        .join(T.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // ---- q09: left outer join + null-safe agg -------------------------------
    Q(
      "q09_outer_join",
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |       CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spend
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin
    ) { (s, d) =>
      T.customer(s, d)
        .join(T.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          coalesce(sum(dec2(col("o_totalprice"))), lit(0)).cast(DoubleType).as("total_spend"))
        .orderBy(col("c_custkey"))
    },

    // ---- q10: window row_number, top-n per group ----------------------------
    Q(
      "q10_window_topk",
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin
    ) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      T.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).cast(LongType).as("rn"))
        .filter(col("rn") <= 3)
        .orderBy(col("o_custkey"), col("rn"))
    },

    // ---- q11: running-sum frame window --------------------------------------
    Q(
      "q11_window_running",
      // NOTE: (l_orderkey, l_linenumber) is NOT unique in the synthetic data,
      // so both the window order and the output order break ties all the way
      // down to l_extendedprice; fully-tied rows produce identical output
      // rows, which keeps the result deterministic across engines.
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
        |            OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_rev
        |FROM lineitem ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_extendedprice, running_rev""".stripMargin
    ) { (s, d) =>
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T.lineitem(s, d)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_shipdate"), col("l_extendedprice"),
          sum(dec2(col("l_extendedprice"))).over(w).cast(DoubleType).as("running_rev"))
        .orderBy(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
          col("l_linenumber"), col("l_extendedprice"), col("running_rev"))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("running_rev"))
    },

    // ---- q12: multi count-distinct ------------------------------------------
    Q(
      "q12_distinct_agg",
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |       count(DISTINCT l_suppkey) AS n_supps, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    ) { (s, d) =>
      T.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },

    // ---- q13: union all ------------------------------------------------------
    Q(
      "q13_union",
      """SELECT src, key FROM (
        |  SELECT 'customer' AS src, c_custkey AS key FROM customer
        |  UNION ALL SELECT 'supplier' AS src, s_suppkey AS key FROM supplier) t
        |ORDER BY src, key""".stripMargin
    ) { (s, d) =>
      T.customer(s, d).select(lit("customer").as("src"), col("c_custkey").as("key"))
        .unionByName(
          T.supplier(s, d).select(lit("supplier").as("src"), col("s_suppkey").as("key")))
        .orderBy(col("src"), col("key"))
    },

    // ---- q14: EXCEPT / INTERSECT --------------------------------------------
    Q(
      "q14_except_intersect",
      """SELECT tag, k FROM (
        |  SELECT 'both' AS tag, k FROM (SELECT c_custkey AS k FROM customer INTERSECT SELECT o_custkey FROM orders) a
        |  UNION ALL
        |  SELECT 'only_cust' AS tag, k FROM (SELECT c_custkey AS k FROM customer EXCEPT SELECT o_custkey FROM orders) b) t
        |ORDER BY tag, k""".stripMargin
    ) { (s, d) =>
      val ck = T.customer(s, d).select(col("c_custkey").as("k"))
      val ok = T.orders(s, d).select(col("o_custkey").as("k"))
      ck.intersect(ok).select(lit("both").as("tag"), col("k"))
        .unionByName(ck.except(ok).select(lit("only_cust").as("tag"), col("k")))
        .orderBy(col("tag"), col("k"))
    },

    // ---- q15: ROLLUP ---------------------------------------------------------
    Q(
      "q15_rollup",
      """SELECT coalesce(l_returnflag, 'ALL') AS rflag, coalesce(l_linestatus, 'ALL') AS lstatus,
        |       sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rflag, lstatus""".stripMargin
    ) { (s, d) =>
      T.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
          col("sum_qty"), col("n"))
        .orderBy(col("rflag"), col("lstatus"))
    },

    // ---- q16: CUBE -----------------------------------------------------------
    Q(
      "q16_cube",
      """SELECT coalesce(l_returnflag, 'ALL') AS rflag, coalesce(l_linestatus, 'ALL') AS lstatus,
        |       sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY rflag, lstatus""".stripMargin
    ) { (s, d) =>
      T.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
          col("sum_qty"), col("n"))
        .orderBy(col("rflag"), col("lstatus"))
    },

    // ---- q17: CASE-WHEN conditional aggregation (manual pivot) ---------------
    Q(
      "q17_case_pivot",
      """SELECT o_custkey,
        |       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin
    ) { (s, d) =>
      def flag(v: String) = sum(when(col("o_orderstatus") === v, 1).otherwise(0)).cast(LongType)
      T.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(flag("F").as("n_f"), flag("O").as("n_o"), flag("P").as("n_p"))
        .orderBy(col("o_custkey"))
    },

    // ---- q18: scalar subquery ------------------------------------------------
    Q(
      "q18_subquery",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin
    ) { (s, d) =>
      val o = T.orders(s, d)
      val avgPrice = o.agg(avg(col("o_totalprice")).as("a"))
      o.join(broadcast(avgPrice), col("o_totalprice") > col("a"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },

    // ---- q19: string functions ----------------------------------------------
    Q(
      "q19_string_funcs",
      """SELECT c_custkey, upper(c_name) AS uname, substr(c_name, 1, 8) AS pre,
        |       CAST(length(c_name) AS BIGINT) AS name_len,
        |       concat(c_mktsegment, '_', c_name) AS tagged
        |FROM customer WHERE c_name LIKE '%er%' ORDER BY c_custkey""".stripMargin
    ) { (s, d) =>
      T.customer(s, d)
        .filter(col("c_name").like("%er%"))
        .select(
          col("c_custkey"),
          upper(col("c_name")).as("uname"),
          substring(col("c_name"), 1, 8).as("pre"),
          length(col("c_name")).cast(LongType).as("name_len"),
          concat(col("c_mktsegment"), lit("_"), col("c_name")).as("tagged"))
        .orderBy(col("c_custkey"))
    },

    // ---- q20: date functions -------------------------------------------------
    Q(
      "q20_date_funcs",
      """SELECT date_trunc('month', o_orderdate) AS mon, count(*) AS n,
        |       CAST(min(datediff('day', TIMESTAMP '1995-01-01', o_orderdate)) AS BIGINT) AS min_day,
        |       CAST(max(year(o_orderdate)) AS BIGINT) AS max_yr
        |FROM orders GROUP BY mon ORDER BY mon""".stripMargin
    ) { (s, d) =>
      T.orders(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).as("mon"))
        .agg(
          count(lit(1)).as("n"),
          min(datediff(col("o_orderdate"), lit("1995-01-01").cast(DateType)))
            .cast(LongType).as("min_day"),
          max(year(col("o_orderdate"))).cast(LongType).as("max_yr"))
        .orderBy(col("mon"))
    },

    // ---- q21: exact interpolated percentiles --------------------------------
    Q(
      "q21_percentile",
      """SELECT l_returnflag,
        |       round(quantile_cont(l_extendedprice, 0.5), 3) AS p50,
        |       round(quantile_cont(l_extendedprice, 0.9), 3) AS p90
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    ) { (s, d) =>
      T.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(percentile(col("l_extendedprice"), lit(0.5)), 3).as("p50"),
          round(percentile(col("l_extendedprice"), lit(0.9)), 3).as("p90"))
        .orderBy(col("l_returnflag"))
    },

    // ---- q22: as-of join (custom operator; DuckDB ASOF JOIN oracle) ----------
    Q(
      "q22_asof_join",
      """SELECT e.event_id, e.user_id, e.ts, o.o_orderkey AS last_order
        |FROM events e ASOF JOIN (
        |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY o_custkey, o_orderdate) o
        |ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY e.event_id""".stripMargin
    ) { (s, d) =>
      val e = T.events(s, d).select(col("event_id"), col("user_id"), col("ts"))
      // Dedup right side to one order per (cust, instant) so the as-of match
      // is deterministic in both engines.
      val o = T.orders(s, d)
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
      AsOfJoin.asOfBackward(
        e.withColumn("__ts_cmp", col("ts").cast(TimestampType)), o,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "__ts_cmp", rightTime = "o_orderdate",
        payload = Seq("o_orderkey"))
        .select(col("event_id"), col("user_id"), col("ts"), col("o_orderkey").as("last_order"))
        .orderBy(col("event_id"))
    },

    // ---- q22b: FORWARD as-of join (earliest event at-or-after the order) -----
    // (orders predate the event stream, so this direction is the non-trivial
    // one on this data)
    Q(
      "q22b_asof_forward",
      """SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, e.event_id AS next_event
        |FROM orders o ASOF JOIN (
        |  SELECT user_id, ts, max(event_id) AS event_id
        |  FROM events GROUP BY user_id, ts) e
        |ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |ORDER BY o.o_orderkey""".stripMargin
    ) { (s, d) =>
      val o = T.orders(s, d).select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      // Dedup right side to one event per (user, instant) so the as-of match
      // is deterministic in both engines.
      val e = T.events(s, d)
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("event_id"))
      AsOfJoin.asOfForward(
        o.withColumn("__ts_cmp", col("o_orderdate").cast(TimestampNTZType)), e,
        leftKey = "o_custkey", rightKey = "user_id",
        leftTime = "__ts_cmp", rightTime = "ts",
        payload = Seq("event_id"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("event_id").as("next_event"))
        .orderBy(col("o_orderkey"))
    },

    // ---- q23: range (band) join ---------------------------------------------
    Q(
      "q23_range_join",
      """SELECT p_size, count(*) AS n FROM part p
        |JOIN lineitem l ON l.l_quantity >= p.p_size - 2 AND l.l_quantity <= p.p_size + 2
        |GROUP BY p_size ORDER BY p_size""".stripMargin
    ) { (s, d) =>
      // Both band endpoints live on tiny integer domains (~50 values each),
      // so a direct band join would emit |part|×|lineitem|/|domain| pairs
      // (~1.2B at sf0.1). Aggregate-first instead: count each side per value
      // (one map-side-combined shuffle each), expand the ±2 band on the
      // 50-row aggregate, equi-join, multiply counts. Same result, and the
      // join is O(domain) regardless of table size — the 100 TB range-join
      // pattern: collapse to value/bucket granularity before pairing.
      //
      // PRECONDITION (integral domain): expanding the band as the integer
      // sequence [p_size-2, p_size+2] only equals the BETWEEN semantics
      // because l_quantity takes exactly integral values in this data
      // (asserted below so non-integral data fails loudly instead of
      // silently dropping fractional quantities). For a continuous
      // domain, bucket both sides with floor() and post-filter the exact
      // band.
      val lq = T.lineitem(s, d)
        .filter(when(col("l_quantity") === floor(col("l_quantity")), lit(true))
          .otherwise(raise_error(lit(
            "q23 aggregate-first band rewrite requires integral l_quantity"))))
        .groupBy(col("l_quantity").as("qv")).agg(count(lit(1)).as("nl"))
      val ps = T.part(s, d)
        .groupBy(col("p_size")).agg(count(lit(1)).as("np"))
      val band = ps
        .select(col("p_size"), col("np"),
          explode(sequence(col("p_size") - 2, col("p_size") + 2)).as("q"))
        .select(col("p_size"), col("np"), col("q").cast("double").as("qv"))
      band.join(broadcast(lq), "qv")
        .groupBy(col("p_size"))
        .agg(sum(col("np") * col("nl")).as("n"))
        .orderBy(col("p_size"))
    },

    // ---- q24: HLL approx distinct (sketch — hash-proven band gate) -----------
    // The HLL register layout is engine-specific, so the sketch VALUE has
    // no cross-engine oracle — but its ACCURACY does: the query emits the
    // exact distincts (DuckDB reproduces those) plus an in-query band
    // check (|approx-exact| ≤ 5%·exact, 5σ of rsd=0.01; deterministic —
    // HLL hashing has no seed drift). A sketch regression flips the
    // boolean and fails the driver's hash compare.
    Q(
      "q24_approx_distinct",
      """SELECT l_returnflag,
        |       CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
        |       true AS within_band
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    ) { (s, d) =>
      T.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("exact_parts"),
          countDistinct(col("l_orderkey")).as("exact_orders"),
          approx_count_distinct(col("l_partkey"), rsd = 0.01).as("ap"),
          approx_count_distinct(col("l_orderkey"), rsd = 0.01).as("ao"))
        .select(col("l_returnflag"), col("exact_parts"), col("exact_orders"),
          ((abs(col("ap") - col("exact_parts")) <= lit(0.05) * col("exact_parts")) &&
            (abs(col("ao") - col("exact_orders")) <= lit(0.05) * col("exact_orders")))
            .as("within_band"))
        .orderBy(col("l_returnflag"))
    },

    // ---- q37: approximate quantile sketch (hash-proven band gate) ------------
    // The t-digest-family counterpart to q24's HLL: approx_percentile
    // merges per-partition sketches (one map-side pass + tiny shuffle)
    // where q21's EXACT percentile must shuffle the whole column per
    // group — the only viable quantile at 100 TB. Same gate shape as q24:
    // emit the EXACT interpolated percentiles (DuckDB quantile_cont
    // reproduces them — the q21 parity precedent) plus the in-query 1%
    // relative-error band check on the sketch (deterministic: the GK
    // sketch has no randomness). A sketch regression flips the boolean
    // and fails the driver's hash compare.
    Q(
      "q37_approx_quantile",
      """SELECT l_returnflag,
        |       round(quantile_cont(l_extendedprice, 0.25), 3) AS price_p25,
        |       round(quantile_cont(l_extendedprice, 0.50), 3) AS price_p50,
        |       round(quantile_cont(l_extendedprice, 0.75), 3) AS price_p75,
        |       round(quantile_cont(l_extendedprice, 0.95), 3) AS price_p95,
        |       round(quantile_cont(l_quantity, 0.5), 3) AS qty_median,
        |       true AS within_band
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    ) { (s, d) =>
      // One sketch pass feeds all four price quantiles; the exact pass
      // rides the same shuffle (scalar projections — the driver harness
      // can't sort/hash array columns).
      val bands = (1 to 4).map(i =>
        abs(element_at(col("apq"), i) - element_at(col("epq"), i)) <=
          lit(0.01) * abs(element_at(col("epq"), i))) :+
        (abs(col("aqm") - col("eqm")) <= lit(0.01) * abs(col("eqm")))
      T.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          expr("approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.95), 10000)")
            .as("apq"),
          expr("approx_percentile(l_quantity, 0.5, 10000)").as("aqm"),
          expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.95))").as("epq"),
          expr("percentile(l_quantity, 0.5)").as("eqm"))
        .select(
          col("l_returnflag"),
          round(element_at(col("epq"), 1), 3).as("price_p25"),
          round(element_at(col("epq"), 2), 3).as("price_p50"),
          round(element_at(col("epq"), 3), 3).as("price_p75"),
          round(element_at(col("epq"), 4), 3).as("price_p95"),
          round(col("eqm"), 3).as("qty_median"),
          bands.reduce(_ && _).as("within_band"))
        .orderBy(col("l_returnflag"))
    },

    // ---- q25: global sort + limit (top-k) ------------------------------------
    Q(
      "q25_topk",
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin
    ) { (s, d) =>
      T.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(100)
    },

    // ---- q27: salted skew join ------------------------------------------------
    // l_returnflag has 3 values -> a naive repartition join puts ~1/3 of the
    // fact table on ONE reducer. Salting: replicate the dim ×16 with a salt
    // column, key the fact side by (flag, hash%16) -> even 16-way spread per
    // hot key. (With a broadcastable dim AQE avoids the issue entirely; the
    // salted form is the pattern for when BOTH sides are too big to
    // broadcast, demonstrated here oracle-checked against the plain join.)
    Q(
      "q27_salted_skew_join",
      """SELECT f.l_returnflag, count(*) AS n, sum(CAST(d.weight AS DOUBLE)) AS sum_w
        |FROM lineitem f
        |JOIN (VALUES ('A', 1.0), ('N', 2.0), ('R', 3.0)) d(flag, weight)
        |  ON f.l_returnflag = d.flag
        |GROUP BY f.l_returnflag ORDER BY f.l_returnflag""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val Salts = 16
      val dim = Seq(("A", 1.0), ("N", 2.0), ("R", 3.0)).toDF("flag", "weight")
        .withColumn("salt", explode(sequence(lit(0), lit(Salts - 1))))
      val fact = T.lineitem(s, d)
        .select(col("l_returnflag"),
          pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(Salts))
            .cast("int").as("salt"))
      fact
        .hint("shuffle_hash") // force the shuffled path the salt exists for
        .join(dim, fact("l_returnflag") === dim("flag") && fact("salt") === dim("salt"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("weight")).as("sum_w"))
        .orderBy(col("l_returnflag"))
    },

    // ---- q28: lateral explode + re-aggregate ---------------------------------
    // Unnest a per-row array (comment words) and aggregate over the exploded
    // rows — the LATERAL VIEW shape. Generate is pipelined inside the scan
    // stage (no shuffle until the final agg), so at 100 TB the explode adds
    // zero extra exchanges.
    Q(
      "q28_explode_agg",
      """SELECT w AS word, count(*) AS n, count(DISTINCT doc_id) AS n_docs
        |FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        |      FROM documents)
        |WHERE length(w) >= 6
        |GROUP BY w
        |HAVING count(*) >= 50
        |ORDER BY n DESC, word LIMIT 50""".stripMargin
    ) { (s, d) =>
      T.documents(s, d)
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
        .filter(length(col("w")) >= 6)
        .groupBy(col("w").as("word"))
        .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
        .filter(col("n") >= 50)
        .orderBy(col("n").desc, col("word"))
        .limit(50)
    },

    // ---- q29: higher-order array functions -----------------------------------
    // Per-order array built with a DETERMINISTIC order (sort_array over
    // (linenumber, qty) structs), then transform/filter/aggregate lambdas —
    // all codegen-friendly, no UDFs. DuckDB mirrors with list(... ORDER BY)
    // + list_transform/list_filter/list_sum.
    Q(
      "q29_higher_order",
      """SELECT o_orderkey,
        |       array_to_string(list_transform(qtys,
        |         q -> CAST(CAST(q AS BIGINT) AS VARCHAR)), ',') AS qtys_csv,
        |       array_to_string(list_transform(qtys,
        |         q -> CAST(CAST(q * 2 AS BIGINT) AS VARCHAR)), ',') AS doubled_csv,
        |       len(list_filter(qtys, q -> q >= 30)) AS n_big,
        |       CAST(list_sum(qtys) AS DOUBLE) AS total_qty
        |FROM (
        |  SELECT l_orderkey AS o_orderkey,
        |         list(l_quantity ORDER BY l_linenumber, l_quantity) AS qtys
        |  FROM lineitem GROUP BY l_orderkey)
        |WHERE len(qtys) >= 6
        |ORDER BY o_orderkey LIMIT 1000""".stripMargin
    ) { (s, d) =>
      // Driver-facing columns must be scalar (the harness' pandas sort can't
      // hash arrays), so the per-order quantity lists are emitted as CSV via
      // a lossless double->BIGINT->string element cast (quantities are
      // integral 1..50) — same higher-order lambdas, portable rendering.
      T.lineitem(s, d)
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(expr(
          "transform(sort_array(collect_list(struct(l_linenumber, l_quantity))), x -> x.l_quantity)")
          .as("qtys"))
        .filter(size(col("qtys")) >= 6)
        .select(
          col("o_orderkey"),
          expr("array_join(transform(qtys, q -> CAST(CAST(q AS BIGINT) AS STRING)), ',')")
            .as("qtys_csv"),
          expr("array_join(transform(qtys, q -> CAST(CAST(q * 2 AS BIGINT) AS STRING)), ',')")
            .as("doubled_csv"),
          expr("size(filter(qtys, q -> q >= 30))").cast("long").as("n_big"),
          expr("aggregate(qtys, 0.0D, (acc, q) -> acc + q)").as("total_qty"))
        .orderBy(col("o_orderkey"))
        .limit(1000)
    },

    // ---- q30: full analytic-window battery -----------------------------------
    // lead/lag/dense_rank/ntile/first/last over one partition spec: one
    // hash-partition exchange + one sort feeds EVERY window function
    // (single Window node — the planner shares the partitioning).
    Q(
      "q30_window_battery",
      """SELECT c_custkey, o_orderkey,
        |       lag(o_totalprice) OVER w AS prev_price,
        |       lead(o_totalprice) OVER w AS next_price,
        |       dense_rank() OVER w AS dr,
        |       ntile(4) OVER w AS quartile,
        |       first_value(o_orderkey) OVER w AS first_ok,
        |       o_totalprice - max(o_totalprice) OVER
        |         (PARTITION BY c_custkey) AS delta_max
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_custkey % 10 = 0
        |WINDOW w AS (PARTITION BY c_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY c_custkey, o_orderkey""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("c_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wAll = Window.partitionBy(col("c_custkey"))
      T.orders(s, d)
        .join(T.customer(s, d), col("o_custkey") === col("c_custkey"))
        .filter(col("c_custkey") % 10 === 0)
        .select(
          col("c_custkey"), col("o_orderkey"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          dense_rank().over(w).cast("long").as("dr"),
          ntile(4).over(w).cast("long").as("quartile"),
          first(col("o_orderkey")).over(w).as("first_ok"),
          (col("o_totalprice") - max(col("o_totalprice")).over(wAll))
            .as("delta_max"))
        .orderBy(col("c_custkey"), col("o_orderkey"))
    },

    // ---- q31: unpivot (melt) + re-aggregate ---------------------------------
    // Wide-to-long reshape: three measure columns melt to (measure, value)
    // rows — Spark's native Unpivot node (Generate-free, pipelined in the
    // scan stage), then a 3-group aggregate. Decimal-exact sums for
    // engine parity (double addition is order-dependent).
    Q(
      "q31_unpivot",
      """SELECT measure, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM (
        |  SELECT 'l_quantity' AS measure, l_quantity AS value FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem)
        |GROUP BY measure ORDER BY measure""".stripMargin
    ) { (s, d) =>
      T.lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
          col("l_discount"))
        .unpivot(
          Array(col("l_orderkey")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "measure", "value")
        .groupBy(col("measure"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
        .orderBy(col("measure"))
    },

    // ---- q32: explicit GROUPING SETS ----------------------------------------
    // Arbitrary grouping-set lattice — ((rf,ls),(ls),()) is neither a
    // rollup nor a cube (it drops the FIRST key before the second), so it
    // exercises Spark's native Expand-based grouping-sets path. One scan,
    // one Expand (3× row multiplication only into the aggregate), one
    // shuffle — same cost shape as rollup at any scale.
    Q(
      "q32_grouping_sets",
      """SELECT coalesce(l_returnflag, 'ALL') AS rflag,
        |       coalesce(l_linestatus, 'ALL') AS lstatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
        |ORDER BY rflag, lstatus""".stripMargin
    ) { (s, d) =>
      T.lineitem(s, d)
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
          col("sum_qty"), col("n"))
        .orderBy(col("rflag"), col("lstatus"))
    },

    // ---- q33: native PIVOT --------------------------------------------------
    // RelationalGroupedDataset.pivot with EXPLICIT values (the implicit
    // form runs a distinct-scan job first — at 100 TB always enumerate):
    // plans ONE two-phase pivot aggregate, no per-value scans (vs q17's
    // manual CASE battery). DuckDB oracle via FILTER clauses.
    Q(
      "q33_pivot",
      """SELECT l_returnflag,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_F,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS qty_O,
        |       count(*) FILTER (WHERE l_linestatus = 'F') AS n_F,
        |       count(*) FILTER (WHERE l_linestatus = 'O') AS n_O
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    ) { (s, d) =>
      val p = T.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("qty"), count(lit(1)).as("n"))
      p.select(col("l_returnflag"),
          col("F_qty").as("qty_F"), col("O_qty").as("qty_O"),
          coalesce(col("F_n"), lit(0L)).as("n_F"),
          coalesce(col("O_n"), lit(0L)).as("n_O"))
        .orderBy(col("l_returnflag"))
    },

    // ---- q34: LATERAL correlated join ---------------------------------------
    // LATERAL subquery: per customer, the 2 most recent orders — the
    // decorrelator rewrites this into the same window/top-k shape as
    // q10 (no nested-loop re-execution per row). Tie-break on o_orderkey
    // for full determinism.
    Q(
      "q34_lateral",
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer c,
        |     LATERAL (SELECT o_orderkey, o_totalprice
        |              FROM orders
        |              WHERE o_custkey = c.c_custkey
        |              ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 2) o
        |WHERE c.c_custkey <= 200
        |ORDER BY c.c_custkey, o.o_orderkey""".stripMargin
    ) { (s, d) =>
      T.customer(s, d).createOrReplaceTempView("q34_customer")
      T.orders(s, d).createOrReplaceTempView("q34_orders")
      s.sql(
        """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
          |FROM q34_customer c,
          |     LATERAL (SELECT o_orderkey, o_totalprice
          |              FROM q34_orders
          |              WHERE o_custkey = c.c_custkey
          |              ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 2) o
          |WHERE c.c_custkey <= 200
          |ORDER BY c.c_custkey, o.o_orderkey""".stripMargin)
    },

    // ---- q35: time-interval RANGE window frames -----------------------------
    // RANGE BETWEEN INTERVAL ... PRECEDING: the frame is defined by the
    // ORDER-BY VALUE (event time), not row position — peers (equal ts)
    // share one frame, so the result is deterministic under any tie
    // order. One hash exchange on event_type + one sort; the sliding
    // frame itself is O(rows) streaming state per partition.
    Q(
      "q35_range_frame",
      """SELECT event_id, event_type,
        |       count(*) OVER w AS n_1h,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h
        |FROM events WHERE user_id < 100
        |WINDOW w AS (PARTITION BY event_type ORDER BY ts
        |             RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin
    ) { (s, d) =>
      T.events(s, d).filter(col("user_id") < 100)
        .createOrReplaceTempView("q35_events")
      s.sql(
        """SELECT event_id, event_type,
          |       count(*) OVER w AS n_1h,
          |       CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h
          |FROM q35_events
          |WINDOW w AS (PARTITION BY event_type ORDER BY ts
          |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
          |ORDER BY event_id""".stripMargin)
    },

    // ---- q36: semi-structured JSON extraction -------------------------------
    // get_json_object over the events props column (JSON path, codegen'd
    // Jackson walk — row-local, pipelined in the scan stage; the
    // aggregate is the only shuffle).
    Q(
      "q36_json",
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
        |       count(DISTINCT CAST(props->>'k' AS BIGINT)) AS nk
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
    ) { (s, d) =>
      T.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          countDistinct(col("k")).as("nk"))
        .orderBy(col("event_type"))
    },

    // ---- q38: ordered conversion funnel -------------------------------------
    // Sequential-event analytics (view -> click -> purchase, each stage
    // strictly AFTER the previous stage's FIRST occurrence and within
    // 24 h of it — the conversion-window form): three
    // conditional min-aggregations, every one keyed on user_id — the
    // per-stage join-backs reuse one hash partitioning, so at 100 TB the
    // funnel costs one shuffle of the events table plus per-user-sized
    // joins (150 rows here; |users| rows at scale, never |events|²).
    // Purely timestamp/count arithmetic -> bit-exact cross-engine.
    Q(
      "q38_funnel",
      """WITH v AS (
        |  SELECT user_id, min(ts) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS t_click
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.t_view
        |    AND e.ts <= v.t_view + INTERVAL 24 HOUR
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS t_purchase
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        |    AND e.ts <= c.t_click + INTERVAL 24 HOUR
        |  GROUP BY e.user_id),
        |u AS (SELECT DISTINCT user_id FROM events)
        |SELECT CASE WHEN p.user_id IS NOT NULL THEN 3
        |            WHEN c.user_id IS NOT NULL THEN 2
        |            WHEN v.user_id IS NOT NULL THEN 1
        |            ELSE 0 END AS funnel_depth,
        |       CAST(count(*) AS BIGINT) AS n_users
        |FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
        |       LEFT JOIN p USING (user_id)
        |GROUP BY 1 ORDER BY funnel_depth""".stripMargin
    ) { (s, d) =>
      val ev = T.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id")
        .filter(col("ts") > col("t_view") &&
          col("ts") <= col("t_view") + expr("INTERVAL 24 HOUR"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id")
        .filter(col("ts") > col("t_click") &&
          col("ts") <= col("t_click") + expr("INTERVAL 24 HOUR"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
      ev.select(col("user_id")).distinct()
        .join(v.select(col("user_id"), lit(1).as("hv")), Seq("user_id"), "left")
        .join(c.select(col("user_id"), lit(1).as("hc")), Seq("user_id"), "left")
        .join(p.select(col("user_id"), lit(1).as("hp")), Seq("user_id"), "left")
        .select(
          when(col("hp").isNotNull, 3)
            .when(col("hc").isNotNull, 2)
            .when(col("hv").isNotNull, 1)
            .otherwise(0).as("funnel_depth"))
        .groupBy(col("funnel_depth"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("funnel_depth"))
    },

    // ---- q26: stratified sample -------------------------------------------
    // Per-stratum Bernoulli sampling with a DETERMINISTIC hash coin
    // (md5 of the row key -> uniform [0,1)) instead of engine RNG: one
    // scan, no shuffle, and the sample is reproducible across engines,
    // retries and cluster sizes — what a production pipeline wants from
    // sampling at 100 TB (re-running a stage must not re-draw the
    // sample). Fully oracle-checked since md5 is engine-portable.
    Q(
      "q26_strat_sample",
      """SELECT l_returnflag, count(*) AS n_sampled FROM (
        |  SELECT l_returnflag,
        |    CAST(('0x' || substring(md5(l_orderkey || '|' || l_linenumber || '|' ||
        |      l_partkey || '|' || l_suppkey), 1, 8)) AS BIGINT) / 4294967296.0 AS coin
        |  FROM lineitem)
        |WHERE coin < CASE l_returnflag WHEN 'A' THEN 0.1 WHEN 'N' THEN 0.02
        |                               WHEN 'R' THEN 0.1 ELSE 0 END
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    ) { (s, d) =>
      val key = concat_ws("|",
        col("l_orderkey").cast("string"), col("l_linenumber").cast("string"),
        col("l_partkey").cast("string"), col("l_suppkey").cast("string"))
      val coin = conv(substring(md5(key), 1, 8), 16, 10)
        .cast("bigint").cast("double") / 4294967296.0
      val frac = when(col("l_returnflag") === "A", 0.1)
        .when(col("l_returnflag") === "N", 0.02)
        .when(col("l_returnflag") === "R", 0.1)
        .otherwise(0.0)
      T.lineitem(s, d)
        .filter(coin < frac)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_sampled"))
        .orderBy(col("l_returnflag"))
    },

    // ---- q39: cohort retention matrix -------------------------------------
    // Cohort = week of a user's first purchase; cell (cohort_week, k) =
    // distinct users of that cohort active in week k after joining. Plan:
    // one user-keyed aggregation builds the |users|-row cohort table, one
    // user-keyed join tags every event with its cohort (AQE broadcasts the
    // skinny cohort side while it is small; at 100 TB it is a co-keyed
    // shuffle join on user_id — the events table never self-joins), then
    // one (cohort, offset)-keyed distinct-count. Week arithmetic is done
    // on week-truncated timestamps so datediff/7 is exact in both engines.
    Q(
      "q39_retention",
      """WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        |           FROM events WHERE event_type = 'purchase' GROUP BY user_id)
        |SELECT CAST(f.cohort_week AS DATE) AS cohort_week,
        |       CAST(date_diff('week', f.cohort_week, date_trunc('week', e.ts)) AS BIGINT) AS week_offset,
        |       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
        |FROM events e JOIN f ON e.user_id = f.user_id
        |WHERE e.ts >= f.cohort_week
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    ) { (s, d) =>
      val ev = T.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
      val cohorts = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
      ev.join(cohorts, "user_id")
        .filter(col("ts") >= col("cohort_week"))
        .select(col("cohort_week"),
          floor(datediff(date_trunc("week", col("ts")), col("cohort_week")) / 7)
            .cast("long").as("week_offset"),
          col("user_id"))
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .select(col("cohort_week").cast("date").as("cohort_week"),
          col("week_offset"), col("n_active"))
        .orderBy(col("cohort_week"), col("week_offset"))
    },

    // ---- q40: recursive CTE (hierarchy walk) ------------------------------
    // Spark 4.1's native WITH RECURSIVE (UnionLoop): walk a synthetic
    // part hierarchy (parent key = key/10, roots are keys < 10) from the
    // roots down, carrying root id and depth, then aggregate per level.
    // Each recursion step is one keyed join of the frontier against the
    // part table — frontier-sized, never |part|² — and Catalyst plans the
    // loop itself, so the step join gets the same pushdown/broadcast
    // treatment as any other join. Depth is data-bounded (log10 of the
    // key space); `spark.sql.cteRecursionLevelLimit` guards runaways.
    // DuckDB runs the identical recursion (`//` = Spark's DIV).
    Q(
      "q40_recursive",
      """WITH RECURSIVE h AS (
        |  SELECT p_partkey AS part_key, p_partkey AS root_key, 0 AS depth
        |  FROM part WHERE p_partkey < 10
        |  UNION ALL
        |  SELECT p.p_partkey AS part_key, h.root_key, h.depth + 1 AS depth
        |  FROM part p JOIN h ON p.p_partkey // 10 = h.part_key
        |  WHERE p.p_partkey >= 10)
        |SELECT CAST(depth AS BIGINT) AS depth,
        |       CAST(count(*) AS BIGINT) AS n_parts,
        |       CAST(count(DISTINCT root_key) AS BIGINT) AS n_roots,
        |       CAST(sum(part_key) AS BIGINT) AS sum_keys
        |FROM h GROUP BY depth ORDER BY depth""".stripMargin
    ) { (s, d) =>
      T.part(s, d).createOrReplaceTempView("q40_part")
      s.sql(
        """WITH RECURSIVE h AS (
          |  SELECT p_partkey AS part_key, p_partkey AS root_key, 0 AS depth
          |  FROM q40_part WHERE p_partkey < 10
          |  UNION ALL
          |  SELECT p.p_partkey AS part_key, h.root_key, h.depth + 1 AS depth
          |  FROM q40_part p JOIN h ON p.p_partkey DIV 10 = h.part_key
          |  WHERE p.p_partkey >= 10)
          |SELECT CAST(depth AS BIGINT) AS depth,
          |       CAST(count(*) AS BIGINT) AS n_parts,
          |       CAST(count(DISTINCT root_key) AS BIGINT) AS n_roots,
          |       CAST(sum(part_key) AS BIGINT) AS sum_keys
          |FROM h GROUP BY depth ORDER BY depth""".stripMargin)
    },

    // ---- q41: statistical aggregates from exact moments -------------------
    // corr / covar / stddev / regression per group, computed NOT with the
    // engines' one-pass float kernels (whose partial-aggregation order
    // differs run to run and engine to engine) but from EXACT decimal
    // moment sums (n, Σx, Σy, Σx², Σy², Σxy) — order-independent by
    // construction, so the same closed-form double arithmetic on top is
    // bit-identical in Spark and DuckDB. Column choice is deliberate:
    // qty ≤ 50, discount ≤ 0.1 keep every scaled moment integer below
    // 2^53, so even DuckDB's two-step decimal→double cast (int128 to
    // double, then /10^scale) is exact — no 1-ulp divergence from
    // Spark's single correctly-rounded BigDecimal cast. This is also the
    // 100 TB shape: one map-side-combined aggregate producing six
    // numbers per group, no second pass, no collect.
    Q(
      "q41_stats_moments",
      """WITH m AS (
        |  SELECT l_returnflag,
        |         CAST(count(*) AS DOUBLE) AS n,
        |         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |         CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |         CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |         CAST(sum(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS syy,
        |         CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |       CAST(n AS BIGINT) AS n,
        |       (n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS corr_qty_disc,
        |       (n * sxy - sx * sy) / (n * (n - 1)) AS covar_qty_disc,
        |       sqrt((n * sxx - sx * sx) / (n * (n - 1))) AS sd_qty,
        |       sqrt((n * syy - sy * sy) / (n * (n - 1))) AS sd_disc,
        |       (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope_disc_on_qty,
        |       (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS icept_disc_on_qty
        |FROM m ORDER BY l_returnflag""".stripMargin
    ) { (s, d) =>
      val x = dec2(col("l_quantity"))
      val y = dec2(col("l_discount"))
      val m = T.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).cast(DoubleType).as("n"),
          sum(x).cast(DoubleType).as("sx"),
          sum(y).cast(DoubleType).as("sy"),
          sum(x * x).cast(DoubleType).as("sxx"),
          sum(y * y).cast(DoubleType).as("syy"),
          sum(x * y).cast(DoubleType).as("sxy"))
      val n = col("n"); val sx = col("sx"); val sy = col("sy")
      val sxx = col("sxx"); val syy = col("syy"); val sxy = col("sxy")
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      m.select(
        col("l_returnflag"),
        n.cast("long").as("n"),
        ((n * sxy - sx * sy) /
          sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))).as("corr_qty_disc"),
        ((n * sxy - sx * sy) / (n * (n - lit(1)))).as("covar_qty_disc"),
        sqrt((n * sxx - sx * sx) / (n * (n - lit(1)))).as("sd_qty"),
        sqrt((n * syy - sy * sy) / (n * (n - lit(1)))).as("sd_disc"),
        slope.as("slope_disc_on_qty"),
        ((sy - slope * sx) / n).as("icept_disc_on_qty"))
        .orderBy(col("l_returnflag"))
    }
  )
}
