package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join, the operator family Spark SQL lacks natively.
  *
  * Semantics: for each left row, attach the payload of the latest right row
  * with the same key and `rightTime <= leftTime` (backward as-of, inclusive —
  * matches DuckDB's `ASOF JOIN ... ON l.t >= r.t`).
  *
  * Scale design: instead of the naive `join + filter + row_number` (which
  * explodes to |L|×|R| per key before pruning), we union both sides into one
  * relation, shuffle ONCE on the key, sort each partition by (time, side) and
  * sweep with a `last(_, ignoreNulls)` running window. Cost is a single
  * hash-partitioned sort — the same plan shape a dedicated merge-based as-of
  * operator would produce, expressed declaratively so Catalyst/AQE still
  * handle skew and partition sizing. At 100 TB this is one shuffle of
  * |L|+|R| rows; no broadcast, no explosion.
  */
object AsOfJoin {

  /** Backward as-of join; right rows sort before left rows at equal
    * timestamps, so an exactly-simultaneous right row IS matched.
    *
    * @param payload   right columns to attach (must not collide with left names)
    * @param tolerance optional max allowed left−right time gap (same unit
    *                  as a `ts1 - ts2` subtraction of the time columns,
    *                  e.g. an INTERVAL for timestamps) — pandas
    *                  merge_asof-style bound: matches older than the
    *                  tolerance are dropped (null payload / filtered)
    */
  def asOfBackward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      inner: Boolean = true,
      tolerance: Option[Column] = None): DataFrame = {
    val lCols = left.columns.toSeq
    val lTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap
    val rTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap
    require(payload.forall(right.columns.contains), "payload must be right columns")
    require(payload.intersect(lCols).isEmpty, "payload/left name collision")

    val keyType = lTypes(leftKey)
    val lPart = left.select(
      Seq(
        col(leftKey).cast(keyType).as("__k"),
        col(leftTime).as("__t"),
        lit(1).as("__side")) ++
        lCols.map(col) ++
        payload.map(c => lit(null).cast(rTypes(c)).as(c)): _*)
    val rPart = right.select(
      Seq(
        col(rightKey).cast(keyType).as("__k"),
        col(rightTime).as("__t"),
        lit(0).as("__side")) ++
        lCols.map(c => lit(null).cast(lTypes(c)).as(c)) ++
        payload.map(col): _*)

    val w = Window
      .partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // ONE struct of all payload columns, gated on the right side: the
    // payload moves atomically per right row (independent per-column
    // sweeps would mix columns across right rows whenever a matching row
    // carries a NULL payload value), and match-ness is carried by __mt —
    // so inner joins keep matched rows even when their payload is NULL
    // (DuckDB ASOF semantics for nullable payloads).
    val matchTime = last(when(col("__side") === 0, col("__t")), ignoreNulls = true)
      .over(w).as("__mt")
    val pStruct = last(when(col("__side") === 0, struct(payload.map(col): _*)),
      ignoreNulls = true).over(w).as("__p")
    val swept0 = lPart
      .unionByName(rPart)
      .select(Seq(col("__side"), col("__t"), matchTime, pStruct) ++
        lCols.map(col): _*)
      .filter(col("__side") === 1)
    val matched = tolerance match {
      case Some(tol) => // void matches older than the tolerance
        col("__mt").isNotNull && !((col("__t") - col("__mt")) > tol)
      case None => col("__mt").isNotNull
    }
    val swept = swept0.select(
      Seq(matched.as("__matched")) ++ lCols.map(col) ++
        payload.map(c => when(matched, col("__p").getField(c)).as(c)): _*)
    val out = if (inner) swept.filter(col("__matched")) else swept
    out.select(lCols.map(col) ++ payload.map(col): _*)
  }

  /** Forward as-of join: attach the EARLIEST right row with the same key
    * and `rightTime >= leftTime` (matches DuckDB `ASOF JOIN … ON l.t <=
    * r.t`). Same single-shuffle union-sweep, run in descending time.
    */
  def asOfForward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      inner: Boolean = true,
      tolerance: Option[Column] = None): DataFrame = {
    val lCols = left.columns.toSeq
    val lTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap
    val rTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap
    require(payload.forall(right.columns.contains), "payload must be right columns")
    require(payload.intersect(lCols).isEmpty, "payload/left name collision")
    val keyType = lTypes(leftKey)
    val lPart = left.select(
      Seq(col(leftKey).cast(keyType).as("__k"), col(leftTime).as("__t"),
        lit(1).as("__side")) ++
        lCols.map(col) ++
        payload.map(c => lit(null).cast(rTypes(c)).as(c)): _*)
    val rPart = right.select(
      Seq(col(rightKey).cast(keyType).as("__k"), col(rightTime).as("__t"),
        lit(0).as("__side")) ++
        lCols.map(c => lit(null).cast(lTypes(c)).as(c)) ++
        payload.map(col): _*)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").desc, col("__side")) // desc time: sweep from future
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // same atomic struct sweep as the backward direction (see above)
    val matchTime = last(when(col("__side") === 0, col("__t")), ignoreNulls = true)
      .over(w).as("__mt")
    val pStruct = last(when(col("__side") === 0, struct(payload.map(col): _*)),
      ignoreNulls = true).over(w).as("__p")
    val swept0 = lPart
      .unionByName(rPart)
      .select(Seq(col("__side"), col("__t"), matchTime, pStruct) ++
        lCols.map(col): _*)
      .filter(col("__side") === 1)
    val matched = tolerance match {
      case Some(tol) =>
        col("__mt").isNotNull && !((col("__mt") - col("__t")) > tol)
      case None => col("__mt").isNotNull
    }
    val swept = swept0.select(
      Seq(matched.as("__matched")) ++ lCols.map(col) ++
        payload.map(c => when(matched, col("__p").getField(c)).as(c)): _*)
    val out = if (inner) swept.filter(col("__matched")) else swept
    out.select(lCols.map(col) ++ payload.map(col): _*)
  }
}
