package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Runs a view's stored SQL under the view's stored resolution context
  * (current catalog + namespace) in an ISOLATED `cloneSession()`, never
  * touching the caller's CatalogManager: on a SparkSession shared by
  * concurrent threads (Thrift server, notebook with parallel cells) a
  * swap-analyze-restore on the shared manager would leak the view's
  * context into concurrently-analyzing queries and clobber a concurrent
  * `USE` — Spark's own view resolution confines the context to a
  * thread-local `AnalysisContext` for the same reason. The clone shares
  * the SparkContext, SharedState and session extensions (so graft's
  * resolution rules apply recursively inside it, and view-references-
  * view keeps working) but owns its session state; the copy is the
  * per-view-reference cost, paid once at analysis time.
  *
  * CatalogManager is private[sql]; this is the same minimal bridge
  * pattern as the read bridges in this package.
  */
object ViewContextBridge {
  def sqlWith(spark: SparkSession, catalog: String,
      namespace: Array[String], sqlText: String): DataFrame = {
    // cloneSession lives on the classic implementation in Spark 4
    val sub = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .cloneSession()
    val cm = sub.sessionState.catalogManager
    cm.setCurrentCatalog(catalog)
    cm.setCurrentNamespace(namespace)
    sub.sql(sqlText)
  }

  /** [[sqlWith]], but the returned DataFrame is BOUND TO THE CALLER'S
    * session: the clone only hosts the analysis; the resolved plan is
    * re-wrapped on `spark` so `createOrReplaceTempView`, conf reads and
    * every other session-coupled operation target the session the
    * caller actually holds (the clone would silently swallow them).
    */
  def sqlWithOn(spark: SparkSession, catalog: String,
      namespace: Array[String], sqlText: String): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      sqlWith(spark, catalog, namespace, sqlText).queryExecution.analyzed)
}
