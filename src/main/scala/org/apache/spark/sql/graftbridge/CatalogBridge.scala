package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.CatalogPlugin

/** Session-catalog registry access for analyzer rules (CatalogManager is
  * private[sql]; same minimal bridge pattern as the read bridges here).
  */
object CatalogBridge {
  /** The session's plugin registered under `name`, if any — the LIVE
    * instance (with its initialize-time options), not a re-instantiation.
    */
  def catalog(spark: SparkSession, name: String): Option[CatalogPlugin] = {
    val cm = spark.sessionState.catalogManager
    if (!cm.isCatalogRegistered(name)) None else Some(cm.catalog(name))
  }

  def isCatalogRegistered(spark: SparkSession, name: String): Boolean =
    spark.sessionState.catalogManager.isCatalogRegistered(name)

  def currentCatalogName(spark: SparkSession): String =
    spark.sessionState.catalogManager.currentCatalog.name()

  def currentNamespace(spark: SparkSession): Array[String] =
    spark.sessionState.catalogManager.currentNamespace
}
