package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession

/** Runs `body` with the session's current catalog + namespace swapped to
  * a view's stored resolution context, restoring the caller's context
  * after. CatalogManager is private[sql]; this is the same minimal
  * bridge pattern as the read bridges in this package.
  */
object ViewContextBridge {
  def withContext[T](spark: SparkSession, catalog: String,
      namespace: Array[String])(body: => T): T = {
    val cm = spark.sessionState.catalogManager
    val prevCat = cm.currentCatalog.name()
    val prevNs = cm.currentNamespace
    try {
      cm.setCurrentCatalog(catalog)
      cm.setCurrentNamespace(namespace)
      body
    } finally {
      cm.setCurrentCatalog(prevCat)
      cm.setCurrentNamespace(prevNs)
    }
  }
}
