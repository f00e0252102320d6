package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession

/** Clone a session and apply conf overrides to the CLONE only — for
  * code that must run under a temporary conf (a forced model-size
  * clamp, a pinned writer option) without mutating the shared session a
  * concurrent thread may be reading. The clone shares the SparkContext,
  * SharedState and extensions but owns its session state (same
  * isolation contract as [[ViewContextBridge]]).
  *
  * `cloneSession` is private[sql]; this is the same minimal bridge
  * pattern as the other bridges in this package.
  */
object SessionCloneBridge {
  def withConf(spark: SparkSession, overrides: Map[String, String])
      : SparkSession = {
    val sub = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .cloneSession()
    overrides.foreach { case (k, v) => sub.conf.set(k, v) }
    sub
  }
}
