package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Bridge to Spark's native DSv2 parquet BatchWrite (`private[sql]`
  * surface): a throwaway ParquetTable aimed at a staging directory
  * provides the distributed writer (task commit protocol, codegen'd
  * parquet encoding) that graft's copy-on-write row-level operations
  * stream their replacement rows through.
  */
object ParquetWriteBridge {

  def writeBuilder(
      spark: SparkSession,
      path: String,
      schema: StructType,
      info: LogicalWriteInfo): WriteBuilder = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // a cloned session pins MICROS timestamps for the staged files: the
    // CoW stats pass reads FOOTERS now, and INT96 chunks (the session
    // default) carry no statistics — a rewrite would silently drop
    // timestamp min/max from every file it touches
    val writeSession = classic.cloneSession()
    writeSession.conf.set("spark.sql.parquet.outputTimestampType",
      "TIMESTAMP_MICROS")
    val table = new ParquetTable(
      "graft-cow-staging",
      writeSession,
      CaseInsensitiveStringMap.empty(),
      Seq(path),
      Some(schema),
      classOf[ParquetFileFormat])
    val inner = table.newWriteBuilder(info)
    // FileWrite.toBatch snapshots SQLConf from SparkSession.ACTIVE (not
    // the table's session — verified against FileWrite bytecode), so
    // the cloned session's pin must be active exactly while the write
    // job description (and its serialized Hadoop conf) is created.
    // Without this the pin silently does nothing and staged files land
    // as INT96 — zero timestamp footer stats.
    new WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write = {
        val w = inner.build()
        new org.apache.spark.sql.connector.write.Write {
          private def withActive[A](f: => A): A = {
            val prev = SparkSession.getActiveSession
            try { SparkSession.setActiveSession(writeSession); f }
            finally prev.foreach(SparkSession.setActiveSession)
          }
          override def description(): String = w.description()
          override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
            withActive(w.toBatch)
          // same ACTIVE-session exposure as toBatch — pin there too, so a
          // future streaming use of the bridge keeps MICROS stats
          override def toStreaming
              : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
            withActive(w.toStreaming)
          // pass metric surfaces through — the interface defaults would
          // silently drop the parquet write's metrics for CoW writes
          override def supportedCustomMetrics()
              : Array[org.apache.spark.sql.connector.metric.CustomMetric] =
            w.supportedCustomMetrics()
          override def reportDriverMetrics()
              : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
            w.reportDriverMetrics()
        }
      }
    }
  }

  /** Rebind a DataFrame to a CLONED session pinned to MICROS parquet
    * timestamps. The per-session pin replaces mutate-then-restore of the
    * SHARED session conf (TableOps.writeFiles's old pattern), which
    * raced under concurrent writes on one session — a thread could
    * capture another's override as "previous" and leak the setting, or
    * write INT96 and silently lose timestamp footer stats.
    */
  def withMicrosTimestamps(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val writeSession = ds.sparkSession.cloneSession()
    writeSession.conf.set("spark.sql.parquet.outputTimestampType",
      "TIMESTAMP_MICROS")
    org.apache.spark.sql.classic.Dataset.ofRows(writeSession,
      ds.queryExecution.analyzed)
  }
}
