package org.apache.spark.sql.graftbridge

import scala.collection.immutable.ArraySeq

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.execution.datasources.InMemoryFileIndex
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Bridge to Spark's native DSv2 parquet scan (`private[sql]` surface).
  *
  * The graft catalog resolves WHICH immutable files a snapshot read
  * covers (branch/tag/time-travel resolution + min/max stats pruning);
  * everything below that — vectorized columnar decode, parquet
  * row-group/page pruning from the pushed filters, WholeStageCodegen —
  * is delegated to `ParquetScan`, the exact runtime Spark's own parquet
  * source uses. This replaces a V1Scan `.rdd` bridge that deserialized
  * every row to external `Row`s at the scan boundary (a constant-factor
  * tax on every versioned-table scan; at 100 TB the catalog's hot path).
  */
object ParquetReadBridge {

  /** A columnar, codegen-friendly Scan over an explicit parquet file
    * list. `dataSchema` is the table (snapshot) schema; `readSchema` the
    * pruned projection; `pushed` v1 filters forwarded into the parquet
    * reader for row-group pruning (Spark re-applies them above the scan).
    */
  def scan(
      spark: SparkSession,
      paths: Seq[Path],
      dataSchema: StructType,
      readSchema: StructType,
      pushed: Array[Filter]): Scan = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // empty partition spec pinned: graft encodes partition values in
    // `__p_<field>=<v>` directories purely for ITS OWN pruning metadata —
    // the data columns live inside the files, so directory inference must
    // never resurface them as extra columns
    val index = new InMemoryFileIndex(
      classic, paths, Map.empty[String, String], Some(dataSchema),
      userSpecifiedPartitionSpec =
        Some(org.apache.spark.sql.execution.datasources.PartitionSpec.emptySpec))
    val hadoopConf =
      classic.sessionState.newHadoopConfWithOptions(Map.empty[String, String])
    ParquetScan(
      classic,
      hadoopConf,
      index,
      dataSchema,
      readSchema,
      StructType(Nil), // no directory-derived partition columns
      pushed,
      CaseInsensitiveStringMap.empty(),
      None, // no pushed aggregate
      Seq.empty,
      Seq.empty,
      Array.empty)
  }
}
