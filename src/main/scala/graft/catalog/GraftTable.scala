package graft.catalog

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession, SQLContext}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{BaseRelation, InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.versioned.{GraftRepo, Snapshot, TableOps}

/** A graft versioned table surfaced through DataSource V2.
  *
  * Reads go through the V1Scan bridge: the scan prunes snapshot files by
  * min/max stats, then delegates the actual parquet decode to Spark's
  * built-in columnar parquet source (so WholeStageCodegen, vectorized
  * decode and parquet-level predicate pushdown all still apply inside the
  * relation). Writes are immutable-file appends + an optimistic snapshot
  * commit; DELETE is stats-pruned copy-on-write (TableOps).
  *
  * `branch = None` marks a time-travel read (VERSION AS OF) — reads work,
  * mutations are rejected, mirroring reading a detached ref.
  */
final class GraftTable(
    repo: GraftRepo,
    branch: Option[String],
    key: String, // "db/table"
    snap: Snapshot,
    ident: Identifier) extends Table
    with SupportsRead with SupportsWrite with SupportsDelete {

  private val tableSchema =
    org.apache.spark.sql.types.DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]

  override def name(): String = ident.toString
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def properties(): JMap[String, String] =
    Map("provider" -> "graft", "snapshot" -> snap.id).asJava

  private def requireBranch: String = branch.getOrElse(
    throw new UnsupportedOperationException(
      s"$key: cannot write to a time-travel (VERSION AS OF) reference"))

  // ---- read ------------------------------------------------------------

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(repo, snap, tableSchema)

  // ---- write (INSERT INTO / INSERT OVERWRITE / CTAS / df.writeTo) ------

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwriteIgnored: Boolean): Unit =
              TableOps.insert(data.sparkSession, repo, requireBranch, key, data, overwrite)
          }
      }
    }

  // ---- DELETE FROM ... WHERE -------------------------------------------

  override def canDeleteWhere(filters: Array[sources.Filter]): Boolean =
    branch.isDefined && filters.forall(f => TableOps.filterToColumn(f).isDefined)

  override def deleteWhere(filters: Array[sources.Filter]): Unit =
    TableOps.deleteWhere(SparkSession.active, repo, requireBranch, key,
      filters.toIndexedSeq)
}

/** Filter + column pushdown for graft scans. Pushed filters drive
  * file-level stats pruning AND are applied inside the delegated parquet
  * read (where parquet row-group pruning applies again); Spark still
  * re-applies them above the scan (returned as residual) — double
  * evaluation of cheap predicates in exchange for guaranteed correctness
  * on edge semantics.
  */
final class GraftScanBuilder(repo: GraftRepo, snap: Snapshot, fullSchema: StructType)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[sources.Filter] = Array.empty
  private var required: StructType = fullSchema

  override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
    pushed = filters.filter(f => TableOps.filterToColumn(f).isDefined)
    filters // all residual: Spark re-applies above the scan
  }
  override def pushedFilters(): Array[sources.Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new V1Scan {
    override def readSchema(): StructType = required

    override def toV1TableScan[T <: BaseRelation with TableScan](context: SQLContext): T =
      new BaseRelation with TableScan {
        override def sqlContext: SQLContext = context
        override def schema: StructType = required
        override def buildScan(): RDD[Row] = {
          val spark = context.sparkSession
          var df = TableOps.readSnapshot(spark, repo, snap, pushed.toIndexedSeq)
          pushed.flatMap(TableOps.filterToColumn).foreach(c => df = df.filter(c))
          val projected =
            if (required.fieldNames.sameElements(fullSchema.fieldNames)) df
            else if (required.isEmpty) df.select()
            else df.select(required.fieldNames.toIndexedSeq.map(col): _*)
          projected.rdd
        }
      }.asInstanceOf[T]
  }
}
