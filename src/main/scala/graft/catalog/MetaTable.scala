package graft.catalog

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, V1Scan}
import org.apache.spark.sql.sources.{BaseRelation, TableScan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.versioned.GraftRepo

/** Read-only metadata tables over a graft table, addressed
  * `catalog.repo.branch.db.table.<kind>` (the Iceberg metadata-table
  * idiom):
  *
  *  - `files`      current snapshot's data files + row counts
  *  - `snapshots`  every snapshot of this table reachable from the branch
  *  - `history`    branch commits that changed this table
  *  - `partitions` per-partition-value file/row/byte rollup (Iceberg's
  *                 partitions metadata table — the first thing an
  *                 operator checks for skew/small-files at 100 TB)
  *  - `refs`       repo branches and tags with their head commits
  *  - `tombstones` live merge-on-read predicate tombstones (seq +
  *                 predicate + how many files each still applies to)
  *  - `manifests`  manifest chunks of the current snapshot (path, file/
  *                 row counts, partition summary — the Iceberg manifests
  *                 metadata table); empty while the file list is inline
  *
  * Metadata volumes are O(commits + files) — driver-side row building is
  * appropriate here; the DATA path never does this.
  */
final class MetaTable(
    repo: GraftRepo,
    branch: String,
    key: String,
    kind: String,
    ident: Identifier) extends Table with SupportsRead {

  override def name(): String = ident.toString
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def schema(): StructType = kind match {
    case "files" => StructType(Seq(
      StructField("path", StringType),
      StructField("rows", LongType),
      StructField("bytes", LongType),
      StructField("partition", MapType(StringType, StringType)),
      StructField("min_stats", MapType(StringType, StringType)),
      StructField("max_stats", MapType(StringType, StringType))))
    case "snapshots" => StructType(Seq(
      StructField("commit_id", StringType),
      StructField("snapshot_id", StringType),
      StructField("n_files", IntegerType),
      StructField("n_rows", LongType)))
    case "history" => StructType(Seq(
      StructField("commit_id", StringType),
      StructField("ts", LongType),
      StructField("message", StringType),
      StructField("snapshot_id", StringType)))
    case "partitions" => StructType(Seq(
      StructField("partition", MapType(StringType, StringType)),
      StructField("n_files", IntegerType),
      StructField("n_rows", LongType),
      StructField("bytes", LongType)))
    case "refs" => StructType(Seq(
      StructField("name", StringType),
      StructField("kind", StringType),
      StructField("commit_id", StringType),
      StructField("snapshot_id", StringType)))
    case "tombstones" => StructType(Seq(
      StructField("seq", LongType),
      StructField("predicate", StringType),
      StructField("n_files_affected", IntegerType)))
    case "manifests" => StructType(Seq(
      StructField("path", StringType),
      StructField("n_files", IntegerType),
      StructField("n_rows", LongType),
      StructField("partitions", ArrayType(MapType(StringType, StringType)))))
  }

  private def rows(): Seq[Row] = kind match {
    case "files" =>
      val snap = repo.snapshot(repo.headCommit(branch).tables(key))
      snap.files.map(f =>
        Row(f.path, f.rows, f.sizeBytes(bytesPerRow = 64L), f.partValues,
          f.min, f.max))
    case "snapshots" | "history" =>
      // walk first-parent history of the branch
      var out = List.empty[Row]
      var c = repo.headCommit(branch)
      var done = false
      while (!done) {
        val sid = c.tables.get(key)
        (kind, sid) match {
          case ("snapshots", Some(s)) =>
            val snap = repo.snapshot(s)
            out :+= Row(c.id, s, snap.files.size, snap.files.map(_.rows).sum)
          case ("history", Some(s)) =>
            out :+= Row(c.id, c.ts, c.message, s)
          case _ => ()
        }
        if (c.parents.isEmpty) done = true else c = repo.commit(c.parents.head)
      }
      // history/snapshots: only commits where this table's snapshot CHANGED.
      // Walking head->oldest, a run of equal snapshot ids means the newer
      // commits of the run touched OTHER tables — attribute the snapshot
      // to the commit that introduced it: keep a row only when the NEXT
      // (parent-side) row carries a different snapshot id.
      def sidOf(r: Row): String =
        if (kind == "snapshots") r.getString(1) else r.getString(3)
      out.zipAll(out.drop(1).map(Option(_)), null.asInstanceOf[Row], None)
        .collect { case (r, next) if !next.exists(n => sidOf(n) == sidOf(r)) => r }
    case "partitions" =>
      val snap = repo.snapshot(repo.headCommit(branch).tables(key))
      snap.files.groupBy(_.partValues).toSeq
        .sortBy(_._1.toSeq.sortBy(_._1).mkString(","))
        .map { case (pv, fs) =>
          Row(pv, fs.size, fs.map(_.rows).sum,
            fs.map(_.sizeBytes(bytesPerRow = 64L)).sum)
        }
    case "refs" =>
      val bs = repo.branches.map { b =>
        val c = repo.headCommit(b)
        Row(b, "branch", c.id, c.tables.get(key).orNull)
      }
      val ts = repo.tags.map { t =>
        val c = repo.resolve(t)
        Row(t, "tag", c.id, c.tables.get(key).orNull)
      }
      bs ++ ts
    case "tombstones" =>
      val snap = repo.snapshot(repo.headCommit(branch).tables(key))
      val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
      val phys = graft.versioned.TableOps.toPhysical(schema, snap.nameMapping)
      graft.versioned.Tombstones.of(snap).map { t =>
        val n = snap.files.count(f => graft.versioned.Tombstones
          .applicable(Seq(t), f, phys, Some(repo.dataIO)).nonEmpty)
        Row(t.seq, t.filter.toString, n)
      }
    case "manifests" =>
      // segmentation introspection (the Iceberg manifests metadata
      // table): one row per manifest chunk of the current snapshot —
      // empty for inline snapshots, where the file list lives in the
      // snapshot JSON itself. Answers straight from the refs; no chunk
      // is loaded.
      val snap = repo.snapshot(repo.headCommit(branch).tables(key))
      snap.manifestRefs.map(r =>
        Row(r.path, r.count, r.rows, r.partitions.orNull))
    case _ => Nil
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new V1Scan {
        override def readSchema(): StructType = schema()
        override def toV1TableScan[T <: BaseRelation with TableScan](
            context: SQLContext): T =
          new BaseRelation with TableScan {
            override def sqlContext: SQLContext = context
            override def schema: StructType = MetaTable.this.schema()
            override def buildScan(): RDD[Row] =
              context.sparkContext.parallelize(rows(), 1)
          }.asInstanceOf[T]
      }
    }
}

object MetaTable {
  val kinds: Set[String] =
    Set("files", "snapshots", "history", "partitions", "refs", "tombstones",
      "manifests")
}
