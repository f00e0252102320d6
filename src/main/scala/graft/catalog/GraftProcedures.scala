package graft.catalog

import java.nio.file.Path
import java.util.{Iterator => JIterator}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.versioned.{GraftRepo, PartitionField, TableOps}

/** SQL stored procedures for catalog maintenance — the DSv2
  * `ProcedureCatalog` surface, addressed Iceberg-style:
  * {{{
  *   CALL g.system.compact('repo', 'main', 'db.t', 134217728, 'id')
  *   CALL g.system.vacuum('repo')
  *   CALL g.system.create_tag('repo', 'v1', 'main')
  *   CALL g.system.create_branch('repo', 'dev', 'main')
  *   CALL g.system.merge('repo', 'dev', 'main')
  * }}}
  * This closes the SQL-only gap for the version-control verbs the
  * reference's users reach through lakeFS itself (branch/tag/merge) and
  * for table maintenance (compaction, GC): a SQL-only client needs no
  * Scala API for day-2 operations.
  */
private[catalog] object GraftProcedures {

  /** One procedure: fixed IN parameters, single-row result produced on
    * the driver (maintenance verbs are metadata operations; the heavy
    * lifting inside compact() is regular distributed Spark jobs).
    */
  private final class Proc(
      override val name: String,
      params: Seq[(String, DataType, Option[String])],
      out: StructType,
      exec: InternalRow => Seq[Any]) extends UnboundProcedure with BoundProcedure {
    override def description(): String = s"graft system procedure $name"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] =
      params.map { case (n, dt, dflt) =>
        val b = ProcedureParameter.in(n, dt)
        dflt.foreach(b.defaultValue)
        b.build()
      }.toArray
    override def call(input: InternalRow): JIterator[Scan] = {
      val row = InternalRow.fromSeq(exec(input))
      val scan: Scan = new LocalScan {
        override def rows(): Array[InternalRow] = Array(row)
        override def readSchema(): StructType = out
        override def description(): String = s"graft procedure $name result"
      }
      java.util.List.of(scan).iterator()
    }
  }

  private def str(r: InternalRow, i: Int): String = r.getUTF8String(i).toString

  def names: Seq[String] =
    Seq("compact", "vacuum", "create_tag", "create_branch", "merge",
      "rollback", "revert", "cherry_pick", "expire_snapshots",
      "clone_table", "set_partition_spec", "iceberg_export",
      "iceberg_import", "iceberg_import_changes", "iceberg_export_expire")

  /** Parse an Iceberg-style spec string: `"identity(cat), bucket(4, id),
    * days(ts), truncate(3, name)"`; a bare column name means identity;
    * empty string = unpartitioned. Type/width validation happens against
    * the table schema inside [[TableOps.setPartitionSpec]].
    */
  private[catalog] def parseSpecString(s: String): Seq[PartitionField] = {
    val rx = """(\w+)\s*\(([^)]*)\)|([A-Za-z_][\w]*)""".r
    // reject anything the grammar doesn't cover (e.g. an unclosed paren
    // would otherwise degrade 'bucket(8, id' into identity(bucket),
    // identity(id) and silently commit a wrong spec)
    val residue = rx.replaceAllIn(s.trim, "")
    if (!residue.matches("""[\s,]*"""))
      throw new IllegalArgumentException(
        s"malformed partition spec near '${residue.trim.take(30)}': $s")
    rx.findAllMatchIn(s.trim).map { m =>
      if (m.group(3) != null) PartitionField(m.group(3), "identity", m.group(3))
      else {
        val args = m.group(2).split(',').map(_.trim).filter(_.nonEmpty)
        def arg(i: Int): String =
          if (i < args.length) args(i)
          else throw new IllegalArgumentException(s"bad transform args: ${m.matched}")
        m.group(1) match {
          case "identity" => PartitionField(arg(0), "identity", arg(0))
          case "bucket" =>
            PartitionField(s"${arg(1)}_bucket", "bucket", arg(1), arg(0).toInt)
          case t @ ("years" | "months" | "days" | "hours") =>
            PartitionField(s"${arg(0)}_${t.stripSuffix("s")}", t, arg(0))
          case "truncate" =>
            PartitionField(s"${arg(1)}_trunc", "truncate", arg(1), arg(0).toInt)
          case other => throw new IllegalArgumentException(
            s"unknown transform: $other " +
              "(identity/bucket/years/months/days/hours/truncate)")
        }
      }
    }.toSeq
  }

  def load(root: Path, name: String,
      io: graft.versioned.GraftIO = graft.versioned.LocalGraftIO.instance)
      : Option[UnboundProcedure] = {
    def open(repo: String) = GraftRepo.open(root.resolve(repo), io)
    name match {
      case "compact" => Some(new Proc(
        "compact",
        Seq(
          ("repo", StringType, None),
          ("branch", StringType, None),
          ("tbl", StringType, None),
          ("target_bytes", LongType, Some((128L << 20).toString)),
          ("sort_by", StringType, Some("''")),
          ("zorder_by", StringType, Some("''"))),
        StructType(Seq(
          StructField("files_before", IntegerType, nullable = false),
          StructField("files_after", IntegerType, nullable = false))),
        { in =>
          val key = str(in, 2).replace('.', '/')
          def cols(i: Int) = str(in, i).split(',').map(_.trim).filter(_.nonEmpty).toSeq
          val (b, a) = TableOps.compact(SparkSession.active, open(str(in, 0)),
            str(in, 1), key, in.getLong(3), cols(4), cols(5))
          Seq(b, a)
        }))
      case "vacuum" => Some(new Proc(
        "vacuum",
        // default age guard 10 min: an unguarded sweep would delete a
        // concurrent writer's staged-but-uncommitted data files (see
        // GraftRepo.vacuum); pass 0 only when no writer is in flight
        Seq(("repo", StringType, None),
          ("older_than_ms", LongType, Some("600000"))),
        StructType(Seq(StructField("deleted_files", IntegerType, nullable = false))),
        in => Seq(open(str(in, 0)).vacuum(in.getLong(1)))))
      case "create_tag" => Some(new Proc(
        "create_tag",
        Seq(("repo", StringType, None), ("tag", StringType, None),
          ("ref", StringType, Some("'main'"))),
        StructType(Seq(StructField("commit_id", StringType, nullable = false))),
        { in =>
          val g = open(str(in, 0))
          g.createTag(str(in, 1), str(in, 2))
          Seq(UTF8String.fromString(g.resolve(str(in, 1)).id))
        }))
      case "create_branch" => Some(new Proc(
        "create_branch",
        Seq(("repo", StringType, None), ("branch", StringType, None),
          ("from_ref", StringType, Some("'main'"))),
        StructType(Seq(StructField("commit_id", StringType, nullable = false))),
        { in =>
          val g = open(str(in, 0))
          g.createBranch(str(in, 1), str(in, 2))
          Seq(UTF8String.fromString(g.headCommit(str(in, 1)).id))
        }))
      case "merge" => Some(new Proc(
        "merge",
        Seq(("repo", StringType, None), ("src", StringType, None),
          ("dst", StringType, None)),
        StructType(Seq(StructField("commit_id", StringType, nullable = false))),
        { in =>
          val c = open(str(in, 0)).merge(str(in, 1), str(in, 2))
          Seq(UTF8String.fromString(c.id))
        }))
      case "rollback" => Some(new Proc(
        "rollback",
        Seq(("repo", StringType, None), ("branch", StringType, None),
          ("to_ref", StringType, None)),
        StructType(Seq(StructField("commit_id", StringType, nullable = false))),
        { in =>
          val c = open(str(in, 0)).rollback(str(in, 1), str(in, 2))
          Seq(UTF8String.fromString(c.id))
        }))
      case "revert" => Some(new Proc(
        "revert",
        Seq(("repo", StringType, None), ("branch", StringType, None),
          ("to_ref", StringType, None)),
        StructType(Seq(StructField("commit_id", StringType, nullable = false))),
        { in =>
          val c = open(str(in, 0)).revert(str(in, 1), str(in, 2))
          Seq(UTF8String.fromString(c.id))
        }))
      case "cherry_pick" => Some(new Proc(
        "cherry_pick",
        Seq(("repo", StringType, None), ("branch", StringType, None),
          ("ref", StringType, None)),
        StructType(Seq(StructField("commit_id", StringType, nullable = false))),
        { in =>
          val c = open(str(in, 0)).cherryPick(str(in, 1), str(in, 2))
          Seq(UTF8String.fromString(c.id))
        }))
      case "expire_snapshots" => Some(new Proc(
        "expire_snapshots",
        // default age guard 10 min: sweeping younger unreachable objects
        // races in-flight committers (see GraftRepo.expireSnapshots)
        Seq(("repo", StringType, None),
          ("older_than_ms", LongType, Some("600000"))),
        StructType(Seq(
          StructField("expired_commits", IntegerType, nullable = false),
          StructField("expired_snapshots", IntegerType, nullable = false),
          StructField("expired_chunks", IntegerType, nullable = false),
          StructField("deleted_files", IntegerType, nullable = false))),
        { in =>
          val (c, s, m, d) = open(str(in, 0)).expireSnapshots(in.getLong(1))
          Seq(c, s, m, d)
        }))
      case "iceberg_export_expire" => Some(new Proc(
        // Follower-side retention for an export/sync destination: sync
        // appends a metadata version per commit and chunk/delete files
        // are shared across versions — keep the newest K versions and
        // delete everything no kept version references (the Iceberg
        // expire_snapshots + remove_orphan_files analog for the dest).
        "iceberg_export_expire",
        Seq(("dest", StringType, None), ("keep_versions", IntegerType, Some("1")),
          // age guard for orphan sweeps (spares a concurrent emission's
          // not-yet-referenced files); 0 only when no export is in flight
          ("older_than_ms", LongType, Some("600000"))),
        StructType(Seq(
          StructField("metadata_deleted", IntegerType, nullable = false),
          StructField("delete_files_deleted", IntegerType, nullable = false))),
        { in =>
          val (m, d) = graft.versioned.IcebergExport.expireDestAt(
            str(in, 0), in.getInt(1), in.getLong(2))
          Seq(m, d)
        }))
      case "clone_table" => Some(new Proc(
        // Zero-copy table clone: the destination entry points at the
        // SOURCE's current snapshot — no data read, no data written,
        // O(1) metadata commit (the table-level analog of the repo's
        // zero-copy branches; Delta's SHALLOW CLONE verb). Safe because
        // snapshots and data files are immutable and every file-GC path
        // (vacuum, expire_snapshots) walks ALL tables of ALL reachable
        // commits, so shared files stay referenced until the LAST
        // referent goes. Subsequent writes to either side produce new
        // snapshots — clones never interfere.
        "clone_table",
        Seq(("repo", StringType, None), ("branch", StringType, None),
          ("src", StringType, None), ("dst", StringType, None)),
        StructType(Seq(StructField("snapshot_id", StringType, nullable = false))),
        { in =>
          val g = open(str(in, 0))
          val branch = str(in, 1)
          val srcKey = str(in, 2).replace('.', '/')
          val dstKey = str(in, 3).replace('.', '/')
          var sid: String = null
          g.commitRetry(branch, s"clone $srcKey -> $dstKey") { base =>
            sid = base.tables.getOrElse(srcKey,
              throw new IllegalArgumentException(s"no such table: $srcKey"))
            // same shared table/view namespace invariant createTable,
            // CTAS and merge enforce
            if (base.tables.contains(dstKey) || base.viewMap.contains(dstKey))
              throw new IllegalArgumentException(
                s"table or view exists: $dstKey")
            val db = dstKey.split('/').head
            if (!base.namespaces.contains(db))
              throw new IllegalArgumentException(s"no such namespace: $db")
            (base.tables + (dstKey -> sid), base.namespaces)
          }
          Seq(UTF8String.fromString(sid))
        }))
      case "iceberg_export" => Some(new Proc(
        // Metadata-only Iceberg export (see IcebergExport): external
        // engines read the published snapshot via standard Iceberg
        // metadata pointing at graft's parquet files in place. The
        // active session enables the v2 positional-delete path for
        // merge-on-read snapshots.
        "iceberg_export",
        Seq(("repo", StringType, None), ("ref", StringType, None),
          ("tbl", StringType, None), ("dest", StringType, None),
          ("snapshots", IntegerType, Some("1")),
          // sync => true: standing subscription — every later commit
          // to the ref re-emits metadata into dest (IcebergSync)
          ("sync", BooleanType, Some("false")),
          // sync-mode retention: after each emission keep only the
          // newest K dest metadata versions (0 = keep everything)
          ("keep_versions", IntegerType, Some("0")),
          // 0 = auto (v1/v2 as features demand); 3 = Iceberg v3 —
          // positional tombstones export as PUFFIN deletion vectors
          // and the metadata carries row lineage
          ("format_version", IntegerType, Some("0"))),
        StructType(Seq(
          StructField("metadata_path", StringType, nullable = false),
          StructField("data_files", IntegerType, nullable = false))),
        { in =>
          val g = open(str(in, 0))
          val ref = str(in, 1)
          val key = str(in, 2).replace('.', '/')
          val maxSnaps = math.max(1, in.getInt(4))
          val fmtV = in.getInt(7)
          val spark = Some(org.apache.spark.sql.SparkSession.active)
          val p: String = if (in.getBoolean(5)) {
            val reg = graft.versioned.IcebergSync.Reg(
              ref, key, str(in, 3), maxSnaps, math.max(0, in.getInt(6)), fmtV)
            graft.versioned.IcebergSync.register(g, reg)
            graft.versioned.IcebergSync.syncExport(g, reg, spark)
          } else graft.versioned.IcebergExport.exportTo(
            g, ref, key, str(in, 3), spark, maxSnaps, version = 1, fmtV)
          val n = g.snapshot(g.resolve(ref).tables(key)).files.size
          Seq(UTF8String.fromString(p), n)
        }))
      case "iceberg_sync_remove" => Some(new Proc(
        // Drop a standing sync registration (the dest's already-written
        // exports stay in place; use iceberg_export_expire to prune them)
        "iceberg_sync_remove",
        Seq(("repo", StringType, None), ("ref", StringType, None),
          ("tbl", StringType, None)),
        StructType(Seq(
          StructField("removed", IntegerType, nullable = false))),
        { in =>
          Seq(graft.versioned.IcebergSync.unregister(
            open(str(in, 0)), str(in, 1), str(in, 2).replace('.', '/')))
        }))
      case "iceberg_import" => Some(new Proc(
        // Register an external Iceberg table (v1/v2, parquet data,
        // positional deletes) as a session temp view via the
        // independent IcebergImport reader — no iceberg-runtime needed.
        "iceberg_import",
        Seq(("metadata_path", StringType, None), ("view", StringType, None),
          ("snapshot_id", LongType, Some("0"))), // 0 = current snapshot
        StructType(Seq(
          StructField("view", StringType, nullable = false),
          StructField("data_files", IntegerType, nullable = false),
          StructField("delete_files", IntegerType, nullable = false))),
        { in =>
          val mp = str(in, 0) // local path or Hadoop-scheme URI
          val view = str(in, 1)
          val sid = Some(in.getLong(2)).filter(_ != 0L)
          val s = org.apache.spark.sql.SparkSession.active
          val plan = graft.versioned.IcebergImport.plan(mp, sid)
          graft.versioned.IcebergImport.readPlan(s, plan)
            .createOrReplaceTempView(view)
          Seq(UTF8String.fromString(view), plan.dataFiles.size,
            plan.deleteFiles.size)
        }))
      case "iceberg_import_changes" => Some(new Proc(
        // Incremental APPEND read of an external Iceberg table: the
        // rows added by snapshots in (from_snapshot, to_snapshot] —
        // the consumer-side analog of Iceberg's incremental append
        // scan. Compaction (`replace`) snapshots are skipped;
        // overwrite/delete snapshots refuse loudly. 0 = unbounded
        // (from the beginning / to the current snapshot).
        "iceberg_import_changes",
        Seq(("metadata_path", StringType, None), ("view", StringType, None),
          ("from_snapshot", LongType, Some("0")),
          ("to_snapshot", LongType, Some("0"))),
        StructType(Seq(
          StructField("view", StringType, nullable = false),
          StructField("data_files", IntegerType, nullable = false))),
        { in =>
          val mp = str(in, 0)
          val view = str(in, 1)
          val from = Some(in.getLong(2)).filter(_ != 0L)
          val to = Some(in.getLong(3)).filter(_ != 0L)
          val s = org.apache.spark.sql.SparkSession.active
          val plan = graft.versioned.IcebergImport.changesPlan(mp, from, to)
          graft.versioned.IcebergImport.readPlan(s, plan)
            .createOrReplaceTempView(view)
          Seq(UTF8String.fromString(view), plan.dataFiles.size)
        }))
      case "set_partition_spec" => Some(new Proc(
        "set_partition_spec",
        Seq(("repo", StringType, None), ("branch", StringType, None),
          ("tbl", StringType, None), ("spec", StringType, Some("''"))),
        StructType(Seq(StructField("spec", StringType, nullable = false))),
        { in =>
          val key = str(in, 2).replace('.', '/')
          val committed = TableOps.setPartitionSpec(open(str(in, 0)),
            str(in, 1), key, parseSpecString(str(in, 3)))
          val rendered = committed.map { pf =>
            val n = if (pf.numBuckets > 0) s"${pf.numBuckets}, " else ""
            s"${pf.transform}($n${pf.source}) AS ${pf.name}"
          }.mkString(", ")
          Seq(UTF8String.fromString(rendered))
        }))
      case _ => None
    }
  }
}
