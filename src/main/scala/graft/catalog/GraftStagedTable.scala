package graft.catalog

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, StagedTable, SupportsWrite, TableCapability}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, Write, WriteBuilder}
import org.apache.spark.sql.types.StructType

import graft.versioned.{Blooms, FileEntry, GraftRepo, PartitionField}

/** Atomic CTAS / RTAS / CREATE-OR-REPLACE staging (DSv2
  * `StagingTableCatalog` surface): the AS-SELECT data is written to
  * immutable staged files FIRST, and the table definition + file list
  * are published in ONE optimistic commit at `commitStagedChanges()`.
  * A reader never observes the dropped-then-empty window a non-atomic
  * drop+create+insert exposes, and a failed query aborts cleanly (staged
  * files deleted; nothing was ever referenced). This is the same
  * atomicity the reference's users get from Iceberg's
  * `newReplaceTableTransaction` — re-expressed as a single graft commit,
  * which is the repo's native transaction anyway.
  *
  * Staged-write scale posture is identical to INSERT: the data job runs
  * fully distributed through the native DSv2 [[GraftLayoutWrite]]
  * (declared partition clustering + ordering, per-directory writers,
  * bloom sidecars from TBLPROPERTIES); only the final metadata swap is
  * driver-side.
  */
private[catalog] final class GraftStagedTable(
    g: GraftRepo,
    branchName: String,
    key: String, // "db/table"
    ident: Identifier,
    dataSchema: StructType,
    spec: Seq[PartitionField],
    userProps: Map[String, String],
    db: String,
    mode: String) // "create" | "replace" | "createOrReplace"
    extends StagedTable with SupportsWrite {

  private var staged: Seq[FileEntry] = Nil

  override def name(): String = ident.toString
  override def schema(): StructType = dataSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def properties(): JMap[String, String] = {
    import scala.jdk.CollectionConverters._
    (userProps ++ Map("provider" -> "graft")).asJava
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      // CTAS/RTAS data lands in a brand-new snapshot either way; the
      // truncate flag Spark sets for overwrite modes is a no-op here
      override def truncate(): WriteBuilder = this
      // CTAS has no snapshot yet: logical = physical names, bloom opt-in
      // read straight from the CREATE's TBLPROPERTIES
      override def build(): Write = new GraftLayoutWrite(
        g, key, dataSchema, Map.empty, spec,
        Blooms.physColsFromProps(userProps, dataSchema),
        Blooms.itemsFromProps(userProps),
        s"graft-ctas $key",
        entries => synchronized { staged = staged ++ entries })
    }

  override def commitStagedChanges(): Unit = {
    // CTAS schema nullability follows the query, which marks literal
    // sources non-null; store the relaxed schema so later inserts of
    // nullable data aren't rejected against accidental REQUIRED fields
    val schemaJson = StructType(dataSchema.fields.map(_.copy(nullable = true))).json
    g.commitRetry(branchName, s"$mode table $key") { base =>
      val exists = base.tables.contains(key)
      if (mode == "create" && exists) throw new TableAlreadyExistsException(ident)
      if (mode == "replace" && !exists) throw new NoSuchTableException(ident)
      // the table/view namespace is shared: CTAS must not shadow a view
      // (same invariant as createTable/createView)
      if (base.viewMap.contains(key))
        throw new org.apache.spark.sql.catalyst.analysis.ViewAlreadyExistsException(ident)
      val snap = g.writeSnapshot(key, schemaJson, staged,
        if (spec.isEmpty) None else Some(spec),
        None,
        if (userProps.isEmpty) None else Some(userProps))
      (base.tables + (key -> snap.id),
        if (base.namespaces.contains(db)) base.namespaces
        else base.namespaces + (db -> Map.empty[String, String]))
    }
  }

  override def abortStagedChanges(): Unit =
    staged.foreach { f =>
      g.dataIO.delete(f.path)
      g.dataIO.delete(f.path + ".bloom")
    }
}
