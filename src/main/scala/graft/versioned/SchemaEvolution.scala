package graft.versioned

import org.apache.spark.sql.connector.catalog.TableChange
import org.apache.spark.sql.types.{DataType, StructType}

/** The pieces of a snapshot a metadata-only schema change produces —
  * callers thread them into `writeSnapshot` alongside the UNCHANGED
  * file list (no evolution rewrites data).
  */
final case class EvolvedTable(
    schema: StructType,
    spec: Seq[PartitionField],
    mapping: Map[String, String],
    props: Map[String, String],
    retired: Set[String])

/** Metadata-only schema evolution (like Iceberg): ADD COLUMN (appears
  * as null in pre-existing files — the explicit read schema fills it),
  * DROP COLUMN (old files keep the bytes; the read schema stops
  * projecting them), RENAME COLUMN (name-mapping indirection: the
  * physical as-written name never changes, so old files keep reading
  * and pruning correctly — the stability Iceberg gets from field IDs),
  * and type WIDENING (int→long, float→double; readers upcast old
  * narrow files). No data rewrite for any of them.
  *
  * Shared core of the two evolution front ends: the native DSv2
  * `ALTER TABLE` ([[graft.catalog.GraftCatalog]].alterTable) and the
  * REST catalog's `update-schema` commits
  * ([[IcebergRestServer]] — external engines post add-schema /
  * set-current-schema metadata updates, reference parity:
  * LakeFSTableOperations.commit accepts arbitrary metadata swaps).
  * One implementation means one set of guards — drop-with-live-
  * tombstone refusal, physical-name freshness for re-added names,
  * widening-only type changes — no matter which door the change
  * walks in through.
  */
object SchemaEvolution {

  /** Allowed metadata-only type changes: strict widenings the parquet
    * readers upcast on the fly (old narrow files read as the wide type).
    */
  def widens(from: DataType, to: DataType): Boolean = {
    import org.apache.spark.sql.types._
    (from, to) match {
      case (a, b) if a == b => true
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case _ => false
    }
  }

  /** Apply `changes` to `snap`'s table metadata. Pure — throws on any
    * change that is not expressible metadata-only; commits nothing.
    */
  def evolve(snap: Snapshot, changes: Seq[TableChange]): EvolvedTable = {
    var schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    var mapping = snap.nameMapping
    var spec = snap.partitionFields
    var tblProps = snap.properties
    var retired = snap.retiredNames

    // ---- nested-path helpers -----------------------------------------
    // A change names a field by path (["s","b"] = member b of struct
    // s; ["arr","element","x"] = member x of arr's element struct —
    // Spark's container segments `element`/`key`/`value` descend
    // array/map types and are UNAMBIGUOUS: a struct expects a member
    // name, an array expects `element`, a map expects `key`/`value`).
    // Mapping keys are dotted LOGICAL paths; retired entries are
    // dotted PHYSICAL paths (physical names never change, so a parent
    // rename cannot orphan its children's retirement records).
    def childOf(dt: DataType, seg: String): DataType = dt match {
      case s: StructType =>
        s.fields.find(_.name == seg).map(_.dataType).getOrElse(
          throw new IllegalArgumentException(s"no such column: $seg"))
      case a: org.apache.spark.sql.types.ArrayType if seg == "element" =>
        a.elementType
      case m: org.apache.spark.sql.types.MapType if seg == "key" =>
        m.keyType
      case m: org.apache.spark.sql.types.MapType if seg == "value" =>
        m.valueType
      case other => throw new UnsupportedOperationException(
        s"nested ALTER cannot descend ${other.simpleString} via '$seg' " +
          "(structs take a member name; arrays 'element'; maps " +
          "'key'/'value')")
    }
    def parentStructAt(parents: Seq[String]): StructType =
      parents.foldLeft(schema: DataType)(childOf) match {
        case s: StructType => s
        case other => throw new UnsupportedOperationException(
          s"nested ALTER on a ${other.simpleString} member is not " +
            "supported (the parent must resolve to a struct; descend " +
            "arrays with 'element' and maps with 'key'/'value')")
      }
    def mapStructAt(parents: Seq[String])(f: StructType => StructType): Unit = {
      import org.apache.spark.sql.types.{ArrayType, MapType, DataType => DT}
      def walk(dt: DT, rest: Seq[String]): DT =
        if (rest.isEmpty) f(dt.asInstanceOf[StructType])
        else dt match {
          case s: StructType => StructType(s.fields.map { fl =>
            if (fl.name != rest.head) fl
            else fl.copy(dataType = walk(fl.dataType, rest.tail))
          })
          case a: ArrayType if rest.head == "element" =>
            a.copy(elementType = walk(a.elementType, rest.tail))
          case m: MapType if rest.head == "key" =>
            m.copy(keyType = walk(m.keyType, rest.tail))
          case m: MapType if rest.head == "value" =>
            m.copy(valueType = walk(m.valueType, rest.tail))
          case other => throw new UnsupportedOperationException(
            s"nested ALTER cannot descend ${other.simpleString}")
        }
      schema = walk(schema, parents).asInstanceOf[StructType]
    }
    /** Dotted PHYSICAL path of a logical path, via the mapping. */
    def physPathOf(path: Seq[String]): String =
      path.indices.map { i =>
        mapping.getOrElse(path.take(i + 1).mkString("."), path(i))
      }.mkString(".")

    changes.foreach {
      case a: TableChange.AddColumn =>
        val path = a.fieldNames().toSeq
        val (parents, name) = (path.init, path.last)
        val parent = parentStructAt(parents)
        if (parent.fieldNames.contains(name))
          throw new IllegalArgumentException(
            s"column already exists: ${path.mkString(".")}")
        // a new field's physical name defaults to its logical name,
        // but names still occupied by stored bytes IN THIS STRUCT —
        // a renamed sibling's physical storage, or a DROPPED
        // sibling's retired physical name — must get a FRESH physical
        // name, or old files' dead bytes would resurface as the new
        // field instead of nulls (Iceberg avoids this by never
        // reusing field ids)
        val physParent = physPathOf(parents) // "" at top level
        val siblingPhys = parent.fields.map(f =>
          mapping.getOrElse((parents :+ f.name).mkString("."), f.name)).toSet
        val retiredHere = retired.collect {
          case r if physParent.isEmpty && !r.contains('.') => r
          case r if physParent.nonEmpty && r.startsWith(physParent + ".") &&
            !r.stripPrefix(physParent + ".").contains('.') =>
            r.stripPrefix(physParent + ".")
        }
        val occupied = siblingPhys ++ retiredHere
        if (occupied.contains(name)) {
          val fresh = Iterator.from(1).map(i => s"${name}__r$i")
            .find(p => !occupied.contains(p)).get
          mapping += (path.mkString(".") -> fresh)
        }
        mapStructAt(parents)(_.add(name, a.dataType(), nullable = true))
      case del: TableChange.DeleteColumn =>
        val path = del.fieldNames().toSeq
        val (parents, name) = (path.init, path.last)
        val parent = parentStructAt(parents)
        if (!parent.fieldNames.contains(name))
          throw new IllegalArgumentException(
            s"no such column: ${path.mkString(".")}")
        // a live merge-on-read tombstone that references the field
        // (or any leaf under it) could no longer be evaluated —
        // deleted rows would resurrect
        val physFull = physPathOf(path)
        val tombRefs = Tombstones.of(snap)
          .flatMap(t => FilterJson.columns(t.filter)).toSet
        if (tombRefs.exists(c => c == physFull ||
            c.startsWith(physFull + ".")))
          throw new UnsupportedOperationException(
            s"cannot drop column ${path.mkString(".")}: a merge-on-read " +
              "delete tombstone references it; run compaction first to " +
              "materialize the delete")
        // the dropped field's physical bytes stay in old files —
        // retire the physical path so it is never re-bound
        retired += physFull
        mapStructAt(parents)(st =>
          StructType(st.fields.filterNot(_.name == name)))
        val logicalFull = path.mkString(".")
        mapping = mapping.view.filterKeys(k =>
          k != logicalFull && !k.startsWith(logicalFull + ".")).toMap
        if (parents.isEmpty) spec = spec.filterNot(_.source == name)
      case r: TableChange.RenameColumn =>
        val path = r.fieldNames().toSeq
        val (parents, from) = (path.init, path.last)
        val to = r.newName()
        val parent = parentStructAt(parents)
        if (!parent.fieldNames.contains(from))
          throw new IllegalArgumentException(
            s"no such column: ${path.mkString(".")}")
        if (parent.fieldNames.contains(to))
          throw new IllegalArgumentException(
            s"column already exists: ${(parents :+ to).mkString(".")}")
        val logicalFrom = path.mkString(".")
        val logicalTo = (parents :+ to).mkString(".")
        val physical = mapping.getOrElse(logicalFrom, from)
        // descendants' mapping keys follow the renamed LOGICAL prefix
        mapping = mapping.map {
          case (k, v) if k == logicalFrom => logicalTo -> v
          case (k, v) if k.startsWith(logicalFrom + ".") =>
            (logicalTo + k.stripPrefix(logicalFrom)) -> v
          case kv => kv
        } + (logicalTo -> physical)
        mapStructAt(parents)(st => StructType(st.fields.map(f =>
          if (f.name == from) f.copy(name = to) else f)))
        // partition spec tracks the LOGICAL source name (top level)
        if (parents.isEmpty)
          spec = spec.map(pf =>
            if (pf.source == from) pf.copy(source = to) else pf)
      case t: TableChange.UpdateColumnType =>
        val path = t.fieldNames().toSeq
        val (parents, name) = (path.init, path.last)
        val parent = parentStructAt(parents)
        val field = parent.fields.find(_.name == name)
          .getOrElse(throw new IllegalArgumentException(
            s"no such column: ${path.mkString(".")}"))
        if (!widens(field.dataType, t.newDataType()))
          throw new UnsupportedOperationException(
            s"only widening type changes are metadata-only: " +
              s"${field.dataType.simpleString} -> ${t.newDataType().simpleString}")
        mapStructAt(parents)(st => StructType(st.fields.map(f =>
          if (f.name == name) f.copy(dataType = t.newDataType()) else f)))
      case sp: TableChange.SetProperty =>
        // graft.mor.* is engine state (tombstones / commit sequence):
        // user edits would resurrect deleted rows or brick the table
        if (sp.property().startsWith("graft.mor."))
          throw new UnsupportedOperationException(
            s"${sp.property()} is engine-managed merge-on-read state")
        tblProps += (sp.property() -> sp.value())
      case rp: TableChange.RemoveProperty =>
        if (rp.property().startsWith("graft.mor."))
          throw new UnsupportedOperationException(
            s"${rp.property()} is engine-managed merge-on-read state")
        tblProps -= rp.property()
      case other => throw new UnsupportedOperationException(
        s"unsupported table change: $other")
    }
    EvolvedTable(schema, spec, mapping, tblProps, retired)
  }
}
