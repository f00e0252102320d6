package graft.versioned

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.util.UUID

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.types._

/** Export a graft snapshot as APACHE ICEBERG table metadata (spec v1) so
  * external engines — Trino, DuckDB's iceberg extension, any
  * iceberg-core reader — can read a published graft table. This closes
  * the one capability class the reference has structurally (its tables
  * ARE Iceberg, pom.xml iceberg-core) that graft's own format lacks.
  *
  * The export is METADATA-ONLY: it writes `v1.metadata.json`, a
  * manifest list and a manifest (Iceberg's Avro layouts, field-id
  * annotations included) that point at the snapshot's EXISTING parquet
  * data files in place — zero data copies, O(files) driver work, so a
  * 100 TB table exports in seconds. Because graft parquet carries no
  * Iceberg field-id metadata, the table property
  * `schema.name-mapping.default` supplies the spec's name-mapping
  * fallback and the exported schema uses PHYSICAL column names — the
  * names actually inside the files (renames are metadata-only in both
  * systems; re-export after a rename to surface new logical names).
  *
  * Scope guards (fail loudly rather than export wrong data):
  *  - merge-on-read tombstones must be compacted first — an Iceberg
  *    reader knows nothing of graft tombstones and would resurrect
  *    deleted rows;
  *  - a partitioned graft table exports its REAL partition spec
  *    (identity/bucket/truncate/year/month/day/hour — graft's transform
  *    set IS Iceberg's) with typed per-file partition values in the
  *    manifest, so external engines partition-prune the export. The
  *    spec falls back to UNPARTITIONED — correct reads, no Iceberg-side
  *    pruning, reason recorded in `graft.export.partition-fallback` —
  *    when any live file predates the current spec (partition
  *    evolution: exporting null values for such files would let an
  *    Iceberg reader prune rows that exist) or a field's value type
  *    has no manifest mapping. Data files always contain every data
  *    column (identity sources included), so reads stay correct either
  *    way.
  */
object IcebergExport {

  /** Write Iceberg metadata for `ref:key` under `dest` (a fresh export
    * directory). Returns the path of the written metadata JSON.
    */
  def export(repo: GraftRepo, ref: String, key: String, dest: Path): Path = {
    val snap = repo.snapshot(repo.resolve(ref).tables.getOrElse(key,
      throw new NoSuchElementException(s"no such table: $key @ $ref")))
    if (Tombstones.of(snap).nonEmpty)
      throw new UnsupportedOperationException(
        s"$key has merge-on-read tombstones; run CALL graft.system.compact " +
          "first — an external Iceberg reader would resurrect deleted rows")
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    val phys = TableOps.toPhysical(schema, snap.nameMapping)

    // Partitioned export is all-or-nothing per the doc comment: every
    // current spec field must have a manifest-typed mapping AND a
    // recorded value in EVERY live file (a file predating an evolved
    // spec has no value — exporting it as null would tell readers
    // "this file's rows transform to null" and mis-prune live rows).
    val pfAll = snap.partitionFields
    val srcTypeOf: PartitionField => DataType = pf =>
      schema.fields.find(_.name == pf.source).map(_.dataType).getOrElse(NullType)
    val unmappable = pfAll.filter(pf => partitionAvroSchema(pf, srcTypeOf(pf)).isEmpty)
    val incomplete = pfAll.nonEmpty &&
      snap.files.exists(f => pfAll.exists(pf => !f.partValues.contains(pf.name)))
    val (specFields, fallbackReason) =
      if (pfAll.isEmpty) (Nil, None)
      else if (unmappable.nonEmpty)
        (Nil, Some("no manifest value mapping for partition field(s): " +
          unmappable.map(pf => s"${pf.name} (${pf.transform} on " +
            s"${srcTypeOf(pf).simpleString})").mkString(", ")))
      else if (incomplete)
        (Nil, Some("live files predate the current partition spec " +
          "(partition evolution); compact to rewrite them, then re-export"))
      else (pfAll, None)

    val metaDir = dest.resolve("metadata")
    Files.createDirectories(metaDir)
    // 64-bit name-UUID of the graft snapshot sha — stable across exports
    // of the same snapshot, collision-resistant across distinct ones
    // (String.hashCode gave 32 bits and could be 0), never 0 or negative
    val snapshotId = math.max(1L, UUID.nameUUIDFromBytes(
      snap.id.getBytes(StandardCharsets.UTF_8))
      .getMostSignificantBits & Long.MaxValue)
    val nowMs = System.currentTimeMillis()

    // partition-spec fields JSON (shared by metadata JSON + manifest meta)
    val specFieldList: java.util.List[Any] = java.util.List.of(
      specFields.zipWithIndex.map { case (pf, i) =>
        val m = new java.util.LinkedHashMap[String, Any]
        m.put("name", pf.name)
        m.put("transform", icebergTransform(pf))
        m.put("source-id", schema.fieldIndex(pf.source) + 1)
        m.put("field-id", 1000 + i)
        m
      }: _*)
    val specFieldsJson = new com.fasterxml.jackson.databind.ObjectMapper()
      .writeValueAsString(specFieldList)

    // ---- manifest (Avro, field-id-annotated; one per export) ----------
    val manifestPath = metaDir.resolve(s"${UUID.randomUUID()}-m0.avro")
    writeManifest(manifestPath, repo, snap, snapshotId, icebergSchemaJson(phys),
      specFields, srcTypeOf, specFieldsJson)
    // ---- manifest list --------------------------------------------------
    val listPath = metaDir.resolve(
      s"snap-$snapshotId-1-${UUID.randomUUID()}.avro")
    writeManifestList(listPath, manifestPath, snapshotId, snap)
    // ---- table metadata JSON -------------------------------------------
    val meta = new java.util.LinkedHashMap[String, Any]
    meta.put("format-version", 1)
    meta.put("table-uuid", UUID.nameUUIDFromBytes(
      snap.id.getBytes(StandardCharsets.UTF_8)).toString)
    meta.put("location", dest.toUri.toString.stripSuffix("/"))
    meta.put("last-updated-ms", nowMs)
    meta.put("last-column-id", phys.fields.length)
    val schemaMap = icebergSchemaMap(phys)
    meta.put("schema", schemaMap)
    meta.put("schemas", java.util.List.of(schemaMap))
    meta.put("current-schema-id", 0)
    meta.put("partition-spec", specFieldList) // v1 legacy flat list
    val spec0 = new java.util.LinkedHashMap[String, Any]
    spec0.put("spec-id", 0)
    spec0.put("fields", specFieldList)
    meta.put("partition-specs", java.util.List.of(spec0))
    meta.put("default-spec-id", 0)
    meta.put("last-partition-id", 999 + specFields.length)
    val order0 = new java.util.LinkedHashMap[String, Any]
    order0.put("order-id", 0)
    order0.put("fields", java.util.List.of())
    meta.put("sort-orders", java.util.List.of(order0))
    meta.put("default-sort-order-id", 0)
    val props = new java.util.LinkedHashMap[String, Any]
    props.put("schema.name-mapping.default", nameMappingJson(phys))
    props.put("graft.source-snapshot", snap.id)
    props.put("graft.source-ref", ref)
    fallbackReason.foreach(r => props.put("graft.export.partition-fallback", r))
    meta.put("properties", props)
    meta.put("current-snapshot-id", snapshotId)
    val snapMap = new java.util.LinkedHashMap[String, Any]
    snapMap.put("snapshot-id", snapshotId)
    snapMap.put("timestamp-ms", nowMs)
    val summary = new java.util.LinkedHashMap[String, Any]
    summary.put("operation", "append")
    summary.put("added-data-files", snap.files.size.toString)
    summary.put("added-records", snap.files.map(_.rows).sum.toString)
    snapMap.put("summary", summary)
    snapMap.put("manifest-list", listPath.toUri.toString)
    snapMap.put("schema-id", 0)
    meta.put("snapshots", java.util.List.of(snapMap))
    meta.put("snapshot-log", java.util.List.of())
    meta.put("metadata-log", java.util.List.of())

    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val metaPath = metaDir.resolve("v1.metadata.json")
    Files.writeString(metaPath,
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(meta))
    // HadoopCatalog-style discovery: readers resolve v<hint>.metadata.json
    Files.writeString(metaDir.resolve("version-hint.text"), "1")
    metaPath
  }

  // ---- Iceberg schema JSON (field ids 1..n, physical names) ------------

  private def icebergType(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType => "int"
    case LongType => "long"
    case FloatType => "float"
    case DoubleType => "double"
    case BooleanType => "boolean"
    case StringType => "string"
    case BinaryType => "binary"
    case DateType => "date"
    case TimestampType => "timestamptz"
    case TimestampNTZType => "timestamp"
    case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
    case other => throw new UnsupportedOperationException(
      s"no Iceberg v1 export mapping for ${other.simpleString}")
  }

  private def icebergSchemaMap(phys: StructType): java.util.Map[String, Any] = {
    val fields = phys.fields.zipWithIndex.map { case (f, i) =>
      val m = new java.util.LinkedHashMap[String, Any]
      m.put("id", i + 1)
      m.put("name", f.name)
      m.put("required", false) // graft parquet columns are all optional
      m.put("type", icebergType(f.dataType))
      m
    }
    val m = new java.util.LinkedHashMap[String, Any]
    m.put("type", "struct")
    m.put("schema-id", 0)
    m.put("fields", java.util.List.of(fields.toSeq: _*))
    m
  }

  private def icebergSchemaJson(phys: StructType): String =
    new com.fasterxml.jackson.databind.ObjectMapper()
      .writeValueAsString(icebergSchemaMap(phys))

  /** Spec name-mapping (`schema.name-mapping.default`): parquet columns
    * carry no Iceberg field ids, so readers bind file columns to schema
    * ids BY NAME through this mapping.
    */
  private def nameMappingJson(phys: StructType): String = {
    val entries = phys.fields.zipWithIndex.map { case (f, i) =>
      val m = new java.util.LinkedHashMap[String, Any]
      m.put("field-id", i + 1)
      m.put("names", java.util.List.of(f.name))
      m
    }
    new com.fasterxml.jackson.databind.ObjectMapper()
      .writeValueAsString(java.util.List.of(entries.toSeq: _*))
  }

  // ---- partition spec export -------------------------------------------

  /** Iceberg transform name (spec's canonical singular forms; graft's
    * field model uses Iceberg's Java-API plural temporal names). */
  private def icebergTransform(pf: PartitionField): String = pf.transform match {
    case "identity" => "identity"
    case "bucket" => s"bucket[${pf.numBuckets}]"
    case "truncate" => s"truncate[${pf.numBuckets}]"
    case "years" => "year"
    case "months" => "month"
    case "days" => "day"
    case "hours" => "hour"
    case other => throw new UnsupportedOperationException(
      s"unknown transform: $other")
  }

  private def logical(t: Schema.Type, logicalType: String,
      adjustToUtc: Option[Boolean] = None): Schema = {
    val sc = Schema.create(t)
    sc.addProp("logicalType", logicalType)
    adjustToUtc.foreach(b => sc.addProp("adjust-to-utc", b: java.lang.Boolean))
    sc
  }

  /** Avro schema of the transform RESULT type (pre-null-union), per the
    * Iceberg spec's transform result-type table. None = this field has
    * no manifest value mapping (identity/truncate on an exotic source)
    * and forces the unpartitioned fallback.
    */
  private def partitionAvroSchema(pf: PartitionField,
      srcType: DataType): Option[Schema] = pf.transform match {
    case "identity" => srcType match {
      case ByteType | ShortType | IntegerType => Some(s(Schema.Type.INT))
      case LongType => Some(s(Schema.Type.LONG))
      case StringType => Some(s(Schema.Type.STRING))
      case BooleanType => Some(s(Schema.Type.BOOLEAN))
      case FloatType => Some(s(Schema.Type.FLOAT))
      case DoubleType => Some(s(Schema.Type.DOUBLE))
      case DateType => Some(logical(Schema.Type.INT, "date"))
      case TimestampType =>
        Some(logical(Schema.Type.LONG, "timestamp-micros", Some(true)))
      case TimestampNTZType =>
        Some(logical(Schema.Type.LONG, "timestamp-micros", Some(false)))
      case _ => None
    }
    case "bucket" => Some(s(Schema.Type.INT))
    case "truncate" => srcType match {
      case ByteType | ShortType | IntegerType => Some(s(Schema.Type.INT))
      case LongType => Some(s(Schema.Type.LONG))
      case StringType => Some(s(Schema.Type.STRING))
      case _ => None
    }
    case "years" | "months" | "hours" => Some(s(Schema.Type.INT))
    case "days" => Some(logical(Schema.Type.INT, "date"))
    case _ => None
  }

  /** Typed manifest value for one recorded partition-directory string
    * ([[Partitioning.valuesFromPath]] output: unescaped; nulls are the
    * hive marker). Directory formats are [[Partitioning]]'s: temporal
    * transforms use lexically-ordered UTC patterns, integral truncate
    * records the floor, bucket the int, identity the plain rendering.
    */
  private def partitionValue(pf: PartitionField, srcType: DataType,
      raw: String): Any = {
    if (raw == Partitioning.NullMarker) return null
    def micros(sTxt: String): Long = {
      val ldt = java.time.LocalDateTime.parse(sTxt.replace(' ', 'T'))
      ldt.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L +
        ldt.getNano / 1000L
    }
    pf.transform match {
      case "identity" => srcType match {
        case ByteType | ShortType | IntegerType => raw.toInt: Integer
        case LongType => raw.toLong: java.lang.Long
        case StringType => raw
        case BooleanType => raw.toBoolean: java.lang.Boolean
        case FloatType => raw.toFloat: java.lang.Float
        case DoubleType => raw.toDouble: java.lang.Double
        case DateType =>
          java.time.LocalDate.parse(raw).toEpochDay.toInt: Integer
        case TimestampType | TimestampNTZType => micros(raw): java.lang.Long
        case other => throw new UnsupportedOperationException(
          s"identity partition value on ${other.simpleString}")
      }
      case "bucket" => raw.toInt: Integer
      case "truncate" => srcType match {
        case ByteType | ShortType | IntegerType => raw.toLong.toInt: Integer
        case LongType => raw.toLong: java.lang.Long
        case StringType => raw
        case other => throw new UnsupportedOperationException(
          s"truncate partition value on ${other.simpleString}")
      }
      // temporal transform results count from the 1970 epoch (spec):
      // year -> years, month -> months, day -> days (date), hour -> hours
      case "years" => raw.toInt - 1970: Integer
      case "months" =>
        val Array(y, m) = raw.split('-')
        (y.toInt - 1970) * 12 + (m.toInt - 1): Integer
      case "days" =>
        java.time.LocalDate.parse(raw).toEpochDay.toInt: Integer
      case "hours" =>
        val p = raw.split('-')
        val ldt = java.time.LocalDateTime.of(p(0).toInt, p(1).toInt,
          p(2).toInt, p(3).toInt, 0)
        (ldt.toEpochSecond(java.time.ZoneOffset.UTC) / 3600).toInt: Integer
      case other => throw new UnsupportedOperationException(
        s"unknown transform: $other")
    }
  }

  // ---- Avro layouts ----------------------------------------------------

  private def field(name: String, fieldId: Int, schema: Schema,
      optional: Boolean): Schema.Field = {
    val (s, dflt) =
      if (optional)
        (Schema.createUnion(Schema.create(Schema.Type.NULL), schema),
          Schema.Field.NULL_DEFAULT_VALUE)
      else (schema, null)
    val f = new Schema.Field(name, s, null, dflt)
    f.addProp("field-id", fieldId: Integer)
    f
  }
  private def s(t: Schema.Type): Schema = Schema.create(t)

  /** manifest_entry / r2 / r102 — the v1 manifest record layout with the
    * required core columns (optional per-column stats omitted: absence
    * is spec-legal and readers fall back to scanning). The r102
    * partition record carries one OPTIONAL field per spec field, typed
    * by the transform result and id'd 1000+i to match the spec JSON —
    * the rows Iceberg-side partition pruning runs on.
    */
  private def manifestEntrySchema(specFields: Seq[PartitionField],
      srcTypeOf: PartitionField => DataType): Schema = {
    val partition = Schema.createRecord("r102", null, null, false)
    partition.setFields(java.util.List.of(
      specFields.zipWithIndex.map { case (pf, i) =>
        field(pf.name, 1000 + i,
          partitionAvroSchema(pf, srcTypeOf(pf)).get, optional = true)
      }: _*))
    val dataFile = Schema.createRecord("r2", null, null, false)
    dataFile.setFields(java.util.List.of(
      field("file_path", 100, s(Schema.Type.STRING), optional = false),
      field("file_format", 101, s(Schema.Type.STRING), optional = false),
      field("partition", 102, partition, optional = false),
      field("record_count", 103, s(Schema.Type.LONG), optional = false),
      field("file_size_in_bytes", 104, s(Schema.Type.LONG), optional = false),
      field("block_size_in_bytes", 105, s(Schema.Type.LONG), optional = false)))
    val entry = Schema.createRecord("manifest_entry", null, null, false)
    entry.setFields(java.util.List.of(
      field("status", 0, s(Schema.Type.INT), optional = false),
      field("snapshot_id", 1, s(Schema.Type.LONG), optional = true),
      field("data_file", 2, dataFile, optional = false)))
    entry
  }

  private def writeManifest(path: Path, repo: GraftRepo, snap: Snapshot,
      snapshotId: Long, schemaJson: String,
      specFields: Seq[PartitionField],
      srcTypeOf: PartitionField => DataType,
      specFieldsJson: String): Unit = {
    val entrySchema = manifestEntrySchema(specFields, srcTypeOf)
    val writer = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](entrySchema))
    writer.setMeta("schema", schemaJson)
    writer.setMeta("schema-id", "0")
    writer.setMeta("partition-spec", specFieldsJson)
    writer.setMeta("partition-spec-id", "0")
    writer.setMeta("format-version", "1")
    writer.setMeta("content", "data")
    writer.create(entrySchema, path.toFile)
    try {
      val dfSchema = entrySchema.getField("data_file").schema()
      val partSchema = dfSchema.getField("partition").schema()
      snap.files.foreach { f =>
        val abs = repo.root.resolve(f.path)
        val df = new GenericData.Record(dfSchema)
        df.put("file_path", abs.toUri.toString)
        df.put("file_format", "PARQUET")
        val part = new GenericData.Record(partSchema)
        specFields.foreach { pf =>
          // export() guarantees every live file records every field
          part.put(pf.name, partitionValue(pf, srcTypeOf(pf),
            f.partValues(pf.name)))
        }
        df.put("partition", part)
        df.put("record_count", f.rows)
        // true on-disk length (readers plan range reads from it — the
        // snapshot's estimate is not good enough here)
        df.put("file_size_in_bytes", java.nio.file.Files.size(abs))
        df.put("block_size_in_bytes", 64L << 20)
        val e = new GenericData.Record(entrySchema)
        e.put("status", 1) // ADDED in this (single) snapshot
        e.put("snapshot_id", snapshotId)
        e.put("data_file", df)
        writer.append(e)
      }
    } finally writer.close()
  }

  /** manifest_file — the v1 manifest-list record layout. */
  private def manifestFileSchema: Schema = {
    val rec = Schema.createRecord("manifest_file", null, null, false)
    rec.setFields(java.util.List.of(
      field("manifest_path", 500, s(Schema.Type.STRING), optional = false),
      field("manifest_length", 501, s(Schema.Type.LONG), optional = false),
      field("partition_spec_id", 502, s(Schema.Type.INT), optional = false),
      field("added_snapshot_id", 503, s(Schema.Type.LONG), optional = true),
      field("added_data_files_count", 504, s(Schema.Type.INT), optional = true),
      field("existing_data_files_count", 505, s(Schema.Type.INT), optional = true),
      field("deleted_data_files_count", 506, s(Schema.Type.INT), optional = true),
      field("added_rows_count", 512, s(Schema.Type.LONG), optional = true),
      field("existing_rows_count", 513, s(Schema.Type.LONG), optional = true),
      field("deleted_rows_count", 514, s(Schema.Type.LONG), optional = true)))
    rec
  }

  private def writeManifestList(path: Path, manifestPath: Path,
      snapshotId: Long, snap: Snapshot): Unit = {
    val schema = manifestFileSchema
    val writer = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    writer.setMeta("snapshot-id", snapshotId.toString)
    writer.setMeta("format-version", "1")
    writer.create(schema, path.toFile)
    try {
      val r = new GenericData.Record(schema)
      r.put("manifest_path", manifestPath.toUri.toString)
      r.put("manifest_length", Files.size(manifestPath))
      r.put("partition_spec_id", 0)
      r.put("added_snapshot_id", snapshotId)
      r.put("added_data_files_count", snap.files.size)
      r.put("existing_data_files_count", 0)
      r.put("deleted_data_files_count", 0)
      r.put("added_rows_count", snap.files.map(_.rows).sum)
      r.put("existing_rows_count", 0L)
      r.put("deleted_rows_count", 0L)
      writer.append(r)
    } finally writer.close()
  }
}
