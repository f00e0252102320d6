package graft.versioned

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, count, lit,
  monotonically_increasing_id, regexp_replace, row_number, sum}
import org.apache.spark.sql.types._

/** Read an APACHE ICEBERG table (spec v1, v2 or v3) from its metadata
  * JSON — an independent, spec-driven reader: metadata JSON → manifest
  * list → manifests (Avro) → data files minus deletes.
  *
  * Exists for two reasons:
  *  1. external interop — `CALL graft.system.iceberg_import` reads any
  *     engine's Iceberg table into a Spark DataFrame with zero extra
  *     dependencies (no iceberg-runtime on the classpath);
  *  2. round-trip verification — it shares no code with
  *     [[IcebergExport]]'s writer beyond the spec constants, so
  *     export → import equality is a real two-sided check of both the
  *     written layouts and this reader (the closest thing to an
  *     external Iceberg reader available without iceberg-core).
  *
  * Scale shape: planning is O(manifest entries) driver work on Avro —
  * the same planning cost Iceberg's own readers pay before distributing
  * scans. The read itself is ONE parquet scan over all live data files
  * (Catalyst pushes filters/pruning into it as usual); positional
  * deletes apply as a LEFT ANTI join on `(file_path, row position)`
  * against `_metadata.file_path` / `_metadata.row_index` — delete files
  * are tiny relative to data, so AQE broadcasts the delete side and the
  * join costs one scan-side hash probe, no shuffle of the data. This is
  * the declarative Spark expression of Iceberg's per-task
  * positional-delete merge.
  *
  * Reader subset (documented, loud on violation): the current snapshot
  * by default, or any snapshot id present in the metadata (history
  * exports time travel via the `snapshotId` overloads); PARQUET, ORC
  * and AVRO data files (ORC positional deletes via a derived per-file
  * row position — see [[boundOrcScan]]; AVRO through the explicit
  * per-file reader — see [[boundAvroScan]]); positional AND equality
  * delete files in ANY of the three formats (`write.delete.format` —
  * graft's own exporter writes only parquet positional ones, but
  * external CDC writers — Flink upserts — emit equality deletes); v3
  * DELETION VECTORS (Puffin-backed roaring bitmaps, one per data file
  * — see [[dvDeleteRows]]/[[parseDvBlob]]); and
  * NESTED schemas (struct/list/map columns parse recursively; equality
  * deletes may only reference top-level fields). Column binding is
  * FIELD-ID-FIRST when the data files' footers carry parquet field ids
  * (external Iceberg engines stamp them; TOP-LEVEL columns renamed by
  * such an engine bind correctly by id — see [[boundScan]]; fields
  * renamed INSIDE a struct still bind by name) and BY NAME otherwise — correct for any writer that uses
  * `schema.name-mapping.default` with physical names, which includes
  * every [[IcebergExport]] output.
  */
object IcebergImport {

  /** Planned current-snapshot file sets of an Iceberg table. */
  /** One live data file: path + its data sequence number (v1 → 0).
    * `partition` is the manifest's avro-decoded partition record keyed
    * by spec field name (Utf8 pre-lowered to String; logical types stay
    * their physical Integer/Long) — empty under an unpartitioned spec.
    */
  final case class DataFile(path: String, seq: Long,
      format: String = "PARQUET",
      partition: Map[String, Any] = Map.empty)

  /** One live delete file. `equalityIds` is empty for positional
    * deletes (content=1) and the referenced schema field ids for
    * equality deletes (content=2).
    */
  final case class DeleteFile(path: String, content: Int, seq: Long,
      equalityIds: Seq[Int], format: String = "PARQUET",
      dv: Option[DvRef] = None)

  /** A v3 DELETION VECTOR's location: a blob inside a Puffin file,
    * scoped to exactly one data file. */
  final case class DvRef(referencedFile: String, offset: Long, length: Long)

  final case class Plan(
      formatVersion: Int,
      schema: StructType,
      fieldIdToName: Map[Int, String],
      dataFiles: Seq[DataFile],
      deleteFiles: Seq[DeleteFile]) {
    def dataPaths: Seq[String] = dataFiles.map(_.path)
    def positionDeletes: Seq[DeleteFile] = deleteFiles.filter(_.content == 1)
    def equalityDeletes: Seq[DeleteFile] = deleteFiles.filter(_.content == 2)
  }

  // ---- location access: plain local paths via java.nio, URIs with a
  // scheme (s3a://, hdfs://, file://) via the Hadoop FileSystem for
  // that scheme — so an import can read a table living in the object
  // store an external engine wrote it to.

  // single-slash forms included: Hadoop renders file URIs as
  // `file:/tmp/x`, and both are legal URI spellings of one location
  private val SchemeRe = "^[a-zA-Z][a-zA-Z0-9+.-]*:/.*".r
  private def hasScheme(s: String): Boolean = SchemeRe.matches(s)

  private def hadoopFs(s: String): org.apache.hadoop.fs.FileSystem = {
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    org.apache.hadoop.fs.FileSystem.get(java.net.URI.create(s), conf)
  }
  private def readBytesAt(s: String): Array[Byte] =
    if (!hasScheme(s)) Files.readAllBytes(Paths.get(s))
    else scala.util.Using.resource(
      hadoopFs(s).open(new org.apache.hadoop.fs.Path(s)))(in =>
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(in))
  private def readStringAt(s: String): String =
    new String(readBytesAt(s), java.nio.charset.StandardCharsets.UTF_8)
  private def isDirAt(s: String): Boolean =
    if (!hasScheme(s)) Files.isDirectory(Paths.get(s))
    else try hadoopFs(s).getFileStatus(
      new org.apache.hadoop.fs.Path(s)).isDirectory
    catch { case _: java.io.FileNotFoundException => false }
  private[graft] def existsAt(s: String): Boolean =
    if (!hasScheme(s)) Files.exists(Paths.get(s))
    else try { hadoopFs(s).getFileStatus(
      new org.apache.hadoop.fs.Path(s)); true }
    catch { case _: java.io.FileNotFoundException => false }
  private def joinLoc(base: String, child: String): String =
    if (!hasScheme(base)) Paths.get(base).resolve(child).toString
    else base.stripSuffix("/") + "/" + child
  private def nameOf(s: String): String =
    s.stripSuffix("/").substring(s.stripSuffix("/").lastIndexOf('/') + 1)

  /** HadoopCatalog-style discovery: a DIRECTORY (table root or its
    * `metadata/`) resolves through `version-hint.text` to the newest
    * `v<N>.metadata.json`, so re-reading the same dir after a sync-mode
    * re-export sees the new table state; a file path is used as-is.
    */
  def resolveMetadata(p: Path): Path =
    Paths.get(resolveMetadataLoc(p.toString))

  /** String/URI form of [[resolveMetadata]]. */
  def resolveMetadataLoc(p: String): String =
    if (!isDirAt(p)) p
    else {
      val metaDir = if (nameOf(p) == "metadata") p else joinLoc(p, "metadata")
      val hint = joinLoc(metaDir, "version-hint.text")
      if (!existsAt(hint))
        throw new IllegalArgumentException(
          s"$p is a directory but has no metadata/version-hint.text")
      joinLoc(metaDir, s"v${readStringAt(hint).trim}.metadata.json")
    }

  /** Parse metadata JSON + manifests into the current snapshot's plan. */
  def plan(metadataPath: Path): Plan = plan(metadataPath.toString, None)

  def plan(metadataPath: Path, snapshotId: Option[Long]): Plan =
    plan(metadataPath.toString, snapshotId)

  /** Plan a specific snapshot (`snapshotId`), or the current one when
    * None — time travel over a history export's `snapshots` list.
    * `metadataLoc` may be a local path or a URI with a Hadoop scheme.
    */
  /** format version + current schema (+ its field id → name map) of a
    * parsed metadata tree — shared by [[plan]] and [[changesPlan]].
    */
  private def parseHeader(meta: com.fasterxml.jackson.databind.JsonNode)
      : (Int, StructType, Map[Int, String]) = {
    val v = meta.get("format-version").asInt()
    require(v == 1 || v == 2 || v == 3,
      s"unsupported Iceberg format-version: $v")
    // current schema: v2 `schemas` + current-schema-id, v1 may have only
    // the legacy single `schema`
    val schemaNode = {
      val byId = Option(meta.get("schemas")).filter(_.isArray).flatMap { arr =>
        val want = Option(meta.get("current-schema-id")).map(_.asInt()).getOrElse(0)
        arr.elements().asScala.find(s =>
          Option(s.get("schema-id")).forall(_.asInt() == want))
      }
      byId.orElse(Option(meta.get("schema"))).getOrElse(
        throw new IllegalArgumentException("metadata has no schema"))
    }
    val schema = structOf(schemaNode)
    val idToName = schemaNode.get("fields").elements().asScala.map(f =>
      f.get("id").asInt() -> f.get("name").asText()).toMap
    (v, schema, idToName)
  }

  def plan(metadataLoc: String, snapshotId: Option[Long]): Plan = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = mapper.readTree(readStringAt(resolveMetadataLoc(metadataLoc)))
    val (v, schema, idToName) = parseHeader(meta)

    val snapIdOpt = snapshotId.orElse(
      Option(meta.get("current-snapshot-id")).map(_.asLong()).filter(_ != -1L))
    if (snapIdOpt.isEmpty) return Plan(v, schema, idToName, Nil, Nil)
    val snapId = snapIdOpt.get
    val snap = meta.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong() == snapId)
      .getOrElse(throw new IllegalArgumentException(
        s"snapshot-id $snapId not in snapshots"))
    val listPath = toLocal(snap.get("manifest-list").asText())
    val (data, deletes) = filesOfManifestList(listPath, v)
    Plan(v, schema, idToName, data, deletes)
  }

  /** Live file sets reachable from one manifest list (the per-snapshot
    * entry point plan() walks; also the unit a REST commit posts via its
    * add-snapshot update). `v` gates format-version-specific shapes
    * (PUFFIN deletion vectors are v3-only).
    */
  private[graft] def filesOfManifestList(listLoc: String,
      v: Int): (Seq[DataFile], Seq[DeleteFile]) = {
    val listPath = toLocal(listLoc)
    // manifest list → (manifest path, content, sequence number); v1 has
    // neither content nor sequence numbers
    val manifests = readAvro(listPath).map { r =>
      val content = Option(r.getSchema.getField("content"))
        .map(_ => r.get("content").asInstanceOf[Int]).getOrElse(0)
      val seq = Option(r.getSchema.getField("sequence_number"))
        .map(_ => r.get("sequence_number").asInstanceOf[Long]).getOrElse(0L)
      (toLocal(r.get("manifest_path").toString), content, seq)
    }
    val data = Seq.newBuilder[DataFile]
    val deletes = Seq.newBuilder[DeleteFile]
    manifests.foreach { case (mPath, mContent, mSeq) =>
      readAvro(mPath).foreach { e =>
        val status = e.get("status").asInstanceOf[Int]
        if (status != 2) { // 2 = DELETED: file no longer live
          val df = e.get("data_file").asInstanceOf[GenericRecord]
          val fmt = df.get("file_format").toString.toUpperCase
          val content = Option(df.getSchema.getField("content"))
            .map(_ => df.get("content").asInstanceOf[Int]).getOrElse(0)
          val path = toLocal(df.get("file_path").toString)
          // spec inheritance: a null entry sequence_number on an ADDED
          // entry inherits the manifest's sequence number
          val seq = Option(e.getSchema.getField("sequence_number"))
            .flatMap(_ => Option(e.get("sequence_number")))
            .map(_.asInstanceOf[Long]).getOrElse(mSeq)
          content match {
            case 0 =>
              require(mContent == 0, s"data file $path in a delete manifest")
              // parquet/ORC through Spark's native sources, AVRO via
              // the explicit per-file reader (boundAvroScan); anything
              // else is a loud refusal, never a silent mis-read
              require(fmt == "PARQUET" || fmt == "ORC" || fmt == "AVRO",
                s"unsupported data file format: $fmt ($path)")
              val part = Option(df.getSchema.getField("partition"))
                .flatMap(_ => Option(df.get("partition")))
                .map(_.asInstanceOf[GenericRecord]).map { p =>
                  p.getSchema.getFields.asScala.map { f =>
                    f.name() -> (p.get(f.name()) match {
                      case u: org.apache.avro.util.Utf8 => u.toString
                      case other => other
                    })
                  }.toMap
                }.getOrElse(Map.empty[String, Any])
              data += DataFile(path, seq, fmt, part)
            case 1 if fmt == "PUFFIN" =>
              // v3 DELETION VECTOR: a blob inside a Puffin file scoped
              // to exactly one data file (replaces that file's position
              // deletes); the manifest carries the blob coordinates
              require(v >= 3,
                s"PUFFIN deletion vector in a format-version $v table ($path)")
              def longField(n: String): Long =
                Option(df.getSchema.getField(n)).flatMap(_ => Option(df.get(n)))
                  .map(_.asInstanceOf[Number].longValue()).getOrElse(
                    throw new IllegalArgumentException(
                      s"deletion vector without $n: $path"))
              val ref = Option(df.getSchema.getField("referenced_data_file"))
                .flatMap(_ => Option(df.get("referenced_data_file")))
                .map(r => toLocal(r.toString)).getOrElse(
                  throw new IllegalArgumentException(
                    s"deletion vector without referenced_data_file: $path"))
              deletes += DeleteFile(path, 1, seq, Nil, fmt, Some(DvRef(
                ref, longField("content_offset"),
                longField("content_size_in_bytes"))))
            case 1 =>
              require(fmt == "PARQUET" || fmt == "ORC" || fmt == "AVRO",
                s"unsupported delete file format: $fmt ($path)")
              deletes += DeleteFile(path, 1, seq, Nil, fmt)
            case 2 =>
              require(fmt == "PARQUET" || fmt == "ORC" || fmt == "AVRO",
                s"unsupported delete file format: $fmt ($path)")
              val ids = Option(df.getSchema.getField("equality_ids"))
                .flatMap(_ => Option(df.get("equality_ids"))).map {
                  case l: java.util.List[_] =>
                    l.asScala.map(_.asInstanceOf[Number].intValue()).toSeq
                  case other => throw new IllegalArgumentException(
                    s"bad equality_ids $other for $path")
                }.getOrElse(throw new UnsupportedOperationException(
                  s"equality delete without equality_ids: $path"))
              deletes += DeleteFile(path, 2, seq, ids, fmt)
            case other => throw new IllegalArgumentException(
              s"unknown data_file.content $other for $path")
          }
        }
      }
    }
    (data.result(), deletes.result())
  }

  /** Inverse of the exporter's manifest partition-value encoding
    * ([[IcebergExport]]'s `partitionValue`): one avro-decoded manifest
    * partition value → the directory string [[Partitioning]] records in
    * `FileEntry.partitionValues`. This is what lets an EXTERNAL
    * engine's commit land on a partitioned graft table with working
    * partition pruning: the engine declares each file's partition tuple
    * in its manifest (the Iceberg trust model — same as any Iceberg
    * catalog), and graft re-renders it in its own canonical directory
    * form. Loud on value shapes graft itself never writes
    * (identity on float/double stays refused both ways). Exactness is
    * spec-proven by round-trip: export a partitioned graft table, parse
    * its manifests back through [[filesOfManifestList]], and this
    * function must reproduce `FileEntry.partitionValues` bit-for-bit
    * (IcebergImportSpec).
    */
  private[graft] def rawPartitionValue(pf: PartitionField,
      srcType: DataType, v: Any): String = {
    if (v == null) return Partitioning.NullMarker
    def i = v.asInstanceOf[Number].intValue()
    def l = v.asInstanceOf[Number].longValue()
    def microsRaw(us: Long): String = {
      val ldt = java.time.LocalDateTime.ofEpochSecond(
        java.lang.Math.floorDiv(us, 1000000L),
        (java.lang.Math.floorMod(us, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
      val base = ldt.format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss"))
      val frac = java.lang.Math.floorMod(us, 1000000L)
      if (frac == 0L) base
      else base + "." + f"$frac%06d".reverse.dropWhile(_ == '0').reverse
    }
    pf.transform match {
      case "identity" => srcType match {
        case ByteType | ShortType | IntegerType | LongType => l.toString
        case StringType => v.toString
        case BooleanType => v.toString
        case DateType => java.time.LocalDate.ofEpochDay(l).toString
        case TimestampType | TimestampNTZType => microsRaw(l)
        case other => throw new UnsupportedOperationException(
          s"identity partition value on ${other.simpleString}")
      }
      case "bucket" => i.toString
      case "truncate" => srcType match {
        case ByteType | ShortType | IntegerType | LongType => l.toString
        case StringType => v.toString
        case other => throw new UnsupportedOperationException(
          s"truncate partition value on ${other.simpleString}")
      }
      case "years" => f"${1970 + i}%04d"
      case "months" =>
        f"${1970 + java.lang.Math.floorDiv(i, 12)}%04d-${java.lang.Math.floorMod(i, 12) + 1}%02d"
      case "days" => java.time.LocalDate.ofEpochDay(l).toString
      case "hours" =>
        java.time.LocalDateTime.ofEpochSecond(l * 3600L, 0,
          java.time.ZoneOffset.UTC).format(
          java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd-HH"))
      case other => throw new UnsupportedOperationException(
        s"unknown transform: $other")
    }
  }

  /** Incremental APPEND scan plan — the data files ADDED by each
    * snapshot in `(fromId, toId]` along the parent-snapshot chain (the
    * consumer-side analog of Iceberg's own IncrementalAppendScan, e.g.
    * Spark's `start-snapshot-id`/`end-snapshot-id` read options).
    * `fromId` None ⇒ from the beginning of history; `toId` None ⇒ the
    * current snapshot.
    *
    * Contract, loud on violation: snapshots whose summary operation is
    * `replace` (compaction — rewrites, no new rows) are skipped;
    * `overwrite`/`delete` snapshots REFUSE — an append-only consumer
    * crossing one would silently miss row deletions. Ancestor deletes
    * never apply to the added files (their data sequence numbers exceed
    * any older delete's), so the plan carries no delete files. Added
    * attribution follows the spec: manifests whose `added_snapshot_id`
    * is the snapshot, entries with ADDED status whose (explicit or
    * list-row-inherited) snapshot id matches — reused content-addressed
    * manifests in later snapshots therefore do NOT re-surface their
    * files.
    */
  def changesPlan(metadataLoc: String, fromId: Option[Long],
      toId: Option[Long]): Plan = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = mapper.readTree(readStringAt(resolveMetadataLoc(metadataLoc)))
    val (v, schema, idToName) = parseHeader(meta)
    val snaps = Option(meta.get("snapshots")).map(
      _.elements().asScala.toSeq).getOrElse(Nil)
    def nodeOpt(id: Long) = snaps.find(_.get("snapshot-id").asLong() == id)
    def node(id: Long) = nodeOpt(id)
      .getOrElse(throw new IllegalArgumentException(
        s"snapshot-id $id not in snapshots"))
    val headId = toId.orElse(Option(meta.get("current-snapshot-id"))
      .map(_.asLong()).filter(_ != -1L))
    if (headId.isEmpty) return Plan(v, schema, idToName, Nil, Nil)

    // parent walk newest → oldest, stopping AT fromId (exclusive). A
    // parent id that is no longer in `snapshots` marks the expiration
    // boundary (expireSnapshots never rewrites the oldest retained
    // snapshot's parent pointer) — crossing it means the range's appends
    // are not reconstructible, which REFUSES with the retention story
    // spelled out rather than a bare "not in snapshots" crash.
    val range = scala.collection.mutable.ListBuffer
      .empty[com.fasterxml.jackson.databind.JsonNode]
    var cur: Option[com.fasterxml.jackson.databind.JsonNode] =
      Some(node(headId.get))
    var expiredParent: Option[Long] = None
    while (cur.isDefined &&
        !fromId.contains(cur.get.get("snapshot-id").asLong())) {
      range += cur.get
      val pid = Option(cur.get.get("parent-snapshot-id"))
        .filterNot(_.isNull).map(_.asLong())
      cur = pid.flatMap(nodeOpt)
      if (pid.isDefined && cur.isEmpty) expiredParent = pid
    }
    if (cur.isEmpty && expiredParent.isDefined) {
      val oldest = range.last.get("snapshot-id").asLong()
      throw new IllegalArgumentException(fromId match {
        case Some(f) =>
          s"snapshot $f is not a RETAINED ancestor of ${headId.get} — " +
            s"history before snapshot $oldest was expired (parent " +
            s"${expiredParent.get} is gone); the appends since $f cannot " +
            "be reconstructed. Read the full snapshot (iceberg_import) " +
            s"instead, or scan the retained range with from_snapshot=$oldest"
        case None =>
          s"history before snapshot $oldest was expired (parent " +
            s"${expiredParent.get} is gone), so an appends-since-beginning " +
            "scan cannot be reconstructed. Read the full snapshot " +
            "(iceberg_import) instead, or pass " +
            s"from_snapshot=$oldest for the retained range"
      })
    }
    if (fromId.isDefined && cur.isEmpty)
      throw new IllegalArgumentException(
        s"snapshot ${fromId.get} is not an ancestor of ${headId.get}")

    val data = Seq.newBuilder[DataFile]
    range.toSeq.reverse.foreach { s => // oldest → newest
      val sid = s.get("snapshot-id").asLong()
      // `summary` (and its operation) is OPTIONAL in v1 metadata — a
      // summary-less snapshot might have deleted rows, so defaulting it
      // to "append" would silently miss deletions. Prove append-only
      // from the manifest list instead (no delete manifests, no
      // DELETED-status data entries) and refuse when the proof fails.
      val op = Option(s.get("summary")).flatMap(n => Option(n.get("operation")))
        .filterNot(_.isNull).map(_.asText()).getOrElse {
          if (provablyAppendOnly(toLocal(s.get("manifest-list").asText())))
            "append"
          else "summary-less (and not provably append-only)"
        }
      op match {
        case "replace" => () // compaction: rewritten rows, nothing new
        case "append" =>
          readAvro(toLocal(s.get("manifest-list").asText())).foreach { r =>
            // added_snapshot_id is REQUIRED by the spec (v1 and v2): a
            // manifest-list row without it cannot be attributed, and
            // defaulting it would silently drop that manifest's appends
            // from the incremental plan (a CDC consumer reading zero
            // rows for the batch, no error) — refuse loudly instead,
            // like every other unprovable shape here
            val addedBy = Option(r.getSchema.getField("added_snapshot_id"))
              .flatMap(_ => Option(r.get("added_snapshot_id")))
              .map(_.asInstanceOf[Long]).getOrElse(
                throw new UnsupportedOperationException(
                  s"manifest-list row of snapshot $sid carries no " +
                    "added_snapshot_id — appends cannot be attributed " +
                    "to snapshots; read via CALL iceberg_import instead"))
            val isData = Option(r.getSchema.getField("content"))
              .forall(_ => r.get("content").asInstanceOf[Int] == 0)
            if (isData && addedBy == sid) {
              val mPath = toLocal(r.get("manifest_path").toString)
              readAvro(mPath).foreach { e =>
                val entrySnap = Option(e.getSchema.getField("snapshot_id"))
                  .flatMap(_ => Option(e.get("snapshot_id")))
                  .map(_.asInstanceOf[Long]).getOrElse(addedBy)
                if (e.get("status").asInstanceOf[Int] == 1 && entrySnap == sid) {
                  val df = e.get("data_file").asInstanceOf[GenericRecord]
                  val fmt = df.get("file_format").toString.toUpperCase
                  val path = toLocal(df.get("file_path").toString)
                  require(fmt == "PARQUET" || fmt == "ORC" || fmt == "AVRO",
                    s"unsupported data file format: $fmt ($path)")
                  data += DataFile(path, 0L, fmt)
                }
              }
            }
          }
        case other => throw new UnsupportedOperationException(
          s"incremental append scan crossed a '$other' snapshot ($sid) — " +
            "rows were deleted or overwritten in the range; read full " +
            "snapshots and diff instead")
      }
    }
    Plan(v, schema, idToName, data.result(), Nil)
  }

  /** One snapshot's guard-relevant metadata: id, the summary's operation
    * (absent in summary-less v1 metadata), and its manifest-list
    * location — consumed by the `iceberg-changes` streaming guard, which
    * must classify snapshots it has not seen before without paying a
    * manifest scan for ordinary appends.
    */
  private[graft] final case class SnapshotInfo(id: Long,
      summaryOp: Option[String], manifestList: String)

  /** Every snapshot listed in the metadata at `metadataLoc` (JSON parse
    * only — no Avro IO).
    */
  private[graft] def snapshotInfos(metadataLoc: String): Seq[SnapshotInfo] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = mapper.readTree(readStringAt(resolveMetadataLoc(metadataLoc)))
    Option(meta.get("snapshots")).map(_.elements().asScala.toSeq)
      .getOrElse(Nil).map { s =>
        SnapshotInfo(s.get("snapshot-id").asLong(),
          Option(s.get("summary")).flatMap(n => Option(n.get("operation")))
            .filterNot(_.isNull).map(_.asText()),
          toLocal(s.get("manifest-list").asText()))
      }
  }

  /** [[provablyAppendOnly]] for callers outside this object (the
    * streaming guard's fallback classification of summary-less
    * snapshots).
    */
  private[graft] def provablyAppendOnlyAt(manifestListLoc: String): Boolean =
    provablyAppendOnly(manifestListLoc)

  /** True when the snapshot behind this manifest list removed live DATA
    * files (DELETED-status entries in a data manifest) — i.e. rows were
    * rewritten or deleted copy-on-write. Adding delete files does NOT
    * count (that is the MoR shape, governed separately by delete-file
    * presence). Checked from the list's `deleted_(data_)files_count`
    * when present, by an entry-status scan otherwise.
    */
  private[graft] def removedDataFiles(manifestListLoc: String): Boolean =
    readAvro(manifestListLoc).exists(r => manifestRemovesData(r).contains(true))

  /** Append-only proof for a summary-less snapshot: its manifest list
    * has no delete manifests (content != 0) and no manifest that removed
    * data files. Sound: an append never produces DELETED entries or
    * delete files; any rewrite/delete does.
    */
  private def provablyAppendOnly(manifestListLoc: String): Boolean =
    readAvro(manifestListLoc).forall(r => manifestRemovesData(r).contains(false))

  /** Does this manifest-list row's DATA manifest remove live files?
    * None for a delete manifest (content != 0 — the MoR shape, governed
    * separately). Checked from the spec's optional
    * `deleted_(data_)files_count` when present, by an explicit
    * entry-status scan of the manifest otherwise — the ONE probe behind
    * both [[removedDataFiles]] (∃ true) and [[provablyAppendOnly]]
    * (∀ false: no removals AND no delete manifests), so the two
    * classifiers can never drift on count-field handling.
    */
  private def manifestRemovesData(r: GenericRecord): Option[Boolean] = {
    val content = Option(r.getSchema.getField("content"))
      .map(_ => r.get("content").asInstanceOf[Int]).getOrElse(0)
    if (content != 0) None
    else Some {
      def cnt(n: String): Option[Int] =
        Option(r.getSchema.getField(n)).flatMap(_ => Option(r.get(n)))
          .map(_.asInstanceOf[Number].intValue())
      cnt("deleted_files_count").orElse(cnt("deleted_data_files_count")) match {
        case Some(c) => c > 0
        case None => readAvro(toLocal(r.get("manifest_path").toString))
          .exists(_.get("status").asInstanceOf[Int] == 2)
      }
    }
  }

  /** The rows APPENDED between two snapshots as a DataFrame (see
    * [[changesPlan]] for the contract). One distributed scan over the
    * added files only — O(changed data), never a re-read of the table.
    */
  def readChanges(spark: SparkSession, metadataLoc: String,
      fromId: Option[Long], toId: Option[Long]): DataFrame =
    readPlan(spark, changesPlan(metadataLoc, fromId, toId))

  /** Row-level CHANGES between two metadata VERSIONS of an external
    * Iceberg table, as `table schema + _change_type` ('insert' |
    * 'delete') — the consumer-side analog of graft's own
    * `TableOps.changesBetween`, with the same net-change contract:
    * only files whose VISIBILITY differs between the versions are read
    * (added/removed data files, or files whose applicable delete set
    * changed), each side's visible rows apply that side's deletes, and
    * the sides cancel through exceptAll. So a compaction (or any
    * rewrite preserving logical rows) nets to ZERO changes, a MoR
    * delete nets to exactly the deleted rows as retractions, and a CoW
    * update nets to the modified rows only. This is TOTAL over snapshot
    * shapes — unlike the append-only [[changesPlan]], nothing refuses —
    * at the cost of reading both sides of every changed file.
    *
    * Delete applicability is judged conservatively from manifests alone
    * (DV: referenced file; positional: data seq at-or-older; equality:
    * strictly older) — an over-match only reads a file on both sides
    * and cancels, never changes the result. Cost: O(changed files +
    * their applicable deletes), never a full re-read of the table.
    *
    * `fromMetaLoc` None ⇒ every live row at `toMetaLoc` is an insert
    * (the initial CDC batch).
    */
  def changesBetweenVersions(spark: SparkSession,
      fromMetaLoc: Option[String], toMetaLoc: String): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val planB = plan(toMetaLoc, None)
    val planA = fromMetaLoc.map(plan(_, None))
    planA.foreach { a =>
      def shape(s: StructType) = s.fields.map(f => (f.name, f.dataType)).toSeq
      if (shape(a.schema) != shape(planB.schema))
        throw new UnsupportedOperationException(
          s"CDC between versions with different schemas " +
            s"(${fromMetaLoc.get} vs $toMetaLoc); diff in two steps at " +
            "the evolution boundary")
    }
    def sig(p: Plan): Map[String, Seq[String]] =
      p.dataFiles.map(f => f.path -> p.deleteFiles.filter(d => d.dv match {
        case Some(r) => r.referencedFile == f.path
        case None => if (d.content == 1) d.seq >= f.seq else d.seq > f.seq
      }).map(_.path).sorted).toMap
    val sigA = planA.map(sig).getOrElse(Map.empty[String, Seq[String]])
    val sigB = sig(planB)
    val changedA = planA.map(_.dataFiles.filter(f =>
      !sigB.get(f.path).contains(sigA(f.path)))).getOrElse(Nil)
    val changedB = planB.dataFiles.filter(f =>
      !sigA.get(f.path).contains(sigB(f.path)))
    val visA = planA match {
      case Some(a) => readPlan(spark, a.copy(dataFiles = changedA))
      case None => readPlan(spark, planB.copy(dataFiles = Nil))
    }
    val visB = readPlan(spark, planB.copy(dataFiles = changedB))
    visB.exceptAll(visA).withColumn("_change_type", lit("insert"))
      .unionByName(
        visA.exceptAll(visB).withColumn("_change_type", lit("delete")))
  }

  /** The table's current snapshot as a DataFrame (schema order/types per
    * the Iceberg schema, positional AND equality deletes applied with
    * the spec's sequence-number semantics: a positional delete masks
    * rows of the file it names; an equality delete masks matching rows
    * in data files with a STRICTLY LOWER data sequence number).
    */
  def read(spark: SparkSession, metadataPath: Path): DataFrame =
    read(spark, metadataPath.toString, None)

  def read(spark: SparkSession, metadataPath: Path,
      snapshotId: Option[Long]): DataFrame =
    read(spark, metadataPath.toString, snapshotId)

  /** Read a specific snapshot of a history export (None = current).
    * `metadataLoc` may be a local path or a Hadoop-scheme URI.
    */
  def read(spark: SparkSession, metadataLoc: String,
      snapshotId: Option[Long]): DataFrame =
    readPlan(spark, plan(metadataLoc, snapshotId))

  /** The distributed read of an already-planned file set (shared by
    * [[read]] and [[readChanges]]; `private[graft]` so callers that
    * already hold a Plan — e.g. the CALL procedures, which report plan
    * file counts — don't re-walk the metadata/manifest tree to read it).
    */
  private[graft] def readPlan(spark: SparkSession, p: Plan): DataFrame = {
    val outCols = p.schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name))
    if (p.dataFiles.isEmpty)
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), p.schema)
    var data = boundScan(spark, p, p.positionDeletes.nonEmpty)

    val anyDeletes = p.positionDeletes.nonEmpty || p.equalityDeletes.nonEmpty
    if (anyDeletes) {
      // Spark renders local paths as file:/..., manifests as file:///...
      // — normalize every path column to one form before comparing
      data = data.withColumn("__ice_path", normPath(col("__ice_fp")))
      // data sequence number via a broadcast (path → seq) lookup — both
      // delete kinds compare against it: positional at `<=`, equality
      // strictly `<` (the spec's applicability rules), so rows from
      // files newer than the delete survive even when they match
      val seqDf = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          p.dataFiles.map(f => org.apache.spark.sql.Row(
            normStr(f.path), f.seq)).asJava),
        StructType(Seq(StructField("__ice_seq_path", StringType),
          StructField("__ice_seq", LongType))))
      data = data.join(broadcast(seqDf),
        col("__ice_path") === col("__ice_seq_path"), "left")
        .drop("__ice_seq_path")
    }

    if (p.positionDeletes.nonEmpty) {
      val (dvs, fileDeletes) = p.positionDeletes.partition(_.dv.isDefined)
      // stamp each delete row with ITS OWN file's sequence number (a
      // broadcast join on the delete file's _metadata path — delete
      // manifests carry the seq, the rows don't): an external v2 table
      // that drops a data file and later re-adds the same path must not
      // see stale position deletes re-applied to the new file
      val delSeqDf = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          fileDeletes.map(f => org.apache.spark.sql.Row(
            normStr(f.path), f.seq)).asJava),
        StructType(Seq(StructField("__ice_del_src", StringType),
          StructField("__ice_del_seq", LongType))))
      // delete files themselves come in any of the three data formats
      // (`write.delete.format`); each format group reads through its
      // own source and the groups union — positional delete schema is
      // fixed by the spec (file_path string, pos long; reserved ids)
      val posSchema = StructType(Seq(StructField("file_path", StringType),
        StructField("pos", LongType)))
      val delRowsSchema = StructType(Seq(
        StructField("__ice_del_path", StringType),
        StructField("__ice_del_pos", LongType),
        StructField("__ice_del_seq", LongType)))
      val fileDelRows = fileDeletes.groupBy(_.format).toSeq.sortBy(_._1)
        .map {
          case ("PARQUET", fs) => spark.read.parquet(fs.map(_.path): _*)
            .select(normPath(col("file_path")).as("__ice_del_path"),
              col("pos").cast(LongType).as("__ice_del_pos"),
              normPath(col("_metadata.file_path")).as("__ice_del_src_path"))
          case ("ORC", fs) =>
            spark.read.schema(posSchema).orc(fs.map(_.path): _*)
              .select(normPath(col("file_path")).as("__ice_del_path"),
                col("pos").as("__ice_del_pos"),
                normPath(col("_metadata.file_path")).as("__ice_del_src_path"))
          case ("AVRO", fs) => avroScan(spark, fs.map(_.path), posSchema,
            Map("file_path" -> 2147483546, "pos" -> 2147483545))
            .select(normPath(col("file_path")).as("__ice_del_path"),
              col("pos").as("__ice_del_pos"),
              normPath(col("__ice_fp")).as("__ice_del_src_path"))
          case (other, fs) => throw new IllegalStateException(
            s"unreachable delete format $other (${fs.head.path})")
        }
        .map(_.join(broadcast(delSeqDf),
          col("__ice_del_src_path") === col("__ice_del_src"))
          .select(col("__ice_del_path"), col("__ice_del_pos"),
            col("__ice_del_seq")))
      // v3 deletion vectors: each DV's roaring bitmap expands into
      // (referenced file, position) rows IN EXECUTORS — one task per
      // DV, no driver-side materialization of potentially-millions of
      // positions; the seq rides the task payload (no lookup join)
      val dvRows =
        if (dvs.isEmpty) None
        else Some(dvDeleteRows(spark, dvs, delRowsSchema))
      val del = (fileDelRows ++ dvRows).reduce(_ unionByName _)
      data = data
        .withColumn("__ice_pos", col("__ice_ri"))
        .join(del, col("__ice_path") === col("__ice_del_path") &&
          col("__ice_pos") === col("__ice_del_pos") &&
          col("__ice_seq") <= col("__ice_del_seq"), "left_anti")
        .drop("__ice_pos")
    }

    if (p.equalityDeletes.nonEmpty) {
      // one anti-join per (column set, sequence) group; external writers
      // produce few groups (typically one flink/CDC writer per schema)
      p.equalityDeletes.groupBy(d => (d.equalityIds, d.seq)).toSeq
        .sortBy { case ((ids, seq), _) => (ids.mkString(","), seq) }
        .foreach { case ((ids, seq), files) =>
          val cols = ids.map(id => p.fieldIdToName.getOrElse(id,
            throw new IllegalArgumentException(
              s"equality_ids references unknown field id $id")))
          val eqSchema = StructType(cols.map(c =>
            p.schema.fields.find(_.name == c).getOrElse(
              throw new IllegalArgumentException(
                s"equality column $c missing from the table schema"))))
          val del = files.groupBy(_.format).toSeq.sortBy(_._1)
            .map {
              case ("PARQUET", fs) => spark.read.parquet(fs.map(_.path): _*)
              case ("ORC", fs) =>
                spark.read.schema(eqSchema).orc(fs.map(_.path): _*)
              case ("AVRO", fs) => avroScan(spark, fs.map(_.path), eqSchema,
                cols.zip(ids).toMap)
              case (other, fs) => throw new IllegalStateException(
                s"unreachable delete format $other (${fs.head.path})")
            }
            .map(_.select(cols.map(c => col(c).as(s"__ice_eq_$c")): _*))
            .reduce(_ unionByName _)
            .distinct()
          // null-safe equality per the spec (a null in the delete row
          // matches a null in the data row)
          val cond = cols.map(c => col(c) <=> col(s"__ice_eq_$c"))
            .reduce(_ && _) && col("__ice_seq") < lit(seq)
          data = data.join(del, cond, "left_anti")
        }
      data = data.drop("__ice_seq")
    }
    data.select(outCols.toSeq: _*)
  }

  /** Data scan with the spec's column-binding rules, emitting the
    * Iceberg-named data columns plus `__ice_fp` / `__ice_ri` (file
    * path / row position, for delete application; `__ice_ri` is null
    * for ORC rows when no positional deletes need it — see
    * [[boundOrcScan]] for the ORC position derivation).
    *
    * Binding is FIELD-ID-FIRST: if the first data file's footer
    * carries field ids (parquet field ids / ORC `iceberg.id`
    * attributes — external Iceberg engines stamp both), every file's
    * footer id→name mapping is
    * read and files are grouped by it; each group is scanned under its
    * own physical names and renamed to the schema names, so a column
    * renamed by the external engine binds by ID instead of silently
    * null-filling under its old name. Ids the footer lacks fall back
    * to name mapping per the spec. Footer probing is driver-side
    * O(files) — the cost Iceberg's own per-task footer opens pay at
    * execution instead — and is SKIPPED entirely (one probe) for
    * id-less tables, which includes every graft export.
    *
    * Id-less path: EXPLICIT schema, not footer inference — after
    * additive schema evolution a snapshot legitimately mixes files
    * with and without the newer columns, and inference would bind to
    * one arbitrary file's footer. Name-mapping semantics: absent
    * column → null.
    */
  private def boundScan(spark: SparkSession, p: Plan,
      needPositions: Boolean): DataFrame = {
    val byFmt = p.dataFiles.groupBy(_.format)
    val parts = Seq.newBuilder[DataFrame]
    byFmt.get("ORC").foreach(fs =>
      parts += boundOrcScan(spark, p, fs.map(_.path), needPositions))
    byFmt.get("PARQUET").foreach(fs => parts += boundFormatScan(
      spark, p, fs.map(_.path),
      Seq(col("_metadata.file_path").as("__ice_fp"),
        col("_metadata.row_index").as("__ice_ri")),
      footerIds(spark, _),
      (schema, files) => spark.read.schema(schema).parquet(files: _*)))
    byFmt.get("AVRO").foreach(fs =>
      parts += boundAvroScan(spark, p, fs.map(_.path)))
    parts.result().reduce(_ unionByName _)
  }

  /** AVRO data files (iceberg-core's third data format; Flink/CDC
    * writers emit them). This Spark build ships no Avro file source,
    * so the scan is an explicit per-file distributed read: one task
    * opens its file through the Hadoop FS (conf rebuilt from a
    * broadcast key-value snapshot of the session's), streams
    * GenericRecords through avro's DataFileReader, binds TOP-LEVEL
    * columns FIELD-ID-FIRST from the writer schema's `field-id` props
    * (iceberg-avro stamps them; plain-name binding when absent, absent
    * column → null per name mapping) and converts values by the table
    * schema's Spark type ([[avroValue]]). Row positions are EXACT for
    * free — the task counts records in file order — so positional
    * deletes need no derivation at all (cf. the ORC path). Files are
    * deliberately not split: an avro split cannot know its global row
    * offset without reading every prior block header, so it is one
    * task per file — the same per-file task shape Iceberg's own avro
    * readers use.
    */
  private def boundAvroScan(spark: SparkSession, p: Plan,
      files: Seq[String]): DataFrame =
    avroScan(spark, files, p.schema, p.fieldIdToName.map(_.swap))

  /** The reusable avro row scan behind [[boundAvroScan]] — also reads
    * avro-format DELETE files (`write.delete.format=avro` tables),
    * whose rows are plain records under the same binding rules.
    * Emits `schema` columns + `__ice_fp` (canonical file path) +
    * `__ice_ri` (exact row position in file order).
    */
  private[graft] def avroScan(spark: SparkSession, files: Seq[String],
      schema: StructType, nameToId: Map[String, Int]): DataFrame = {
    val bc = broadcastHadoopConf(spark)
    val canonical = files.map(f =>
      if (hasScheme(f)) f else normStr(new java.io.File(f).getAbsolutePath))
    val rdd = spark.sparkContext
      .parallelize(canonical, canonical.size)
      .flatMap { path =>
        val conf = rebuildHadoopConf(bc.value)
        val rd = new DataFileReader[GenericRecord](
          new org.apache.avro.mapred.FsInput(
            new org.apache.hadoop.fs.Path(path), conf),
          new GenericDatumReader[GenericRecord]())
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ =>
            try rd.close() catch { case _: Exception => () }))
        val binder = avroBinder(rd.getSchema, schema.fieldNames.toSeq, nameToId)
        var i = -1L
        rd.iterator().asScala.map { rec =>
          i += 1
          org.apache.spark.sql.Row.fromSeq(
            schema.fields.toSeq.map(f =>
              binder.get(f.name)
                .map(an => avroValue(rec.get(an), f.dataType)).orNull)
              :+ path :+ i)
        }
      }
    spark.createDataFrame(rdd, StructType(schema.fields.toSeq :+
      StructField("__ice_fp", StringType) :+
      StructField("__ice_ri", LongType)))
  }

  /** v3 deletion vectors → delete rows `(__ice_del_path, __ice_del_pos,
    * __ice_del_seq)`. One task per DV reads its blob slice from the
    * Puffin file through the Hadoop FS and expands the 64-bit roaring
    * bitmap ([[parseDvBlob]]); the referenced path is canonicalized
    * DRIVER-side (same [[normStr]] form the data scan's `__ice_path`
    * carries) so the anti-join keys match without re-normalization.
    */
  private def dvDeleteRows(spark: SparkSession, dvs: Seq[DeleteFile],
      schema: StructType): DataFrame = {
    val bc = broadcastHadoopConf(spark)
    val payload = dvs.map { d =>
      val r = d.dv.get
      (normStr(r.referencedFile),
        if (hasScheme(d.path)) d.path
        else normStr(new java.io.File(d.path).getAbsolutePath),
        r.offset, r.length, d.seq)
    }
    val rdd = spark.sparkContext.parallelize(payload, payload.size)
      .flatMap { case (ref, puffin, off, len, seq) =>
        val conf = rebuildHadoopConf(bc.value)
        val hp = new org.apache.hadoop.fs.Path(puffin)
        val fs = hp.getFileSystem(conf)
        val bytes = new Array[Byte](len.toInt)
        scala.util.Using.resource(fs.open(hp)) { in =>
          in.seek(off); in.readFully(bytes)
        }
        parseDvBlob(bytes, puffin).map(pos =>
          org.apache.spark.sql.Row(ref, pos, seq))
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Decode one v3 deletion-vector blob into sorted row positions.
    * Layout per the Iceberg v3 spec: 4-byte BIG-endian length of
    * (magic + vector), the magic bytes D1 D3 39 64, the vector — the
    * 64-bit roaring bitmap "portable" serialization: 8-byte LE bitmap
    * count, then per bitmap a 4-byte LE high-32 key + a standard
    * 32-bit roaring serialization — and a 4-byte BIG-endian CRC-32 of
    * (magic + vector). Malformed blobs refuse loudly (a truncated or
    * mis-offset read must never silently delete the wrong rows).
    */
  private[graft] def parseDvBlob(bytes: Array[Byte],
      src: String): Seq[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    require(bytes.length >= 12, s"deletion vector blob too short ($src)")
    val innerLen = bb.getInt // big-endian
    require(innerLen >= 4 && innerLen <= bytes.length - 8,
      s"deletion vector length $innerLen inconsistent with blob " +
        s"${bytes.length} ($src)")
    val magic = Array(bb.get(), bb.get(), bb.get(), bb.get())
    require(magic.map(_ & 0xff).toSeq == Seq(0xd1, 0xd3, 0x39, 0x64),
      s"bad deletion vector magic ($src)")
    val crc = new java.util.zip.CRC32()
    crc.update(bytes, 4, innerLen)
    val stored = java.nio.ByteBuffer.wrap(bytes, 4 + innerLen, 4).getInt
    require(stored == crc.getValue.toInt,
      s"deletion vector CRC mismatch ($src)")
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes, 8, innerLen - 4))
    def leInt(): Int = java.lang.Integer.reverseBytes(in.readInt())
    def leLong(): Long = java.lang.Long.reverseBytes(in.readLong())
    val nBitmaps = leLong()
    require(nBitmaps >= 0 && nBitmaps <= Int.MaxValue,
      s"deletion vector bitmap count $nBitmaps ($src)")
    val out = Seq.newBuilder[Long]
    (0L until nBitmaps).foreach { _ =>
      val key = leInt().toLong & 0xffffffffL
      val rb = new org.roaringbitmap.RoaringBitmap()
      rb.deserialize(in)
      val it = rb.getIntIterator
      while (it.hasNext) out += (key << 32) | (it.next().toLong & 0xffffffffL)
    }
    out.result()
  }

  /** table-schema column name → avro writer-schema field name.
    * Field-id-first when the writer schema carries any `field-id`
    * props; plain name binding otherwise. Unmatched names are absent
    * from the map (null-filled by the caller — name-mapping semantics).
    */
  private[versioned] def avroBinder(writer: org.apache.avro.Schema,
      names: Seq[String], nameToId: Map[String, Int]): Map[String, String] = {
    // iceberg-avro stamps field-id as a NUMERIC json prop — read via
    // getObjectProp (getProp is textual-only and would return null)
    def idOf(f: org.apache.avro.Schema.Field): Option[Int] =
      Option(f.getObjectProp("field-id")).flatMap {
        case n: Number => Some(n.intValue())
        case s: String => scala.util.Try(s.trim.toInt).toOption
        case _ => None
      }
    val fields = writer.getFields.asScala
    val hasIds = fields.exists(f => idOf(f).isDefined)
    names.flatMap { n =>
      val target =
        if (hasIds) nameToId.get(n).flatMap(id =>
          fields.find(f => idOf(f).contains(id)).map(_.name()))
          // a writer field the footer stamped NO id for still binds by
          // name (the spec's name-mapping fallback — the parquet/ORC
          // paths do the same); without this a later-added column in a
          // partially-id-stamped avro file silently reads as null.
          // The fallback applies ONLY to id-less writer fields: an old
          // file whose `x` carries a RETIRED id (column dropped and
          // re-added under a fresh id) must read as null, not as the
          // dead column's bytes.
          .orElse(Option(writer.getField(n))
            .filter(f => idOf(f).isEmpty).map(_.name()))
        else Option(writer.getField(n)).map(_.name())
      target.map(n -> _)
    }.toMap
  }

  /** One avro datum → the Spark-external value for `dt` (recursive).
    * Covers the Iceberg avro encodings: micros timestamps, epoch-day
    * dates, unscaled-big-endian decimals (bytes or fixed), string maps
    * AND the k/v-record-list encoding for non-string keys.
    */
  private[versioned] def avroValue(v: Any, dt: DataType): Any =
    if (v == null) null
    else dt match {
      case IntegerType => v.asInstanceOf[Number].intValue()
      case LongType => v.asInstanceOf[Number].longValue()
      case FloatType => v.asInstanceOf[Number].floatValue()
      case DoubleType => v.asInstanceOf[Number].doubleValue()
      case BooleanType => v
      case StringType => v.toString
      case BinaryType => avroBytes(v)
      case d: DecimalType => new java.math.BigDecimal(
        new java.math.BigInteger(avroBytes(v)), d.scale)
      case DateType =>
        java.time.LocalDate.ofEpochDay(v.asInstanceOf[Number].longValue())
      case TimestampType =>
        val us = v.asInstanceOf[Number].longValue()
        java.time.Instant.ofEpochSecond(
          Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)
      case TimestampNTZType =>
        val us = v.asInstanceOf[Number].longValue()
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(us, 1000000L),
          (Math.floorMod(us, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      case st: StructType =>
        val rec = v.asInstanceOf[GenericRecord]
        org.apache.spark.sql.Row.fromSeq(st.fields.toSeq.map(f =>
          Option(rec.getSchema.getField(f.name))
            .map(_ => avroValue(rec.get(f.name), f.dataType)).orNull))
      case ArrayType(et, _) =>
        v.asInstanceOf[java.util.Collection[_]].asScala
          .map(avroValue(_, et)).toSeq
      case MapType(kt, vt, _) => v match {
        case m: java.util.Map[_, _] => m.asScala.map { case (k, mv) =>
          avroValue(k, kt) -> avroValue(mv, vt) }.toMap
        case c: java.util.Collection[_] => c.asScala.map {
          case r: GenericRecord =>
            avroValue(r.get("key"), kt) -> avroValue(r.get("value"), vt)
        }.toMap
        case other => throw new UnsupportedOperationException(
          s"unsupported avro map encoding: ${other.getClass}")
      }
      case other => throw new UnsupportedOperationException(
        s"unsupported Spark type for avro import: $other")
    }

  private def avroBytes(v: Any): Array[Byte] = v match {
    case b: java.nio.ByteBuffer =>
      val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
    case f: org.apache.avro.generic.GenericFixed => f.bytes().clone()
    case a: Array[Byte] => a
    case other => throw new UnsupportedOperationException(
      s"unsupported avro binary encoding: ${other.getClass}")
  }

  /** ORC data files (Hive-lineage shops; iceberg-core writes ORC too).
    * Binding is field-id-first like parquet — iceberg-orc stamps each
    * column's field id as the ORC type attribute `iceberg.id`
    * ([[orcFooterIds]]) — with name binding (name-mapping semantics:
    * absent column → null) when the footers carry no ids.
    *
    * Spark's ORC `_metadata` struct has NO `row_index` (parquet-only in
    * this build), so when positional deletes are in the snapshot the
    * per-file row position is DERIVED: `file_block_start` identifies
    * each file split, a count-only second scan (column-pruned to the
    * meta struct — stripe-metadata cheap) sizes every split, a running
    * sum over splits of one file yields each split's starting row
    * offset (O(splits) rows, broadcast back), and
    * `row_number() OVER (PARTITION BY file, split ORDER BY
    * monotonically_increasing_id)` indexes rows WITHIN a split — valid
    * because one split is read by exactly one task in file order, so
    * monotonic ids ascend with row position there. Costs one extra
    * count pass + one window shuffle over the ORC rows ONLY when the
    * snapshot actually carries positional deletes; clean/equality-only
    * snapshots stay a single scan.
    */
  private def boundOrcScan(spark: SparkSession, p: Plan,
      files: Seq[String], needPositions: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val metaCols =
      if (needPositions)
        Seq(col("_metadata.file_path").as("__ice_fp"),
          col("_metadata.file_block_start").as("__ice_bs"),
          monotonically_increasing_id().as("__ice_mono"))
      else Seq(col("_metadata.file_path").as("__ice_fp"),
        lit(null).cast(LongType).as("__ice_ri"))
    val base = boundFormatScan(spark, p, files, metaCols,
      orcFooterIds(spark, _),
      (schema, fs) => spark.read.schema(schema).orc(fs: _*))
    if (!needPositions) base
    else {
      // counts come from BASE ITSELF, never a separate scan: split
      // boundaries depend on the scanned file SET (bytes-per-core term
      // of maxSplitBytes), so a second all-files scan could split
      // differently from the per-id-group scans inside base and the
      // (file, block_start) join keys would not line up — dropping rows
      // or mis-offsetting positions. Recomputing base's subtree re-plans
      // the same per-group scans over the same file sets: identical keys
      // by construction (projection does not affect split sizing).
      val counts = base.groupBy("__ice_fp", "__ice_bs")
        .agg(count(lit(1)).as("__ice_n"))
      val offsets = counts.withColumn("__ice_off",
        sum("__ice_n").over(
          Window.partitionBy("__ice_fp").orderBy("__ice_bs"))
          - col("__ice_n")).drop("__ice_n")
      base.join(broadcast(offsets), Seq("__ice_fp", "__ice_bs"))
        .withColumn("__ice_ri", col("__ice_off")
          + row_number().over(Window.partitionBy("__ice_fp", "__ice_bs")
            .orderBy("__ice_mono")) - 1)
        .drop("__ice_bs", "__ice_mono", "__ice_off")
    }
  }

  /** One format's data files under the spec's column-binding rules:
    * field-id-first when the first file's footer carries ids (files
    * grouped by their id→name map, each group scanned under its own
    * physical names and renamed to schema names), explicit-schema name
    * binding otherwise. See [[boundScan]]'s Scaladoc for why the
    * id-less path never infers from footers.
    */
  private def boundFormatScan(spark: SparkSession, p: Plan,
      dataPaths: Seq[String], metaCols: Seq[Column],
      probe: String => Option[Map[Int, String]],
      readFiles: (StructType, Seq[String]) => DataFrame): DataFrame = {
    // probe EVERY file (parallel footer reads), never just the head: a
    // migrated table mixes id-less files (name-mapping writers) with
    // id-stamped ones (Iceberg engines), and if the head happened to be
    // id-less, binding ALL files by name would silently null-fill any
    // column an engine renamed in the id-stamped files — an outcome
    // that flipped with manifest ordering
    val probed = Manifests.fanOut(dataPaths, 2)(f =>
      (probe(f).getOrElse(Map.empty[Int, String]), f))
    probed.filter(_._1.nonEmpty) match {
      case Seq() =>
        readFiles(p.schema, dataPaths)
          .select(p.schema.fields.map(f => col(f.name)).toSeq ++ metaCols: _*)
      case _ =>
        val nameToId = p.fieldIdToName.map(_.swap)
        probed
          .groupBy(_._1).view.mapValues(_.map(_._2)).toSeq
          .sortBy(_._2.head)
          .map { case (idMap, files) =>
            val physNames = p.schema.fields.map(f =>
              idMap.getOrElse(nameToId(f.name), f.name))
            if (physNames.distinct.length != physNames.length)
              throw new UnsupportedOperationException(
                s"field-id binding of ${files.head} maps two schema " +
                  s"columns to one physical name (${physNames.mkString(", ")})" +
                  " — refusing rather than mis-binding")
            val physSchema = StructType(p.schema.fields.zip(physNames)
              .map { case (f, n) => f.copy(name = n) })
            readFiles(physSchema, files)
              .select(p.schema.fields.zip(physNames)
                .map { case (f, n) => col(n).as(f.name) }.toSeq ++ metaCols: _*)
          }.reduce(_ unionByName _)
    }
  }

  /** The footer's field-id → column-name map of one ORC file (from the
    * `iceberg.id` type attributes iceberg-orc stamps), or None when the
    * file carries no ids (name-mapping writers, plain Spark ORC).
    */
  private def orcFooterIds(spark: SparkSession,
      path: String): Option[Map[Int, String]] = {
    val rd = org.apache.orc.OrcFile.createReader(
      new org.apache.hadoop.fs.Path(
        if (hasScheme(path)) path else new java.io.File(path).toURI.toString),
      org.apache.orc.OrcFile.readerOptions(spark.sessionState.newHadoopConf()))
    try {
      val s = rd.getSchema
      val ids = s.getFieldNames.asScala.zip(s.getChildren.asScala)
        .flatMap { case (n, t) => Option(t.getAttributeValue("iceberg.id"))
          .flatMap(v => scala.util.Try(v.trim.toInt).toOption).map(_ -> n) }
        .toMap
      if (ids.isEmpty) None else Some(ids)
    } finally rd.close()
  }

  /** The footer's field-id → column-name map of one parquet file, or
    * None when the file carries no ids (name-mapping writers).
    */
  private def footerIds(spark: SparkSession,
      path: String): Option[Map[Int, String]] = {
    val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(
          if (hasScheme(path)) path else new java.io.File(path).toURI.toString),
        spark.sessionState.newHadoopConf()))
    try {
      val ids = rd.getFooter.getFileMetaData.getSchema.getFields.asScala
        .flatMap(f => Option(f.getId).map(id => id.intValue() -> f.getName))
        .toMap
      if (ids.isEmpty) None else Some(ids)
    } finally rd.close()
  }

  /** Serializable snapshot of the session Hadoop conf for executor-side
    * FS access (Configuration itself does not serialize); rebuild on the
    * executor with [[rebuildHadoopConf]].
    */
  private def broadcastHadoopConf(spark: SparkSession)
      : org.apache.spark.broadcast.Broadcast[Map[String, String]] = {
    val c = spark.sessionState.newHadoopConf()
    spark.sparkContext.broadcast(
      c.iterator().asScala.map(e => e.getKey -> e.getValue).toMap)
  }

  private[versioned] def rebuildHadoopConf(
      m: Map[String, String]): org.apache.hadoop.conf.Configuration = {
    val conf = new org.apache.hadoop.conf.Configuration(false)
    m.foreach { case (k, v) => conf.set(k, v) }
    conf
  }

  /** Guard for callers that scan plan parquet files OUTSIDE
    * [[boundScan]]'s field-id-first binding (the streaming source binds
    * by NAME through one shared DSv2 reader factory, which cannot switch
    * physical schemas per file group): if any file's footer ids map a
    * schema column to a DIFFERENT physical name (external engine renamed
    * a column after writing), a name-bound scan would silently null-fill
    * it — refuse loudly instead. Id-less files (every graft export) pass
    * with a single probe.
    */
  private[graft] def assertNameBindable(spark: SparkSession, p: Plan,
      files: Seq[String]): Unit = {
    if (files.isEmpty) return
    // probe every file, not just the head: a mixed table (id-less files
    // behind an id-stamped tail, or vice versa) must be checked per
    // file — the loop below naturally skips id-less footers
    val nameToId = p.fieldIdToName.map(_.swap)
    files.foreach { f =>
      footerIds(spark, f).foreach { idMap =>
        val drifted = p.schema.fields.flatMap(sf =>
          nameToId.get(sf.name).flatMap(idMap.get)
            .filter(_ != sf.name).map(phys => s"${sf.name} (stored as $phys)"))
        if (drifted.nonEmpty) throw new UnsupportedOperationException(
          s"$f stores column(s) ${drifted.mkString(", ")} under a " +
            "physical name the schema renamed away — a name-bound " +
            "stream would silently null-fill them. Read via CALL " +
            "iceberg_import (field-id binding) instead")
      }
    }
  }

  /** Driver-side twin of [[normPath]] for plan paths ([[toLocal]] output:
    * absolute local paths or non-file URIs) — renders the same canonical
    * form `normPath(_metadata.file_path)` produces on executors.
    */
  private[graft] def normStr(s: String): String =
    if (s.startsWith("/")) "file://" + s
    else if (s.startsWith("file:"))
      "file:///" + s.stripPrefix("file:").dropWhile(_ == '/')
    else s

  /** file:/x, file://x, file:///x → file:///x (other schemes untouched). */
  private def normPath(c: Column): Column =
    regexp_replace(c, "^file:/+", "file:///")

  /** URI string or bare path → form Spark's parquet reader accepts. */
  private def toLocal(s: String): String =
    if (s.startsWith("file:")) Paths.get(java.net.URI.create(s)).toString
    else s

  private def readAvro(p: String): Seq[GenericRecord] = {
    val rd = new DataFileReader[GenericRecord](
      new org.apache.avro.file.SeekableByteArrayInput(readBytesAt(p)),
      new GenericDatumReader[GenericRecord]())
    try rd.iterator().asScala.toList finally rd.close()
  }

  private val DecimalRe = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r

  /** A schema/struct type node → Spark StructType (recursive). */
  private[versioned] def structOf(node: com.fasterxml.jackson.databind.JsonNode)
      : StructType = {
    // absent/misshapen members are the CLIENT's error (a 400 at the
    // REST layer), never a server NPE
    val fields = Option(node.get("fields")).getOrElse(
      throw new IllegalArgumentException("schema carries no 'fields'"))
    StructType(fields.elements().asScala.map { f =>
      val name = Option(f.get("name")).getOrElse(
        throw new IllegalArgumentException("schema field missing 'name'"))
      val typ = Option(f.get("type")).getOrElse(
        throw new IllegalArgumentException(
          s"schema field '${name.asText()}' missing 'type'"))
      StructField(name.asText(), sparkTypeNode(typ),
        nullable = !f.get("required").asBoolean(false))
    }.toSeq)
  }

  /** An Iceberg type node — textual primitive, or object struct/list/map
    * — to its Spark type. */
  private[versioned] def sparkTypeNode(n: com.fasterxml.jackson.databind.JsonNode)
      : DataType =
    if (n.isTextual) sparkType(n.asText())
    else n.get("type").asText() match {
      case "struct" => structOf(n)
      case "list" =>
        ArrayType(sparkTypeNode(n.get("element")),
          containsNull = !n.get("element-required").asBoolean(false))
      case "map" =>
        MapType(sparkTypeNode(n.get("key")), sparkTypeNode(n.get("value")),
          valueContainsNull = !n.get("value-required").asBoolean(false))
      case other => throw new UnsupportedOperationException(
        s"unsupported Iceberg type for import: $other")
    }

  private def sparkType(t: String): DataType = t match {
    case "int" => IntegerType
    case "long" => LongType
    case "float" => FloatType
    case "double" => DoubleType
    case "boolean" => BooleanType
    case "string" => StringType
    case "binary" => BinaryType
    case "date" => DateType
    case "timestamptz" => TimestampType
    case "timestamp" => TimestampNTZType
    case "uuid" => StringType
    case DecimalRe(p, s) => DecimalType(p.toInt, s.toInt)
    case other => throw new UnsupportedOperationException(
      s"unsupported Iceberg type for import: $other")
  }
}
