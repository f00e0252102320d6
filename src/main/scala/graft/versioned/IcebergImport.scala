package graft.versioned

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, regexp_replace}
import org.apache.spark.sql.types._

/** Read an APACHE ICEBERG table (spec v1 or v2) from its metadata JSON —
  * an independent, spec-driven reader: metadata JSON → manifest list →
  * manifests (Avro) → parquet data files minus positional deletes.
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
  * only (no time travel), PARQUET data files, positional deletes
  * (equality deletes — which this engine never writes — are refused),
  * and flat schemas (the only shape graft tables have). Column binding
  * is BY NAME — correct for any writer that uses
  * `schema.name-mapping.default` with physical names, which includes
  * every [[IcebergExport]] output.
  */
object IcebergImport {

  /** Planned current-snapshot file sets of an Iceberg table. */
  final case class Plan(
      formatVersion: Int,
      schema: StructType,
      dataFiles: Seq[String],
      deleteFiles: Seq[String])

  /** Parse metadata JSON + manifests into the current snapshot's plan. */
  def plan(metadataPath: Path): Plan = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = mapper.readTree(Files.readString(metadataPath))
    val v = meta.get("format-version").asInt()
    require(v == 1 || v == 2, s"unsupported Iceberg format-version: $v")

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
    val schema = StructType(schemaNode.get("fields").elements().asScala.map { f =>
      StructField(f.get("name").asText(), sparkType(f.get("type").asText()),
        nullable = !f.get("required").asBoolean(false))
    }.toSeq)

    val snapIdOpt = Option(meta.get("current-snapshot-id")).map(_.asLong())
      .filter(_ != -1L)
    if (snapIdOpt.isEmpty) return Plan(v, schema, Nil, Nil) // empty table
    val snapId = snapIdOpt.get
    val snap = meta.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong() == snapId)
      .getOrElse(throw new IllegalArgumentException(
        s"current-snapshot-id $snapId not in snapshots"))
    val listPath = toLocal(snap.get("manifest-list").asText())

    // manifest list → (manifest path, content); v1 has no content field
    val manifests = readAvro(listPath).map { r =>
      val content = Option(r.getSchema.getField("content"))
        .map(_ => r.get("content").asInstanceOf[Int]).getOrElse(0)
      (toLocal(r.get("manifest_path").toString), content)
    }
    val data = Seq.newBuilder[String]
    val deletes = Seq.newBuilder[String]
    manifests.foreach { case (mPath, mContent) =>
      readAvro(mPath).foreach { e =>
        val status = e.get("status").asInstanceOf[Int]
        if (status != 2) { // 2 = DELETED: file no longer live
          val df = e.get("data_file").asInstanceOf[GenericRecord]
          val fmt = df.get("file_format").toString.toUpperCase
          require(fmt == "PARQUET", s"unsupported file format: $fmt")
          val content = Option(df.getSchema.getField("content"))
            .map(_ => df.get("content").asInstanceOf[Int]).getOrElse(0)
          val path = toLocal(df.get("file_path").toString)
          content match {
            case 0 =>
              require(mContent == 0, s"data file $path in a delete manifest")
              data += path
            case 1 => deletes += path
            case 2 => throw new UnsupportedOperationException(
              s"equality delete files are not supported: $path")
            case other => throw new IllegalArgumentException(
              s"unknown data_file.content $other for $path")
          }
        }
      }
    }
    Plan(v, schema, data.result(), deletes.result())
  }

  /** The table's current snapshot as a DataFrame (schema order/types per
    * the Iceberg schema, positional deletes applied).
    */
  def read(spark: SparkSession, metadataPath: Path): DataFrame = {
    val p = plan(metadataPath)
    val outCols = p.schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name))
    if (p.dataFiles.isEmpty)
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), p.schema)
    val data = spark.read.parquet(p.dataFiles: _*)
    if (p.deleteFiles.isEmpty) data.select(outCols.toSeq: _*)
    else {
      // Spark renders local paths as file:/..., manifests as file:///...
      // — normalize both sides of the join to one form
      val del = spark.read.parquet(p.deleteFiles: _*)
        .select(normPath(col("file_path")).as("__ice_del_path"),
          col("pos").as("__ice_del_pos"))
      data
        .withColumn("__ice_path", normPath(col("_metadata.file_path")))
        .withColumn("__ice_pos", col("_metadata.row_index"))
        .join(del, col("__ice_path") === col("__ice_del_path") &&
          col("__ice_pos") === col("__ice_del_pos"), "left_anti")
        .select(outCols.toSeq: _*)
    }
  }

  /** file:/x, file://x, file:///x → file:///x (other schemes untouched). */
  private def normPath(c: Column): Column =
    regexp_replace(c, "^file:/+", "file:///")

  /** URI string or bare path → form Spark's parquet reader accepts. */
  private def toLocal(s: String): String =
    if (s.startsWith("file:")) Paths.get(java.net.URI.create(s)).toString
    else s

  private def readAvro(p: String): Seq[GenericRecord] = {
    val rd = new DataFileReader[GenericRecord](
      new java.io.File(p), new GenericDatumReader[GenericRecord]())
    try rd.iterator().asScala.toList finally rd.close()
  }

  private val DecimalRe = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r

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
