package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.scalatest.matchers.should.Matchers

import graft.versioned.GraftRepo

/** Iceberg v1 metadata export: an external Iceberg reader's view of a
  * graft snapshot — metadata JSON, manifest list and manifest validate
  * structurally against the spec (field ids, required core columns,
  * name mapping), and the referenced parquet files reproduce the graft
  * read exactly. (iceberg-core itself is not on the classpath — zero
  * extra dependencies — so the spec validates the LAYOUTS the readers
  * consume, plus end-to-end data equality over the manifest's file
  * list.)
  */
class IcebergExportSpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.catalog.g", classOf[graft.catalog.GraftCatalog].getName)
    .config("spark.sql.catalog.g.root", Files.createTempDirectory("graft-ice").toString)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def sql(q: String) = spark.sql(q)

  private def readAvro(p: String): (Seq[GenericRecord], Map[String, String]) = {
    val rd = new DataFileReader[GenericRecord](
      new java.io.File(p), new GenericDatumReader[GenericRecord]())
    try {
      val metaKeys = rd.getMetaKeys.asScala.toSeq
      val meta = metaKeys.filterNot(_.startsWith("avro."))
        .map(k => k -> rd.getMetaString(k)).toMap
      (rd.iterator().asScala.toList, meta)
    } finally rd.close()
  }

  test("export writes spec-shaped v1 metadata; the manifest's file list " +
    "reproduces the graft read bit-for-bit") {
    sql("CREATE NAMESPACE g.ice")
    sql("CREATE NAMESPACE g.ice.main.db")
    sql("CREATE TABLE g.ice.main.db.t (id INT, name STRING, ts TIMESTAMP)")
    sql("INSERT INTO g.ice.main.db.t SELECT CAST(id AS INT), concat('n', id), " +
      "timestamp'2024-06-01 00:00:00' + make_interval(0,0,0,0,CAST(id % 24 AS INT),0,0) " +
      "FROM range(0, 50)")
    val dest = Files.createTempDirectory("ice-export")
    val out = sql("CALL g.system.iceberg_export('ice', 'main', 'db.t', " +
      s"'$dest')").collect()
    out.length shouldBe 1
    val metaPath = out.head.getString(0)
    out.head.getInt(1) should be > 0

    // ---- metadata JSON -------------------------------------------------
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = mapper.readTree(Files.readString(java.nio.file.Paths.get(metaPath)))
    meta.get("format-version").asInt() shouldBe 1
    meta.get("table-uuid").asText() should not be empty
    val snapId = meta.get("current-snapshot-id").asLong()
    // spec branch-ref map: main tracks the current snapshot
    meta.get("refs").get("main").get("snapshot-id").asLong() shouldBe snapId
    meta.get("refs").get("main").get("type").asText() shouldBe "branch"
    val snaps = meta.get("snapshots")
    snaps.size() shouldBe 1
    snaps.get(0).get("snapshot-id").asLong() shouldBe snapId
    val schemaFields = meta.get("schema").get("fields")
    schemaFields.size() shouldBe 3
    schemaFields.get(0).get("name").asText() shouldBe "id"
    schemaFields.get(0).get("id").asInt() shouldBe 1
    schemaFields.get(2).get("type").asText() shouldBe "timestamptz"
    // name mapping present (files carry no iceberg field ids)
    val nm = mapper.readTree(
      meta.get("properties").get("schema.name-mapping.default").asText())
    nm.size() shouldBe 3
    nm.get(0).get("field-id").asInt() shouldBe 1
    // version hint for HadoopCatalog-style discovery
    Files.readString(java.nio.file.Paths.get(metaPath).getParent
      .resolve("version-hint.text")) shouldBe "1"

    // ---- manifest list -------------------------------------------------
    val listUri = java.net.URI.create(
      snaps.get(0).get("manifest-list").asText())
    val (listRecs, listMeta) = readAvro(java.nio.file.Paths.get(listUri).toString)
    listRecs.length shouldBe 1
    listMeta("snapshot-id") shouldBe snapId.toString
    val mf = listRecs.head
    mf.get("added_snapshot_id").asInstanceOf[Long] shouldBe snapId
    val manifestPath = java.nio.file.Paths.get(
      java.net.URI.create(mf.get("manifest_path").toString))
    Files.size(manifestPath) shouldBe mf.get("manifest_length").asInstanceOf[Long]

    // ---- manifest ------------------------------------------------------
    val (entries, mMeta) = readAvro(manifestPath.toString)
    mMeta("format-version") shouldBe "1"
    mMeta("partition-spec") shouldBe "[]"
    mapper.readTree(mMeta("schema")).get("fields").size() shouldBe 3
    // field-id annotations on the avro layout itself
    val entrySchema = entries.head.getSchema
    entrySchema.getField("status").getObjectProp("field-id") shouldBe 0
    entrySchema.getField("data_file").schema()
      .getField("file_path").getObjectProp("field-id") shouldBe 100
    val repo = GraftRepo.open(java.nio.file.Paths.get(
      spark.conf.get("spark.sql.catalog.g.root"), "ice"))
    val snapFiles = repo.snapshot(repo.headCommit("main").tables("db/t")).files
    entries.length shouldBe snapFiles.size
    val paths = entries.map { e =>
      val df = e.get("data_file").asInstanceOf[GenericRecord]
      df.get("file_format").toString shouldBe "PARQUET"
      val p = java.nio.file.Paths.get(java.net.URI.create(df.get("file_path").toString))
      Files.exists(p) shouldBe true
      Files.size(p) shouldBe df.get("file_size_in_bytes").asInstanceOf[Long]
      (p.toString, df.get("record_count").asInstanceOf[Long])
    }
    paths.map(_._2).sum shouldBe 50L

    // ---- end to end: the manifest's file list IS the table -------------
    val viaManifest = spark.read.parquet(paths.map(_._1): _*)
      .orderBy("id").collect().map(r => (r.getInt(0), r.getString(1), r.getTimestamp(2)))
    val viaGraft = sql("SELECT id, name, ts FROM g.ice.main.db.t ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getTimestamp(2)))
    viaManifest shouldBe viaGraft
  }

  test("partitioned export: real spec fields (identity/bucket/day) with " +
    "typed per-file partition values in the manifest, so external " +
    "readers partition-prune") {
    sql("CREATE NAMESPACE g.icep")
    sql("CREATE NAMESPACE g.icep.main.db")
    sql("CREATE TABLE g.icep.main.db.t (id INT, cat STRING, ts TIMESTAMP) " +
      "PARTITIONED BY (cat, bucket(4, id), days(ts))")
    sql("INSERT INTO g.icep.main.db.t SELECT CAST(id AS INT), " +
      "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END, " +
      "timestamp'2024-06-01 00:00:00' + make_interval(0,0,0,CAST(id % 3 AS INT),0,0,0) " +
      "FROM range(0, 40)")
    val dest = Files.createTempDirectory("ice-export-part")
    val metaPath = sql("CALL g.system.iceberg_export('icep', 'main', 'db.t', " +
      s"'$dest')").collect().head.getString(0)

    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = mapper.readTree(Files.readString(java.nio.file.Paths.get(metaPath)))
    // spec JSON: canonical transform names, schema source-ids, 1000+ ids
    val spec = meta.get("partition-specs").get(0)
    spec.get("spec-id").asInt() shouldBe 0
    val fields = spec.get("fields")
    fields.size() shouldBe 3
    fields.get(0).get("name").asText() shouldBe "cat"
    fields.get(0).get("transform").asText() shouldBe "identity"
    fields.get(0).get("source-id").asInt() shouldBe 2
    fields.get(0).get("field-id").asInt() shouldBe 1000
    fields.get(1).get("transform").asText() shouldBe "bucket[4]"
    fields.get(1).get("source-id").asInt() shouldBe 1
    fields.get(2).get("transform").asText() shouldBe "day"
    fields.get(2).get("source-id").asInt() shouldBe 3
    meta.get("partition-spec").size() shouldBe 3 // v1 legacy flat list
    meta.get("last-partition-id").asInt() shouldBe 1002
    meta.has("properties") shouldBe true
    Option(meta.get("properties").get("graft.export.partition-fallback")) shouldBe None

    // manifest: r102 carries typed values per file matching graft's own
    // partition metadata (bucket int, day = days-since-epoch with an
    // avro date logical type, identity string)
    val listUri = java.net.URI.create(
      meta.get("snapshots").get(0).get("manifest-list").asText())
    val (listRecs, _) = readAvro(java.nio.file.Paths.get(listUri).toString)
    val manifestPath = java.nio.file.Paths.get(
      java.net.URI.create(listRecs.head.get("manifest_path").toString))
    val (entries, mMeta) = readAvro(manifestPath.toString)
    mapper.readTree(mMeta("partition-spec")).size() shouldBe 3

    val repo = GraftRepo.open(java.nio.file.Paths.get(
      spark.conf.get("spark.sql.catalog.g.root"), "icep"))
    val snap = repo.snapshot(repo.headCommit("main").tables("db/t"))
    val byPath = snap.files.map(f =>
      repo.root.resolve(f.path).toUri.toString -> f.partValues).toMap
    entries.length shouldBe snap.files.size
    entries.foreach { e =>
      val df = e.get("data_file").asInstanceOf[GenericRecord]
      val part = df.get("partition").asInstanceOf[GenericRecord]
      val expected = byPath(df.get("file_path").toString)
      part.get("cat").toString shouldBe expected("cat")
      part.get("id_bucket").asInstanceOf[Int] shouldBe
        expected("id_bucket").toInt
      part.get("ts_day").asInstanceOf[Int] shouldBe
        java.time.LocalDate.parse(expected("ts_day")).toEpochDay.toInt
      // avro field ids + date logical type on the partition record
      val ps = part.getSchema
      ps.getField("cat").getObjectProp("field-id") shouldBe 1000
      ps.getField("ts_day").schema().getTypes.asScala
        .find(_.getType != org.apache.avro.Schema.Type.NULL).get
        .getProp("logicalType") shouldBe "date"
    }
  }

  test("partition evolution falls back to an unpartitioned export when " +
    "live files predate the current spec (null values would mis-prune)") {
    sql("CREATE NAMESPACE g.icev")
    sql("CREATE NAMESPACE g.icev.main.db")
    sql("CREATE TABLE g.icev.main.db.t (id INT, cat STRING)")
    sql("INSERT INTO g.icev.main.db.t VALUES (1, 'a'), (2, 'b')")
    sql("CALL g.system.set_partition_spec('icev', 'main', 'db.t', 'cat')")
    sql("INSERT INTO g.icev.main.db.t VALUES (3, 'c')")
    val dest = Files.createTempDirectory("ice-export-evo")
    val metaPath = sql("CALL g.system.iceberg_export('icev', 'main', 'db.t', " +
      s"'$dest')").collect().head.getString(0)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = mapper.readTree(Files.readString(java.nio.file.Paths.get(metaPath)))
    meta.get("partition-specs").get(0).get("fields").size() shouldBe 0
    meta.get("properties").get("graft.export.partition-fallback").asText() should
      include("predate")
  }

  test("export refuses a table with non-equality merge-on-read " +
    "tombstones when no SparkSession is supplied (a v1 reader would " +
    "resurrect deleted rows)") {
    sql("CREATE NAMESPACE g.ice2")
    sql("CREATE NAMESPACE g.ice2.main.db")
    sql("CREATE TABLE g.ice2.main.db.t (id INT, v STRING) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    sql("INSERT INTO g.ice2.main.db.t VALUES (1, 'a'), (2, 'b')")
    sql("DELETE FROM g.ice2.main.db.t WHERE id > 1") // range: positional only
    val repo = GraftRepo.open(java.nio.file.Paths.get(
      spark.conf.get("spark.sql.catalog.g.root"), "ice2"))
    val dest = Files.createTempDirectory("ice-export-mor")
    val e = intercept[UnsupportedOperationException](
      graft.versioned.IcebergExport.export(repo, "main", "db/t", dest))
    e.getMessage should include("tombstones")
  }

  test("equality-shaped tombstones export as O(1) equality delete files " +
    "WITHOUT a SparkSession — no data scanned — and the import applies " +
    "the strictly-older rule exactly") {
    sql("CREATE NAMESPACE g.iceq")
    sql("CREATE NAMESPACE g.iceq.main.db")
    sql("CREATE TABLE g.iceq.main.db.t (id INT, grp STRING, v DOUBLE) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    sql("INSERT INTO g.iceq.main.db.t SELECT CAST(id AS INT), " +
      "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END, CAST(id AS DOUBLE) " +
      "FROM range(0, 50)")
    sql("DELETE FROM g.iceq.main.db.t WHERE id IN (1, 3, 5)") // In: equality
    sql("DELETE FROM g.iceq.main.db.t WHERE grp = 'a' AND id = 2") // conjunction
    // rows inserted after the tombstones survive even when they match
    sql("INSERT INTO g.iceq.main.db.t VALUES (1, 'b', -1.0), (2, 'a', -2.0)")
    val repo = GraftRepo.open(java.nio.file.Paths.get(
      spark.conf.get("spark.sql.catalog.g.root"), "iceq"))
    val dest = Files.createTempDirectory("ice-export-eq")
    // NO SparkSession — the whole export is driver-side metadata work
    val metaPath = graft.versioned.IcebergExport.export(
      repo, "main", "db/t", dest)

    val meta = mapperOf(metaPath.toString)
    meta.get("format-version").asInt() shouldBe 2
    val (listRecs, _) = readAvro(java.nio.file.Paths.get(java.net.URI.create(
      meta.get("snapshots").get(0).get("manifest-list").asText())).toString)
    val delManifest = listRecs.find(_.get("content").asInstanceOf[Int] == 1).get
    val (delEntries, _) = readAvro(java.nio.file.Paths.get(
      java.net.URI.create(delManifest.get("manifest_path").toString)).toString)
    delEntries.length shouldBe 2 // one equality delete file per tombstone
    delEntries.foreach { e =>
      val df = e.get("data_file").asInstanceOf[GenericRecord]
      df.get("content").asInstanceOf[Int] shouldBe 2 // EQUALITY_DELETES
    }
    // the In-tombstone's file: 3 value rows under column `id`, field id
    // stamped in the parquet footer
    val byRows = delEntries.map { e =>
      val df = e.get("data_file").asInstanceOf[GenericRecord]
      df.get("record_count").asInstanceOf[Long] -> df
    }.toMap
    byRows.keySet shouldBe Set(3L, 1L)
    val inFile = java.nio.file.Paths.get(
      java.net.URI.create(byRows(3L).get("file_path").toString))
    parquetFooterSchema(inFile).getType(Seq("id"): _*)
      .getId.intValue() shouldBe 1
    spark.read.parquet(inFile.toString).collect()
      .map(_.getInt(0)).sorted shouldBe Array(1, 3, 5)
    // conjunction file carries both columns and both field ids
    val andIds = byRows(1L).get("equality_ids")
      .asInstanceOf[java.util.List[Integer]]
    andIds.asScala.map(_.toInt).sorted shouldBe Seq(1, 2)

    // round trip: id 1,3,5 and (grp a, id 2) dead from the FIRST batch;
    // the re-inserted (1,'b') and (2,'a') SURVIVE (strictly-older rule)
    val imported = graft.versioned.IcebergImport.read(spark, metaPath)
      .orderBy("id", "v").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    val viaGraft = sql("SELECT id, grp, v FROM g.iceq.main.db.t ORDER BY id, v")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    imported shouldBe viaGraft
    imported.length shouldBe 48 // 50 - 4 deleted + 2 re-inserts
    imported.count(_._3 < 0) shouldBe 2 // both late inserts present
  }

  test("equality deletes on date/timestamp/long columns write the typed " +
    "single-value encodings and round trip") {
    sql("CREATE NAMESPACE g.iceqt")
    sql("CREATE NAMESPACE g.iceqt.main.db")
    sql("CREATE TABLE g.iceqt.main.db.t (id BIGINT, d DATE, ts TIMESTAMP) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    sql("INSERT INTO g.iceqt.main.db.t SELECT CAST(id AS BIGINT), " +
      "DATE'2024-03-01' + CAST(id % 5 AS INT), " +
      "TIMESTAMP'2024-03-01 00:00:00' + make_interval(0,0,0,0,CAST(id AS INT),0,0) " +
      "FROM range(0, 20)")
    sql("DELETE FROM g.iceqt.main.db.t WHERE d = DATE'2024-03-02'") // ids 1,6,11,16
    sql("DELETE FROM g.iceqt.main.db.t WHERE ts = TIMESTAMP'2024-03-01 02:00:00'") // id 2
    sql("DELETE FROM g.iceqt.main.db.t WHERE id = 7")
    val repo = GraftRepo.open(java.nio.file.Paths.get(
      spark.conf.get("spark.sql.catalog.g.root"), "iceqt"))
    val dest = Files.createTempDirectory("ice-export-eqt")
    val metaPath = graft.versioned.IcebergExport.export(
      repo, "main", "db/t", dest) // no session: all equality-shaped
    val plan = graft.versioned.IcebergImport.plan(metaPath)
    plan.equalityDeletes.length shouldBe 3
    plan.positionDeletes shouldBe empty
    val got = graft.versioned.IcebergImport.read(spark, metaPath)
      .orderBy("id").collect().map(_.getLong(0))
    got shouldBe (0L until 20L).filterNot(Set(1L, 6L, 11L, 16L, 2L, 7L)).toArray
  }

  test("mixed tombstones: equality-shaped ones become equality deletes, " +
    "range ones positional — both applied in one import") {
    sql("CREATE NAMESPACE g.icemix")
    sql("CREATE NAMESPACE g.icemix.main.db")
    sql("CREATE TABLE g.icemix.main.db.t (id INT, v DOUBLE) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    sql("INSERT INTO g.icemix.main.db.t SELECT CAST(id AS INT), " +
      "CAST(id AS DOUBLE) FROM range(0, 40)")
    sql("DELETE FROM g.icemix.main.db.t WHERE id = 7") // equality
    sql("DELETE FROM g.icemix.main.db.t WHERE id >= 35") // positional
    val dest = Files.createTempDirectory("ice-export-mix")
    val metaPath = java.nio.file.Paths.get(
      sql(s"CALL g.system.iceberg_export('icemix', 'main', 'db.t', '$dest')")
        .collect().head.getString(0))
    val plan = graft.versioned.IcebergImport.plan(metaPath)
    plan.equalityDeletes.length shouldBe 1
    plan.positionDeletes.length shouldBe 1
    val got = graft.versioned.IcebergImport.read(spark, metaPath)
      .orderBy("id").collect().map(_.getInt(0))
    got shouldBe (0 until 35).filter(_ != 7).toArray
  }

  private def mapperOf(p: String) =
    new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readString(java.nio.file.Paths.get(p)))

  private def parquetFooterSchema(p: java.nio.file.Path) = {
    val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(p.toUri),
        new org.apache.hadoop.conf.Configuration()))
    try rd.getFooter.getFileMetaData.getSchema finally rd.close()
  }

  test("merge-on-read snapshot exports as v2 with positional delete " +
    "files (spec field ids, sorted, later inserts exempt) and the " +
    "independent import reproduces the graft read") {
    sql("CREATE NAMESPACE g.icem")
    sql("CREATE NAMESPACE g.icem.main.db")
    sql("CREATE TABLE g.icem.main.db.t (id INT, grp STRING, v DOUBLE) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    sql("INSERT INTO g.icem.main.db.t SELECT CAST(id AS INT), " +
      "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END, CAST(id AS DOUBLE) " +
      "FROM range(0, 100)")
    sql("DELETE FROM g.icem.main.db.t WHERE grp = 'a' AND id < 40")
    // rows inserted AFTER the tombstone survive it, matching or not
    sql("INSERT INTO g.icem.main.db.t VALUES (2, 'a', -1.0), (200, 'a', -2.0)")
    val dest = Files.createTempDirectory("ice-export-v2")
    val out = sql("CALL g.system.iceberg_export('icem', 'main', 'db.t', " +
      s"'$dest')").collect()
    val metaPath = java.nio.file.Paths.get(out.head.getString(0))

    // ---- v2 metadata ---------------------------------------------------
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = mapper.readTree(Files.readString(metaPath))
    meta.get("format-version").asInt() shouldBe 2
    // real sequences: insert(graft 1 -> 2), tombstone(2 -> delete at 3),
    // late insert(3 -> 4); snapshot carries the max
    meta.get("last-sequence-number").asLong() shouldBe 4L
    meta.has("schema") shouldBe false // v1-only legacy keys absent in v2
    meta.has("partition-spec") shouldBe false
    val snapNode = meta.get("snapshots").get(0)
    snapNode.get("sequence-number").asLong() shouldBe 4L
    snapNode.get("summary").get("added-position-deletes").asText().toLong should be > 0L

    // ---- manifest list: one data + one deletes manifest ----------------
    val (listRecs, _) = readAvro(java.nio.file.Paths.get(
      java.net.URI.create(snapNode.get("manifest-list").asText())).toString)
    listRecs.length shouldBe 2
    val byContent = listRecs.map(r => r.get("content").asInstanceOf[Int] -> r).toMap
    byContent.keySet shouldBe Set(0, 1)
    listRecs.foreach { r =>
      r.get("sequence_number").asInstanceOf[Long] shouldBe 4L
      r.getSchema.getField("added_files_count") should not be null
    }
    byContent(0).get("min_sequence_number").asInstanceOf[Long] shouldBe 2L
    byContent(1).get("min_sequence_number").asInstanceOf[Long] shouldBe 3L

    // ---- delete manifest + delete parquet ------------------------------
    val delManifest = java.nio.file.Paths.get(java.net.URI.create(
      byContent(1).get("manifest_path").toString))
    val (delEntries, delMeta) = readAvro(delManifest.toString)
    delMeta("content") shouldBe "deletes"
    delMeta("format-version") shouldBe "2"
    delEntries.length shouldBe 1 // unpartitioned: one file per tombstone group
    val delFileRec = delEntries.head.get("data_file").asInstanceOf[GenericRecord]
    delFileRec.get("content").asInstanceOf[Int] shouldBe 1
    val delPath = java.nio.file.Paths.get(
      java.net.URI.create(delFileRec.get("file_path").toString))
    Files.size(delPath) shouldBe
      delFileRec.get("file_size_in_bytes").asInstanceOf[Long]
    // spec's reserved field ids in the parquet footer itself
    val delSchema = parquetFooterSchema(delPath)
    delSchema.getType(Seq("file_path"): _*).getId.intValue() shouldBe 2147483546
    delSchema.getType(Seq("pos"): _*).getId.intValue() shouldBe 2147483545
    // rows sorted by (file_path, pos); every file_path is a manifest
    // data-file path; pos < that file's record_count
    val delRows = spark.read.parquet(delPath.toString)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    delRows.length.toLong shouldBe
      delFileRec.get("record_count").asInstanceOf[Long]
    delRows.sortBy(identity).toSeq shouldBe delRows.toSeq
    val (dataEntries, dataMeta) = readAvro(java.nio.file.Paths.get(
      java.net.URI.create(byContent(0).get("manifest_path").toString)).toString)
    dataMeta("content") shouldBe "data"
    val dataByPath = dataEntries.map { e =>
      val df = e.get("data_file").asInstanceOf[GenericRecord]
      df.get("content").asInstanceOf[Int] shouldBe 0
      df.get("file_path").toString -> df.get("record_count").asInstanceOf[Long]
    }.toMap
    delRows.foreach { case (p, pos) =>
      dataByPath.keySet should contain(p)
      pos should be < dataByPath(p)
    }
    // the deletes reference ONLY files the tombstone applies to — the
    // post-delete insert's file carries a higher commit seq and is
    // never scanned (20 'a'-rows below 40 died; id=2 re-insert lives)
    delRows.length shouldBe 20

    // ---- round trip: independent reader == graft read ------------------
    val imported = graft.versioned.IcebergImport.read(spark, metaPath)
      .orderBy("id", "v")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    val viaGraft = sql(
      "SELECT id, grp, v FROM g.icem.main.db.t ORDER BY id, v")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    imported shouldBe viaGraft
    imported.length shouldBe 82 // 100 - 20 deleted + 2 late inserts
  }

  test("partitioned merge-on-read export stamps per-file delete files " +
    "with the data file's partition values; round trip holds") {
    sql("CREATE NAMESPACE g.icemp")
    sql("CREATE NAMESPACE g.icemp.main.db")
    sql("CREATE TABLE g.icemp.main.db.t (id INT, cat STRING, v DOUBLE) " +
      "PARTITIONED BY (cat) TBLPROPERTIES " +
      "('graft.delete.mode'='merge-on-read')")
    sql("INSERT INTO g.icemp.main.db.t SELECT CAST(id AS INT), " +
      "CASE WHEN id % 3 = 0 THEN 'x' WHEN id % 3 = 1 THEN 'y' ELSE 'z' END, " +
      "CAST(id AS DOUBLE) FROM range(0, 60)")
    sql("DELETE FROM g.icemp.main.db.t WHERE id < 9") // touches all cats
    val dest = Files.createTempDirectory("ice-export-v2p")
    val metaPath = java.nio.file.Paths.get(
      sql(s"CALL g.system.iceberg_export('icemp', 'main', 'db.t', '$dest')")
        .collect().head.getString(0))

    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = mapper.readTree(Files.readString(metaPath))
    meta.get("format-version").asInt() shouldBe 2
    // real partitioned spec survives the v2 path
    meta.get("partition-specs").get(0).get("fields").size() shouldBe 1
    val (listRecs, _) = readAvro(java.nio.file.Paths.get(java.net.URI.create(
      meta.get("snapshots").get(0).get("manifest-list").asText())).toString)
    val delManifestRec = listRecs.find(_.get("content").asInstanceOf[Int] == 1).get
    val (delEntries, _) = readAvro(java.nio.file.Paths.get(
      java.net.URI.create(delManifestRec.get("manifest_path").toString)).toString)
    delEntries should not be empty
    // one delete file per dirty PARTITION (not per file): every data
    // file it references lives in the partition it is stamped with, so
    // Iceberg readers prune deletes with the data
    delEntries.foreach { e =>
      val df = e.get("data_file").asInstanceOf[GenericRecord]
      df.get("content").asInstanceOf[Int] shouldBe 1
      val cat = df.get("partition").asInstanceOf[GenericRecord]
        .get("cat").toString
      val refs = spark.read.parquet(java.nio.file.Paths.get(
        java.net.URI.create(df.get("file_path").toString)).toString)
        .select("file_path").distinct().collect().map(_.getString(0))
      refs should not be empty
      refs.foreach(_ should include(s"cat=$cat"))
    }
    // partition-distinct delete files (the batching key is the tuple)
    val delCats = delEntries.map(_.get("data_file").asInstanceOf[GenericRecord]
      .get("partition").asInstanceOf[GenericRecord].get("cat").toString)
    delCats.distinct.length shouldBe delCats.length

    val imported = graft.versioned.IcebergImport.read(spark, metaPath)
      .orderBy("id").collect().map(r => (r.getInt(0), r.getString(1)))
    val viaGraft = sql("SELECT id, cat FROM g.icemp.main.db.t ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    imported shouldBe viaGraft
    imported.length shouldBe 51
  }

  test("history export: the branch's table versions become real Iceberg " +
    "snapshots with snapshot-log + parent links; each one reads back " +
    "equal to graft VERSION AS OF, and older snapshots ignore later " +
    "deletes") {
    sql("CREATE NAMESPACE g.iceh")
    sql("CREATE NAMESPACE g.iceh.main.db")
    sql("CREATE TABLE g.iceh.main.db.t (id INT, v DOUBLE) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    val repo = GraftRepo.open(java.nio.file.Paths.get(
      spark.conf.get("spark.sql.catalog.g.root"), "iceh"))
    // CREATE itself is version 0 (a valid empty Iceberg snapshot)
    sql("INSERT INTO g.iceh.main.db.t SELECT CAST(id AS INT), " +
      "CAST(id AS DOUBLE) FROM range(0, 10)")
    val c1 = repo.headCommit("main").id
    sql("INSERT INTO g.iceh.main.db.t SELECT CAST(id AS INT), " +
      "CAST(id AS DOUBLE) FROM range(100, 110)")
    val c2 = repo.headCommit("main").id
    sql("DELETE FROM g.iceh.main.db.t WHERE id IN (3, 103)") // equality MoR
    val c3 = repo.headCommit("main").id

    val dest = Files.createTempDirectory("ice-export-hist")
    val metaPath = java.nio.file.Paths.get(sql(
      s"CALL g.system.iceberg_export('iceh', 'main', 'db.t', '$dest', 5)")
      .collect().head.getString(0))

    val meta = mapperOf(metaPath.toString)
    val snaps = meta.get("snapshots")
    snaps.size() shouldBe 4
    val log = meta.get("snapshot-log")
    log.size() shouldBe 4
    // oldest → newest; log order matches snapshots order; parents chain
    val ids = (0 until 4).map(i => snaps.get(i).get("snapshot-id").asLong())
    (0 until 4).foreach { i =>
      log.get(i).get("snapshot-id").asLong() shouldBe ids(i)
      if (i > 0)
        snaps.get(i).get("parent-snapshot-id").asLong() shouldBe ids(i - 1)
      else snaps.get(i).has("parent-snapshot-id") shouldBe false
    }
    log.get(0).get("timestamp-ms").asLong() should be <=
      log.get(3).get("timestamp-ms").asLong()
    meta.get("current-snapshot-id").asLong() shouldBe ids(3)
    // v2 sequence numbers strictly increase
    (0 until 3).foreach(i =>
      snaps.get(i).get("sequence-number").asLong() should be <
        snaps.get(i + 1).get("sequence-number").asLong())

    // each snapshot == graft VERSION AS OF; the pre-delete snapshots
    // must NOT lose rows to the later equality delete
    def viaGraft(cid: String) =
      sql(s"SELECT id, v FROM g.iceh.main.db.t VERSION AS OF '$cid' ORDER BY id")
        .collect().map(r => (r.getInt(0), r.getDouble(1)))
    def viaIce(sid: Long) =
      graft.versioned.IcebergImport.read(spark, metaPath, Some(sid))
        .orderBy("id").collect().map(r => (r.getInt(0), r.getDouble(1)))
    viaIce(ids(0)).length shouldBe 0 // the empty CREATE version
    viaIce(ids(1)) shouldBe viaGraft(c1)
    viaIce(ids(2)) shouldBe viaGraft(c2)
    viaIce(ids(3)) shouldBe viaGraft(c3)
    viaIce(ids(1)).length shouldBe 10
    viaIce(ids(2)).length shouldBe 20
    viaIce(ids(3)).length shouldBe 18
    // the import CALL's snapshot_id arg drives the same selection
    sql(s"CALL g.system.iceberg_import('$metaPath', 'ice_hist_v', ${ids(1)})")
      .collect().head.getInt(2) shouldBe 0 // pre-delete version: no deletes yet
    sql("SELECT count(*) FROM ice_hist_v").collect().head.getLong(0) shouldBe 10L
  }

  test("history export truncates at a schema change (the export carries " +
    "one schema)") {
    sql("CREATE NAMESPACE g.icehs")
    sql("CREATE NAMESPACE g.icehs.main.db")
    sql("CREATE TABLE g.icehs.main.db.t (id INT)")
    sql("INSERT INTO g.icehs.main.db.t VALUES (1), (2)")
    sql("ALTER TABLE g.icehs.main.db.t ADD COLUMN v DOUBLE")
    sql("INSERT INTO g.icehs.main.db.t VALUES (3, 3.0)")
    val dest = Files.createTempDirectory("ice-export-hs")
    val metaPath = sql(
      s"CALL g.system.iceberg_export('icehs', 'main', 'db.t', '$dest', 10)")
      .collect().head.getString(0)
    val meta = mapperOf(metaPath)
    // only the post-ALTER versions export (insert after ALTER = 1
    // version; the ALTER itself produced a same-files version whose
    // schema already matches)
    val n = meta.get("snapshots").size()
    n should be >= 1
    val schemas = meta.get("schemas").get(0).get("fields")
    schemas.size() shouldBe 2 // current schema only
    // every exported snapshot reads back with the current 2-col schema
    val snaps = meta.get("snapshots")
    (0 until n).foreach { i =>
      val got = graft.versioned.IcebergImport.read(spark,
        java.nio.file.Paths.get(metaPath),
        Some(snaps.get(i).get("snapshot-id").asLong()))
      got.schema.fieldNames.toSeq shouldBe Seq("id", "v")
    }
  }

  test("partitioned table + equality tombstone: the delete lands as a " +
    "GLOBAL delete in an auxiliary unpartitioned spec (spec-id 1), " +
    "no data scanned, and applies across partitions on import") {
    sql("CREATE NAMESPACE g.icepg")
    sql("CREATE NAMESPACE g.icepg.main.db")
    sql("CREATE TABLE g.icepg.main.db.t (id INT, cat STRING) " +
      "PARTITIONED BY (cat) TBLPROPERTIES " +
      "('graft.delete.mode'='merge-on-read')")
    sql("INSERT INTO g.icepg.main.db.t SELECT CAST(id AS INT), " +
      "CASE WHEN id % 2 = 0 THEN 'x' ELSE 'y' END FROM range(0, 20)")
    sql("DELETE FROM g.icepg.main.db.t WHERE id IN (2, 5)") // spans both cats
    val repo = GraftRepo.open(java.nio.file.Paths.get(
      spark.conf.get("spark.sql.catalog.g.root"), "icepg"))
    val dest = Files.createTempDirectory("ice-export-pg")
    // equality-only tombstones: NO SparkSession needed even partitioned
    val metaPath = graft.versioned.IcebergExport.export(
      repo, "main", "db/t", dest)

    val meta = mapperOf(metaPath.toString)
    meta.get("format-version").asInt() shouldBe 2
    // two specs: the real partitioned one + the global-delete one
    meta.get("partition-specs").size() shouldBe 2
    meta.get("partition-specs").get(1).get("spec-id").asInt() shouldBe 1
    meta.get("partition-specs").get(1).get("fields").size() shouldBe 0
    meta.get("default-spec-id").asInt() shouldBe 0
    val (listRecs, _) = readAvro(java.nio.file.Paths.get(java.net.URI.create(
      meta.get("snapshots").get(0).get("manifest-list").asText())).toString)
    val delRec = listRecs.find(_.get("content").asInstanceOf[Int] == 1).get
    delRec.get("partition_spec_id").asInstanceOf[Int] shouldBe 1
    listRecs.find(_.get("content").asInstanceOf[Int] == 0).get
      .get("partition_spec_id").asInstanceOf[Int] shouldBe 0
    val (delEntries, delMeta) = readAvro(java.nio.file.Paths.get(
      java.net.URI.create(delRec.get("manifest_path").toString)).toString)
    delMeta("partition-spec-id") shouldBe "1"
    delMeta("partition-spec") shouldBe "[]"
    delEntries.head.get("data_file").asInstanceOf[GenericRecord]
      .get("content").asInstanceOf[Int] shouldBe 2

    val got = graft.versioned.IcebergImport.read(spark, metaPath)
      .orderBy("id").collect().map(_.getInt(0))
    got shouldBe (0 until 20).filterNot(Set(2, 5)).toArray
  }

  test("manifests carry per-file column statistics (value/null counts, " +
    "exact lower/upper bounds in Iceberg single-value binary) so " +
    "external engines min/max-prune files") {
    sql("CREATE NAMESPACE g.icest")
    sql("CREATE NAMESPACE g.icest.main.db")
    sql("CREATE TABLE g.icest.main.db.t (id INT, name STRING, ts TIMESTAMP)")
    sql("INSERT INTO g.icest.main.db.t VALUES " +
      "(5, 'delta', TIMESTAMP'2024-06-01 12:30:00')," +
      "(17, 'alpha', TIMESTAMP'2024-06-03 01:02:03')," +
      "(9, NULL, TIMESTAMP'2024-06-02 00:00:00')")
    val dest = Files.createTempDirectory("ice-export-stats")
    val metaPath = sql("CALL g.system.iceberg_export('icest', 'main', " +
      s"'db.t', '$dest')").collect().head.getString(0)
    val meta = mapperOf(metaPath)
    val (listRecs, _) = readAvro(java.nio.file.Paths.get(java.net.URI.create(
      meta.get("snapshots").get(0).get("manifest-list").asText())).toString)
    val (entries, _) = readAvro(java.nio.file.Paths.get(
      java.net.URI.create(listRecs.head.get("manifest_path").toString)).toString)
    // the 3-row VALUES insert may split across files — aggregate the
    // per-file maps like a manifest-pruning reader would
    def mapsOf(name: String): Seq[Map[Int, Any]] = entries.map(
      _.get("data_file").asInstanceOf[GenericRecord].get(name)
        .asInstanceOf[java.util.List[GenericRecord]].asScala
        .map(r => r.get("key").asInstanceOf[Int] -> r.get("value")).toMap)
    mapsOf("value_counts").map(_(1).asInstanceOf[Long]).sum shouldBe 3L
    mapsOf("null_value_counts")
      .map(_.getOrElse(2, 0L).asInstanceOf[Long]).sum shouldBe 1L // NULL name
    def le(bb: Any) = {
      val b = bb.asInstanceOf[java.nio.ByteBuffer].duplicate()
      b.order(java.nio.ByteOrder.LITTLE_ENDIAN); b
    }
    def str(bb: Any) = {
      val b = bb.asInstanceOf[java.nio.ByteBuffer].duplicate()
      val a = new Array[Byte](b.remaining()); b.get(a)
      new String(a, java.nio.charset.StandardCharsets.UTF_8)
    }
    val lowers = mapsOf("lower_bounds"); val uppers = mapsOf("upper_bounds")
    lowers.map(m => le(m(1)).getInt).min shouldBe 5 // id bounds, 4-byte LE
    uppers.map(m => le(m(1)).getInt).max shouldBe 17
    // string bounds exist only for files holding a non-null name;
    // exact full values, not truncated prefixes
    lowers.flatMap(_.get(2)).map(str).min shouldBe "alpha"
    uppers.flatMap(_.get(2)).map(str).max shouldBe "delta"
    lowers.map(m => le(m(3)).getLong).min shouldBe // ts micros, 8-byte LE
      java.time.LocalDateTime.parse("2024-06-01T12:30:00")
        .toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L
  }

  test("migration recipe: an external Iceberg table (deletes included) " +
    "lands as a first-class graft table via iceberg_import + CTAS") {
    sql("CREATE NAMESPACE g.icemig")
    sql("CREATE NAMESPACE g.icemig.main.db")
    sql("CREATE TABLE g.icemig.main.db.src (id INT, v DOUBLE) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    sql("INSERT INTO g.icemig.main.db.src SELECT CAST(id AS INT), " +
      "CAST(id AS DOUBLE) FROM range(0, 25)")
    sql("DELETE FROM g.icemig.main.db.src WHERE id IN (2, 4)")
    val dest = Files.createTempDirectory("ice-export-mig")
    val metaPath = sql("CALL g.system.iceberg_export('icemig', 'main', " +
      s"'db.src', '$dest')").collect().head.getString(0)
    // the two-step adoption path for a user arriving with Iceberg tables
    sql(s"CALL g.system.iceberg_import('$metaPath', 'mig_v')")
    sql("CREATE TABLE g.icemig.main.db.migrated AS SELECT * FROM mig_v")
    // full graft table: content matches, and versioned ops work on it
    sql("SELECT count(*) FROM g.icemig.main.db.migrated")
      .collect().head.getLong(0) shouldBe 23L
    sql("CREATE NAMESPACE g.icemig.feat") // zero-copy branch
    sql("DELETE FROM g.icemig.feat.db.migrated WHERE id < 10")
    sql("SELECT count(*) FROM g.icemig.feat.db.migrated")
      .collect().head.getLong(0) shouldBe 15L
    sql("SELECT count(*) FROM g.icemig.main.db.migrated")
      .collect().head.getLong(0) shouldBe 23L // main untouched
  }

  test("positional-delete export job count is CONSTANT in the number of " +
    "dirty partitions (one unioned action, not a job per tuple)") {
    def exportJobs(ns: String, nCats: Int): (Int, Int) = {
      sql(s"CREATE NAMESPACE g.$ns")
      sql(s"CREATE NAMESPACE g.$ns.main.db")
      sql(s"CREATE TABLE g.$ns.main.db.t (id INT, cat STRING) " +
        "PARTITIONED BY (cat) TBLPROPERTIES " +
        "('graft.delete.mode'='merge-on-read')")
      sql(s"INSERT INTO g.$ns.main.db.t SELECT CAST(id AS INT), " +
        s"concat('c', CAST(id % $nCats AS STRING)) FROM range(0, 120)")
      // range predicate → NOT equality-shaped → positional path; id<110
      // touches every cat
      sql(s"DELETE FROM g.$ns.main.db.t WHERE id < 110")
      val jobs = new java.util.concurrent.atomic.AtomicInteger()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        val dest = Files.createTempDirectory(s"ice-jobs-$nCats")
        val metaPath = sql(s"CALL g.system.iceberg_export('$ns', 'main', " +
          s"'db.t', '$dest')").collect().head.getString(0)
        org.apache.spark.graftbridge.TestListenerBridge.drain(spark.sparkContext)
        val imported = graft.versioned.IcebergImport
          .read(spark, java.nio.file.Paths.get(metaPath)).count()
        (jobs.get(), imported.toInt)
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    val (fewJobs, fewRows) = exportJobs("icejf", 2)
    val (manyJobs, manyRows) = exportJobs("icejm", 12)
    fewRows shouldBe 10
    manyRows shouldBe 10
    // the import's count() also runs jobs, but identical ones in both
    // measurements — any per-partition export loop would show up here
    manyJobs shouldBe fewJobs
  }

  test("iceberg_export_expire: keeps the newest K metadata versions, " +
    "drops unreferenced manifests/delete files, latest import unaffected") {
    sql("CREATE NAMESPACE g.iceexp")
    sql("CREATE NAMESPACE g.iceexp.main.db")
    sql("CREATE TABLE g.iceexp.main.db.t (id INT, v DOUBLE) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    sql("INSERT INTO g.iceexp.main.db.t SELECT CAST(id AS INT), " +
      "CAST(id AS DOUBLE) FROM range(0, 20)")
    val dest = Files.createTempDirectory("ice-expire")
    sql(s"CALL g.system.iceberg_export('iceexp', 'main', 'db.t', " +
      s"'$dest', sync => true)")
    sql("INSERT INTO g.iceexp.main.db.t SELECT CAST(id AS INT), " +
      "CAST(id AS DOUBLE) FROM range(20, 30)")
    sql("DELETE FROM g.iceexp.main.db.t WHERE id >= 28") // positional MoR
    val metaDir = dest.resolve("metadata")
    Files.exists(metaDir.resolve("v3.metadata.json")) shouldBe true
    // default 10-min age guard: fresh orphan avros are spared (only the
    // superseded version files themselves go), and a .tmp- staging file
    // survives any sweep
    val staged = metaDir.resolve(".tmp-inflight.avro")
    Files.writeString(staged, "in-flight")
    val avrosBefore = Files.list(metaDir).iterator().asScala
      .count(_.getFileName.toString.endsWith(".avro"))
    sql(s"CALL g.system.iceberg_export_expire('$dest', 3)")
    Files.list(metaDir).iterator().asScala
      .count(_.getFileName.toString.endsWith(".avro")) shouldBe avrosBefore
    Files.exists(staged) shouldBe true
    val out = sql(s"CALL g.system.iceberg_export_expire('$dest', 1, " +
      "older_than_ms => 0)").collect().head
    out.getInt(0) should be > 0 // old versions + their avros gone
    // the .tmp- exclusion holds even with the age guard disabled
    Files.exists(staged) shouldBe true
    Files.delete(staged)
    Files.exists(metaDir.resolve("v1.metadata.json")) shouldBe false
    Files.exists(metaDir.resolve("v2.metadata.json")) shouldBe false
    Files.exists(metaDir.resolve("v3.metadata.json")) shouldBe true
    // hint still points at the survivor; import reads the latest state
    Files.readString(metaDir.resolve("version-hint.text")).trim shouldBe "3"
    graft.versioned.IcebergImport.read(spark, dest).count() shouldBe 28
    // every avro left is referenced by v3 (no orphans)
    val meta = mapperOf(metaDir.resolve("v3.metadata.json").toString)
    val snaps = meta.get("snapshots")
    val reachable = scala.collection.mutable.Set.empty[String]
    (0 until snaps.size()).foreach { i =>
      val lp = java.nio.file.Paths.get(
        java.net.URI.create(snaps.get(i).get("manifest-list").asText()))
      reachable += lp.getFileName.toString
      readAvro(lp.toString)._1.foreach(mf => reachable +=
        java.nio.file.Paths.get(java.net.URI.create(
          mf.get("manifest_path").toString)).getFileName.toString)
    }
    Files.list(metaDir).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".avro"))
      .foreach(n => reachable should contain(n))
    // a further sync emission keeps working after the expire
    sql("INSERT INTO g.iceexp.main.db.t SELECT CAST(id AS INT), " +
      "CAST(id AS DOUBLE) FROM range(100, 105)")
    Files.readString(metaDir.resolve("version-hint.text")).trim shouldBe "4"
    graft.versioned.IcebergImport.read(spark, dest).count() shouldBe 33
  }

  test("re-emission to the same dest reuses delete files: the positional " +
    "memo skips the Spark job entirely and the equality delete file is " +
    "content-addressed, not re-written") {
    sql("CREATE NAMESPACE g.icedr")
    sql("CREATE NAMESPACE g.icedr.main.db")
    sql("CREATE TABLE g.icedr.main.db.t (id INT, v DOUBLE) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    sql("INSERT INTO g.icedr.main.db.t SELECT CAST(id AS INT), " +
      "CAST(id AS DOUBLE) FROM range(0, 40)")
    sql("DELETE FROM g.icedr.main.db.t WHERE id >= 35")  // positional
    sql("DELETE FROM g.icedr.main.db.t WHERE id = 7")    // equality
    val dest = Files.createTempDirectory("ice-del-reuse")
    sql(s"CALL g.system.iceberg_export('icedr', 'main', 'db.t', '$dest')")
    // content fingerprint, not mtime: reuse deliberately BUMPS mtime
    // (DestIO.touch shields the reuse window from the expire sweep)
    def deleteFiles = Files.walk(dest.resolve("data")).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith("-deletes.parquet"))
      .map(p => p -> java.util.Arrays.hashCode(Files.readAllBytes(p))).toMap
    val before = deleteFiles
    before.size should be >= 2
    // second emission: zero Spark jobs (the memo answers), same files
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      sql(s"CALL g.system.iceberg_export('icedr', 'main', 'db.t', '$dest')")
      org.apache.spark.graftbridge.TestListenerBridge.drain(spark.sparkContext)
      jobs.get() shouldBe 0
    } finally spark.sparkContext.removeSparkListener(listener)
    deleteFiles shouldBe before // byte-stable: neither rewritten nor added
    // and the re-emitted metadata still reads back correctly
    graft.versioned.IcebergImport.read(spark, dest).count() shouldBe 34
  }

  test("sync-mode export: later commits re-emit metadata automatically " +
    "(new version + hint), a dir import follows the hint with no extra " +
    "CALL, and unrelated-table commits don't re-emit") {
    sql("CREATE NAMESPACE g.icesync")
    sql("CREATE NAMESPACE g.icesync.main.db")
    sql("CREATE TABLE g.icesync.main.db.t (id INT, v DOUBLE)")
    sql("INSERT INTO g.icesync.main.db.t SELECT CAST(id AS INT), " +
      "CAST(id AS DOUBLE) FROM range(0, 10)")
    val dest = Files.createTempDirectory("ice-sync")
    sql(s"CALL g.system.iceberg_export('icesync', 'main', 'db.t', " +
      s"'$dest', sync => true)")
    def hint: String =
      Files.readString(dest.resolve("metadata/version-hint.text")).trim
    hint shouldBe "1"
    // a later commit re-emits with NO further CALL
    sql("INSERT INTO g.icesync.main.db.t SELECT CAST(id AS INT), " +
      "CAST(id AS DOUBLE) FROM range(10, 25)")
    hint shouldBe "2"
    Files.exists(dest.resolve("metadata/v2.metadata.json")) shouldBe true
    // dir import resolves through the hint: the NEW table state
    graft.versioned.IcebergImport.read(spark, dest).count() shouldBe 25
    // the older metadata version stays readable in place
    graft.versioned.IcebergImport.read(spark,
      dest.resolve("metadata/v1.metadata.json")).count() shouldBe 10
    // an unrelated table's commit advances the ref but NOT this export
    sql("CREATE TABLE g.icesync.main.db.u (id INT)")
    sql("INSERT INTO g.icesync.main.db.u VALUES (CAST(1 AS INT))")
    hint shouldBe "2"
    // deletes follow too (CoW delete = new snapshot id)
    sql("DELETE FROM g.icesync.main.db.t WHERE id < 5")
    hint shouldBe "3"
    graft.versioned.IcebergImport.read(spark, dest).count() shouldBe 20
  }

  test("segmented snapshots export one content-addressed Iceberg manifest " +
    "per graft chunk; history versions AND sync re-emissions share " +
    "unchanged chunks (O(changed chunks) per emission)") {
    val saved = Seq("graft.manifest.inline.max", "graft.manifest.target")
      .map(k => k -> Option(System.getProperty(k)))
    System.setProperty("graft.manifest.inline.max", "4")
    System.setProperty("graft.manifest.target", "4")
    try {
      sql("CREATE NAMESPACE g.icemseg")
      sql("CREATE NAMESPACE g.icemseg.main.db")
      sql("CREATE TABLE g.icemseg.main.db.t (id INT, v DOUBLE)")
      val repo = GraftRepo.open(java.nio.file.Paths.get(
        spark.conf.get("spark.sql.catalog.g.root"), "icemseg"))
      // 6 single-file commits → segmented head
      (0 until 6).foreach(i =>
        sql("INSERT INTO g.icemseg.main.db.t SELECT CAST(id AS INT), " +
          s"CAST(id AS DOUBLE) FROM range(${i * 10}, ${i * 10 + 10})"))
      val c1 = repo.headCommit("main").id
      sql("INSERT INTO g.icemseg.main.db.t SELECT CAST(id AS INT), " +
        "CAST(id AS DOUBLE) FROM range(100, 110)")
      val c2 = repo.headCommit("main").id
      def refsOf(cid: String) =
        repo.snapshot(repo.commit(cid).tables("db/t")).manifestRefs
      refsOf(c1) should not be empty
      refsOf(c2) should not be empty

      // ---- history export: versions share unchanged chunk manifests
      val dest = Files.createTempDirectory("ice-seg")
      val metaPath = java.nio.file.Paths.get(sql(
        s"CALL g.system.iceberg_export('icemseg', 'main', 'db.t', '$dest', 2)")
        .collect().head.getString(0))
      val metaDir = dest.resolve("metadata")
      def cmFiles = Files.list(metaDir).iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.startsWith("cm-") && n.endsWith(".avro")).toSeq
      // content addressing: one avro per DISTINCT graft chunk across
      // both exported versions — plus at most one extra for the
      // append-fast-path REWRITTEN TAIL chunk, which splits into an
      // added + a carried sub-manifest so carried entries keep their
      // older attribution
      val distinctChunks =
        (refsOf(c1).map(_.path) ++ refsOf(c2).map(_.path)).distinct.size
      cmFiles.size should (be >= distinctChunks and be <= distinctChunks + 1)
      // both versions read back exactly
      val meta = mapperOf(metaPath.toString)
      val snaps = meta.get("snapshots")
      val ids = (0 until snaps.size())
        .map(i => snaps.get(i).get("snapshot-id").asLong())
      def viaGraft(cid: String) =
        sql(s"SELECT id, v FROM g.icemseg.main.db.t VERSION AS OF '$cid' ORDER BY id")
          .collect().map(r => (r.getInt(0), r.getDouble(1)))
      def viaIce(sid: Long) =
        graft.versioned.IcebergImport.read(spark, metaPath, Some(sid))
          .orderBy("id").collect().map(r => (r.getInt(0), r.getDouble(1)))
      viaIce(ids.last) shouldBe viaGraft(c2)
      viaIce(ids(ids.size - 2)) shouldBe viaGraft(c1)
      // reused chunks: the newest version's manifest list attributes
      // unchanged chunks to the OLDER snapshot (added there, existing now)
      val (listRows, _) = readAvro(
        snaps.get(snaps.size() - 1).get("manifest-list").asText()
          .stripPrefix("file://"))
      val dataRows = listRows.filter(r =>
        r.get("manifest_path").toString.contains("cm-"))
      dataRows.map(_.get("added_snapshot_id").asInstanceOf[Long])
        .distinct.size should be > 1
      val existingCounts = dataRows.map { r =>
        // v2 spells it existing_files_count, v1 existing_data_files_count
        val f = if (r.getSchema.getField("existing_files_count") != null)
          "existing_files_count" else "existing_data_files_count"
        r.get(f).asInstanceOf[Int]
      }
      existingCounts.sum should be > 0 // shared chunks marked existing
      // the decisive attribution check: the incremental append scan
      // between the two exported versions delivers EXACTLY the rows the
      // newer commit appended — the rewritten tail chunk's carried
      // entries (same chunk avro as the new file's) must not re-deliver
      graft.versioned.IcebergImport
        .readChanges(spark, metaPath.toString,
          Some(ids(ids.size - 2)), Some(ids.last))
        .orderBy("id").collect().map(_.getInt(0)) shouldBe (100 until 110)

      // ---- sync mode: a later commit re-emits only the changed chunks
      val dest2 = Files.createTempDirectory("ice-seg-sync")
      sql(s"CALL g.system.iceberg_export('icemseg', 'main', 'db.t', " +
        s"'$dest2', sync => true)")
      val metaDir2 = dest2.resolve("metadata")
      def cm2 = Files.list(metaDir2).iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.startsWith("cm-") && n.endsWith(".avro")).toSet
      val before = cm2
      before.size shouldBe refsOf(c2).map(_.path).distinct.size
      val filesBefore = repo
        .snapshot(repo.resolve("main").tables("db/t")).files.size
      sql("INSERT INTO g.icemseg.main.db.t SELECT CAST(id AS INT), " +
        "CAST(id AS DOUBLE) FROM range(200, 210)")
      val c3 = repo.headCommit("main").id
      val filesAdded = repo
        .snapshot(repo.resolve("main").tables("db/t")).files.size -
        filesBefore
      val after = cm2
      // the append re-emitted O(changed chunks): every chunk manifest of
      // the previous emission that is still a live chunk was NOT
      // rewritten. The new-avro count depends on where content-defined
      // cuts fall around the appended entries (path hashes are
      // randomized per run): worst case each appended file opens its own
      // chunk plus the perturbed tail re-emits — bound by files added,
      // not a fixed constant
      (after -- before).size should be <= (filesAdded + 2)
      before.intersect(after).size should be >= (before.size - 3)
      graft.versioned.IcebergImport.read(spark, dest2)
        .orderBy("id").collect().map(r => (r.getInt(0), r.getDouble(1))) shouldBe
        viaGraft(c3)
    } finally saved.foreach { case (k, v) =>
      v.fold[AnyRef](System.clearProperty(k))(System.setProperty(k, _))
    }
  }

  test("history export truncates at a REVERT's re-aliased snapshot id: " +
    "the snapshots list never carries a duplicate id (iceberg-core " +
    "rejects such metadata; incremental consumers would double-count " +
    "the re-added rows)") {
    sql("CREATE NAMESPACE g.icerv")
    sql("CREATE NAMESPACE g.icerv.main.db")
    sql("CREATE TABLE g.icerv.main.db.t (id INT, v STRING)")
    sql("INSERT INTO g.icerv.main.db.t VALUES (1, 'a')")
    val root = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.catalog.g.root"), "icerv")
    val repo = GraftRepo.open(root)
    val cX = repo.headCommit("main").id
    sql("INSERT INTO g.icerv.main.db.t VALUES (2, 'b')")
    sql(s"CALL g.system.revert('icerv', 'main', '$cX')")
    // first-parent chain now reads X(head), Y, X — the same table
    // snapshot id twice, non-consecutively
    val dest = Files.createTempDirectory("ice-revert-export")
    val metaP = graft.versioned.IcebergExport.export(
      repo, "main", "db/t", dest, Some(spark), 5)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = mapper.readTree(Files.readString(metaP))
    val ids = meta.get("snapshots").elements().asScala
      .map(_.get("snapshot-id").asLong()).toSeq
    withClue(s"snapshot ids: $ids") {
      ids.distinct.size shouldBe ids.size // NEVER a duplicate id
      ids.size shouldBe 2 // head X + Y; the pre-revert X truncates off
    }
    ids should contain (meta.get("current-snapshot-id").asLong())
    // the snapshot-log mirrors the truncated chain
    val logIds = meta.get("snapshot-log").elements().asScala
      .map(_.get("snapshot-id").asLong()).toSeq
    logIds.distinct.size shouldBe logIds.size
    // and the import reads the REVERTED state
    graft.versioned.IcebergImport.read(spark, dest)
      .orderBy("id").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq shouldBe Seq((1, "a"))
  }

  test("import reads a clean v1 export (no deletes) identically to graft") {
    sql("CREATE NAMESPACE g.icei")
    sql("CREATE NAMESPACE g.icei.main.db")
    sql("CREATE TABLE g.icei.main.db.t (id INT, name STRING, d DATE)")
    sql("INSERT INTO g.icei.main.db.t SELECT CAST(id AS INT), " +
      "concat('r', id), DATE'2024-01-01' + CAST(id % 10 AS INT) " +
      "FROM range(0, 30)")
    val dest = Files.createTempDirectory("ice-export-imp")
    val metaPath = sql("CALL g.system.iceberg_export('icei', 'main', " +
      s"'db.t', '$dest')").collect().head.getString(0)
    // clean table → v1, and the import CALL reports zero delete files
    mapperOf(metaPath).get("format-version").asInt() shouldBe 1
    val imp = sql(s"CALL g.system.iceberg_import('$metaPath', 'ice_imp_v')")
      .collect().head
    imp.getString(0) shouldBe "ice_imp_v"
    imp.getInt(1) should be > 0 // data files
    imp.getInt(2) shouldBe 0 // no deletes in a clean v1 export
    // the CALL registered a temp view over the import
    val viaView = sql("SELECT id, name, d FROM ice_imp_v ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDate(2)))
    val viaGraft = sql("SELECT id, name, d FROM g.icei.main.db.t ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDate(2)))
    viaView shouldBe viaGraft
    viaView.length shouldBe 30
  }

  test("history export is an honest incremental-append source: " +
    "import_changes between exported snapshots returns exactly the " +
    "appended rows (carried files are EXISTING, not re-ADDED)") {
    sql("CREATE NAMESPACE g.icehinc")
    sql("CREATE NAMESPACE g.icehinc.main.db")
    sql("CREATE TABLE g.icehinc.main.db.t (id INT, v DOUBLE)")
    Seq(0 -> 10, 10 -> 20, 20 -> 30).foreach { case (a, b) =>
      sql("INSERT INTO g.icehinc.main.db.t SELECT CAST(id AS INT), " +
        s"CAST(id AS DOUBLE) FROM range($a, $b)")
    }
    val dest = Files.createTempDirectory("ice-hist-incr")
    val metaPath = sql("CALL g.system.iceberg_export('icehinc', 'main', " +
      s"'db.t', '$dest', snapshots => 3)").collect().head.getString(0)
    val meta = mapperOf(metaPath)
    val sids = meta.get("snapshots").elements().asScala
      .map(_.get("snapshot-id").asLong()).toSeq // oldest → newest
    sids.length shouldBe 3

    // manifest-list attribution: the newest version's single inline
    // manifest reports only ITS files as added, the rest as existing
    val (listRecs, _) = readAvro(java.nio.file.Paths.get(
      java.net.URI.create(meta.get("snapshots").get(2)
        .get("manifest-list").asText())).toString)
    listRecs.map(_.get("added_rows_count").asInstanceOf[Long]).sum shouldBe 10L
    listRecs.map(_.get("existing_rows_count").asInstanceOf[Long]).sum shouldBe 20L

    def ids(from: Option[Long], to: Option[Long]): Seq[Int] =
      graft.versioned.IcebergImport
        .readChanges(spark, metaPath, from, to)
        .orderBy("id").collect().map(_.getInt(0)).toSeq
    ids(Some(sids(0)), Some(sids(2))) shouldBe (10 until 30)
    ids(Some(sids(1)), Some(sids(2))) shouldBe (20 until 30)
    ids(None, Some(sids(1))) shouldBe (0 until 20)
    // full-window changes == the table itself (append-only history)
    ids(None, None) shouldBe (0 until 30)
  }

  test("history export classifies summary operations: compaction is " +
    "'replace' (skipped by incremental consumers — no double count), " +
    "CoW deletes are 'overwrite' (refused), appends stay 'append'") {
    sql("CREATE NAMESPACE g.iceop")
    sql("CREATE NAMESPACE g.iceop.main.db")
    sql("CREATE TABLE g.iceop.main.db.t (id INT, v DOUBLE)")
    Seq(0 -> 10, 10 -> 20).foreach { case (a, b) =>
      sql("INSERT INTO g.iceop.main.db.t SELECT CAST(id AS INT), " +
        s"CAST(id AS DOUBLE) FROM range($a, $b)")
    }
    sql("CALL g.system.compact('iceop', 'main', 'db.t')")
    sql("INSERT INTO g.iceop.main.db.t SELECT CAST(id AS INT), " +
      "CAST(id AS DOUBLE) FROM range(20, 30)")
    sql("DELETE FROM g.iceop.main.db.t WHERE id >= 25") // CoW rewrite
    val dest = Files.createTempDirectory("ice-ops")
    val metaPath = sql("CALL g.system.iceberg_export('iceop', 'main', " +
      s"'db.t', '$dest', snapshots => 5)").collect().head.getString(0)
    val meta = mapperOf(metaPath)
    val snaps = meta.get("snapshots").elements().asScala.toSeq // old → new
    snaps.map(_.get("summary").get("operation").asText()) shouldBe
      Seq("append", "append", "replace", "append", "overwrite")
    val sids = snaps.map(_.get("snapshot-id").asLong())

    def ids(from: Option[Long], to: Option[Long]): Seq[Int] =
      graft.versioned.IcebergImport
        .readChanges(spark, metaPath, from, to)
        .orderBy("id").collect().map(_.getInt(0)).toSeq
    // crossing the compaction must NOT re-emit the rewritten rows
    ids(Some(sids(0)), Some(sids(3))) shouldBe (10 until 30)
    ids(Some(sids(1)), Some(sids(3))) shouldBe (20 until 30)
    ids(None, Some(sids(3))) shouldBe (0 until 30)
    // crossing the CoW delete refuses loudly — rows were removed
    val e = intercept[UnsupportedOperationException] {
      graft.versioned.IcebergImport.changesPlan(metaPath, Some(sids(3)), None)
    }
    e.getMessage should include("overwrite")
  }

  test("v3 export: positional tombstones become PUFFIN deletion vectors " +
    "(one blob per dirty data file, spec manifest coordinates, row " +
    "lineage) and the independent import reproduces the graft read") {
    sql("CREATE NAMESPACE g.icev3")
    sql("CREATE NAMESPACE g.icev3.main.db")
    sql("CREATE TABLE g.icev3.main.db.t (id INT, grp STRING, v DOUBLE) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    sql("INSERT INTO g.icev3.main.db.t SELECT CAST(id AS INT), " +
      "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END, CAST(id AS DOUBLE) " +
      "FROM range(0, 100)")
    sql("DELETE FROM g.icev3.main.db.t WHERE grp = 'a' AND id < 40")
    sql("INSERT INTO g.icev3.main.db.t VALUES (2, 'a', -1.0), (200, 'a', -2.0)")
    val dest = Files.createTempDirectory("ice-export-v3")
    val out = sql("CALL g.system.iceberg_export('icev3', 'main', 'db.t', " +
      s"'$dest', format_version => 3)").collect()
    val metaPath = java.nio.file.Paths.get(out.head.getString(0))

    // ---- v3 metadata + row lineage -------------------------------------
    val meta = mapperOf(metaPath.toString)
    meta.get("format-version").asInt() shouldBe 3
    meta.get("next-row-id").asLong() shouldBe 102L // 100 + 2 late inserts
    val snapNode = meta.get("snapshots").get(0)
    snapNode.get("first-row-id").asLong() shouldBe 0L

    // ---- manifest list: data manifests carry first_row_id --------------
    val (listRecs, _) = readAvro(java.nio.file.Paths.get(
      java.net.URI.create(snapNode.get("manifest-list").asText())).toString)
    val byContent =
      listRecs.groupBy(_.get("content").asInstanceOf[Int])
    byContent.keySet shouldBe Set(0, 1)
    var cursor = 0L
    byContent(0).foreach { r =>
      r.get("first_row_id").asInstanceOf[Long] shouldBe cursor
      cursor += r.get("added_rows_count").asInstanceOf[Long] +
        r.get("existing_rows_count").asInstanceOf[Long]
    }
    cursor shouldBe 102L
    byContent(1).foreach(r => r.get("first_row_id") shouldBe null)

    // ---- delete manifest: one DV entry per dirty data file -------------
    val (delEntries, delMeta) = readAvro(java.nio.file.Paths.get(
      java.net.URI.create(
        byContent(1).head.get("manifest_path").toString)).toString)
    delMeta("format-version") shouldBe "3"
    val dataByPath = byContent(0).flatMap { r =>
      readAvro(java.nio.file.Paths.get(java.net.URI.create(
        r.get("manifest_path").toString)).toString)._1
    }.map { e =>
      val df = e.get("data_file").asInstanceOf[GenericRecord]
      df.get("file_path").toString -> df.get("record_count").asInstanceOf[Long]
    }.toMap
    val puffins = delEntries.map(
      _.get("data_file").asInstanceOf[GenericRecord].get("file_path").toString)
    puffins.distinct.length shouldBe 1 // ONE puffin file for the snapshot
    val puffinPath = java.nio.file.Paths.get(java.net.URI.create(puffins.head))
    puffinPath.getFileName.toString should endWith(".puffin")
    val puffinBytes = Files.readAllBytes(puffinPath)
    puffinBytes.take(4) shouldBe "PFA1".getBytes("UTF-8")
    puffinBytes.takeRight(4) shouldBe "PFA1".getBytes("UTF-8")
    var total = 0L
    delEntries.foreach { e =>
      val df = e.get("data_file").asInstanceOf[GenericRecord]
      df.get("content").asInstanceOf[Int] shouldBe 1
      df.get("file_format").toString shouldBe "PUFFIN"
      df.get("file_size_in_bytes").asInstanceOf[Long] shouldBe
        Files.size(puffinPath)
      val ref = df.get("referenced_data_file").toString
      dataByPath.keySet should contain(ref)
      // the blob at (content_offset, content_size_in_bytes) decodes via
      // the independent DV parser; positions stay inside the file
      val off = df.get("content_offset").asInstanceOf[Long]
      val len = df.get("content_size_in_bytes").asInstanceOf[Long]
      val blob = java.util.Arrays.copyOfRange(
        puffinBytes, off.toInt, (off + len).toInt)
      val positions = graft.versioned.IcebergImport.parseDvBlob(blob, ref)
      positions.length.toLong shouldBe df.get("record_count").asInstanceOf[Long]
      positions.foreach(_ should be < dataByPath(ref))
      total += positions.length
    }
    total shouldBe 20L // 20 'a'-rows below 40 died (late inserts exempt)

    // ---- round trip: independent reader == graft read ------------------
    val imported = graft.versioned.IcebergImport.read(spark, metaPath)
      .orderBy("id", "v")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    val viaGraft = sql(
      "SELECT id, grp, v FROM g.icev3.main.db.t ORDER BY id, v")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    imported shouldBe viaGraft
    imported.length shouldBe 82
  }

  test("v3 partitioned export: each deletion vector carries its " +
    "referenced file's partition tuple, and a re-emission reuses the " +
    "puffin memo with zero Spark jobs") {
    sql("CREATE NAMESPACE g.icev3p")
    sql("CREATE NAMESPACE g.icev3p.main.db")
    sql("CREATE TABLE g.icev3p.main.db.t (id INT, grp STRING, v DOUBLE) " +
      "PARTITIONED BY (grp) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    sql("INSERT INTO g.icev3p.main.db.t SELECT CAST(id AS INT), " +
      "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END, CAST(id AS DOUBLE) " +
      "FROM range(0, 60)")
    sql("DELETE FROM g.icev3p.main.db.t WHERE id >= 50") // both partitions
    val dest = Files.createTempDirectory("ice-export-v3p")
    val metaPath = java.nio.file.Paths.get(
      sql("CALL g.system.iceberg_export('icev3p', 'main', 'db.t', " +
        s"'$dest', format_version => 3)").collect().head.getString(0))
    val meta = mapperOf(metaPath.toString)
    meta.get("format-version").asInt() shouldBe 3
    val (listRecs, _) = readAvro(java.nio.file.Paths.get(
      java.net.URI.create(meta.get("snapshots").get(0)
        .get("manifest-list").asText())).toString)
    val byContent = listRecs.groupBy(_.get("content").asInstanceOf[Int])
    // data-file path → its partition tuple (grp)
    val partByPath = byContent(0).flatMap { r =>
      readAvro(java.nio.file.Paths.get(java.net.URI.create(
        r.get("manifest_path").toString)).toString)._1
    }.map { e =>
      val df = e.get("data_file").asInstanceOf[GenericRecord]
      df.get("file_path").toString ->
        df.get("partition").asInstanceOf[GenericRecord].get("grp").toString
    }.toMap
    val (delEntries, _) = readAvro(java.nio.file.Paths.get(
      java.net.URI.create(
        byContent(1).head.get("manifest_path").toString)).toString)
    delEntries.length should be >= 2 // at least one DV per partition
    delEntries.foreach { e =>
      val df = e.get("data_file").asInstanceOf[GenericRecord]
      df.get("file_format").toString shouldBe "PUFFIN"
      // the DV's partition tuple IS its referenced file's
      df.get("partition").asInstanceOf[GenericRecord].get("grp").toString shouldBe
        partByPath(df.get("referenced_data_file").toString)
    }
    delEntries.map(_.get("data_file").asInstanceOf[GenericRecord]
      .get("partition").asInstanceOf[GenericRecord].get("grp").toString)
      .toSet shouldBe Set("a", "b")

    graft.versioned.IcebergImport.read(spark, metaPath).count() shouldBe 50

    // ---- re-emission: the DV memo answers, zero Spark jobs -------------
    def dvFiles = Files.walk(dest.resolve("data")).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".puffin"))
      .map(p => p -> java.util.Arrays.hashCode(Files.readAllBytes(p))).toMap
    val before = dvFiles
    before.size shouldBe 1
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      sql("CALL g.system.iceberg_export('icev3p', 'main', 'db.t', " +
        s"'$dest', format_version => 3)")
      org.apache.spark.graftbridge.TestListenerBridge.drain(spark.sparkContext)
      jobs.get() shouldBe 0
    } finally spark.sparkContext.removeSparkListener(listener)
    dvFiles shouldBe before // byte-stable: the puffin was reused, not rebuilt
  }

  test("table-uuid is table identity: stable across commits and " +
    "re-exports; refs.main tracks each version's current snapshot") {
    sql("CREATE NAMESPACE g.iceuid")
    sql("CREATE NAMESPACE g.iceuid.main.db")
    sql("CREATE TABLE g.iceuid.main.db.t (id INT)")
    sql("INSERT INTO g.iceuid.main.db.t VALUES (1)")
    val dest = Files.createTempDirectory("ice-uuid")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val repo = GraftRepo.open(java.nio.file.Paths.get(
      spark.conf.get("spark.sql.catalog.g.root"), "iceuid"))
    def metaOf(version: Int): com.fasterxml.jackson.databind.JsonNode = {
      val p = graft.versioned.IcebergExport.export(repo, "main", "db/t",
        dest, Some(spark), 1, version, 0)
      mapper.readTree(Files.readString(p))
    }
    val m1 = metaOf(1)
    sql("INSERT INTO g.iceuid.main.db.t VALUES (2)")
    val m2 = metaOf(2)
    m2.get("table-uuid").asText() shouldBe m1.get("table-uuid").asText()
    m2.get("current-snapshot-id").asLong() should not be
      m1.get("current-snapshot-id").asLong()
    Seq(m1, m2).foreach { m =>
      m.get("refs").get("main").get("snapshot-id").asLong() shouldBe
        m.get("current-snapshot-id").asLong()
    }
  }
}
