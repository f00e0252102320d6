package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.scalatest.matchers.should.Matchers

/** Nested-type columns (top-level struct / array / map) end-to-end through
  * the versioned lifecycle: create → insert → read → branch → row-level ops
  * → merge → time travel → compaction. Mirrors the Iceberg-user expectation
  * (the reference's catalog accepts any Iceberg schema, nested included)
  * while nested ALTER stays loudly unsupported (GraftCatalog.alterTable).
  */
class NestedTypesSpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.catalog.g", classOf[graft.catalog.GraftCatalog].getName)
    .config("spark.sql.catalog.g.root", Files.createTempDirectory("graft-nested").toString)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def sql(q: String) = spark.sql(q)
  private def rows(q: String): Seq[Seq[Any]] =
    sql(q).collect().toIndexedSeq.map(_.toSeq)

  test("struct/array/map columns: create + insert + read") {
    sql("CREATE NAMESPACE g.n1")
    sql("CREATE NAMESPACE g.n1.main.db")
    sql("""CREATE TABLE g.n1.main.db.t (
        id INT,
        meta STRUCT<author: STRING, score: DOUBLE>,
        tags ARRAY<STRING>,
        props MAP<STRING, INT>)""")
    sql("""INSERT INTO g.n1.main.db.t VALUES
        (1, named_struct('author','ann','score',0.9), array('a','b'), map('x',1)),
        (2, named_struct('author','bob','score',0.4), array('c'), map('y',2,'z',3)),
        (3, named_struct('author','cat','score',0.7), array(), map())""")
    rows("SELECT id, meta.author, size(tags), props['y'] FROM g.n1.main.db.t ORDER BY id") shouldBe
      Seq(Seq(1, "ann", 2, null), Seq(2, "bob", 1, 2), Seq(3, "cat", 0, null))
    // predicate over a nested field must not break pruning/scan
    rows("SELECT id FROM g.n1.main.db.t WHERE meta.score > 0.5 ORDER BY id").flatten shouldBe Seq(1, 3)
  }

  test("branch isolation + merge with nested columns") {
    sql("CREATE NAMESPACE g.n1.dev")
    sql("""INSERT INTO g.n1.dev.db.t VALUES
        (4, named_struct('author','dev','score',1.0), array('d'), map('w',4))""")
    rows("SELECT count(*) FROM g.n1.main.db.t").flatten shouldBe Seq(3L)
    rows("SELECT count(*) FROM g.n1.dev.db.t").flatten shouldBe Seq(4L)
    sql("CALL g.system.merge('n1', 'dev', 'main')")
    rows("SELECT id, meta.author FROM g.n1.main.db.t ORDER BY id") shouldBe
      Seq(Seq(1, "ann"), Seq(2, "bob"), Seq(3, "cat"), Seq(4, "dev"))
  }

  test("DELETE and UPDATE on nested-schema table (CoW + MoR)") {
    sql("DELETE FROM g.n1.main.db.t WHERE id = 2")
    rows("SELECT id FROM g.n1.main.db.t ORDER BY id").flatten shouldBe Seq(1, 3, 4)
    sql("UPDATE g.n1.main.db.t SET tags = array('upd') WHERE id = 3")
    rows("SELECT tags[0] FROM g.n1.main.db.t WHERE id = 3").flatten shouldBe Seq("upd")
    // delete keyed on a nested field
    sql("DELETE FROM g.n1.main.db.t WHERE meta.author = 'dev'")
    rows("SELECT id FROM g.n1.main.db.t ORDER BY id").flatten shouldBe Seq(1, 3)
  }

  test("compaction preserves nested data") {
    sql("CALL g.system.compact('n1', 'main', 'db.t')")
    rows("SELECT id, meta.author, tags[0] FROM g.n1.main.db.t ORDER BY id") shouldBe
      Seq(Seq(1, "ann", "a"), Seq(3, "cat", "upd"))
  }

  test("time travel over nested-schema history") {
    val vers = sql("SELECT commit_id FROM g.n1.main.db.t.history ORDER BY ts")
      .collect().map(_.getString(0))
    // first version with data: after the initial 3-row insert
    val withRows = vers.find { v =>
      sql(s"SELECT * FROM g.n1.main.db.t VERSION AS OF '$v'").count() == 3
    }
    withRows should not be empty
    rows(s"SELECT meta.author FROM g.n1.main.db.t VERSION AS OF '${withRows.get}' ORDER BY id")
      .flatten shouldBe Seq("ann", "bob", "cat")
  }

  test("top-level ADD/DROP COLUMN works alongside nested columns") {
    sql("ALTER TABLE g.n1.main.db.t ADD COLUMN note STRING")
    sql("""INSERT INTO g.n1.main.db.t VALUES
        (9, named_struct('author','new','score',0.1), array('n'), map('k',9), 'hello')""")
    rows("SELECT id, note FROM g.n1.main.db.t ORDER BY id") shouldBe
      Seq(Seq(1, null), Seq(3, null), Seq(9, "hello"))
    sql("ALTER TABLE g.n1.main.db.t DROP COLUMN note")
    rows("SELECT id FROM g.n1.main.db.t ORDER BY id").flatten shouldBe Seq(1, 3, 9)
  }

  test("iceberg export of a nested schema: recursive field ids, nested " +
    "name mapping, import round-trips the data") {
    import java.nio.file.{Files => JFiles, Paths => JPaths}
    val dest = JFiles.createTempDirectory("ice-nested")
    val out = sql(s"CALL g.system.iceberg_export('n1', 'main', 'db.t', '$dest')").collect()
    val metaPath = out.head.getString(0)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = mapper.readTree(JFiles.readString(JPaths.get(metaPath)))

    // ---- schema JSON: nested types with unique ids ---------------------
    val fields = meta.get("schema").get("fields")
    fields.size() shouldBe 4
    val metaF = fields.get(1)
    metaF.get("name").asText() shouldBe "meta"
    metaF.get("type").get("type").asText() shouldBe "struct"
    val inner = metaF.get("type").get("fields")
    inner.size() shouldBe 2
    inner.get(0).get("name").asText() shouldBe "author"
    inner.get(0).get("type").asText() shouldBe "string"
    val tagsF = fields.get(2)
    tagsF.get("type").get("type").asText() shouldBe "list"
    tagsF.get("type").get("element").asText() shouldBe "string"
    val propsF = fields.get(3)
    propsF.get("type").get("type").asText() shouldBe "map"
    propsF.get("type").get("key").asText() shouldBe "string"
    propsF.get("type").get("value").asText() shouldBe "int"
    // ids unique across the whole tree; last-column-id is the max
    def idsOf(n: com.fasterxml.jackson.databind.JsonNode): Seq[Int] = {
      val b = Seq.newBuilder[Int]
      def walk(t: com.fasterxml.jackson.databind.JsonNode): Unit =
        if (t.isObject) t.get("type").asText() match {
          case "struct" => t.get("fields").forEach { f =>
            b += f.get("id").asInt(); walk(f.get("type")) }
          case "list" =>
            b += t.get("element-id").asInt(); walk(t.get("element"))
          case "map" =>
            b += t.get("key-id").asInt(); walk(t.get("key"))
            b += t.get("value-id").asInt(); walk(t.get("value"))
        }
      walk(n)
      b.result()
    }
    val allIds = idsOf(meta.get("schema"))
    allIds.distinct.length shouldBe allIds.length
    // top-level ids stay 1..n (equality_ids / stats-map key space)
    (0 until 4).map(i => fields.get(i).get("id").asInt()) shouldBe Seq(1, 2, 3, 4)
    meta.get("last-column-id").asInt() shouldBe allIds.max

    // ---- name mapping covers nested fields -----------------------------
    val nm = mapper.readTree(
      meta.get("properties").get("schema.name-mapping.default").asText())
    nm.size() shouldBe 4
    val nmMeta = nm.get(1)
    nmMeta.get("names").get(0).asText() shouldBe "meta"
    nmMeta.get("fields").get(0).get("names").get(0).asText() shouldBe "author"
    val nmTags = nm.get(2)
    nmTags.get("fields").get(0).get("names").get(0).asText() shouldBe "element"
    val nmProps = nm.get(3)
    nmProps.get("fields").get(0).get("names").get(0).asText() shouldBe "key"
    nmProps.get("fields").get(1).get("names").get(0).asText() shouldBe "value"
    // nested mapping ids match the schema tree's ids
    (nmMeta.get("fields").get(0).get("field-id").asInt() +:
      nmTags.get("fields").get(0).get("field-id").asInt() +: Nil)
      .foreach(id => allIds should contain(id))

    // ---- independent import reads the same rows ------------------------
    val got = graft.versioned.IcebergImport.read(
      spark, JPaths.get(metaPath))
    got.select("id", "meta.author", "tags", "props").orderBy("id")
      .collect().map(_.toSeq.toList).toList shouldBe
      sql("SELECT id, meta.author, tags, props FROM g.n1.main.db.t ORDER BY id")
        .collect().map(_.toSeq.toList).toList
  }

  test("nested-leaf footer stats prune files by nested-field predicates") {
    import org.apache.spark.sql.sources.{EqualTo, GreaterThan}
    import org.apache.spark.sql.types.{DataType, StructType}
    sql("CREATE NAMESPACE g.np")
    sql("CREATE NAMESPACE g.np.main.db")
    sql("CREATE TABLE g.np.main.db.t (id INT, " +
      "meta STRUCT<author: STRING, score: INT>, tags ARRAY<STRING>)")
    // two files with disjoint nested ranges
    sql("INSERT INTO g.np.main.db.t SELECT CAST(id AS INT), " +
      "named_struct('author', concat('a', id), 'score', CAST(id AS INT)), " +
      "array('x') FROM range(0, 50)")
    sql("INSERT INTO g.np.main.db.t SELECT CAST(id AS INT), " +
      "named_struct('author', concat('z', id), 'score', CAST(id AS INT)), " +
      "array('y') FROM range(1000, 1050)")
    val repo = graft.versioned.GraftRepo.open(java.nio.file.Paths.get(
      spark.conf.get("spark.sql.catalog.g.root"), "np"))
    val snap = repo.snapshot(repo.headCommit("main").tables("db/t"))
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    snap.files.size should be >= 2
    // write-time footer stats carry the struct leaves
    val withNested = snap.files.filter(f => f.min.contains("meta.score"))
    withNested.size shouldBe snap.files.size
    // nested numeric range predicate keeps only the second insert's files
    val hi = graft.versioned.TableOps.pruneFiles(
      snap, schema, Seq(GreaterThan("meta.score", 999)))
    hi should not be empty
    hi.size should be < snap.files.size
    // nested string equality
    val one = graft.versioned.TableOps.pruneFiles(
      snap, schema, Seq(EqualTo("meta.author", "z1000")))
    one should not be empty
    one.size should be < snap.files.size
    // SQL answers stay correct through the pruned scan
    rows("SELECT count(*) FROM g.np.main.db.t WHERE meta.score > 999")
      .flatten shouldBe Seq(50L)
    rows("SELECT id FROM g.np.main.db.t WHERE meta.author = 'z1000'")
      .flatten shouldBe Seq(1000)
    // planner statistics follow nested static pruning iff Spark pushes
    // the dotted filter into the DSv2 scan (proves end-to-end wiring)
    val pruned = spark.table("g.np.main.db.t").where("meta.score > 999")
      .queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.stats.rowCount.get
      }
    pruned.get shouldBe BigInt(50)
  }

  test("nested-field CoW delete rewrites only stat-hit files") {
    sql("DELETE FROM g.np.main.db.t WHERE meta.score = 1005")
    rows("SELECT count(*) FROM g.np.main.db.t").flatten shouldBe Seq(99L)
    // the 0..49 file survived untouched (pruned from the rewrite group)
    val repo = graft.versioned.GraftRepo.open(java.nio.file.Paths.get(
      spark.conf.get("spark.sql.catalog.g.root"), "np"))
    val snap = repo.snapshot(repo.headCommit("main").tables("db/t"))
    val lows = snap.files.filter(f => f.max.get("meta.score").exists(_.toInt < 999))
    lows should not be empty
  }

  test("iceberg export carries nested-leaf column stats under nested ids") {
    import java.nio.file.{Files => JFiles, Paths => JPaths}
    val dest = JFiles.createTempDirectory("ice-nested-stats")
    val out = sql(s"CALL g.system.iceberg_export('np', 'main', 'db.t', '$dest')").collect()
    val metaPath = out.head.getString(0)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = mapper.readTree(JFiles.readString(JPaths.get(metaPath)))
    // resolve the nested ids of meta.author / meta.score from the schema
    val fields = meta.get("schema").get("fields")
    val metaType = (0 until fields.size()).map(fields.get)
      .find(_.get("name").asText() == "meta").get.get("type")
    val innerIds = metaType.get("fields")
    val authorId = (0 until innerIds.size()).map(innerIds.get)
      .find(_.get("name").asText() == "author").get.get("id").asInt()
    val scoreId = (0 until innerIds.size()).map(innerIds.get)
      .find(_.get("name").asText() == "score").get.get("id").asInt()
    // decode a manifest entry's stats maps: nested ids must be present
    val snaps = meta.get("snapshots")
    val listUri = java.net.URI.create(
      snaps.get(snaps.size() - 1).get("manifest-list").asText())
    val rd = new org.apache.avro.file.DataFileReader[org.apache.avro.generic.GenericRecord](
      JPaths.get(listUri).toFile,
      new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    val manifestPath = try rd.iterator().next().get("manifest_path").toString finally rd.close()
    val mrd = new org.apache.avro.file.DataFileReader[org.apache.avro.generic.GenericRecord](
      JPaths.get(java.net.URI.create(manifestPath)).toFile,
      new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    try {
      val entry = mrd.iterator().next()
      val df = entry.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
      def idsOfMap(field: String): Set[Int] = {
        df.get(field).asInstanceOf[java.util.List[_]].asScala.map { kv =>
          kv.asInstanceOf[org.apache.avro.generic.GenericRecord]
            .get("key").asInstanceOf[Number].intValue()
        }.toSet
      }
      idsOfMap("value_counts") should contain allOf (authorId, scoreId)
      idsOfMap("lower_bounds") should contain allOf (authorId, scoreId)
      idsOfMap("upper_bounds") should contain allOf (authorId, scoreId)
      // top-level id column (field id 1) still present
      idsOfMap("lower_bounds") should contain(1)
    } finally mrd.close()
  }

  test("nested ALTER stays loudly unsupported") {
    val e = intercept[Exception] {
      sql("ALTER TABLE g.n1.main.db.t ADD COLUMN meta.extra STRING")
    }
    e.getMessage should include("nested")
  }
}
