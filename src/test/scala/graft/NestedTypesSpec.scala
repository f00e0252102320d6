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

  test("nested ALTER lifecycle: ADD / RENAME / DROP of struct members " +
    "are metadata-only; old files read correctly throughout") {
    sql("CREATE NAMESPACE g.na")
    sql("CREATE NAMESPACE g.na.main.db")
    sql("""CREATE TABLE g.na.main.db.e (
        id INT,
        meta STRUCT<author: STRING, score: DOUBLE>)""")
    sql("""INSERT INTO g.na.main.db.e VALUES
        (1, named_struct('author','ann','score',0.9)),
        (2, named_struct('author','bob','score',0.4))""")

    // ADD a struct member: pre-existing rows read it as null
    sql("ALTER TABLE g.na.main.db.e ADD COLUMN meta.lang STRING")
    rows("SELECT id, meta.lang FROM g.na.main.db.e ORDER BY id") shouldBe
      Seq(Seq(1, null), Seq(2, null))
    sql("INSERT INTO g.na.main.db.e VALUES " +
      "(3, named_struct('author','cat','score',0.7,'lang','en'))")
    rows("SELECT id, meta.lang FROM g.na.main.db.e ORDER BY id") shouldBe
      Seq(Seq(1, null), Seq(2, null), Seq(3, "en"))

    // RENAME a struct member: physical bytes untouched, old files keep
    // reading; predicates on the new name still push down / prune
    sql("ALTER TABLE g.na.main.db.e RENAME COLUMN meta.score TO rating")
    rows("SELECT id, meta.rating FROM g.na.main.db.e WHERE meta.rating > 0.5 " +
      "ORDER BY id") shouldBe Seq(Seq(1, 0.9), Seq(3, 0.7))
    // rename the PARENT too: children resolve under the new parent name
    sql("ALTER TABLE g.na.main.db.e RENAME COLUMN meta TO info")
    rows("SELECT id, info.rating, info.author FROM g.na.main.db.e " +
      "WHERE info.rating > 0.5 ORDER BY id") shouldBe
      Seq(Seq(1, 0.9, "ann"), Seq(3, 0.7, "cat"))

    // DROP a member, then re-ADD the same name: the old physical bytes
    // must NOT resurface (fresh physical name; old rows read null)
    sql("ALTER TABLE g.na.main.db.e DROP COLUMN info.lang")
    sql("ALTER TABLE g.na.main.db.e ADD COLUMN info.lang STRING")
    rows("SELECT id, info.lang FROM g.na.main.db.e ORDER BY id") shouldBe
      Seq(Seq(1, null), Seq(2, null), Seq(3, null))
    sql("INSERT INTO g.na.main.db.e VALUES " +
      "(4, named_struct('author','dan','rating',0.2,'lang','fr'))")
    rows("SELECT id, info.lang FROM g.na.main.db.e WHERE id >= 3 " +
      "ORDER BY id") shouldBe Seq(Seq(3, null), Seq(4, "fr"))

    // CoW row-level ops evaluate renamed nested predicates correctly
    sql("DELETE FROM g.na.main.db.e WHERE info.rating < 0.3")
    rows("SELECT id FROM g.na.main.db.e ORDER BY id").flatten shouldBe
      Seq(1, 2, 3)
  }

  test("nested widen: struct member int -> long is metadata-only") {
    sql("CREATE NAMESPACE g.nw")
    sql("CREATE NAMESPACE g.nw.main.db")
    sql("CREATE TABLE g.nw.main.db.w (id INT, m STRUCT<n: INT>)")
    sql("INSERT INTO g.nw.main.db.w VALUES (1, named_struct('n', 7))")
    sql("ALTER TABLE g.nw.main.db.w ALTER COLUMN m.n TYPE BIGINT")
    rows("SELECT m.n FROM g.nw.main.db.w").head.head shouldBe 7L
    sql("INSERT INTO g.nw.main.db.w VALUES " +
      "(2, named_struct('n', 5000000000))")
    rows("SELECT sum(m.n) FROM g.nw.main.db.w").head.head shouldBe 5000000007L
    // non-widening stays refused (Spark's analyzer catches the narrow
    // direction itself; our gate backs it up for what slips through)
    val e = intercept[Exception] {
      sql("ALTER TABLE g.nw.main.db.w ALTER COLUMN m.n TYPE INT")
    }
    e.getMessage should (include("widening") or
      include("NOT_SUPPORTED_CHANGE_COLUMN"))
  }

  test("export/import round trip of an EVOLVED nested schema matches " +
    "the graft read; physical field ids stay stable under renames") {
    val dest = Files.createTempDirectory("ice-nested-alter")
    sql("CALL g.system.iceberg_export('na', 'main', 'db.e', " +
      s"'$dest')")
    val back = graft.versioned.IcebergImport.read(spark, dest)
    // export carries PHYSICAL names (renames are logical); compare by
    // position against the graft read
    val ours = sql("SELECT id, info FROM g.na.main.db.e").collect()
      .map(_.toSeq.toList).sortBy(_.head.asInstanceOf[Int])
    val theirs = back.collect()
      .map(r => List(r.get(0), r.get(1))).sortBy(_.head.asInstanceOf[Int])
    theirs.map(_.map {
      case r: org.apache.spark.sql.Row => r.toSeq.toList
      case v => v
    }) shouldBe ours.map(_.map {
      case r: org.apache.spark.sql.Row => r.toSeq.toList
      case v => v
    })
    // the exported schema uses the STABLE physical member names: the
    // original storage names survive both renames (meta->info,
    // score->rating) and the drop/re-add got a fresh physical name
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = om.readTree(java.nio.file.Files.readString(
      dest.resolve("metadata").resolve("v1.metadata.json")))
    val metaField = meta.get("schemas").get(0).get("fields").get(1)
    metaField.get("name").asText() shouldBe "meta"
    val memberNames = (0 until metaField.get("type").get("fields").size())
      .map(i => metaField.get("type").get("fields").get(i).get("name").asText())
    memberNames should contain allOf ("author", "score", "lang__r1")
  }

  test("ALTER inside ARRAY<STRUCT> and MAP<_, STRUCT> element structs: " +
    "ADD/RENAME/DROP of element members, metadata-only") {
    sql("CREATE NAMESPACE g.nc")
    sql("CREATE NAMESPACE g.nc.main.db")
    sql("""CREATE TABLE g.nc.main.db.c (
        id INT,
        evs ARRAY<STRUCT<kind: STRING, n: INT>>,
        attrs MAP<STRING, STRUCT<v: INT>>)""")
    sql("""INSERT INTO g.nc.main.db.c VALUES
        (1, array(named_struct('kind','a','n',1), named_struct('kind','b','n',2)),
            map('x', named_struct('v', 7))),
        (2, array(named_struct('kind','c','n',3)), map('y', named_struct('v', 8)))""")

    // ADD a member to the array's element struct: pre-existing rows
    // read it as null inside every element
    sql("ALTER TABLE g.nc.main.db.c ADD COLUMN evs.element.w DOUBLE")
    rows("SELECT id, e.kind, e.n, e.w FROM g.nc.main.db.c " +
      "LATERAL VIEW explode(evs) AS e ORDER BY id, e.n") shouldBe
      Seq(Seq(1, "a", 1, null), Seq(1, "b", 2, null), Seq(2, "c", 3, null))
    // RENAME an element member: old files keep reading (physical stays)
    sql("ALTER TABLE g.nc.main.db.c RENAME COLUMN evs.element.n TO cnt")
    sql("INSERT INTO g.nc.main.db.c VALUES " +
      "(3, array(named_struct('kind','d','cnt',4,'w',0.5)), " +
      "map('z', named_struct('v', 9)))")
    rows("SELECT id, e.kind, e.cnt, e.w FROM g.nc.main.db.c " +
      "LATERAL VIEW explode(evs) AS e ORDER BY id, e.cnt") shouldBe
      Seq(Seq(1, "a", 1, null), Seq(1, "b", 2, null),
        Seq(2, "c", 3, null), Seq(3, "d", 4, 0.5))

    // MAP value struct: ADD + RENAME, old values null-fill / keep reading
    sql("ALTER TABLE g.nc.main.db.c ADD COLUMN attrs.value.u STRING")
    sql("ALTER TABLE g.nc.main.db.c RENAME COLUMN attrs.value.v TO score")
    rows("SELECT id, k, a.score, a.u FROM g.nc.main.db.c " +
      "LATERAL VIEW explode(attrs) AS k, a ORDER BY id") shouldBe
      Seq(Seq(1, "x", 7, null), Seq(2, "y", 8, null), Seq(3, "z", 9, null))

    // DROP + re-ADD inside the element struct: old bytes never resurface
    sql("ALTER TABLE g.nc.main.db.c DROP COLUMN evs.element.kind")
    sql("ALTER TABLE g.nc.main.db.c ADD COLUMN evs.element.kind STRING")
    rows("SELECT id, e.kind FROM g.nc.main.db.c " +
      "LATERAL VIEW explode(evs) AS e WHERE e.cnt = 4 ORDER BY id") shouldBe
      Seq(Seq(3, null))
  }

  test("nested ALTER addressing a NON-STRUCT parent (array of scalars) " +
    "stays loudly unsupported") {
    sql("CREATE NAMESPACE g.ne")
    sql("CREATE NAMESPACE g.ne.main.db")
    sql("CREATE TABLE g.ne.main.db.a (id INT, tags ARRAY<STRING>)")
    // through SQL, Spark's analyzer rejects the non-struct path itself;
    // the catalog's own guard covers direct DSv2 callers
    intercept[Exception] {
      sql("ALTER TABLE g.ne.main.db.a ADD COLUMN tags.x STRING")
    }
    val cat = spark.sessionState.catalogManager.catalog("g")
      .asInstanceOf[graft.catalog.GraftCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("ne", "main", "db"), "a")
    val e = intercept[UnsupportedOperationException] {
      cat.alterTable(ident,
        org.apache.spark.sql.connector.catalog.TableChange.addColumn(
          Array("tags", "x"), org.apache.spark.sql.types.StringType))
    }
    e.getMessage.toLowerCase should include("not supported")
  }

  test("DROP of a nested member referenced by a live MoR tombstone " +
    "is refused") {
    sql("CREATE NAMESPACE g.nt")
    sql("CREATE NAMESPACE g.nt.main.db")
    sql("CREATE TABLE g.nt.main.db.m (id INT, s STRUCT<a: INT, b: INT>) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    sql("INSERT INTO g.nt.main.db.m VALUES (1, named_struct('a',1,'b',2)), " +
      "(2, named_struct('a',2,'b',3))")
    sql("DELETE FROM g.nt.main.db.m WHERE s.a = 2") // MoR tombstone on s.a
    val e = intercept[Exception] {
      sql("ALTER TABLE g.nt.main.db.m DROP COLUMN s.a")
    }
    e.getMessage should include("tombstone")
    // dropping the PARENT struct is refused for the same reason
    val e2 = intercept[Exception] {
      sql("ALTER TABLE g.nt.main.db.m DROP COLUMN s")
    }
    e2.getMessage should include("tombstone")
    // an unreferenced sibling drops fine
    sql("ALTER TABLE g.nt.main.db.m DROP COLUMN s.b")
    rows("SELECT s.a FROM g.nt.main.db.m").head.head shouldBe 1
  }
}
