package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.sources
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.scalatest.matchers.should.Matchers

import graft.versioned.{Blooms, GraftRepo, TableOps}

/** Per-file bloom sidecars ([[graft.versioned.Blooms]]): point-lookup
  * file pruning where min/max stats are useless (unclustered columns),
  * width-normalized hashing across type widening, sound rewrite
  * selection for row-level ops, GC of sidecars with their data files.
  */
class BloomSpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {

  private val catRoot = Files.createTempDirectory("graft-bloom")

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.catalog.g", classOf[graft.catalog.GraftCatalog].getName)
    .config("spark.sql.catalog.g.root", catRoot.toString)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def sql(q: String) = spark.sql(q)

  private var n = 0
  /** Fresh repo with a bloom-on-id table: 4 single-file commits × 25
    * ids, id ranges OVERLAPPING across files (interleaved by residue
    * mod 4) so min/max stats can never separate them — only the bloom
    * can. (repartition(1) pins one file per commit; a SQL VALUES insert
    * may split across tasks.)
    */
  private def setup(): String = {
    n += 1; val r = s"b$n"
    sql(s"CREATE NAMESPACE g.$r")
    sql(s"CREATE NAMESPACE g.$r.main.db")
    sql(s"CREATE TABLE g.$r.main.db.t (id INT, v STRING) " +
      "TBLPROPERTIES('graft.bloom.columns'='id')")
    import spark.implicits._
    for (res <- 0 until 4) {
      val df = (0 until 100).filter(_ % 4 == res).map(i => (i, s"v_$i"))
        .toDF("id", "v").repartition(1)
      TableOps.insert(spark, repoOf(r), "main", "db/t", df, overwrite = false)
    }
    r
  }

  private def repoOf(r: String): GraftRepo = GraftRepo.open(catRoot.resolve(r))
  private def headSnap(r: String) =
    repoOf(r).snapshot(repoOf(r).headCommit("main").tables("db/t"))

  test("sidecars are written and advertised; min/max alone cannot separate the files") {
    val r = setup()
    val snap = headSnap(r)
    snap.files should have size 4
    snap.files.foreach { f =>
      f.bloomColsList shouldBe Seq("id")
      Files.exists(repoOf(r).root.resolve(Blooms.sidecar(f.path))) shouldBe true
      // every file's [min,max] spans nearly the whole id domain
      f.min("id").toInt should be <= 3
      f.max("id").toInt should be >= 96
    }
  }

  test("bloom tables keep NESTED leaf stats: a struct member's min/max " +
    "lands in FileEntry like the footer path records it (a bloom " +
    "opt-in must not silently cost nested-column pruning)") {
    n += 1; val r = s"b$n"
    sql(s"CREATE NAMESPACE g.$r")
    sql(s"CREATE NAMESPACE g.$r.main.db")
    sql(s"CREATE TABLE g.$r.main.db.nt " +
      "(id INT, meta STRUCT<author: STRING, stars: INT>) " +
      "TBLPROPERTIES('graft.bloom.columns'='id')")
    sql(s"INSERT INTO g.$r.main.db.nt VALUES " +
      "(1, named_struct('author', 'ada', 'stars', 3)), " +
      "(2, named_struct('author', 'zoe', 'stars', 9))")
    val fs = repoOf(r).snapshot(
      repoOf(r).headCommit("main").tables("db/nt")).files
    fs.foreach { f =>
      f.bloomColsList shouldBe Seq("id")
      f.min.keySet should contain allOf ("meta.author", "meta.stars")
      f.nullCounts.get("meta.stars") shouldBe Some(0L)
    }
    fs.flatMap(_.min.get("meta.author")).min shouldBe "ada"
    fs.flatMap(_.max.get("meta.author")).max shouldBe "zoe"
    fs.flatMap(_.min.get("meta.stars")).map(_.toInt).min shouldBe 3
    fs.flatMap(_.max.get("meta.stars")).map(_.toInt).max shouldBe 9
  }

  test("data files carry parquet-native blooms on the same columns (row-group pruning)") {
    import scala.jdk.CollectionConverters._
    val r = setup()
    val f = headSnap(r).files.head
    val conf = new org.apache.hadoop.conf.Configuration()
    val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(repoOf(r).root.resolve(f.path).toUri), conf))
    try {
      val rg = rd.getRowGroups.get(0)
      val idCol = rg.getColumns.asScala.find(_.getPath.toDotString == "id").get
      rd.getBloomFilterDataReader(rg).readBloomFilter(idCol) should not be null
      // v (not a bloom column) has none
      val vCol = rg.getColumns.asScala.find(_.getPath.toDotString == "v").get
      Option(rd.getBloomFilterDataReader(rg).readBloomFilter(vCol)) shouldBe None
    } finally rd.close()
  }

  test("equality lookup prunes to exactly the file holding the value") {
    val r = setup()
    val repo = repoOf(r); val snap = headSnap(r)
    val schema = spark.table(s"g.$r.main.db.t").schema
    // id=42 lives in the residue-2 file; min/max keeps all 4, bloom keeps 1
    TableOps.pruneFiles(snap, schema,
      Seq(sources.EqualTo("id", 42))) should have size 4
    val kept = TableOps.pruneFilesBloom(repo, snap, schema,
      Seq(sources.EqualTo("id", 42)))
    kept should have size 1
    // absent value: bloom proves no file can match
    TableOps.pruneFilesBloom(repo, snap, schema,
      Seq(sources.EqualTo("id", 5000))) shouldBe empty
    // result correctness through SQL (the scan path applies the same prune)
    sql(s"SELECT v FROM g.$r.main.db.t WHERE id = 42")
      .collect().map(_.getString(0)) shouldBe Array("v_42")
  }

  test("In-filters, Or-composition, and non-equality shapes behave soundly") {
    val r = setup()
    val repo = repoOf(r); val snap = headSnap(r)
    val schema = spark.table(s"g.$r.main.db.t").schema
    // In over two residues keeps exactly those two files
    TableOps.pruneFilesBloom(repo, snap, schema,
      Seq(sources.In("id", Array(8, 13)))) should have size 2
    // Or of two equalities likewise
    TableOps.pruneFilesBloom(repo, snap, schema,
      Seq(sources.Or(sources.EqualTo("id", 0), sources.EqualTo("id", 1))))
      .should(have size 2)
    // ranges and negations never bloom-prune
    TableOps.pruneFilesBloom(repo, snap, schema,
      Seq(sources.GreaterThan("id", 90))) should have size 4
    TableOps.pruneFilesBloom(repo, snap, schema,
      Seq(sources.Not(sources.EqualTo("id", 42)))) should have size 4
    sql(s"SELECT count(*) FROM g.$r.main.db.t WHERE id IN (8, 13)")
      .collect().head.getLong(0) shouldBe 2
  }

  test("type widening keeps old blooms valid (width-normalized hashing)") {
    val r = setup()
    sql(s"ALTER TABLE g.$r.main.db.t ALTER COLUMN id TYPE BIGINT")
    val repo = repoOf(r); val snap = headSnap(r)
    val schema = spark.table(s"g.$r.main.db.t").schema
    schema("id").dataType shouldBe org.apache.spark.sql.types.LongType
    // pre-widening sidecars still prove presence/absence for long probes
    TableOps.pruneFilesBloom(repo, snap, schema,
      Seq(sources.EqualTo("id", 42L))) should have size 1
    TableOps.pruneFilesBloom(repo, snap, schema,
      Seq(sources.EqualTo("id", 5000L))) shouldBe empty
    sql(s"SELECT v FROM g.$r.main.db.t WHERE id = 42")
      .collect().map(_.getString(0)) shouldBe Array("v_42")
  }

  test("point DELETE rewrites only the file the bloom admits") {
    val r = setup()
    val before = headSnap(r).files.map(_.path).toSet
    sql(s"DELETE FROM g.$r.main.db.t WHERE id = 42")
    val after = headSnap(r).files.map(_.path).toSet
    // 3 of 4 original files untouched; exactly one replaced
    (before intersect after) should have size 3
    (before diff after) should have size 1
    sql(s"SELECT count(*) FROM g.$r.main.db.t").collect().head.getLong(0) shouldBe 99
  }

  test("row-level rewrites keep building sidecars: CoW DELETE and " +
    "UPDATE replacement files advertise blooms (pruning must not decay " +
    "under churn)") {
    val r = setup()
    sql(s"DELETE FROM g.$r.main.db.t WHERE id = 42")
    // every live file still advertises the bloom — including the one
    // the delete just rewrote
    headSnap(r).files.foreach { f =>
      f.bloomCols.getOrElse(Nil) should contain ("id")
    }
    sql(s"UPDATE g.$r.main.db.t SET v = 'X' WHERE id = 43")
    headSnap(r).files.foreach { f =>
      f.bloomCols.getOrElse(Nil) should contain ("id")
    }
    // and the rewritten files' sidecars still PRUNE: a lookup of a key
    // in an untouched file admits exactly one file
    val snapF = headSnap(r)
    val schemaF = org.apache.spark.sql.types.DataType
      .fromJson(snapF.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val admitted = graft.versioned.Blooms.prune(repoOf(r).dataIO,
      snapF, schemaF, Seq(org.apache.spark.sql.sources.EqualTo("id", 41)),
      snapF.files)
    admitted should have size 1
  }

  test("compaction rewrites carry fresh blooms; vacuum GCs orphaned sidecars") {
    val r = setup()
    val repo = repoOf(r)
    sql(s"DELETE FROM g.$r.main.db.t WHERE id = 42")
    TableOps.compact(spark, repo, "main", "db/t")
    val snap = headSnap(r)
    snap.files.foreach(_.bloomColsList shouldBe Seq("id"))
    snap.files.foreach(f =>
      Files.exists(repo.root.resolve(Blooms.sidecar(f.path))) shouldBe true)
    // orphan a file + its sidecar: dev-only commit, then drop the branch
    // (DML alone orphans nothing — ancestor commits keep their files)
    sql(s"CREATE NAMESPACE g.$r.dev")
    sql(s"INSERT INTO g.$r.dev.db.t VALUES (999, 'dev_only')")
    val devOnly = repoOf(r).snapshot(
      repoOf(r).headCommit("dev").tables("db/t")).files
      .filterNot(f => snap.files.map(_.path).contains(f.path))
    devOnly should not be empty
    devOnly.foreach(f =>
      Files.exists(repo.root.resolve(Blooms.sidecar(f.path))) shouldBe true)
    repo.dropBranch("dev")
    repo.vacuum(0L) should be >= 1
    devOnly.foreach { f =>
      Files.exists(repo.root.resolve(f.path)) shouldBe false
      Files.exists(repo.root.resolve(Blooms.sidecar(f.path))) shouldBe false // GC'd together
    }
  }

  test("merge-on-read × blooms: tombstones dirty only files that might hold the row") {
    import org.apache.spark.sql.types.{DataType, StructType}
    import graft.versioned.Tombstones
    n += 1; val r = s"b$n"
    sql(s"CREATE NAMESPACE g.$r")
    sql(s"CREATE NAMESPACE g.$r.main.db")
    sql(s"CREATE TABLE g.$r.main.db.t (id INT, v STRING) TBLPROPERTIES(" +
      "'graft.bloom.columns'='id', 'graft.delete.mode'='merge-on-read')")
    import spark.implicits._
    // EVEN ids only, residue-interleaved: every file spans ~the whole
    // domain, and odd probes are in-range but provably absent
    for (res <- 0 until 4)
      TableOps.insert(spark, repoOf(r), "main", "db/t",
        (0 until 100).filter(_ % 4 == res).map(i => (i * 2, s"v_${i * 2}"))
          .toDF("id", "v").repartition(1), overwrite = false)
    // absent value (85 is odd): blooms prove NO file holds it -> the MoR
    // delete is a provable no-op, no tombstone commits
    sql(s"DELETE FROM g.$r.main.db.t WHERE id = 85")
    Tombstones.of(headSnap(r)) shouldBe empty
    // present value: tombstone commits, but dirties ONLY the one file
    // whose bloom admits it — the other three keep the columnar path
    sql(s"DELETE FROM g.$r.main.db.t WHERE id = 84")
    val snap = headSnap(r)
    Tombstones.of(snap) should have size 1
    val physSchema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    val (clean, dirty) = Tombstones.split(Tombstones.of(snap), physSchema,
      snap.files, Some(repoOf(r).dataIO))
    clean should have size 3
    dirty.map(_._1.size).sum shouldBe 1
    // without blooms every file would be dirty (min/max all span 84)
    val (cleanNoBloom, _) = Tombstones.split(Tombstones.of(snap), physSchema,
      snap.files, None)
    cleanNoBloom shouldBe empty
    sql(s"SELECT count(*) FROM g.$r.main.db.t").collect().head.getLong(0) shouldBe 99
    sql(s"SELECT count(*) FROM g.$r.main.db.t WHERE id = 84")
      .collect().head.getLong(0) shouldBe 0
  }

  test("renamed bloom column keeps pruning (physical-name sidecars)") {
    val r = setup()
    sql(s"ALTER TABLE g.$r.main.db.t RENAME COLUMN id TO doc_id")
    val repo = repoOf(r); val snap = headSnap(r)
    val schema = spark.table(s"g.$r.main.db.t").schema
    TableOps.pruneFilesBloom(repo, snap, schema,
      Seq(sources.EqualTo("doc_id", 42))) should have size 1
    sql(s"SELECT v FROM g.$r.main.db.t WHERE doc_id = 42")
      .collect().map(_.getString(0)) shouldBe Array("v_42")
  }

  test("lossy literals and absent sidecars never wrongly prune") {
    val r = setup()
    val repo = repoOf(r); val snap = headSnap(r)
    val schema = spark.table(s"g.$r.main.db.t").schema
    // fractional probe against an int column: bloom must not answer
    Blooms.literalHash(java.lang.Double.valueOf(5.7),
      org.apache.spark.sql.types.IntegerType) shouldBe None
    // delete ONE file's sidecar out from under the metadata (the
    // residue-0 file), then probe id=42 (residue 2): the sidecar-less
    // file degrades to "keep" — a lost sidecar costs speed, never rows
    val blind = snap.files.find(_.min("id") == "0").get
    Files.delete(repo.root.resolve(Blooms.sidecar(blind.path)))
    val kept = TableOps.pruneFilesBloom(repo, snap, schema,
      Seq(sources.EqualTo("id", 42)))
    kept.map(_.path).toSet shouldBe
      Set(blind.path, snap.files.find(_.min("id") == "2").get.path)
  }
}
