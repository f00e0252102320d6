package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.scalatest.matchers.should.Matchers

import graft.versioned.{FileEntry, GraftRepo, Json, Manifests, PartitionField, Snapshot}

/** Manifest-segmented snapshot metadata (Manifests.scala): past the
  * inline threshold a snapshot's file list is stored as content-defined,
  * content-addressed chunks, so commit metadata cost is O(changed files)
  * and successive snapshots share unchanged chunks byte-for-byte — the
  * property Iceberg gets from manifest files, which the reference serves
  * through iceberg-core (LakeFSTableOperations.java:36).
  */
class ManifestSpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {

  private var savedInline: Option[String] = None
  private var savedTarget: Option[String] = None

  override def beforeAll(): Unit = {
    savedInline = Option(System.getProperty("graft.manifest.inline.max"))
    savedTarget = Option(System.getProperty("graft.manifest.target"))
    System.setProperty("graft.manifest.inline.max", "8")
    System.setProperty("graft.manifest.target", "4")
  }

  override def afterAll(): Unit = {
    def restore(k: String, v: Option[String]): Unit =
      v.fold[AnyRef](System.clearProperty(k))(System.setProperty(k, _))
    restore("graft.manifest.inline.max", savedInline)
    restore("graft.manifest.target", savedTarget)
  }

  private def entry(i: Int, part: Option[Map[String, String]] = None) =
    FileEntry(f"data/u$i%04d/part-0.parquet", rows = 10L + i,
      min = Map("id" -> i.toString), max = Map("id" -> (i + 9).toString),
      partitionValues = part, bytes = Some(1000L), seq = Some(1L))

  private def freshRepo() =
    GraftRepo.init(Files.createTempDirectory("graft-manifest"))

  private def manifestObjects(repo: GraftRepo): Seq[String] = {
    val dir = repo.root.resolve("snapshots").resolve("manifests")
    if (!Files.isDirectory(dir)) Nil
    else repo.io.list(dir).map(_.getFileName.toString).sorted
  }

  private def rawSnapshot(repo: GraftRepo, id: String): Snapshot =
    Json.read[Snapshot](repo.io.readString(
      repo.root.resolve("snapshots").resolve(s"$id.json")))

  test("small file lists stay inline: no manifests field, no objects") {
    val repo = freshRepo()
    val files = (1 to 8).map(entry(_))
    val s = repo.writeSnapshot("db/t", "{}", files)
    rawSnapshot(repo, s.id).manifestRefs shouldBe empty
    rawSnapshot(repo, s.id).files shouldBe files
    manifestObjects(repo) shouldBe empty
    repo.snapshot(s.id).files shouldBe files
  }

  test("segmented round trip: persisted files empty, load re-materializes order + content") {
    val repo = freshRepo()
    val files = (1 to 100).map(entry(_))
    val s = repo.writeSnapshot("db/t", "{}", files)
    // persisted form: refs only, inline list empty
    val raw = rawSnapshot(repo, s.id)
    raw.files shouldBe empty
    raw.manifestRefs should not be empty
    raw.manifestRefs.map(_.count).sum shouldBe 100
    raw.manifestRefs.map(_.rows).sum shouldBe files.map(_.rows).sum
    // returned and re-loaded snapshots both materialize the full ordered list
    s.files shouldBe files
    repo.snapshot(s.id).files shouldBe files
    // chunk sizes respect the 4x hard cap
    raw.manifestRefs.foreach(_.count should be <= 4 * 4)
  }

  test("append shares every untouched chunk (O(delta) commit metadata)") {
    val repo = freshRepo()
    val base = (1 to 100).map(entry(_))
    val s1 = repo.writeSnapshot("db/t", "{}", base)
    val before = manifestObjects(repo)
    val s2 = repo.writeSnapshot("db/t", "{}", base ++ Seq(entry(101), entry(102)))
    val r1 = rawSnapshot(repo, s1.id).manifestRefs.map(_.path)
    val r2 = rawSnapshot(repo, s2.id).manifestRefs.map(_.path)
    // every base chunk except the (possibly partial) tail is literally
    // the same object in the appended snapshot
    r1.dropRight(1).foreach(p => r2 should contain(p))
    // the 2-entry append rewrote at most the tail chunk plus whatever
    // new chunks the appended entries themselves cut — never O(chunks)
    (manifestObjects(repo).size - before.size) should be <= 3
    repo.snapshot(s2.id).files should have size 102
  }

  test("delete perturbs only the chunk holding the entry") {
    val repo = freshRepo()
    val base = (1 to 100).map(entry(_))
    val s1 = repo.writeSnapshot("db/t", "{}", base)
    val victim = base(40)
    val s2 = repo.writeSnapshot("db/t", "{}", base.filterNot(_ == victim))
    val r1 = rawSnapshot(repo, s1.id).manifestRefs.map(_.path)
    val r2 = rawSnapshot(repo, s2.id).manifestRefs.map(_.path)
    val changed = r2.filterNot(r1.contains)
    // content-defined boundaries: removing one entry rewrites the chunk
    // it lived in (possibly merging with a neighbor), nothing else
    changed.size should be <= 2
    (r1.toSet intersect r2.toSet).size should be >= (r1.size - 2)
    repo.snapshot(s2.id).files shouldBe base.filterNot(_ == victim)
  }

  test("identical lists are deduplicated across snapshots AND tables (content addressing)") {
    val repo = freshRepo()
    val files = (1 to 50).map(entry(_))
    repo.writeSnapshot("db/t1", "{}", files)
    val before = manifestObjects(repo)
    repo.writeSnapshot("db/t2", "{}", files)
    manifestObjects(repo) shouldBe before // zero new objects
  }

  test("partition summaries recorded when few distinct tuples; loaders can skip disjoint chunks") {
    val repo = freshRepo()
    val files = (1 to 60).map(i => entry(i, Some(Map("p" -> s"p${i % 3}"))))
    val spec = Seq(PartitionField("p", "identity", "p"))
    val s = repo.writeSnapshot("db/t", "{}", files, partitionBy = Some(spec))
    val refs = rawSnapshot(repo, s.id).manifestRefs
    refs.foreach { r =>
      r.partitions should not be empty
      r.partitions.get.toSet.subsetOf(
        Set(Map("p" -> "p0"), Map("p" -> "p1"), Map("p" -> "p2"))) shouldBe true
    }
  }

  test("legacy inline snapshot JSON (no manifests key) still reads") {
    val repo = freshRepo()
    val files = (1 to 3).map(entry(_))
    val legacy = Snapshot("sLEGACY", "db/t", "{}", files)
    // hand-write the pre-manifest JSON shape
    repo.io.createExclusive(
      repo.root.resolve("snapshots").resolve("sLEGACY.json"),
      Json.write(legacy)) shouldBe true
    repo.snapshot("sLEGACY").files shouldBe files
  }

  test("manifest cache: immutable objects load once; clearCache forces re-read") {
    val repo = freshRepo()
    Manifests.clearCache()
    val files = (1 to 100).map(entry(_))
    val s = repo.writeSnapshot("db/t", "{}", files)
    repo.snapshot(s.id).files.toVector // traversal loads (snapshot() is lazy)
    val after1 = Manifests.cacheSize
    after1 should be > 0
    repo.snapshot(s.id).files.toVector // warm: same objects, no growth
    Manifests.cacheSize shouldBe after1
    Manifests.clearCache()
    Manifests.cacheSize shouldBe 0
    repo.snapshot(s.id).files shouldBe files
  }

  test("expire GC: orphaned manifests swept with one-pass lag, live ones kept") {
    val repo = freshRepo()
    val (v, _) = repo.head("main")
    val live = repo.writeSnapshot("db/t", "{}", (1 to 100).map(entry(_)))
    repo.commitAt("main", v, Seq(repo.head("main")._2), "keep",
      Map("db/t" -> live.id), Map.empty)
    // orphan: a snapshot never referenced by any commit, with distinct chunks
    val orphan = repo.writeSnapshot("db/x", "{}", (200 to 300).map(entry(_)))
    val orphanRefs = rawSnapshot(repo, orphan.id).manifestRefs.map(_.path)
    val liveRefs = rawSnapshot(repo, live.id).manifestRefs.map(_.path)
    // pass 1: deletes the orphan snapshot object; its manifests survive
    // this pass (liveness collected before deletion — the conservative lag)
    repo.expireSnapshots(olderThanMs = 0L)
    liveRefs.foreach(p => Files.isRegularFile(repo.root.resolve(p)) shouldBe true)
    // pass 2: nothing references the orphan chunks anymore
    repo.expireSnapshots(olderThanMs = 0L)
    orphanRefs.filterNot(liveRefs.contains).foreach(p =>
      Files.isRegularFile(repo.root.resolve(p)) shouldBe false)
    liveRefs.foreach(p => Files.isRegularFile(repo.root.resolve(p)) shouldBe true)
    repo.snapshot(live.id).files should have size 100
  }

  test("verifyLive rewrites a reused manifest swept from under a landing snapshot") {
    val repo = freshRepo()
    val files = (1 to 100).map(entry(_))
    val s = repo.writeSnapshot("db/t", "{}", files)
    val refs = rawSnapshot(repo, s.id).manifestRefs.map(_.path)
    // simulate the racing GC: one chunk vanishes after the writer's
    // existence check but before its snapshot publish
    val victim = refs.head
    Files.delete(repo.root.resolve(victim))
    Manifests.verifyLive(repo.root, repo.io, Seq(victim), files)
    Files.isRegularFile(repo.root.resolve(victim)) shouldBe true
    Manifests.clearCache()
    repo.snapshot(s.id).files shouldBe files
  }

  test("lazy load: size/isEmpty answer from ref counts without reading any chunk") {
    val repo = freshRepo()
    val files = (1 to 100).map(entry(_))
    val s = repo.writeSnapshot("db/t", "{}", files)
    Manifests.clearCache()
    val before = Manifests.chunkReadCount
    val loaded = repo.snapshot(s.id)
    loaded.files.size shouldBe 100
    loaded.files.isEmpty shouldBe false
    Manifests.chunkReadCount shouldBe before // no chunk touched
    loaded.files.head shouldBe entry(1) // first traversal materializes
    Manifests.chunkReadCount should be > before
  }

  test("partition-pruned planning loads only chunks whose summary may match") {
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    import org.apache.spark.sql.sources
    val repo = freshRepo()
    // 3 partitions interleaved; chunks are small (target=4) so most
    // chunks hold 1-2 distinct partition tuples
    val files = (1 to 90).map(i =>
      entry(i, Some(Map("p" -> s"p${i % 3}"))))
    val spec = Seq(PartitionField("p", "identity", "p"))
    val schema = StructType(Seq(StructField("id", IntegerType),
      StructField("p", org.apache.spark.sql.types.StringType)))
    val s = repo.writeSnapshot("db/t", "{}", files,
      partitionBy = Some(spec))
    Manifests.clearCache()
    val loaded = repo.snapshot(s.id)
    val totalChunks = loaded.manifestRefs.size
    val before = Manifests.chunkReadCount
    val pruned = graft.versioned.TableOps.pruneFiles(
      loaded.copy(schemaJson = schema.json), schema,
      Seq(sources.EqualTo("p", "p1")))
    val readChunks = Manifests.chunkReadCount - before
    pruned.map(_.path).toSet shouldBe
      files.filter(_.partValues("p") == "p1").map(_.path).toSet
    // only the chunks whose summary contains p1 were read
    val p1Chunks = loaded.manifestRefs.count(
      _.partitions.forall(_.exists(_.get("p").contains("p1"))))
    readChunks shouldBe p1Chunks
    readChunks.toInt should be < totalChunks
  }

  test("metadata-only commit passes refs through: zero manifest objects written or read") {
    val repo = freshRepo()
    val files = (1 to 100).map(entry(_))
    val s1 = repo.writeSnapshot("db/t", "{}", files)
    Manifests.clearCache()
    val loaded = repo.snapshot(s1.id) // lazy — chunks untouched
    val objsBefore = manifestObjects(repo)
    val readsBefore = Manifests.chunkReadCount
    // rename-style commit: same (lazy, untraversed) file list straight through
    val s2 = repo.writeSnapshot("db/t", "{}", loaded.files,
      physicalNames = Some(Map("newname" -> "id")))
    Manifests.chunkReadCount shouldBe readsBefore // no chunk read
    manifestObjects(repo) shouldBe objsBefore     // no object written
    rawSnapshot(repo, s2.id).manifestRefs shouldBe
      rawSnapshot(repo, s1.id).manifestRefs       // refs shared verbatim
    repo.snapshot(s2.id).files shouldBe files
  }

  test("engine end-to-end under segmentation: DML, time travel, branch, merge") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.gm", classOf[graft.catalog.GraftCatalog].getName)
      .config("spark.sql.catalog.gm.root",
        Files.createTempDirectory("graft-manifest-cat").toString)
      .getOrCreate()
    try {
      spark.sql("CREATE NAMESPACE gm.r")
      spark.sql("CREATE NAMESPACE gm.r.main.db")
      spark.sql("CREATE TABLE gm.r.main.db.t (id INT, v STRING)")
      // 12 separate inserts → ≥12 files > inlineMax=8 → segmented head
      (1 to 12).foreach(i =>
        spark.sql(s"INSERT INTO gm.r.main.db.t VALUES ($i, 'v$i'), (${i + 100}, 'w$i')"))
      val repoRoot = java.nio.file.Paths.get(
        spark.conf.get("spark.sql.catalog.gm.root"), "r")
      val repo = GraftRepo.open(repoRoot)
      val head = repo.headCommit("main")
      val snap = repo.snapshot(head.tables("db/t"))
      snap.manifestRefs should not be empty // segmentation actually engaged
      spark.sql("SELECT count(*) c FROM gm.r.main.db.t")
        .collect()(0).getLong(0) shouldBe 24
      // branch + diverging DML + merge, all over segmented snapshots
      spark.sql("CREATE NAMESPACE gm.r.dev")
      spark.sql("DELETE FROM gm.r.dev.db.t WHERE id = 3")
      spark.sql("SELECT count(*) c FROM gm.r.main.db.t")
        .collect()(0).getLong(0) shouldBe 24
      val preMerge = repo.head("main")._2
      spark.sql("CALL gm.system.merge('r', 'dev', 'main')")
      spark.sql("SELECT count(*) c FROM gm.r.main.db.t")
        .collect()(0).getLong(0) shouldBe 23
      // time travel back across segmented history
      spark.sql(s"SELECT * FROM gm.r.main.db.t VERSION AS OF '$preMerge'")
        .count() shouldBe 24
      // manifests metadata table: one row per chunk, counts match head
      val mrows = spark.sql(
        "SELECT path, n_files, n_rows FROM gm.r.main.db.t.manifests").collect()
      val headSnap = repo.snapshot(repo.headCommit("main").tables("db/t"))
      if (headSnap.manifestRefs.nonEmpty) {
        mrows.length shouldBe headSnap.manifestRefs.size
        mrows.map(_.getInt(1)).sum shouldBe headSnap.files.size
      } else mrows shouldBe empty
    } finally spark.stop()
  }

  test("refs-passthrough commit restores a swept chunk when entries are in " +
    "memory, and fails LOUD (not silently broken) when they are not") {
    val repo = freshRepo()
    val files = (1 to 100).map(entry(_))
    val s1 = repo.writeSnapshot("db/t", "{}", files)
    // case 1: list materialized before the sweep → restorable
    Manifests.clearCache()
    val loadedM = repo.snapshot(s1.id)
    loadedM.files.toVector // materialize
    val victim = loadedM.manifestRefs.head.path
    Files.delete(repo.root.resolve(victim))
    val s2 = repo.writeSnapshot("db/t", "{}", loadedM.files,
      props = Some(Map("k" -> "v"))) // metadata-only passthrough
    Files.isRegularFile(repo.root.resolve(victim)) shouldBe true // restored
    Manifests.clearCache()
    repo.snapshot(s2.id).files shouldBe files
    // case 2: untraversed lazy list + swept chunk → the entries are
    // gone with the chunk; publishing must surface the corruption
    Manifests.clearCache()
    val loadedL = repo.snapshot(s1.id)
    Files.delete(repo.root.resolve(victim))
    an[IllegalStateException] should be thrownBy
      repo.writeSnapshot("db/t", "{}", loadedL.files,
        props = Some(Map("k2" -> "v2")))
  }

  test("segmentation runs entirely through the GraftIO seam: object-store " +
    "backend round trip + GC") {
    // an S3-shaped backend (conditional PUT, prefix list) — any direct
    // java.nio.Files call in the manifest path would miss this store
    val io = new graft.versioned.ObjectStoreGraftIO(
      new graft.versioned.InMemoryObjectStore())
    val root = java.nio.file.Paths.get("/graft-os-manifest")
    val repo = GraftRepo.init(root, io)
    val files = (1 to 100).map(entry(_))
    val s1 = repo.writeSnapshot("db/t", "{}", files)
    Manifests.clearCache()
    repo.snapshot(s1.id).files shouldBe files
    // content-addressed reuse across the same store
    val before = repo.io.list(root.resolve("snapshots").resolve("manifests")).size
    repo.writeSnapshot("db/t2", "{}", files)
    repo.io.list(root.resolve("snapshots").resolve("manifests")).size shouldBe before
    // GC: the orphaned snapshots' chunks die after two passes, the
    // committed table's survive
    val (v, _) = repo.head("main")
    repo.commitAt("main", v, Seq(repo.head("main")._2), "keep",
      Map("db/t" -> s1.id), Map.empty)
    repo.expireSnapshots(olderThanMs = 0L)
    repo.expireSnapshots(olderThanMs = 0L)
    Manifests.clearCache()
    repo.snapshot(repo.headCommit("main").tables("db/t")).files shouldBe files
  }

  test("chunking properties over 200 seeded random edit sequences: " +
    "lossless, order-preserving, edit-local") {
    val saved = Option(System.getProperty("graft.manifest.target"))
    System.setProperty("graft.manifest.target", "8")
    try {
      val rnd = new scala.util.Random(7)
      (1 to 200).foreach { _ =>
        val n = 1 + rnd.nextInt(300)
        val files = (0 until n).map(i => entry(rnd.nextInt(100000)))
          .distinctBy(_.path).toVector
        val chunks = Manifests.chunk(files)
        // lossless + order-preserving
        chunks.flatten shouldBe files
        // hard cap honored
        chunks.foreach(_.size should be <= 32)
        // edit locality: one random removal changes at most 2 chunks
        if (files.size > 1) {
          val victim = files(rnd.nextInt(files.size))
          val after = Manifests.chunk(files.filterNot(_ == victim))
          val beforeSet = chunks.map(c => c.map(_.path)).toSet
          after.count(c => !beforeSet.contains(c.map(_.path))) should be <= 2
        }
        // append locality: appending changes only the tail region
        val appended = Manifests.chunk(files :+ entry(999999))
        val beforeSet = chunks.map(c => c.map(_.path)).toSet
        appended.count(c => !beforeSet.contains(c.map(_.path))) should be <= 2
      }
    } finally saved.fold[AnyRef](System.clearProperty("graft.manifest.target"))(
      System.setProperty("graft.manifest.target", _))
  }

  test("chained writes through materialized snapshots keep chunk identity stable") {
    val repo = freshRepo()
    var files = (1 to 50).map(entry(_))
    var s = repo.writeSnapshot("db/t", "{}", files)
    val objectCounts = Seq.newBuilder[Int]
    // 10 successive appends, each chaining off the LOADED snapshot the
    // way TableOps does (h.files ++ delta)
    (1 to 10).foreach { k =>
      val loaded = repo.snapshot(s.id)
      s = repo.writeSnapshot("db/t", "{}", loaded.files :+ entry(1000 + k))
      objectCounts += manifestObjects(repo).size
    }
    repo.snapshot(s.id).files should have size 60
    // object growth is O(appends), not O(appends × chunks): each append
    // adds at most one rewritten tail chunk
    val counts = objectCounts.result()
    (counts.last - counts.head) should be <= 10
  }

  test("INSERT-shaped append (Manifests.appended) re-serializes only the " +
    "tail: ONE chunk read, O(delta) new objects, boundaries identical " +
    "to a full re-chunk") {
    val repo = freshRepo()
    val files = (1 to 200).map(entry(_))
    val s0 = repo.writeSnapshot("db/t", "{}", files)
    val before = manifestObjects(repo).size
    Manifests.clearCache()
    val loaded = repo.snapshot(s0.id)
    val readsBefore = Manifests.chunkReadCount
    val delta = (1000 to 1004).map(entry(_))
    val s1 = repo.writeSnapshot("db/t", "{}",
      Manifests.appended(loaded.files, delta))
    // only the LAST base chunk is loaded to re-chunk the tail — the
    // commit never touches the other N-1 chunks (the O(delta) claim)
    (Manifests.chunkReadCount - readsBefore) shouldBe 1
    (manifestObjects(repo).size - before) should be <= 3
    // correctness: materializes base ++ delta in order
    repo.snapshot(s1.id).files.toSeq shouldBe (files ++ delta)
    // and reproduces EXACTLY the refs a full re-chunk yields (content-
    // defined cuts run left-to-right and reset at each boundary)
    val slow = repo.writeSnapshot("db/t2", "{}", files ++ delta)
    rawSnapshot(repo, s1.id).manifestRefs shouldBe
      rawSnapshot(repo, slow.id).manifestRefs
  }

  test("reusing a chunk bumps its mtime: an age-guarded GC sweep treats " +
    "it as freshly written") {
    val repo = freshRepo()
    val files = (1 to 100).map(entry(_))
    repo.writeSnapshot("db/t", "{}", files)
    val dir = repo.root.resolve("snapshots").resolve("manifests")
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 2 * 3600 * 1000L)
    repo.io.list(dir).foreach(p =>
      Files.setLastModifiedTime(p, old))
    // identical content → every chunk REUSED → touch fires on each
    repo.writeSnapshot("db/t2", "{}", files)
    val cutoff = System.currentTimeMillis() - 3600 * 1000L
    repo.io.list(dir).foreach { p =>
      Files.getLastModifiedTime(p).toMillis should be > cutoff
    }
  }

  test("a snapshot holding a LazyFileList java-serializes " +
    "(writeReplace degrades to the materialized list)") {
    val repo = freshRepo()
    val files = (1 to 100).map(entry(_))
    val s = repo.writeSnapshot("db/t", "{}", files)
    val loaded = repo.snapshot(s.id)
    loaded.files shouldBe a[Manifests.LazyFileList] // the lazy path is live
    // Spark closures/broadcasts capturing a snapshot use exactly this
    val bo = new java.io.ByteArrayOutputStream()
    val oo = new java.io.ObjectOutputStream(bo)
    oo.writeObject(loaded); oo.close()
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bo.toByteArray))
      .readObject().asInstanceOf[Snapshot]
    back.files.toSeq shouldBe files
    // the deserialized form is a plain collection (no dead io handles)
    (back.files match {
      case _: Manifests.LazyFileList => false
      case _ => true
    }) shouldBe true
  }
}
