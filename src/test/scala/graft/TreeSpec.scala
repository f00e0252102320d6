package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.scalatest.matchers.should.Matchers

import graft.versioned.{GraftRepo, Json, Commit, Trees}

/** Tree-segmented commit table maps (Trees.scala): past the inline
  * threshold a commit's table map is stored as content-defined,
  * content-addressed chunks — commit metadata is O(changed tables) and
  * a single-table resolve reads one chunk (git tree objects; the same
  * contract ManifestSpec proves for snapshot file lists).
  */
class TreeSpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {

  private var saved: Seq[(String, Option[String])] = Nil

  override def beforeAll(): Unit = {
    saved = Seq("graft.tree.inline.max", "graft.tree.target")
      .map(k => k -> Option(System.getProperty(k)))
    System.setProperty("graft.tree.inline.max", "8")
    System.setProperty("graft.tree.target", "4")
  }

  override def afterAll(): Unit =
    saved.foreach { case (k, v) =>
      v.fold[AnyRef](System.clearProperty(k))(System.setProperty(k, _))
    }

  private def freshRepo() =
    GraftRepo.init(Files.createTempDirectory("graft-tree"))

  private def treeObjects(repo: GraftRepo): Seq[String] = {
    val dir = repo.root.resolve("commits").resolve("trees")
    if (!Files.isDirectory(dir)) Nil
    else repo.io.list(dir).map(_.getFileName.toString).sorted
  }

  private def rawCommit(repo: GraftRepo, id: String): Commit =
    Json.read[Commit](repo.io.readString(
      repo.root.resolve("commits").resolve(s"$id.json")))

  private def tables(n: Int): Map[String, String] =
    (1 to n).map(i => f"db/t$i%04d" -> s"s$i").toMap

  test("small table maps stay inline; no tree objects") {
    val repo = freshRepo()
    val c = repo.writeCommit(Nil, "m", tables(8), Map.empty)
    rawCommit(repo, c.id).treeRefs shouldBe empty
    rawCommit(repo, c.id).tables shouldBe tables(8)
    treeObjects(repo) shouldBe empty
  }

  test("segmented round trip: persisted map empty, load re-materializes; " +
    "point lookup reads ONE chunk") {
    val repo = freshRepo()
    val t = tables(300)
    val c = repo.writeCommit(Nil, "m", t, Map.empty)
    val raw = rawCommit(repo, c.id)
    raw.tables shouldBe empty
    raw.treeRefs.map(_.count).sum shouldBe 300
    // returned commit chains like an inline one
    c.tables.toMap shouldBe t
    // lazy load: a single-key get loads exactly one chunk
    Trees.clearCache()
    val loaded = repo.commit(c.id)
    val before = Trees.chunkReadCount
    loaded.tables.get("db/t0150") shouldBe Some("s150")
    (Trees.chunkReadCount - before) shouldBe 1
    loaded.tables.get("zz/absent") shouldBe None // outside every range
    (Trees.chunkReadCount - before) shouldBe 1
    loaded.tables.size shouldBe 300 // from ref counts, still 1 chunk read
    (Trees.chunkReadCount - before) shouldBe 1
    // full iteration materializes and matches
    loaded.tables.toMap shouldBe t
  }

  test("iteratorFrom on a MATERIALIZED map memoizes the sorted view: " +
    "repeated seeks binary-search one cached sort instead of " +
    "re-sorting the whole map per call, and stay strictly-after " +
    "correct on both paths") {
    val repo = freshRepo()
    val t = tables(300)
    val c = repo.writeCommit(Nil, "m", t, Map.empty)
    Trees.clearCache()
    val loaded = repo.commit(c.id)
    val m = loaded.tables.asInstanceOf[Trees.LazyTableMap]
    val sortedKeys = t.keys.toSeq.sorted
    // unmaterialized path first (chunk-seeking), for parity
    m.iteratorFrom(Some("db/t0150")).map(_._1).toSeq shouldBe
      sortedKeys.dropWhile(_ <= "db/t0150")
    // full iteration materializes; seeks now run on the memoized sort
    m.toMap shouldBe t
    val chunkBefore = Trees.chunkReadCount
    // timing-free memoization proof: many seeks on a materialized map
    // touch ZERO chunks (they'd each re-load + re-sort otherwise only
    // in cost, so assert the semantics exhaustively instead)
    (0 until 300 by 7).foreach { i =>
      val k = sortedKeys(i)
      m.iteratorFrom(Some(k)).map(_._1).toSeq shouldBe
        sortedKeys.dropWhile(_ <= k)
    }
    m.iteratorFrom(None).map(_._1).toSeq shouldBe sortedKeys
    m.iteratorFrom(Some("zz")).toSeq shouldBe empty
    m.iteratorFrom(Some("a")).map(_._1).toSeq shouldBe sortedKeys
    (Trees.chunkReadCount - chunkBefore) shouldBe 0
  }

  test("one-table commit shares every untouched chunk (O(changed tables))") {
    val repo = freshRepo()
    val t = tables(300)
    val c1 = repo.writeCommit(Nil, "m1", t, Map.empty)
    val objsBefore = treeObjects(repo).size
    val c2 = repo.writeCommit(Seq(c1.id), "m2",
      t.updated("db/t0150", "sNEW"), Map.empty)
    // the single-table change wrote at most 2 new chunks
    (treeObjects(repo).size - objsBefore) should be <= 2
    val r1 = rawCommit(repo, c1.id).treeRefs.map(_.path).toSet
    val r2 = rawCommit(repo, c2.id).treeRefs.map(_.path).toSet
    (r1 intersect r2).size should be >= (r1.size - 2)
    repo.commit(c2.id).tables.get("db/t0150") shouldBe Some("sNEW")
  }

  test("engine end-to-end: a 300-table repo commits, resolves, branches " +
    "and merges through segmented commits") {
    val repo = freshRepo()
    val (v, head) = repo.head("main")
    repo.commitAt("main", v, Seq(head), "bulk", tables(300), Map.empty)
    // table-level commitRetry (the DML path) over the segmented head
    repo.commitRetry("main", "one more") { base =>
      (base.tables.toMap.updated("db/extra", "sX"), Map.empty)
    }
    val h = repo.headCommit("main")
    h.tables.get("db/extra") shouldBe Some("sX")
    h.tables.get("db/t0001") shouldBe Some("s1")
    h.tables.size shouldBe 301
    // branch + diff over segmented maps
    repo.createBranch("dev", "main")
    repo.diff("main", "dev") shouldBe empty
    repo.commitRetry("dev", "dev change") { base =>
      (base.tables.toMap.updated("db/t0002", "sDEV"), Map.empty)
    }
    repo.diff("main", "dev") shouldBe Map("db/t0002" -> "changed")
    repo.merge("dev", "main")
    repo.headCommit("main").tables.get("db/t0002") shouldBe Some("sDEV")
  }

  test("expire GC: orphaned tree chunks swept with one-pass lag, live kept") {
    val repo = freshRepo()
    val (v, head) = repo.head("main")
    // REAL (empty) snapshots: expire's vacuum resolves every snapshot id
    // reachable commits reference
    val live = (1 to 120).map(i =>
      f"db/t$i%04d" -> repo.writeSnapshot(f"db/t$i%04d", "{}", Nil).id).toMap
    repo.commitAt("main", v, Seq(head), "live", live, Map.empty)
    val liveRefs = rawCommit(repo, repo.head("main")._2).treeRefs.map(_.path)
    // orphan: a commit object never referenced by any ref
    val orphan = repo.writeCommit(Nil, "orphan",
      (1 to 200).map(i => s"ox/t$i" -> s"o$i").toMap, Map.empty)
    val orphanRefs = rawCommit(repo, orphan.id).treeRefs.map(_.path)
    orphanRefs should not be empty
    repo.expireSnapshots(olderThanMs = 0L) // pass 1: commit object dies
    repo.expireSnapshots(olderThanMs = 0L) // pass 2: its chunks die
    orphanRefs.filterNot(liveRefs.contains).foreach(p =>
      Files.isRegularFile(repo.root.resolve(p)) shouldBe false)
    liveRefs.foreach(p =>
      Files.isRegularFile(repo.root.resolve(p)) shouldBe true)
    Trees.clearCache()
    repo.headCommit("main").tables.size shouldBe 120
  }

  test("8-thread concurrent commitRetry over a segmented repo: all land, " +
    "every chunk referenced by the final head exists") {
    val repo = freshRepo()
    val (v, head) = repo.head("main")
    repo.commitAt("main", v, Seq(head), "bulk", tables(300), Map.empty)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futures = (1 to 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String =
            repo.commitRetry("main", s"writer $i") { base =>
              (base.tables.toMap.updated(f"db/t$i%04d", s"sW$i"), Map.empty)
            }.id
        })
      }
      futures.foreach(_.get()) // all 8 eventually land (CAS + rebase)
    } finally pool.shutdown()
    val h = repo.headCommit("main")
    (1 to 8).foreach(i => h.tables.get(f"db/t$i%04d") shouldBe Some(s"sW$i"))
    h.tables.size shouldBe 300
    // every chunk the head references is on disk and loads
    rawCommit(repo, h.id).treeRefs.foreach { r =>
      Files.isRegularFile(repo.root.resolve(r.path)) shouldBe true
    }
    Trees.clearCache()
    repo.commit(h.id).tables.toMap.size shouldBe 300
  }

  test("legacy commit JSON (no trees key) still reads") {
    val repo = freshRepo()
    val legacy = Commit("cLEGACY", Nil, 1L, "m", tables(3), Map.empty)
    repo.io.createExclusive(
      repo.root.resolve("commits").resolve("cLEGACY.json"),
      Json.write(legacy)) shouldBe true
    repo.commit("cLEGACY").tables shouldBe tables(3)
  }

  test("a commit holding a LazyTableMap java-serializes " +
    "(writeReplace degrades to the materialized map)") {
    val repo = freshRepo()
    val t = tables(300)
    val c = repo.writeCommit(Nil, "m", t, Map.empty)
    val loaded = repo.commit(c.id)
    loaded.tables shouldBe a[Trees.LazyTableMap]
    val bo = new java.io.ByteArrayOutputStream()
    val oo = new java.io.ObjectOutputStream(bo)
    oo.writeObject(loaded); oo.close()
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bo.toByteArray))
      .readObject().asInstanceOf[Commit]
    back.tables.toMap shouldBe t
    (back.tables match {
      case _: Trees.LazyTableMap => false
      case _ => true
    }) shouldBe true
  }
}
