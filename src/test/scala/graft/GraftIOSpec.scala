package graft

import java.nio.file.Paths
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

import graft.versioned.{CommitConflictException, GraftRepo, InMemoryGraftIO}

/** The storage seam (GraftIO) is complete and pluggable: the ENTIRE
  * version-graph lifecycle — init, snapshot/commit objects, branch CAS,
  * tags, merge, cherry-pick, rollback/revert, racing committers — runs
  * against a non-filesystem backend. Any engine code that bypassed the
  * seam with a direct java.nio.Files call would throw here, because the
  * repo root never exists on disk. The in-memory backend's key-value
  * shape (putIfAbsent publish, prefix-derived directories) is the same
  * contract an S3-style backend must supply (GraftIO scaladoc).
  */
class GraftIOSpec extends AnyFunSuite with Matchers {

  private val schemaJson =
    StructType(Seq(StructField("id", IntegerType))).json

  test("whole metadata lifecycle runs on the in-memory backend; " +
    "the repo root never exists on disk") {
    val io = new InMemoryGraftIO
    val root = Paths.get("/graft-mem-spec/repo")
    val repo = GraftRepo.init(root, io)
    java.nio.file.Files.exists(root) shouldBe false

    // table pointer commits
    val s1 = repo.writeSnapshot("db/t", schemaJson, Nil)
    repo.commitRetry("main", "add t") { base =>
      (base.tables + ("db/t" -> s1.id), base.namespaces)
    }
    repo.headCommit("main").tables.keySet shouldBe Set("db/t")

    // zero-copy branch + divergence + 3-way merge (t untouched on main,
    // u added on dev -> dev side wins for u)
    repo.createBranch("dev", "main")
    val s2 = repo.writeSnapshot("db/u", schemaJson, Nil)
    repo.commitRetry("dev", "add u") { base =>
      (base.tables + ("db/u" -> s2.id), base.namespaces)
    }
    val s3 = repo.writeSnapshot("db/v", schemaJson, Nil)
    repo.commitRetry("main", "add v") { base =>
      (base.tables + ("db/v" -> s3.id), base.namespaces)
    }
    repo.merge("dev", "main")
    repo.headCommit("main").tables.keySet shouldBe Set("db/t", "db/u", "db/v")

    // tag is set-if-absent
    repo.createTag("v1", "main")
    repo.resolve("v1").id shouldBe repo.headCommit("main").id
    intercept[CommitConflictException](
      repo.createTag("v1", "main")).getMessage should include("exists")

    // cherry-pick one commit's delta (new table on dev2) onto main
    repo.createBranch("dev2", "main")
    val s4 = repo.writeSnapshot("db/w", schemaJson, Nil)
    repo.commitRetry("dev2", "add w") { base =>
      (base.tables + ("db/w" -> s4.id), base.namespaces)
    }
    val pick = repo.headCommit("dev2").id
    repo.cherryPick("main", pick)
    repo.headCommit("main").tables.keySet should contain("db/w")

    // rollback to the tag; revert back forward-preserving history
    repo.rollback("main", "v1")
    repo.headCommit("main").tables.keySet shouldBe Set("db/t", "db/u", "db/v")
    java.nio.file.Files.exists(root) shouldBe false
  }

  test("set-if-absent publish is atomic under racing committers " +
    "(the object-store commit primitive)") {
    val io = new InMemoryGraftIO
    val root = Paths.get("/graft-mem-race/repo")
    val repo = GraftRepo.init(root, io)

    // raw primitive: N racers, exactly one winner
    val path = root.resolve("refs/main/v-race")
    val latch = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(8)
    val wins = (0 until 8).map { i =>
      pool.submit(new java.util.concurrent.Callable[Boolean] {
        def call(): Boolean = { latch.await(); io.createExclusive(path, s"c$i") }
      })
    }
    latch.countDown()
    wins.count(_.get(5, TimeUnit.SECONDS)) shouldBe 1
    pool.shutdown()

    // full protocol: 8 concurrent commitRetry writers all land (each
    // loses some CAS races and rebases; none is lost, none overwrites)
    val pool2 = Executors.newFixedThreadPool(8)
    val done = (0 until 8).map { i =>
      pool2.submit(new Runnable {
        def run(): Unit = {
          val s = repo.writeSnapshot(s"db/t$i", schemaJson, Nil)
          repo.commitRetry("main", s"add t$i") { base =>
            (base.tables + (s"db/t$i" -> s.id), base.namespaces)
          }
        }
      })
    }
    done.foreach(_.get(30, TimeUnit.SECONDS))
    pool2.shutdown()
    repo.headCommit("main").tables.keySet shouldBe
      (0 until 8).map(i => s"db/t$i").toSet
  }
}
