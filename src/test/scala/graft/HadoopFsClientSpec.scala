package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.versioned.{GraftRepo, HadoopFsObjectStoreClient, ObjectStoreGraftIO}

/** [[HadoopFsObjectStoreClient]] — the production Hadoop-FileSystem
  * binding of the object-store client — honors the ObjectStoreClient
  * contract the in-memory S3 emulation defines: exclusive conditional
  * PUT, marker-key directory semantics, recursive listing with
  * trailing-slash pseudo-keys for (possibly empty) directories, and
  * non-recursive deletes. Run on the RAW local FS; s3a://-rooted
  * production use swaps only the FileSystem instance.
  */
class HadoopFsClientSpec extends AnyFunSuite with Matchers {

  private def freshIO(): (ObjectStoreGraftIO, String) = {
    val root = Files.createTempDirectory("hfs-os").toString
    (new ObjectStoreGraftIO(HadoopFsObjectStoreClient.local()), root)
  }

  test("conditional PUT is exclusive; overwrite put replaces; get round-trips") {
    val (io, root) = freshIO()
    io.createExclusive(Paths.get(root, "refs/main/v1"), "commit-a") shouldBe true
    io.createExclusive(Paths.get(root, "refs/main/v1"), "commit-b") shouldBe false
    io.readString(Paths.get(root, "refs/main/v1")) shouldBe "commit-a"
    io.overwrite(Paths.get(root, "refs/main/v1"), "commit-c".getBytes("UTF-8"))
    io.readString(Paths.get(root, "refs/main/v1")) shouldBe "commit-c"
  }

  test("directory semantics: mkdirs/list/walk/isDirectory see files AND " +
    "empty directories; deleteIfExists refuses non-empty directories") {
    val (io, root) = freshIO()
    io.mkdirs(Paths.get(root, "d/empty"))
    io.createExclusive(Paths.get(root, "d/sub/a.txt"), "1") shouldBe true
    io.createExclusive(Paths.get(root, "d/sub/b.txt"), "2") shouldBe true
    io.list(Paths.get(root, "d")).map(_.getFileName.toString).sorted shouldBe
      Seq("empty", "sub")
    io.isDirectory(Paths.get(root, "d/empty")) shouldBe true
    io.isDirectory(Paths.get(root, "d/sub")) shouldBe true
    io.isFile(Paths.get(root, "d/sub/a.txt")) shouldBe true
    io.walk(Paths.get(root, "d")).map(_.toString) should contain allOf (
      s"$root/d/sub/a.txt", s"$root/d/sub/b.txt", s"$root/d/empty")
    intercept[java.nio.file.DirectoryNotEmptyException](
      io.deleteIfExists(Paths.get(root, "d/sub")))
    io.delete(Paths.get(root, "d/sub/a.txt"))
    io.delete(Paths.get(root, "d/sub/b.txt"))
    io.deleteIfExists(Paths.get(root, "d/sub")) shouldBe true
    io.isDirectory(Paths.get(root, "d/sub")) shouldBe false
  }

  test("move is exclusive toward existing targets and deletes the source") {
    val (io, root) = freshIO()
    io.createExclusive(Paths.get(root, "a"), "payload") shouldBe true
    io.move(Paths.get(root, "a"), Paths.get(root, "b"))
    io.readString(Paths.get(root, "b")) shouldBe "payload"
    io.isFile(Paths.get(root, "a")) shouldBe false
    io.createExclusive(Paths.get(root, "c"), "other") shouldBe true
    intercept[java.nio.file.FileAlreadyExistsException](
      io.move(Paths.get(root, "c"), Paths.get(root, "b")))
    io.readString(Paths.get(root, "c")) shouldBe "other"
  }

  test("racing committers on one key: exactly one createExclusive wins " +
    "(the conditional-PUT commit primitive over a Hadoop FS)") {
    val (io, root) = freshIO()
    val path = Paths.get(root, "refs/main/head")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val latch = new java.util.concurrent.CountDownLatch(1)
    val wins = (0 until 8).map { i =>
      pool.submit(new java.util.concurrent.Callable[Boolean] {
        def call(): Boolean = { latch.await(); io.createExclusive(path, s"c$i") }
      })
    }
    latch.countDown()
    val results = wins.map(_.get())
    pool.shutdown()
    results.count(identity) shouldBe 1
    io.readString(path) should fullyMatch regex "c[0-7]"
  }

  test("whole GraftRepo metadata lifecycle runs over the Hadoop binding") {
    val (io, _) = freshIO()
    val root = Files.createTempDirectory("hfs-repo")
    val repo = GraftRepo.init(root, io)
    val schemaJson = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.IntegerType))).json
    val snap = repo.writeSnapshot("db/t", schemaJson, Nil, None, None, None, None)
    repo.commitRetry("main", "create db/t")(base =>
      (base.tables + ("db/t" -> snap.id), base.namespaces))
    repo.createBranch("dev", "main")
    val snap2 = repo.writeSnapshot("db/u", schemaJson, Nil, None, None, None, None)
    repo.commitRetry("dev", "create db/u")(base =>
      (base.tables + ("db/u" -> snap2.id), base.namespaces))
    repo.merge("dev", "main")
    repo.headCommit("main").tables.keySet shouldBe Set("db/t", "db/u")
  }
}
