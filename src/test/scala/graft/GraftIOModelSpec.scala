package graft

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.versioned.{GraftIO, InMemoryGraftIO, InMemoryObjectStore, LocalGraftIO, ObjectStoreGraftIO}

/** Differential model test: LocalGraftIO (the shipped backend) and
  * InMemoryGraftIO and ObjectStoreGraftIO (the S3-shaped backends) must be
  * observationally equivalent under random operation sequences — same
  * return values, same exception classes, same observable tree after
  * every step. This is what makes the seam's contract real: an engine
  * developer can code against either backend and a new backend can be
  * validated by dropping it into this harness. Seeded random ops —
  * deterministic across runs, same style as KernelPropertiesSpec.
  */
class GraftIOModelSpec extends AnyFunSuite with Matchers {

  /** Run one op against a backend, normalizing result/exception so the
    * two sides compare: paths are rebased to the backend's root.
    */
  private def step(io: GraftIO, root: Path, op: Op): String = {
    def rel(p: Path): String = root.relativize(p).toString
    try {
      op match {
        case Create(p, c) => s"create=${io.createExclusive(root.resolve(p), c)}"
        case Overwrite(p, c) =>
          io.overwrite(root.resolve(p), c.getBytes("UTF-8")); "overwrite=ok"
        case Read(p) => s"read=${io.readString(root.resolve(p))}"
        case ListOp(p) =>
          s"list=${io.list(root.resolve(p)).map(rel).sorted.mkString(",")}"
        case WalkOp(p) =>
          s"walk=${io.walk(root.resolve(p)).map(rel).sorted.mkString(",")}"
        case IsDir(p) => s"isdir=${io.isDirectory(root.resolve(p))}"
        case IsFile(p) => s"isfile=${io.isFile(root.resolve(p))}"
        case SizeOp(p) => s"size=${io.size(root.resolve(p))}"
        case Mkdirs(p) => io.mkdirs(root.resolve(p)); "mkdirs=ok"
        case Delete(p) => s"del=${io.deleteIfExists(root.resolve(p))}"
        case Move(p, to) =>
          io.move(root.resolve(p), root.resolve(to)); "move=ok"
      }
    } catch {
      // compare failure MODE, not message (messages embed absolute paths)
      case e: Throwable => s"throw=${e.getClass.getSimpleName}"
    }
  }

  private sealed trait Op
  private case class Create(p: String, c: String) extends Op
  private case class Overwrite(p: String, c: String) extends Op
  private case class Read(p: String) extends Op
  private case class ListOp(p: String) extends Op
  private case class WalkOp(p: String) extends Op
  private case class IsDir(p: String) extends Op
  private case class IsFile(p: String) extends Op
  private case class SizeOp(p: String) extends Op
  private case class Mkdirs(p: String) extends Op
  private case class Delete(p: String) extends Op
  private case class Move(p: String, to: String) extends Op

  test("LocalGraftIO and InMemoryGraftIO are observationally equivalent " +
    "under 400 seeded-random operation sequences") {
    val rnd = new scala.util.Random(7)
    val dirPool = Seq("refs", "refs/main", "commits", "snapshots", "data/t")
    val filePool = Seq("refs/main/v1", "refs/main/v2", "commits/c1.json",
      "snapshots/s1.json", "data/t/f1.parquet", "hint.txt")

    (1 to 400).foreach { caseId =>
      val localRoot = Files.createTempDirectory(s"giom-$caseId")
      val memRoot = java.nio.file.Paths.get(s"/graftio-model/$caseId")
      val local: GraftIO = new LocalGraftIO
      val mem: GraftIO = new InMemoryGraftIO
      val ossRoot = java.nio.file.Paths.get(s"/graftio-oss/$caseId")
      val oss: GraftIO = new ObjectStoreGraftIO(new InMemoryObjectStore())

      def randDir() = dirPool(rnd.nextInt(dirPool.length))
      def randFile() = filePool(rnd.nextInt(filePool.length))
      val ops = (1 to 25).map { _ =>
        rnd.nextInt(11) match {
          case 0 => Mkdirs(randDir())
          case 1 => // engine policy: parents exist before a publish
            val f = randFile(); Create(f, s"c${rnd.nextInt(3)}")
          case 2 => Overwrite(randFile(), s"o${rnd.nextInt(3)}")
          case 3 => Read(randFile())
          case 4 => ListOp(randDir())
          case 5 => WalkOp(if (rnd.nextBoolean()) randDir() else randFile())
          case 6 => IsDir(if (rnd.nextBoolean()) randDir() else randFile())
          case 7 => IsFile(randFile())
          case 8 => SizeOp(randFile())
          case 9 => Delete(if (rnd.nextInt(4) == 0) randDir() else randFile())
          case _ => Move(randFile(), randFile())
        }
      }
      // parents first, both sides, like every engine write path
      dirPool.foreach { d =>
        local.mkdirs(localRoot.resolve(d)); mem.mkdirs(memRoot.resolve(d))
        oss.mkdirs(ossRoot.resolve(d))
      }
      ops.zipWithIndex.foreach { case (op, i) =>
        // engine write policy: a publish's parent is mkdirs'd first
        // (object stores need no parent for a PUT; the local FS does —
        // the seam's contract is writes-under-prepared-prefixes)
        def prep(p: String): Unit = Option(java.nio.file.Paths.get(p).getParent)
          .map(_.toString).foreach { d =>
            local.mkdirs(localRoot.resolve(d)); mem.mkdirs(memRoot.resolve(d))
            oss.mkdirs(ossRoot.resolve(d))
          }
        op match {
          case Create(p, _) => prep(p)
          case Overwrite(p, _) => prep(p)
          case Move(_, to) => prep(to)
          case _ => ()
        }
        val a = step(local, localRoot, op)
        val b = step(mem, memRoot, op)
        val c = step(oss, ossRoot, op)
        withClue(s"case $caseId op#$i $op: local=$a mem=$b\n") { b shouldBe a }
        withClue(s"case $caseId op#$i $op: local=$a oss=$c\n") { c shouldBe a }
      }
      // final observable tree agrees (paths + per-file contents)
      def tree(io: GraftIO, root: Path): Seq[String] =
        io.walk(root).flatMap { p =>
          val r = root.relativize(p).toString
          if (r.isEmpty) None
          else if (io.isFile(p)) Some(s"$r=${io.readString(p)}")
          else Some(s"$r/")
        }.sorted
      withClue(s"case $caseId final tree\n") {
        tree(mem, memRoot) shouldBe tree(local, localRoot)
        tree(oss, ossRoot) shouldBe tree(local, localRoot)
      }
      local.walk(localRoot).sorted(Ordering[Path].reverse)
        .foreach(p => local.deleteIfExists(p))
    }
  }
}
