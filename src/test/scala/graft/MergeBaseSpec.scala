package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.versioned.GraftRepo

/** Randomized DIFFERENTIAL test of the generation-ordered mergeBase
  * walk (GraftRepo.mergeBase `bounded()`): seeded random commit DAGs —
  * chains, merges, criss-crosses — are built with writeCommit directly,
  * and for random commit pairs the result is compared against an
  * independent driver-side oracle (full ancestry intersection →
  * maximality filter → deterministic min), i.e. the SPECIFICATION the
  * exhaustive fallback implements. The scripted LCA specs pin single
  * shapes; this walks the space the priority-queue termination argument
  * has to hold over (stale propagation racing candidate emission,
  * multiple maximal ancestors, deep asymmetric sides).
  */
class MergeBaseSpec extends AnyFunSuite with Matchers {

  private def oracle(parents: Map[String, Seq[String]], a: String,
      b: String): String = {
    def anc(x: String): Set[String] = {
      val seen = scala.collection.mutable.Set[String]()
      val q = scala.collection.mutable.Queue(x)
      while (q.nonEmpty) {
        val c = q.dequeue()
        if (seen.add(c)) q.enqueueAll(parents(c))
      }
      seen.toSet
    }
    val common = anc(a).intersect(anc(b))
    val maximal = common.filter(c =>
      !common.exists(o => o != c && anc(o).contains(c)))
    maximal.min
  }

  test("mergeBase equals the exhaustive specification on 40 seeded " +
    "random DAGs x 12 pairs each (merges, criss-crosses, asymmetric " +
    "depths)") {
    val rnd = new scala.util.Random(20260816L)
    (1 to 40).foreach { trial =>
      val repo = GraftRepo.init(Files.createTempDirectory(s"graft-mb$trial"))
      val root = repo.headCommit("main").id // repo-init commit, gen 0
      val ids = scala.collection.mutable.ArrayBuffer(root)
      val parentsOf = scala.collection.mutable.Map(root -> Seq.empty[String])
      val n = 10 + rnd.nextInt(25)
      (1 to n).foreach { i =>
        val nParents = if (ids.size >= 2 && rnd.nextInt(3) == 0) 2 else 1
        val ps = rnd.shuffle(ids.toSeq).take(nParents)
        val c = repo.writeCommit(ps, s"c$i",
          Map.empty, Map("db" -> Map("k" -> i.toString)))
        ids += c.id
        parentsOf(c.id) = ps
      }
      (1 to 12).foreach { _ =>
        val a = ids(rnd.nextInt(ids.size))
        val b = ids(rnd.nextInt(ids.size))
        withClue(s"trial=$trial a=$a b=$b: ") {
          repo.mergeBase(a, b) shouldBe oracle(parentsOf.toMap, a, b)
        }
      }
    }
  }

  test("bounded walk and exhaustive fallback agree on the same DAG " +
    "(gen stripped from every commit forces the fallback)") {
    val rnd = new scala.util.Random(7L)
    val dir = Files.createTempDirectory("graft-mb-fb")
    val repo = GraftRepo.init(dir)
    val root = repo.headCommit("main").id
    val ids = scala.collection.mutable.ArrayBuffer(root)
    (1 to 20).foreach { i =>
      val nParents = if (ids.size >= 2 && rnd.nextInt(3) == 0) 2 else 1
      val ps = rnd.shuffle(ids.toSeq).take(nParents)
      ids += repo.writeCommit(ps, s"c$i",
        Map.empty, Map("db" -> Map("k" -> i.toString))).id
    }
    val pairs = (1 to 10).map(_ =>
      (ids(rnd.nextInt(ids.size)), ids(rnd.nextInt(ids.size))))
    val boundedAnswers = pairs.map { case (a, b) => repo.mergeBase(a, b) }
    // strip gen from EVERY commit on disk; a fresh open must fall back
    ids.foreach { id =>
      val f = dir.resolve("commits").resolve(s"$id.json")
      val node = graft.versioned.Json.mapper.readTree(
        new String(Files.readAllBytes(f), "UTF-8"))
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      node.remove("gen")
      Files.write(f, node.toString.getBytes("UTF-8"))
    }
    val legacy = GraftRepo.open(dir)
    legacy.headCommit("main").genOpt shouldBe None
    pairs.zip(boundedAnswers).foreach { case ((a, b), want) =>
      withClue(s"pair ($a, $b): ") {
        legacy.mergeBase(a, b) shouldBe want
      }
    }
  }
}
