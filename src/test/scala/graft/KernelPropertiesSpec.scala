package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.functions.HashKernels

/** Property-style gates for the native kernels (pure JVM, no Spark
  * session): algebraic invariants checked over 200 seeded random word
  * sets — deterministic across runs.
  */
class KernelPropertiesSpec extends AnyFunSuite with Matchers {

  private def arr(ws: Seq[String]): GenericArrayData =
    new GenericArrayData(ws.map(w => UTF8String.fromString(w)).toArray[Any])

  private def cases(n: Int): Seq[(Seq[String], Seq[String])] = {
    val rnd = new scala.util.Random(42)
    (1 to n).map { _ =>
      def set() = (0 until rnd.nextInt(40))
        .map(_ => s"w${rnd.nextInt(60)}").distinct
      (set(), set())
    }
  }

  test("setJaccard: bounds, identity, symmetry, disjoint-zero, naive-equal") {
    cases(200).foreach { case (a, b) =>
      val j = HashKernels.setJaccard(arr(a), arr(b))
      j should (be >= 0.0 and be <= 1.0)
      HashKernels.setJaccard(arr(b), arr(a)) shouldBe j
      if (a.nonEmpty) HashKernels.setJaccard(arr(a), arr(a)) shouldBe 1.0
      val (sa, sb) = (a.toSet, b.toSet)
      val expected =
        if (sa.union(sb).isEmpty) 0.0
        else sa.intersect(sb).size.toDouble / sa.union(sb).size
      j shouldBe expected
    }
  }

  test("simhash64: deterministic, permutation-invariant, 1-word stability") {
    cases(200).map(_._1).filter(_.size >= 8).foreach { ws =>
      val fp = HashKernels.simhash64(arr(ws))
      HashKernels.simhash64(arr(ws)) shouldBe fp
      HashKernels.simhash64(arr(ws.reverse)) shouldBe fp // commutative votes
      val fp2 = HashKernels.simhash64(arr(ws.tail))
      java.lang.Long.bitCount(fp ^ fp2) should be <= 48
    }
  }

  test("minhashSig: k minima, deterministic, element-monotone") {
    cases(200).map(_._1).filter(_.nonEmpty).foreach { ws =>
      val sig = HashKernels.minhashSig(arr(ws), 16)
      sig.numElements() shouldBe 16
      val again = HashKernels.minhashSig(arr(ws), 16)
      (0 until 16).foreach(i => again.getLong(i) shouldBe sig.getLong(i))
      // adding an element can only lower (or keep) each per-perm minimum
      val sup = HashKernels.minhashSig(arr(ws :+ "zzz-extra"), 16)
      (0 until 16).foreach(i => sup.getLong(i) should be <= sig.getLong(i))
    }
  }

  test("minhash signature agreement estimates Jaccard (statistical)") {
    val a = (1 to 60).map(i => s"w$i")
    val b = (21 to 80).map(i => s"w$i") // true J = 40/80 = 0.5
    val k = 256
    val sa = HashKernels.minhashSig(arr(a), k)
    val sb = HashKernels.minhashSig(arr(b), k)
    val agree = (0 until k).count(i => sa.getLong(i) == sb.getLong(i))
    (agree.toDouble / k) shouldBe 0.5 +- 0.12 // ±~4σ for k=256
  }
}
