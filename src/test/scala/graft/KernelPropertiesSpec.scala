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

  test("sigAgree: bounds, identity, symmetry, naive-equal, estimates " +
    "jaccard within binomial tolerance") {
    val longArr = (xs: Seq[Long]) => new GenericArrayData(xs.toArray[Any])
    cases(200).foreach { case (a, b) =>
      if (a.nonEmpty && b.nonEmpty) {
        val sa = HashKernels.minhashSig(arr(a), 64)
        val sb = HashKernels.minhashSig(arr(b), 64)
        val m = HashKernels.sigAgree(sa, sb)
        m should (be >= 0 and be <= 64)
        HashKernels.sigAgree(sb, sa) shouldBe m
        HashKernels.sigAgree(sa, sa) shouldBe 64
        val naive = (0 until 64).count(i => sa.getLong(i) == sb.getLong(i))
        m shouldBe naive
        // minhash agreement is an unbiased Jaccard estimator: 64 perms
        // put the estimate within ~4 sd of the true value
        val (xa, xb) = (a.toSet, b.toSet)
        val j = if (xa.union(xb).isEmpty) 0.0
          else xa.intersect(xb).size.toDouble / xa.union(xb).size
        math.abs(m / 64.0 - j) should be <= (4 * math.sqrt(j.max(0.01) * (1 - j.min(0.99)) / 64) + 0.02)
      }
    }
    // truncated/mismatched lengths: agreement over the common prefix
    HashKernels.sigAgree(longArr(Seq(1L, 2L, 3L)), longArr(Seq(1L, 9L))) shouldBe 1
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

  test("bucketOfLiteral: width-normalized — equal values bucket identically " +
    "across int/long and float/double (type widening never re-buckets)") {
    import org.apache.spark.sql.types._
    import graft.versioned.Partitioning.bucketOfLiteral
    val rnd = new scala.util.Random(7)
    (1 to 300).foreach { _ =>
      val v = rnd.nextInt()
      val n = 1 + rnd.nextInt(64)
      val b = bucketOfLiteral(v, IntegerType, n)
      b should (be >= 0 and be < n)
      bucketOfLiteral(v.toLong, LongType, n) shouldBe b
      bucketOfLiteral(v.toShort, ShortType, n) shouldBe
        bucketOfLiteral(v.toShort.toLong, LongType, n)
      val f = rnd.nextFloat() * 1000f
      bucketOfLiteral(f, FloatType, n) shouldBe
        bucketOfLiteral(f.toDouble, DoubleType, n)
    }
  }

  test("floorOfLiteral: temporal floors agree across literal shapes and " +
    "sort lexically in time order") {
    import graft.versioned.{PartitionField, Partitioning}
    val day = PartitionField("ts_day", "days", "ts")
    val month = PartitionField("ts_month", "months", "ts")
    val hour = PartitionField("ts_hour", "hours", "ts")
    val t = java.sql.Timestamp.valueOf("2024-03-07 13:45:10")
    Partitioning.floorOfLiteral(t, day) shouldBe Some("2024-03-07")
    Partitioning.floorOfLiteral(t.toInstant, day) shouldBe Some("2024-03-07")
    Partitioning.floorOfLiteral("2024-03-07 13:45:10", day) shouldBe Some("2024-03-07")
    Partitioning.floorOfLiteral(t, month) shouldBe Some("2024-03")
    Partitioning.floorOfLiteral(t, hour) shouldBe Some("2024-03-07-13")
    // lexical order == time order for the fixed-width formats
    val rnd = new scala.util.Random(11)
    val times = (1 to 100).map(_ => java.sql.Timestamp.valueOf(
      f"20${10 + rnd.nextInt(20)}%d-${1 + rnd.nextInt(12)}%02d-" +
        f"${1 + rnd.nextInt(28)}%02d ${rnd.nextInt(24)}%02d:00:00"))
    val floors = times.map(x => (x.getTime, Partitioning.floorOfLiteral(x, hour).get))
    floors.sortBy(_._1).map(_._2) shouldBe floors.sortBy(_._2).map(_._2)
  }

  test("truncate floors: numeric floor handles negatives; string prefix") {
    import graft.versioned.{PartitionField, Partitioning}
    val t10 = PartitionField("id_trunc", "truncate", "id", 10)
    Partitioning.floorOfLiteral(23, t10) shouldBe Some("20")
    Partitioning.floorOfLiteral(-3, t10) shouldBe Some("-10")
    Partitioning.floorOfLiteral(-10, t10) shouldBe Some("-10")
    val s2 = PartitionField("c_trunc", "truncate", "c", 2)
    Partitioning.floorOfLiteral("abcdef", s2) shouldBe Some("ab")
    Partitioning.floorOfLiteral("a", s2) shouldBe Some("a")
  }

  test("write-time HLL sketch: accuracy bands across cardinalities, " +
    "duplicate-insensitive, deterministic") {
    import graft.versioned.FooterStats
    val rnd = new scala.util.Random(42)
    for (n <- Seq(5, 50, 1000, 50000, 500000)) {
      val vals = Array.fill(n)(rnd.nextLong()) // stand-in for xxhash64 output
      val h = new FooterStats.Hll
      vals.foreach(h.add)
      // re-adding half the values must not move the estimate (set semantics)
      val before = h.estimate
      vals.take(n / 2).foreach(h.add)
      h.estimate shouldBe before
      val err = math.abs(h.estimate.toDouble - n) / n
      // 2^12 registers: ~1.6% standard error; allow 3 sigma + small-range
      // linear-counting exactness at tiny n
      val band = if (n <= 1000) 0.02 else 0.05
      withClue(s"n=$n est=${h.estimate}: ") { err should be <= band }
    }
    // determinism: same inputs, same estimate
    val h1 = new FooterStats.Hll
    val h2 = new FooterStats.Hll
    val vs = Array.fill(10000)(rnd.nextLong())
    vs.foreach(h1.add)
    vs.foreach(h2.add)
    h1.estimate shouldBe h2.estimate
  }
}
