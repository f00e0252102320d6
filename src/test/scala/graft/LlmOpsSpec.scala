package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.scalatest.matchers.should.Matchers

/** Semantics gates for the rows-only LLM ops (SURVEY.md §2.3): LSH ANN
  * recall vs the exact baseline, and dedup-family internal consistency.
  */
class LlmOpsSpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.01"

  private lazy val spark = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("sim_ann_lsh: bucketed candidates are a subset of brute-force ranks " +
    "with usable recall") {
    val brute = SparkEntry.queries("sim_ann_brute")(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("sim_ann_lsh")(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = lsh.intersect(brute).size.toDouble / brute.size
    // 6-bit single-table LSH on 64-dim synthetic data: recall is bounded
    // but must be far better than random (random ≈ k/N ≈ 0.05)
    recall should be >= 0.25
    // and LSH must actually prune: it returns fewer pairs than brute
    lsh.size should be <= brute.size
  }

  test("dd_simhash: hamming bound respected and pairs deduplicated") {
    val out = SparkEntry.queries("dd_simhash")(spark, sfDir).collect()
    all(out.map(_.getAs[Long]("hamming"))) should be <= 6L
    val pairs = out.map(r => (r.getLong(0), r.getLong(1)))
    pairs.distinct.length shouldBe pairs.length
    all(pairs.map { case (a, b) => a < b }) shouldBe true
  }

  test("dd_minhash_lsh: verified pairs all have jaccard >= 0.9 and include " +
    "the consecutive-id near-dups found by the exact pass") {
    val out = SparkEntry.queries("dd_minhash_lsh")(spark, sfDir).collect()
    all(out.map(_.getAs[Double]("jaccard"))) should be >= 0.9
    // exact n-gram jaccard on consecutive ids: every >=0.95 pair there must
    // be recalled by the LSH pipeline (8x8 bands catch J>=0.9 w.h.p.)
    val exact = SparkEntry.queries("dd_ngram_jaccard")(spark, sfDir).collect()
      .filter(_.getAs[Double]("jaccard") >= 0.95)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    exact.diff(found) shouldBe empty
  }

  test("q24_approx_distinct: HLL estimates within 5% of exact counts") {
    val approx = SparkEntry.queries("q24_approx_distinct")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions.countDistinct("l_partkey").as("p"),
        org.apache.spark.sql.functions.countDistinct("l_orderkey").as("o"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    exact.foreach { case (flag, (p, o)) =>
      approx(flag)._1.toDouble shouldBe p.toDouble +- p * 0.05
      approx(flag)._2.toDouble shouldBe o.toDouble +- o * 0.05
    }
  }

  test("dd_cluster: components cover the corpus; every near-dup edge is " +
    "within one cluster; cluster ids are member minima") {
    val out = SparkEntry.queries("dd_cluster")(spark, sfDir).collect()
    out.map(_.getAs[Long]("cluster_size")).sum shouldBe
      Tables.documents(spark, sfDir).count()
    // recompute labels per doc to validate edge containment
    val pairs = SparkEntry.queries("dd_minhash_lsh")(spark, sfDir)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    // naive union-find on the driver as the oracle (sf0.01 corpus is small)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val docIds = Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0))
    val expected = docIds.groupBy(id => find(id)).map { case (root, members) =>
      members.min -> members.length.toLong
    }
    val got = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe expected
  }

  test("dd_exact: groups partition the corpus (sum of copies = row count)") {
    val out = SparkEntry.queries("dd_exact")(spark, sfDir).collect()
    out.map(_.getAs[Long]("n_copies")).sum shouldBe
      Tables.documents(spark, sfDir).count()
  }
}
