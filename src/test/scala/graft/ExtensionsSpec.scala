package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.scalatest.matchers.should.Matchers

/** The native kernels are reachable from plain SQL via
  * spark.sql.extensions=graft.GraftExtensions.
  */
class ExtensionsSpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {

  private lazy val spark = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  test("graft_dot from SQL equals the arithmetic result") {
    spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head().getDouble(0) shouldBe 32.0
  }

  test("graft_simhash64 and graft_minhash_sig match the HOF formulations") {
    val r = spark.sql(
      """SELECT graft_simhash64(ws) AS nat_fp,
        |       aggregate(zip_with(
        |         aggregate(ws, array_repeat(0, 64), (acc, w) -> zip_with(acc,
        |           transform(sequence(0, 63), i ->
        |             CASE WHEN (shiftright(xxhash64(w), i) & 1) = 1 THEN 1 ELSE -1 END),
        |           (x, y) -> x + y)),
        |         sequence(0, 63), (v, i) -> IF(v > 0, shiftleft(1L, i), 0L)),
        |         0L, (acc, x) -> acc + x) AS hof_fp,
        |       graft_minhash_sig(ws, 4) AS nat_sig,
        |       transform(sequence(0, 3), i ->
        |         array_min(transform(ws, w -> xxhash64(w, i)))) AS hof_sig
        |FROM (SELECT array('the', 'quick', 'brown', 'fox') AS ws)""".stripMargin)
      .head()
    r.getLong(0) shouldBe r.getLong(1)
    r.getSeq[Long](2) shouldBe r.getSeq[Long](3)
  }

  test("graft_simhash64_md5 matches the portable md5 HOF formulation") {
    // word hash = first 16 md5 hex chars as a signed big-endian 64-bit
    // value: (hi32 as signed) * 2^32 + lo32 — the same arithmetic the
    // DuckDB oracle computes
    val h64 = """(CAST(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT)
                |  - IF(CAST(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT)
                |       >= 2147483648L, 4294967296L, 0L)) * 4294967296L
                |  + CAST(conv(substring(md5(w), 9, 8), 16, 10) AS BIGINT)""".stripMargin
    val r = spark.sql(
      s"""SELECT graft_simhash64_md5(ws) AS nat_fp,
         |       aggregate(zip_with(
         |         aggregate(ws, array_repeat(0, 64), (acc, w) -> zip_with(acc,
         |           transform(sequence(0, 63), i ->
         |             CASE WHEN (shiftright($h64, i) & 1) = 1 THEN 1 ELSE -1 END),
         |           (x, y) -> x + y)),
         |         sequence(0, 63), (v, i) -> IF(v > 0, shiftleft(1L, i), 0L)),
         |         0L, (acc, x) -> acc + x) AS hof_fp
         |FROM (SELECT array('the', 'quick', 'brown', 'fox', 'fox') AS ws)""".stripMargin)
      .head()
    r.getLong(0) shouldBe r.getLong(1)
  }

  test("graft_set_jaccard from SQL") {
    spark.sql(
      "SELECT graft_set_jaccard(array('a','b','c'), array('b','c','d')) AS j")
      .head().getDouble(0) shouldBe 0.5
  }

  test("graft_sig_agree from SQL: agreement of identical sigs is k") {
    val r = spark.sql(
      """SELECT
        |  graft_sig_agree(graft_minhash_sig(array('a','b'), 16),
        |                  graft_minhash_sig(array('a','b'), 16)) AS same,
        |  graft_sig_agree(array(1, 2, 3), array(1, 9, 3)) AS partial
        |""".stripMargin).head()
    r.getInt(0) shouldBe 16
    r.getInt(1) shouldBe 2
  }

  test("graft_bpe_encode from SQL: rank-ordered left-to-right " +
    "non-overlapping merges, later ranks see earlier ranks' tokens") {
    val r = spark.sql(
      """SELECT
        |  graft_bpe_encode('abab', array(array('a','b'))) AS m1,
        |  graft_bpe_encode('aaa',  array(array('a','a'))) AS overlap,
        |  graft_bpe_encode('abc',  array(array('a','b'), array('ab','c'))) AS chain,
        |  graft_bpe_encode('xy',   array()) AS none
        |""".stripMargin).head()
    r.getSeq[String](0) shouldBe Seq("ab", "ab")
    r.getSeq[String](1) shouldBe Seq("aa", "a") // non-overlapping
    r.getSeq[String](2) shouldBe Seq("abc")     // rank 1 merges rank 0's token
    r.getSeq[String](3) shouldBe Seq("x", "y")
  }
}
