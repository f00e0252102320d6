package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text / vector kernels, all built from codegen'd Spark SQL
  * higher-order functions — row-local, no UDFs, no shuffles. At 100 TB these
  * run inside WholeStageCodegen over the scan, so throughput is bounded by
  * parquet decode, not the kernels.
  *
  * Functions suffixed `Expr` take the NAME of an existing column (they build
  * SQL higher-order-function strings, which only re-parse reliably against
  * named columns); the rest take `Column`s directly.
  */
object TextVec {

  /** Whitespace-normalized, lowercased text (canonical form for dedup). */
  def normText(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Word array (keeps duplicates — carries term frequency). */
  def words(text: Column): Column = split(lower(text), " ")

  /** Distinct word set. */
  def wordSet(text: Column): Column = array_distinct(words(text))

  /** Word n-gram shingles (distinct) over word-array column `wsCol`. */
  def shinglesExpr(wsCol: String, n: Int): Column =
    if (n == 1) array_distinct(col(wsCol))
    else {
      val parts = (0 until n).map(i => s"$wsCol[i + $i]").mkString(", ")
      expr(s"array_distinct(transform(sequence(0, greatest(size($wsCol), $n) - $n), i -> " +
        s"concat_ws(' ', $parts)))")
    }

  /** MinHash signature: k 64-bit min-hashes of set-column `setCol`.
    * Row-local: k × |set| xxhash64 evaluations, no shuffle — the classic
    * permutation family is replaced by seeding xxhash64 with the permutation
    * index (hash(elem, i)), the standard one-hash-per-perm construction.
    */
  def minHashSignatureExpr(setCol: String, k: Int): Column =
    expr(s"transform(sequence(0, ${k - 1}), i -> array_min(transform($setCol, w -> xxhash64(w, i))))")

  /** LSH band hashes over minhash-signature column `sigCol`: `bands` hashes
    * of `rowsPerBand` consecutive entries. Candidates share (band idx, hash).
    */
  def lshBandsExpr(sigCol: String, bands: Int, rowsPerBand: Int): Column = {
    val slices = (0 until bands).map { b =>
      val elems = (0 until rowsPerBand).map(r => s"$sigCol[${b * rowsPerBand + r}]").mkString(", ")
      s"xxhash64($b, $elems)"
    }
    expr(s"array(${slices.mkString(", ")})")
  }

  /** Exact Jaccard similarity of two array columns (as double). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b)).cast("double")

  /** 64-bit SimHash of word-array column `wsCol` (dup words weight votes).
    * The per-bit vote array appears exactly ONCE in the expression tree
    * (the bit-fold zips it against the bit indexes) — an earlier version
    * indexed a votes subexpression 64 times inside the fold, which
    * recomputed the whole |words|×64 vote aggregate per bit: measured 615s
    * -> ~1s at sf0.1 from this restructuring alone.
    */
  def simHash64Expr(wsCol: String): Column = {
    val votes =
      s"""aggregate($wsCol, array_repeat(0, 64), (acc, w) -> zip_with(acc,
         |  transform(sequence(0, 63), i ->
         |    CASE WHEN (shiftright(xxhash64(w), i) & 1) = 1 THEN 1 ELSE -1 END),
         |  (x, y) -> x + y))""".stripMargin
    expr(
      s"""aggregate(zip_with($votes, sequence(0, 63),
         |  (v, i) -> IF(v > 0, shiftleft(1L, i), 0L)), 0L, (acc, x) -> acc + x)""".stripMargin)
  }

  /** Hamming distance between two 64-bit fingerprint columns. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("long")

  /** Cast a float-array embedding to double (exact widening — keeps Spark
    * and the DuckDB oracle bit-identical).
    */
  def toDoubleVec(v: Column): Column =
    transform(v, x => x.cast("double"))

  /** Dot product of two double-array columns — native codegen'd Catalyst
    * expression (VectorExpressions.DotProduct). Left-to-right accumulation,
    * matching DuckDB's list_sum order for oracle parity.
    */
  def dot(a: Column, b: Column): Column = VectorExpressions.dotNative(a, b)

  /** L2 norm. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two double-array columns. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Random-hyperplane LSH bucket for double-vector column `vCol`: `nbits`
    * sign bits of projections onto pseudo-random ±1 hyperplanes derived from
    * xxhash64(dim, plane). `planeOffset` selects a disjoint plane family per
    * LSH table (multi-table LSH). Deterministic, row-local.
    */
  def hyperplaneBucketExpr(vCol: String, nbits: Int, dim: Int,
      planeOffset: Int = 0): Column = {
    val bits = (0 until nbits).map { j =>
      val plane = planeOffset + j
      s"""CASE WHEN aggregate(sequence(0, ${dim - 1}), cast(0 as double), (acc, i) ->
         |  acc + $vCol[i] * (CASE WHEN (xxhash64(i, $plane) & 1) = 1 THEN 1.0d ELSE -1.0d END)) > 0
         |THEN ${1L << j}L ELSE 0L END""".stripMargin
    }
    expr(bits.mkString("(", " + ", ")"))
  }
}
