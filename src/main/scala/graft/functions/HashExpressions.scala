package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native hash kernels for the dedup family. Each replaces a
  * higher-order-function formulation whose per-element interpreted lambda
  * dominated the scan at scale; these run one tight JVM loop per row,
  * invoked from generated code (the static-helper codegen pattern keeps
  * the WholeStageCodegen span intact).
  *
  * Hash values are bit-compatible with the SQL formulations they replace:
  * Spark's own XxHash64Function with the SQL-default seed 42, chained for
  * multi-argument hashes exactly as the `xxhash64(...)` expression chains.
  */
object HashKernels {
  final val Seed = 42L

  private def hashWord(w: org.apache.spark.unsafe.types.UTF8String): Long =
    XxHash64Function.hash(w, StringType, Seed)

  /** SimHash64: per-bit ±1 votes from xxhash64 of each word, fingerprint
    * bit b set when votes are positive. Matches the HOF formulation
    * (xxhash64(w) seed 42, bit = shiftright(h,b)&1).
    */
  def simhash64(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = hashWord(arr.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 bytes of md5(utf8(w)) as a big-endian signed long — an
    * ENGINE-PORTABLE 64-bit word hash: any engine with md5() reproduces
    * it from hex ((hi32 as signed) * 2^32 + lo32, i.e. the first 16 hex
    * chars read as a signed 64-bit value).
    */
  def md5Word64(w: org.apache.spark.unsafe.types.UTF8String): Long = {
    val md = md5Digest.get()
    md.reset()
    val d = md.digest(w.getBytes)
    ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
  }

  /** [[simhash64]] with the PORTABLE md5 word hash instead of xxhash64 —
    * the variant the oracle-checked dd_simhash query fingerprints with
    * (a DuckDB expression reproduces it bit-for-bit; xxhash64 has no
    * cross-engine SQL form).
    */
  def simhash64Md5(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = md5Word64(arr.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  /** MinHash signature: k per-permutation minima of
    * xxhash64(w, i) = hashInt(i, seed = xxhash64(w)) — the same chaining
    * the SQL `xxhash64(w, i)` performs, but the per-word base hash is
    * computed once instead of once per permutation.
    */
  def minhashSig(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val hw = hashWord(arr.getUTF8String(i))
        var p = 0
        while (p < k) {
          // boxed Int p is JVM-Integer-cache-hit for k<=128; hash() chains
          // identically to the SQL xxhash64(w, i) two-arg form
          val h = XxHash64Function.hash(p, org.apache.spark.sql.types.IntegerType, hw)
          if (h < mins(p)) mins(p) = h
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** BPE encode of ONE word under a rank-ordered merge table
    * (`array<array<string>>` of [a, b] pairs): symbols start as UTF-16
    * code-unit characters (the same units the trainer's
    * `split(word, '')` produces), and each merge applies left-to-right
    * non-overlapping in rank order — the standard BPE inference loop.
    * O(len · merges) per word in one tight JVM loop with in-place
    * compaction (write never passes read), invoked from generated code.
    */
  def bpeEncode(w: org.apache.spark.unsafe.types.UTF8String,
      merges: ArrayData): ArrayData = {
    val word = w.toString
    val syms = new Array[String](word.length)
    var i = 0
    while (i < word.length) {
      syms(i) = String.valueOf(word.charAt(i)); i += 1
    }
    var len = word.length
    val m = merges.numElements()
    var r = 0
    while (r < m && len > 1) {
      val pair = merges.getArray(r)
      val a = pair.getUTF8String(0).toString
      val b = pair.getUTF8String(1).toString
      val ab = a + b
      var read = 0
      var write = 0
      while (read < len) {
        if (read + 1 < len && syms(read) == a && syms(read + 1) == b) {
          syms(write) = ab; read += 2
        } else {
          syms(write) = syms(read); read += 1
        }
        write += 1
      }
      len = write
      r += 1
    }
    val out = new Array[Any](len)
    i = 0
    while (i < len) {
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(syms(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Random-hyperplane sign bucket of a double vector: bit j = sign of the
    * projection onto a ±1 hyperplane whose entries derive from
    * xxhash64(i, planeOffset+j) — chained exactly like the SQL two-arg
    * xxhash64, so buckets are bit-compatible with the HOF formulation.
    */
  def hyperplaneBucket(v: ArrayData, nbits: Int, planeOffset: Int): Long = {
    val dim = v.numElements()
    var bucket = 0L
    var j = 0
    while (j < nbits) {
      val plane = planeOffset + j
      var acc = 0.0
      var i = 0
      while (i < dim) {
        val hi = XxHash64Function.hash(i, org.apache.spark.sql.types.IntegerType, Seed)
        val h = XxHash64Function.hash(plane, org.apache.spark.sql.types.IntegerType, hi)
        acc += v.getDouble(i) * (if ((h & 1L) == 1L) 1.0 else -1.0)
        i += 1
      }
      if (acc > 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  /** ±1 hyperplane entries for the PORTABLE md5 plane scheme: entry
    * (plane, i) = +1 iff the top bit of md5("plane:i") is set — in any
    * engine with md5(), `substr(md5(concat(plane,':',i)),1,1) >= '8'`.
    * Planes are global constants, so the per-plane sign row is computed
    * once per JVM and cached (the hot loop reads a primitive array).
    */
  private val md5PlaneCache =
    new java.util.concurrent.ConcurrentHashMap[java.lang.Long, Array[Double]]()

  def md5PlaneSigns(plane: Int, dim: Int): Array[Double] =
    md5PlaneCache.computeIfAbsent((plane.toLong << 32) | dim.toLong,
      _ => Array.tabulate(dim) { i =>
        val h = md5Word64(org.apache.spark.unsafe.types.UTF8String
          .fromString(s"$plane:$i"))
        if (h < 0) 1.0 else -1.0 // top md5 bit = sign bit of the long
      })

  /** [[hyperplaneBucket]] with md5-derived ±1 planes — the variant the
    * oracle-checked sim_ann_lsh buckets with: DuckDB rebuilds the same
    * planes from md5() and replays the projection with order-preserving
    * list arithmetic, reproducing every bucket bit-for-bit (the same
    * portability move [[simhash64Md5]] made for dd_simhash).
    */
  def hyperplaneBucketMd5(v: ArrayData, nbits: Int, planeOffset: Int): Long = {
    val dim = v.numElements()
    var bucket = 0L
    var j = 0
    while (j < nbits) {
      val signs = md5PlaneSigns(planeOffset + j, dim)
      var acc = 0.0
      var i = 0
      while (i < dim) {
        acc += v.getDouble(i) * signs(i)
        i += 1
      }
      if (acc > 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  /** Count of aligned equal positions of two long arrays (minhash
    * signature agreement — matches/k estimates Jaccard unbiasedly). One
    * linear pass, no allocation: the sketch-verify prefilter that keeps
    * the expensive exact-Jaccard kernel off the overwhelming majority of
    * LSH candidate pairs.
    */
  def sigAgree(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var m = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) m += 1
      i += 1
    }
    m
  }

  /** |A∩B| / |A∪B| for distinct-element string arrays (nulls skipped). */
  def setJaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val set = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](na * 2)
    var i = 0
    var sa = 0
    while (i < na) {
      if (!a.isNullAt(i)) { if (set.add(a.getUTF8String(i))) sa += 1 }
      i += 1
    }
    var inter = 0
    var sb = 0
    i = 0
    while (i < nb) {
      if (!b.isNullAt(i)) {
        sb += 1
        if (set.contains(b.getUTF8String(i))) inter += 1
      }
      i += 1
    }
    val union = sa + sb - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
}

/** Exact Jaccard of two DISTINCT-element string arrays: one hash-set pass,
  * no intermediate array allocation (vs array_intersect + array_union).
  */
case class SetJaccard(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "graft_set_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.setJaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashKernels.setJaccard($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Aligned-position agreement count of two long-array minhash signatures
  * (codegen'd). Signatures are built with `containsNull = false`, so
  * elements read via the primitive `getLong` path.
  */
case class SigAgree(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_sig_agree"
  // declared input types make Spark CAST int-array inputs to long arrays;
  // without them, getLong over an int-packed UnsafeArrayData reads
  // misaligned slots and returns garbage under codegen
  // (covariant override: AbstractDataType itself is private[sql])
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType, containsNull = false),
      ArrayType(LongType, containsNull = false))

  override def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.sigAgree(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashKernels.sigAgree($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sign-LSH bucket of a double-array column (codegen'd). */
case class HyperplaneBucket(child: Expression, nbits: Int, planeOffset: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hyperplane_bucket"

  override def nullSafeEval(input: Any): Any =
    HashKernels.hyperplaneBucket(input.asInstanceOf[ArrayData], nbits, planeOffset)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.hyperplaneBucket($c, $nbits, $planeOffset)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sign-LSH bucket over PORTABLE md5-derived planes (codegen'd) — see
  * [[HashKernels.hyperplaneBucketMd5]].
  */
case class HyperplaneBucketMd5(child: Expression, nbits: Int, planeOffset: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hyperplane_bucket_md5"

  override def nullSafeEval(input: Any): Any =
    HashKernels.hyperplaneBucketMd5(input.asInstanceOf[ArrayData], nbits, planeOffset)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.hyperplaneBucketMd5($c, $nbits, $planeOffset)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash of an array-of-string column (codegen'd). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(input: Any): Any =
    HashKernels.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash over the PORTABLE md5 word hash (codegen'd) — see
  * [[HashKernels.simhash64Md5]].
  */
case class SimHash64Md5(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64_md5"

  override def nullSafeEval(input: Any): Any =
    HashKernels.simhash64Md5(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.simhash64Md5($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** BPE-encode a word under a rank-ordered merge table (codegen'd): the
  * inference half of `graft.operators.TextAnalysis.bpeTrain`'s model.
  * `right` is the model as `array<array<string>>` of `[a, b]` pairs in
  * rank order — K rows, a foldable literal in practice.
  */
case class BpeEncode(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  override def nullSafeEval(w: Any, m: Any): Any =
    HashKernels.bpeEncode(
      w.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      m.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (w, m) => s"graft.functions.HashKernels.bpeEncode($w, $m)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** k-permutation MinHash signature of an array-of-string column. */
case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(input: Any): Any =
    HashKernels.minhashSig(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.minhashSig($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashExpressions {
  def simHash64Native(wsCol: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(wsCol)))
  def simHash64Md5Native(wsCol: Column): Column =
    Bridge.column(SimHash64Md5(Bridge.expression(wsCol)))
  def minHashSignatureNative(setCol: Column, k: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(setCol), k))
  def setJaccardNative(a: Column, b: Column): Column =
    Bridge.column(SetJaccard(Bridge.expression(a), Bridge.expression(b)))
  def sigAgreeNative(a: Column, b: Column): Column =
    Bridge.column(SigAgree(Bridge.expression(a), Bridge.expression(b)))
  def hyperplaneBucketNative(v: Column, nbits: Int, planeOffset: Int): Column =
    Bridge.column(HyperplaneBucket(Bridge.expression(v), nbits, planeOffset))
  def hyperplaneBucketMd5Native(v: Column, nbits: Int, planeOffset: Int): Column =
    Bridge.column(HyperplaneBucketMd5(Bridge.expression(v), nbits, planeOffset))
  def bpeEncodeNative(word: Column, merges: Column): Column =
    Bridge.column(BpeEncode(Bridge.expression(word), Bridge.expression(merges)))
}
