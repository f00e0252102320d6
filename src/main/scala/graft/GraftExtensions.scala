package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{BpeEncode, DotProduct, MinHashSignature, SetJaccard, SigAgree, SimHash64, SimHash64Md5}

/** Session extensions exposing graft's native Catalyst kernels to SQL:
  * {{{
  *   spark.sql.extensions = graft.GraftExtensions
  *
  *   SELECT graft_dot(a.v, b.v)            -- codegen'd double[] dot product
  *   SELECT graft_simhash64(words)         -- 64-bit SimHash fingerprint
  *   SELECT graft_minhash_sig(words, 64)   -- k-perm MinHash signature
  *   SELECT graft_set_jaccard(ws_a, ws_b)  -- exact set Jaccard
  *   SELECT graft_sig_agree(sig_a, sig_b)  -- minhash agreement count
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, clazz: Class[_]) =
    new ExpressionInfo(clazz.getCanonicalName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    // SQL over versioned views: SELECT … FROM g.repo.branch.db.view
    // resolves the stored, branch-rebound definition (Spark 4.1 has no
    // analyzer wiring for DSv2 ViewCatalog — this supplies it)
    ext.injectResolutionRule(session =>
      new graft.catalog.GraftViewResolution(session))

    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", classOf[DotProduct]),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))

    ext.injectFunction((FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", classOf[SimHash64]),
      (args: Seq[Expression]) => SimHash64(args(0))))

    // engine-portable variant (md5 word hash — any engine with md5()
    // reproduces it; what the oracle-checked dd_simhash fingerprints with)
    ext.injectFunction((FunctionIdentifier("graft_simhash64_md5"),
      info("graft_simhash64_md5", classOf[SimHash64Md5]),
      (args: Seq[Expression]) => SimHash64Md5(args(0))))

    ext.injectFunction((FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig", classOf[MinHashSignature]),
      (args: Seq[Expression]) => args(1) match {
        case Literal(k: Int, IntegerType) => MinHashSignature(args(0), k)
        case other => throw new IllegalArgumentException(
          s"graft_minhash_sig(arr, k): k must be an integer literal, got $other")
      }))

    ext.injectFunction((FunctionIdentifier("graft_set_jaccard"),
      info("graft_set_jaccard", classOf[SetJaccard]),
      (args: Seq[Expression]) => SetJaccard(args(0), args(1))))

    ext.injectFunction((FunctionIdentifier("graft_sig_agree"),
      info("graft_sig_agree", classOf[SigAgree]),
      (args: Seq[Expression]) => SigAgree(args(0), args(1))))

    ext.injectFunction((FunctionIdentifier("graft_bpe_encode"),
      info("graft_bpe_encode", classOf[BpeEncode]),
      (args: Seq[Expression]) => BpeEncode(args(0), args(1))))
  }
}
