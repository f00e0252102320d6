package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: one-off intermediate cardinality probes for perf work. */
object Probe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.TextVec._

    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"), wordSet(col("text")).as("ws"))
      .withColumn("sig", minHashSignatureExpr("ws", k = 64))
    val bands = docs
      .select(col("doc_id"), col("lang"),
        posexplode(lshBandsExpr("sig", bands = 8, rowsPerBand = 8)))
      .toDF("doc_id", "lang", "band", "bh").cache()
    val bucketSizes = bands.groupBy("lang", "band", "bh").count()
    println("minhash: n_buckets=" + bucketSizes.count())
    println("minhash candidate pairs = " +
      bucketSizes.agg(sum(expr("count * (count - 1) / 2"))).head().get(0))

    val fps = Tables.documents(spark, d)
      .select(col("doc_id"), words(col("text")).as("ws"))
      .withColumn("fp", simHash64Expr("ws"))
      .select(col("doc_id"), col("fp")).cache()
    println("simhash distinct fp = " + fps.select("fp").distinct().count() + " of " + fps.count())
    val chunks = fps.select(col("doc_id"), col("fp"),
      posexplode(expr("transform(sequence(0, 3), c -> shiftright(fp, c * 16) & 65535)")))
      .toDF("doc_id", "fp", "chunk", "cv")
    val cb = chunks.groupBy("chunk", "cv").count()
    println("simhash candidate pairs = " +
      cb.agg(sum(expr("count * (count - 1) / 2"))).head().get(0))

    val e = Tables.embeddings(spark, d).groupBy("label").count()
    println("embeddings per label:"); e.orderBy("label").show(100, false)

    // native kernels must be bit-compatible with the HOF formulations
    val cmp = Tables.documents(spark, d).limit(200)
      .select(col("doc_id"), words(col("text")).as("ws"))
      .withColumn("fp_hof", simHash64Expr("ws"))
      .withColumn("fp_nat", graft.functions.HashExpressions.simHash64Native(col("ws")))
      .withColumn("sig_hof", minHashSignatureExpr("ws", 8))
      .withColumn("sig_nat",
        graft.functions.HashExpressions.minHashSignatureNative(col("ws"), 8))
    println("simhash native==hof mismatches: " +
      cmp.filter(col("fp_hof") =!= col("fp_nat")).count())
    println("minhash native==hof mismatches: " +
      cmp.filter(col("sig_hof") =!= col("sig_nat")).count())

    // stage timing for dd_minhash_lsh
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $tag: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val docs2 = Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"), wordSet(col("text")).as("ws"))
      .withColumn("sig",
        graft.functions.HashExpressions.minHashSignatureNative(col("ws"), 64))
      .cache()
    t("docs.cache")(docs2.count())
    val bands2 = docs2
      .select(col("doc_id"), col("lang"),
        posexplode(lshBandsExpr("sig", bands = 8, rowsPerBand = 8)))
      .toDF("doc_id", "lang", "band", "bh")
    val cand2 = bands2.as("a")
      .join(bands2.as("b"),
        col("a.lang") === col("b.lang") && col("a.band") === col("b.band") &&
          col("a.bh") === col("b.bh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    t("cand.distinct.count")(println(cand2.count()))
    val w2 = docs2.select(col("doc_id"), col("ws"))
    val ver = cand2
      .join(broadcast(w2.select(col("doc_id").as("id_a"), col("ws").as("ws_a"))), "id_a")
      .join(broadcast(w2.select(col("doc_id").as("id_b"), col("ws").as("ws_b"))), "id_b")
      .select(col("id_a"), col("id_b"),
        round(graft.functions.HashExpressions.setJaccardNative(
          col("ws_a"), col("ws_b")), 6).as("jaccard"))
      .filter(col("jaccard") >= 0.9)
    t("verify.count")(println(ver.count()))
    spark.stop()
  }
}
