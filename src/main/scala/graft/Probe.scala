package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: one-off stage-time probes for perf work (currently aimed at
  * the dd_minhash_lsh gate; rewritten per investigation). */
object Probe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.TextVec._

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // warm (mirror Bench)
    spark.read.parquet(s"$d/documents.parquet").count()
    spark.range(1000000).selectExpr("id % 7 AS k", "id").groupBy("k").count().collect()

    val par = spark.sparkContext.defaultParallelism
    val docs = t("docs checkpoint (ws+sz+sig)") {
      Tables.documents(spark, d)
        .select(col("doc_id"), wordSet(col("text")).as("ws"))
        .repartition(par, col("doc_id"))
        .withColumn("sz", size(col("ws")))
        .withColumn("sig",
          graft.functions.HashExpressions.minHashSignatureNative(col("ws"), k = 64))
        .localCheckpoint()
    }
    val coinPass = (conv(substring(md5(concat_ws("|",
      col("id_a"), col("id_b"))), 1, 8), 16, 10)
      .cast("bigint").cast("double") / 4294967296.0) < 0.25

    val ppRaw = Dedup.ppCandidates(spark, docs, 0.9, 1024)
    val lshRaw = Dedup.lshCandidates(spark, docs)
    t("pp raw count")(println("  pp_raw=" + ppRaw.count()))
    t("pp raw QUARTER count")(println("  pp_q=" + ppRaw.filter(coinPass).count()))
    t("lsh raw count")(println("  lsh_raw=" + lshRaw.count()))
    t("lsh raw QUARTER count")(println("  lsh_q=" + lshRaw.filter(coinPass).count()))

    val tagged = ppRaw.withColumn("src", lit(0))
      .unionByName(lshRaw.withColumn("src", lit(1)))
      .filter(coinPass)
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(col("src") === 0).as("in_pp"), max(col("src") === 1).as("in_lsh"))
    t("union+filter+groupBy")(println("  pairs=" + tagged.count()))
    t("verify quarter + agg") {
      Dedup.verifyPairs(spark, docs, tagged, 0.9)
        .agg(count(when(col("in_pp"), lit(1))).as("n_true_pairs"),
          count(when(col("in_lsh"), lit(1))).as("n_lsh_true"))
        .collect().foreach(r => println("  " + r))
    }
    spark.stop()
  }
}
