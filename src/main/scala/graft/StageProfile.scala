package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-side stage profiler for the heavy bench rows (BASELINE.md's
  * stage-decomposition notes). Times cumulative prefixes of a query's
  * plan — each prefix `count()`ed on a fresh action — so "stage cost" =
  * prefix(i) − prefix(i−1) under the same warm JVM. Not part of the
  * shipped surface; `sbt "runMain graft.StageProfile"` on
  * SPARK_GRAFT_SF_DIR (default sf0.1).
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.{Tables => T}
    // warm: parquet footers, codegen, shuffle machinery
    T.documents(spark, sfDir).count()
    spark.range(1000000).selectExpr("id % 7 AS k", "id")
      .groupBy("k").count().collect()

    val L = graft.operators.Dedup.DupSpanL
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    val toks = T.documents(spark, sfDir)
      .select(col("doc_id"), split(trim(lower(col("text"))), " ").as("toks"))
      .filter(size(col("toks")) >= L)
    val grams = toks.select(col("doc_id"),
      posexplode(transform(
        sequence(lit(0), size(col("toks")) - L),
        i => unhex(md5(concat_ws(" ", slice(col("toks"), i + lit(1), lit(L)))))))
        .as(Seq("pos", "g")))
    val dup = grams.groupBy(col("g")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2).select(col("g"))
    val hits = grams.join(dup, "g").select(col("doc_id"), col("pos"))
    time("p1 tokenize+posexplode")(grams.count())
    time("p2 + gram count-agg")(dup.count())
    time("p3 + dup-mark equi-join")(hits.count())
    time("p4 full dd_dupspans")(
      graft.SparkEntry.queries("dd_dupspans")(spark, sfDir).count())
    // the scale-path key: 8-byte LongType xxhash64 vs BINARY(16) md5
    spark.conf.set("spark.graft.dupspans.hash", "xxhash64")
    try time("p5 full (xxhash64 key)")(
      graft.SparkEntry.queries("dd_dupspans")(spark, sfDir).count())
    finally spark.conf.unset("spark.graft.dupspans.hash")

    // ---- dd_incr_persist lifecycle decomposition (the top bench row):
    // init (build + persist the posting index for the corpus slice),
    // admit (screen batch 1 + atomic multi-table append), screen
    // (batch 2 vs corpus ∪ admissions) — same slices as the gate
    locally {
      import org.apache.spark.sql.functions._
      val cat = "gsp" + java.util.UUID.randomUUID().toString
        .replace("-", "").take(10)
      val root = operators.GateScratch.register(java.nio.file.Files.createTempDirectory(s"graft-$cat"))
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.catalog.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.root", root.toString)
      spark.sql(s"CREATE NAMESPACE $cat.r")
      spark.sql(s"CREATE NAMESPACE $cat.r.main.dd")
      val repo = graft.versioned.GraftRepo.open(root.resolve("r"))
      val docs = T.documents(spark, sfDir)
        .select(col("doc_id"), col("text"))
      time("i1 indexInit (corpus)") {
        graft.operators.Dedup.indexInit(spark, cat, repo, "main",
          docs.filter((col("doc_id") % 100).between(10, 19)), 0.9); 0L
      }
      time("i2 indexAdmit (batch 1)") {
        graft.operators.Dedup.indexAdmit(spark, cat, repo, "main",
          docs.filter(col("doc_id") % 100 === 5), 0.9); 0L
      }
      time("i3 indexScreen (batch 2)")(
        graft.operators.Dedup.indexScreen(spark, cat, "r", "main",
          docs.filter(col("doc_id") % 100 === 0), 0.9).count())
    }
    spark.stop()
  }
}
