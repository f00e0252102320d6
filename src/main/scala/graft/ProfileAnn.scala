package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-side decomposition of the ANN gate costs (the three heaviest
  * rows of the r18 baseline bench: sim_ann_dist, st_ann_persist,
  * sim_ann_filtered are each dominated by a per-JVM index-template
  * build). Times init / append / probe / recall separately under the
  * same warm JVM the bench uses. Not part of the shipped surface.
  * `sbt "runMain graft.ProfileAnn"` on SPARK_GRAFT_SF_DIR (default
  * sf0.1).
  */
object ProfileAnn {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.{Tables => T}
    T.embeddings(spark, sfDir).count()
    spark.range(1000000).selectExpr("id % 7 AS k", "id")
      .groupBy("k").count().collect()

    val jobCount = new java.util.concurrent.atomic.AtomicLong()
    val jobNanos = new java.util.concurrent.atomic.AtomicLong()
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobStarts.put(e.jobId, System.nanoTime())
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          jobCount.incrementAndGet()
          Option(jobStarts.remove(e.jobId)).foreach(t0 =>
            jobNanos.addAndGet(System.nanoTime() - t0))
        }
      })

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val j0 = jobCount.get()
      val jn0 = jobNanos.get()
      val r = f
      Thread.sleep(150) // let the listener bus drain
      val dt = (System.nanoTime() - t0) / 1e9 - 0.15
      val jobs = jobCount.get() - j0
      val jsec = (jobNanos.get() - jn0) / 1e9
      println(f"[profile] $name%-32s $dt%8.3f s  jobs=$jobs%3d " +
        f"jobSec=$jsec%7.3f driverSec=${dt - jsec}%7.3f")
      r
    }

    def freshCat(clampK: Option[Int]): (String, graft.versioned.GraftRepo, SparkSession) = {
      val cat = "gprof" + java.util.UUID.randomUUID().toString
        .replace("-", "").take(10)
      val root = operators.GateScratch.register(
        java.nio.file.Files.createTempDirectory(s"graft-$cat"))
      val sb = clampK.fold(spark)(k =>
        org.apache.spark.sql.graftbridge.SessionCloneBridge.withConf(spark,
          Map("spark.graft.kmeans.maxModelK" -> k.toString)))
      sb.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.catalog.GraftCatalog].getName)
      sb.conf.set(s"spark.sql.catalog.$cat.root", root.toString)
      sb.sql(s"CREATE NAMESPACE $cat.r")
      sb.sql(s"CREATE NAMESPACE $cat.r.main.ann")
      (cat, graft.versioned.GraftRepo.open(root.resolve("r")), sb)
    }

    val emb = T.embeddings(spark, sfDir)
      .select(col("vec_id"),
        graft.functions.TextVec.toDoubleVec(col("embedding")).as("nv"))
    println(s"[profile] corpus rows = ${emb.count()}")

    // ---- std mode (driver-sized model) ----
    locally {
      val (cat, repo, sb) = freshCat(None)
      val e = T.embeddings(sb, sfDir)
        .select(col("vec_id"),
          graft.functions.TextVec.toDoubleVec(col("embedding")).as("nv"))
      time("std init (2/3 corpus)") {
        operators.Similarity.annIndexInit(sb, cat, repo, "main",
          e.filter(col("vec_id") % 3 =!= 0))
      }
      time("std append (1/3 corpus)") {
        operators.Similarity.annIndexAppend(sb, cat, repo, "main",
          e.filter(col("vec_id") % 3 === 0))
      }
      val qs = T.embeddings(spark, sfDir)
        .filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("query_id"),
          graft.functions.TextVec.toDoubleVec(col("embedding")).as("qv"))
        .withColumn("qn", graft.functions.TextVec.l2norm(col("qv")))
      time("std probe") {
        operators.Similarity.annIndexProbe(spark, cat, "r", "main", qs).count()
      }
      time("std probe (2nd)") {
        operators.Similarity.annIndexProbe(spark, cat, "r", "main", qs).count()
      }
    }

    // ---- dist mode (maxModelK=8 forces the router path) ----
    locally {
      val (cat, repo, sb) = freshCat(Some(8))
      val e = T.embeddings(sb, sfDir)
        .select(col("vec_id"),
          graft.functions.TextVec.toDoubleVec(col("embedding")).as("nv"))
      time("dist init (2/3 corpus)") {
        operators.Similarity.annIndexInit(sb, cat, repo, "main",
          e.filter(col("vec_id") % 3 =!= 0))
      }
      time("dist append (1/3 corpus)") {
        operators.Similarity.annIndexAppend(sb, cat, repo, "main",
          e.filter(col("vec_id") % 3 === 0))
      }
      val qs = T.embeddings(sb, sfDir)
        .filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("query_id"),
          graft.functions.TextVec.toDoubleVec(col("embedding")).as("qv"))
        .withColumn("qn", graft.functions.TextVec.l2norm(col("qv")))
      time("dist probe") {
        operators.Similarity.annIndexProbe(sb, cat, "r", "main", qs).count()
      }
    }

    // ---- the brute memo every recall gate shares ----
    time("bruteForceImpl (collect)") {
      operators.Similarity.bruteForceImpl(spark, sfDir).collect().length
    }
    spark.stop()
  }
}
