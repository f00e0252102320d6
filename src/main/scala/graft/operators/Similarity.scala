package graft.operators

import graft.{Q, Tables => T}
import graft.functions.TextVec._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor pack over the `embeddings` table
  * (SURVEY.md §2.3).
  *
  * Query set = every 50th vector (deterministic, sf-proportional).
  *
  * Scale posture: brute force broadcasts the (small) query set against the
  * full corpus — one pass, no shuffle of the corpus, the standard exact-top-k
  * baseline. The LSH variant buckets the corpus by random-hyperplane
  * signature so each query only scans its bucket: corpus shuffle is by
  * bucket id, candidate work drops from |Q|×|N| to Σ|bucket_q|.
  */
object Similarity {

  private val K = 10
  private val Dim = 64

  private def queriesSet(s: SparkSession, d: String): DataFrame =
    T.embeddings(s, d)
      .filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), toDoubleVec(col("embedding")).as("qv"))
      .withColumn("qn", l2norm(col("qv")))

  /** Exact brute-force cosine top-k per query (oracle-checked). Norms are
    * precomputed per side so the |Q|×|N| loop does ONE codegen'd dot per
    * pair (same fold order as the oracle -> identical doubles).
    *
    * The query set is broadcast ONLY while it is provably small
    * (size-guarded by an up-front count of the skinny id column): a small
    * query batch against a huge corpus is one broadcast-NL pass with no
    * corpus shuffle — the standard exact baseline. Past the guard the
    * work is inherently |Q|×|N| and falls back to a block-partitioned
    * cartesian (every corpus-partition × query-partition pair lands on
    * some executor; no single node ever holds the query set).
    */
  private[graft] def bruteForceImpl(s: SparkSession, d: String,
      maxBroadcastQueries: Long = 500000): DataFrame = {
    val corpus = T.embeddings(s, d)
      .select(col("vec_id").as("neighbor_id"), toDoubleVec(col("embedding")).as("nv"))
      .withColumn("nn", l2norm(col("nv")))
    val qs = queriesSet(s, d)
    val nQueries = qs.select(col("query_id")).count()
    val qSide = if (nQueries <= maxBroadcastQueries) broadcast(qs) else qs
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    corpus
      .join(qSide, col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .orderBy(col("query_id"), col("rank"))
  }

  private def bruteForce(s: SparkSession, d: String): DataFrame =
    bruteForceImpl(s, d)

  /** Multi-table LSH ANN: L independent 6-bit random-hyperplane tables;
    * a corpus vector is a candidate for a query if they share a bucket in
    * ANY table (recall 1-(1-p^b)^L vs p^b for one table — the standard
    * multi-table construction; single-table recall measured ~0.04 on this
    * data, multi-table >=0.25, spec-gated in LlmOpsSpec). Each side
    * explodes to L (table, bucket) keys; candidate work is Σ|bucket| per
    * table and the corpus never joins itself. Rows-only gate.
    */
  private def lsh(s: SparkSession, d: String): DataFrame = {
    val L = 8
    val NBits = 6
    def tables(vCol: String): Column = array(
      (0 until L).map(t => graft.functions.HashExpressions
        .hyperplaneBucketNative(col(vCol), nbits = NBits, planeOffset = t * NBits)): _*)
    val corpus = T.embeddings(s, d)
      .select(col("vec_id").as("neighbor_id"), toDoubleVec(col("embedding")).as("nv"))
      .withColumn("nn", l2norm(col("nv")))
      .select(col("neighbor_id"), col("nv"), col("nn"),
        posexplode(tables("nv")))
      .toDF("neighbor_id", "nv", "nn", "tbl", "bucket")
    val qs = queriesSet(s, d)
      .select(col("query_id"), col("qv"), col("qn"), posexplode(tables("qv")))
      .toDF("query_id", "qv", "qn", "tbl", "bucket")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    // plain equi-join on (table, bucket): AQE broadcasts the exploded
    // query side only while it is genuinely small; at corpus-sized query
    // batches this is a keyed shuffle co-partitioned on the bucket id —
    // never an unbounded broadcast
    corpus
      .join(qs, Seq("tbl", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6).as("cos_sim"))
      .groupBy(col("query_id"), col("neighbor_id")) // dedupe multi-table hits
      .agg(first(col("cos_sim")).as("cos_sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF (inverted-file) ANN: a spherical k-means coarse quantizer
    * partitions the corpus into k cells; each query probes only its
    * `nprobe` nearest cells. The 100 TB scale path next to LSH:
    *
    *  - TRAIN: k = O(√N) centroids, deterministic init (every N/k-th
    *    unit vector), 2 Lloyd rounds. Assignment is a |N|×k codegen'd
    *    dot-product pass; the new means are a (cell, dim) aggregation.
    *    Only the k×dim centroid MODEL is ever collected/broadcast —
    *    bounded like any model parameter, never the corpus.
    *  - INDEX: every corpus vector belongs to exactly ONE cell (so probe
    *    results need no dedup, unlike multi-table LSH).
    *  - QUERY: |Q|×k centroid ranking picks nprobe cells; the candidate
    *    join is a keyed shuffle on cell id — work drops from |Q|×|N| to
    *    (nprobe/k)·|N| per query.
    */
  /** Spherical k-means coarse quantizer over the embeddings table:
    * deterministic init (every N/k-th unit vector), `lloydRounds` Lloyd
    * iterations, one cell per vector. Returns the assignment
    * (vec_id, nv, nn, cell) plus the trained k×dim centroid model —
    * also the clustering stage of [[Dedup]]'s SemDeDup. Only the model
    * is ever collected/broadcast.
    */
  private[graft] def kmeansIndex(s: SparkSession, d: String,
      k: Int = 0, lloydRounds: Int = 2): (DataFrame, Seq[(Long, Seq[Double])]) = {
    import s.implicits._
    val corpus = T.embeddings(s, d)
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("nv"))
      .withColumn("nn", l2norm(col("nv")))
      .withColumn("u", expr("transform(nv, x -> x / nn)")) // unit vectors
      .localCheckpoint() // reused per Lloyd round + final index
    val n = corpus.count()
    val kk = if (k > 0) k else math.max(4, math.sqrt(n.toDouble).toInt)
    val step = math.max(1, n / kk)

    // deterministic init: every step-th unit vector
    var centroids = corpus
      .filter(col("vec_id") % step === 0)
      .limit(kk)
      .select(col("vec_id").as("cell"), col("u").as("cv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq

    def centroidDf = s.createDataFrame(centroids).toDF("cell", "cv")
    def assign(): DataFrame = {
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("sim").desc, col("cell"))
      corpus
        .join(broadcast(centroidDf), lit(true)) // k-row model, not corpus
        .select(col("vec_id"), col("u"), col("nv"), col("nn"), col("cell"),
          dot(col("u"), col("cv")).as("sim"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .drop("rn", "sim")
    }

    for (_ <- 1 to lloydRounds) {
      val assigned = assign()
      // new centroid = normalized mean of member unit vectors:
      // (cell, dim)-grained aggregation, k×dim rows back to the driver
      val means = assigned
        .select(col("cell"), posexplode(col("u")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .groupBy(col("cell"))
        .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("dims"))
        .select(col("cell"), expr("transform(dims, d -> d.m)").as("cv"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
        .map { case (c, v) =>
          val nrm = math.sqrt(v.map(x => x * x).sum)
          (c, if (nrm == 0) v else v.map(_ / nrm))
        }.toSeq
      centroids = means
    }
    (assign().select(col("vec_id"), col("nv"), col("nn"), col("cell")), centroids)
  }

  private[graft] def ivf(s: SparkSession, d: String,
      k: Int = 0, nprobe: Int = 8, lloydRounds: Int = 2): DataFrame = {
    import s.implicits._
    val (idx, model) = kmeansIndex(s, d, k, lloydRounds)
    val index = idx.toDF("neighbor_id", "nv", "nn", "cell")
    val centroidDf = s.createDataFrame(model).toDF("cell", "cv")
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("cell"))
    val queryCells = queriesSet(s, d)
      .withColumn("qu", expr("transform(qv, x -> x / qn)"))
      .join(broadcast(centroidDf), lit(true))
      .select(col("query_id"), col("qv"), col("qn"), col("cell"),
        dot(col("qu"), col("cv")).as("csim"))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("qv"), col("qn"), col("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    // keyed shuffle on cell id; each vector lives in exactly one cell
    index
      .join(queryCells, Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .orderBy(col("query_id"), col("rank"))
  }

  val all: Seq[Q] = Seq(
    Q(
      "sim_ann_brute",
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |           FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 50 = 0)
         |SELECT query_id, neighbor_id, cos_sim, rank FROM (
         |  SELECT q.query_id, e.vec_id AS neighbor_id,
         |         round(list_sum(list_transform(list_zip(q.qv, e.v), p -> p[1] * p[2])) /
         |               (sqrt(list_sum(list_transform(q.qv, x -> x * x))) *
         |                sqrt(list_sum(list_transform(e.v, x -> x * x)))), 6) AS cos_sim,
         |         row_number() OVER (PARTITION BY q.query_id
         |                            ORDER BY round(list_sum(list_transform(list_zip(q.qv, e.v), p -> p[1] * p[2])) /
         |                                           (sqrt(list_sum(list_transform(q.qv, x -> x * x))) *
         |                                            sqrt(list_sum(list_transform(e.v, x -> x * x)))), 6) DESC,
         |                            e.vec_id) AS rank
         |  FROM q JOIN e ON e.vec_id <> q.query_id) t
         |WHERE rank <= $K
         |ORDER BY query_id, rank""".stripMargin
    )(bruteForce),
    Q.rowsOnly("sim_ann_lsh")(lsh),
    Q.rowsOnly("sim_ann_ivf")((s, d) => ivf(s, d))
  )
}
