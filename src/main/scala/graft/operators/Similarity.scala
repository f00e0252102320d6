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
  /** Every (query, corpus) pair with its rounded cosine — the ONE
    * scored-pairs kernel behind [[bruteForceImpl]] (top-k window) and
    * [[rangeSearch]] (threshold filter), sharing the corpus projection,
    * the size-guarded broadcast dispatch, and the codegen'd dot kernel
    * so the guard cannot drift between the two entry points.
    */
  private def scoredPairs(s: SparkSession, d: String,
      maxBroadcastQueries: Long): DataFrame = {
    val corpus = T.embeddings(s, d)
      .select(col("vec_id").as("neighbor_id"), toDoubleVec(col("embedding")).as("nv"))
      .withColumn("nn", l2norm(col("nv")))
    val qs = queriesSet(s, d)
    val nQueries = qs.select(col("query_id")).count()
    val qSide = if (nQueries <= maxBroadcastQueries) broadcast(qs) else qs
    corpus
      .join(qSide, col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6).as("cos_sim"))
  }

  private[graft] def bruteForceImpl(s: SparkSession, d: String,
      maxBroadcastQueries: Long = 500000): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scoredPairs(s, d, maxBroadcastQueries)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Per-dataset memo of the brute-force exact top-k: the brute gate
    * and the recall gates of ivf/ivfpq/persist all score against the
    * SAME immutable testdata, so the |Q|×|N| pass runs once per JVM,
    * not once per gate. The memo holds the COLLECTED rows — |Q|·K, the
    * gate's fixed query set × 10, driver-trivial — because the bench
    * harness sweeps localCheckpoints between queries, which would
    * truncate a checkpointed frame's lineage mid-run. Keyed by file
    * identity (mtime + size) — regenerated testdata must not serve
    * stale pairs.
    */
  // ConcurrentHashMap.computeIfAbsent, not TrieMap.getOrElseUpdate: the
  // builder is a full |Q|×|N| brute pass, and getOrElseUpdate can run
  // it concurrently in two racing gates — computeIfAbsent guarantees
  // at-most-once per key
  private val bruteCache = new java.util.concurrent
    .ConcurrentHashMap[(String, Long, Long), Seq[(Long, Long, Double, Long)]]()
  private def bruteCached(s: SparkSession, d: String): DataFrame = {
    val f = java.nio.file.Paths.get(s"$d/embeddings.parquet")
    val key = (d,
      java.nio.file.Files.getLastModifiedTime(f).toMillis,
      java.nio.file.Files.size(f))
    val rows = bruteCache.computeIfAbsent(key, _ =>
      bruteForceImpl(s, d).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq)
    s.createDataFrame(rows)
      .toDF("query_id", "neighbor_id", "cos_sim", "rank")
  }

  private def bruteForce(s: SparkSession, d: String): DataFrame =
    // re-assert the output order: checkpointed blocks don't carry it
    bruteCached(s, d).orderBy(col("query_id"), col("rank"))

  /** Multi-table LSH ANN: L independent 6-bit random-hyperplane tables;
    * a corpus vector is a candidate for a query if they share a bucket in
    * ANY table (recall 1-(1-p^b)^L vs p^b for one table — the standard
    * multi-table construction; single-table recall measured ~0.04 on this
    * data, multi-table >=0.25, spec-gated in LlmOpsSpec). Each side
    * explodes to L (table, bucket) keys; candidate work is Σ|bucket| per
    * table and the corpus never joins itself.
    *
    * Planes are the PORTABLE md5 scheme ([[graft.functions.HashKernels
    * .hyperplaneBucketMd5]]): DuckDB rebuilds every plane from md5() and
    * replays the projections with order-preserving list arithmetic, so
    * the whole query — bucketing included — is oracle-checked bit-for-bit
    * (the same move that took dd_simhash from rows-only to hash-proven).
    */
  private val LshL = 8
  private val LshBits = 6
  private def lsh(s: SparkSession, d: String): DataFrame = {
    val L = LshL
    val NBits = LshBits
    def tables(vCol: String): Column = array(
      (0 until L).map(t => graft.functions.HashExpressions
        .hyperplaneBucketMd5Native(col(vCol), nbits = NBits, planeOffset = t * NBits)): _*)
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
      k: Int = 0, lloydRounds: Int = 2): (DataFrame, Seq[(Long, Seq[Double])]) =
    kmeansIndexOf(s,
      T.embeddings(s, d)
        .select(col("vec_id"), toDoubleVec(col("embedding")).as("nv")),
      k, lloydRounds)

  /** Same quantizer over an arbitrary `(vec_id, nv)` corpus — the entry
    * point [[annIndexInit]] trains through (the persisted-index path
    * must train on exactly the rows it stores, not the raw table).
    */
  private[graft] def kmeansIndexOf(s: SparkSession, corpusIn: DataFrame,
      k: Int = 0, lloydRounds: Int = 2): (DataFrame, Seq[(Long, Seq[Double])]) = {
    import s.implicits._
    val corpus = corpusIn
      .select(col("vec_id"), col("nv"))
      .withColumn("nn", l2norm(col("nv")))
      .withColumn("u", expr("transform(nv, x -> x / nn)")) // unit vectors
      .localCheckpoint() // reused per Lloyd round + final index
    val n = corpus.count()
    // Model-size guard: the Lloyd loop collects the k×dim centroid model
    // to the driver (k·dim·8 bytes — at k=4096, dim=1024 that is ~32 MB,
    // a model parameter, not data). Beyond the cap the model stops being
    // driver-sized, so k is clamped; the documented scale-up path past
    // the cap is to keep centroids DISTRIBUTED — assignment becomes a
    // keyed join against a (cell, cv) table instead of a broadcast, and
    // the mean-update aggregation already is distributed. Override with
    // spark.graft.kmeans.maxModelK.
    val maxModelK = s.conf.getOption("spark.graft.kmeans.maxModelK")
      .flatMap(_.toIntOption).filter(_ > 0).getOrElse(4096)
    val kk = math.min(
      if (k > 0) k else math.max(4, math.sqrt(n.toDouble).toInt), maxModelK)
    val step = math.max(1, n / kk)

    // deterministic init: every step-th unit vector
    var centroids = corpus
      .filter(col("vec_id") % step === 0)
      .limit(kk)
      .select(col("vec_id").as("cell"), col("u").as("cv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    if (centroids.size < math.max(1, kk / 2)) {
      // id-modulo seeding assumes DENSE ids; an id-sparse corpus (a
      // filtered slice whose surviving ids share a factor with step —
      // e.g. vec_id % 3 ≠ 0 under a step divisible by 3) can seed
      // nothing. Deterministic hash-spread fallback: same expected
      // seed count, uniform over any id structure, still a filter +
      // limit (scale-safe). Dense corpora never take this branch, so
      // every pre-existing gate keeps its exact seeds.
      centroids = corpus
        .filter(pmod(xxhash64(col("vec_id")), lit(step)) === 0)
        .limit(kk)
        .select(col("vec_id").as("cell"), col("u").as("cv"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    }

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

  /** IVF-PQ: the coarse IVF quantizer above plus PRODUCT QUANTIZATION —
    * the memory-bound 100 TB ANN answer (FAISS's IVFADC layout). Each
    * unit vector splits into `m` subvectors; a per-subspace codebook of
    * `ks` centroids (trained by grouped Lloyd rounds — ALL subspaces in
    * one job per round, never a job per subspace) encodes the corpus as
    * m small codes: 64 dims × 8 bytes → m=8 codes (32× compression), so
    * the scan side of a probe touches codes, not vectors.
    *
    * Query = asymmetric distance computation (ADC): the query's per-
    * (subspace, code) dot contributions form a |Q|×(m·ks) table; probed-
    * cell candidates explode to (neighbor, subspace, code) and a keyed
    * join + sum reconstructs approximate cosine — every step a keyed
    * shuffle or a model-sized (m·ks rows) broadcast, corpus never
    * broadcast, no cartesian. Top-`rerank` by ADC then re-rank EXACTLY
    * against the true vectors (the standard refine step: PQ error only
    * affects which candidates reach the exact pass).
    */
  /** `(id, j, sv)` subvectors of each row's UNIT vector (the input
    * carries `nv`+`nn`): approx cos(q,v) = Σ_j qu_j · cb[j][code_j].
    */
  private def pqSubvectors(vecs: DataFrame, idCol: String,
      m: Int, dimPer: Int): DataFrame =
    vecs.select(col(idCol), posexplode(
      expr(s"transform(sequence(0, ${m - 1}), " +
        s"j -> slice(transform(nv, x -> x / nn), j * $dimPer + 1, $dimPer))")))
      .toDF(idCol, "j", "sv")

  /** Nearest code per (vector, subspace): L2 argmin == argmin of
    * (||cb||² - 2·sv·cb) — ||sv||² is constant per row. The codebook
    * is an m·ks·dimPer model (~1K doubles), so the argmin is a pure
    * codegen'd PROJECTION over a typed literal — no join, no window,
    * no shuffle (the exact FAISS shape: tiny local codebook, local
    * encode). array_min + array_position picks the LOWEST code among
    * d2 ties. A code with no assigned vectors after a Lloyd update
    * gets a far-away sentinel (1e150: d2 ≈ 8e300, finite so no NaN
    * via 0·∞, never the argmin) — unselectable.
    */
  private def pqEncode(sub: DataFrame, codebook: Seq[(Int, Int, Seq[Double])],
      idCol: String, m: Int, ks: Int, dimPer: Int): DataFrame = {
    val sentinel = Seq.fill(dimPer)(1e150)
    val byJC = codebook.map(e => (e._1, e._2) -> e._3).toMap
    val dense: Seq[Seq[Seq[Double]]] = (0 until m).map(j =>
      (0 until ks).map(c => byJC.getOrElse((j, c), sentinel).toSeq))
    val cbLit = typedlit(dense)
    sub
      .withColumn("d2s", transform(element_at(cbLit, col("j") + 1),
        cb => dot(cb, cb) - lit(2.0) * dot(col("sv"), cb)))
      .withColumn("code",
        (array_position(col("d2s"), array_min(col("d2s"))) - 1).cast("int"))
      .select(col(idCol), col("j"), col("sv"), col("code"))
  }

  /** Grouped-Lloyd PQ codebook training: deterministic per-subspace
    * init (every n/ks-th vector's subvector), 2 rounds, ALL subspaces
    * in one job per round. Only the m·ks·dimPer model is collected.
    */
  private def trainPqCodebook(s: SparkSession, sub: DataFrame, n: Long,
      idCol: String, m: Int, ks: Int, dimPer: Int): Seq[(Int, Int, Seq[Double])] = {
    val step = math.max(1, n / ks)
    val initW = Window.partitionBy(col("j")).orderBy(col(idCol))
    def seed(pick: Column): Seq[(Int, Int, Seq[Double])] = sub
      .filter(pick)
      .withColumn("rn", row_number().over(initW))
      .filter(col("rn") <= ks)
      .select(col("j"), (col("rn") - 1).cast("int").as("code"), col("sv"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2))).toSeq
    var codebook = seed(col(idCol) % step === 0)
    if (codebook.size < math.max(1, m * ks / 2))
      // same id-sparse fallback as the coarse quantizer's init (see
      // kmeansIndexOf): dense corpora never take this branch
      codebook = seed(pmod(xxhash64(col(idCol)), lit(step)) === 0)
    for (_ <- 1 to 2) { // Lloyd rounds, all subspaces in ONE job
      codebook = pqEncode(sub, codebook, idCol, m, ks, dimPer)
        .select(col("j"), col("code"), posexplode(col("sv")))
        .groupBy(col("j"), col("code"), col("pos"))
        .agg(avg(col("col")).as("c"))
        .groupBy(col("j"), col("code"))
        .agg(sort_array(collect_list(struct(col("pos"), col("c")))).as("dims"))
        .select(col("j"), col("code"), expr("transform(dims, x -> x.c)").as("cb"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2))).toSeq
    }
    codebook
  }

  /** `(id, codes)` — m PQ codes per vector under `codebook`. */
  private def pqCodes(sub: DataFrame, codebook: Seq[(Int, Int, Seq[Double])],
      idCol: String, m: Int, ks: Int, dimPer: Int): DataFrame =
    pqEncode(sub, codebook, idCol, m, ks, dimPer)
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("j"), col("code")))).as("cs"))
      .select(col(idCol), expr("transform(cs, x -> x.code)").as("codes"))

  private[graft] def ivfpq(s: SparkSession, d: String,
      k: Int = 0, nprobe: Int = 8, m: Int = 8, ks: Int = 16,
      rerank: Int = 50): DataFrame = {
    import s.implicits._
    val dimPer = Dim / m
    val (idx, model) = kmeansIndex(s, d, k, 2)
    val index = idx.toDF("neighbor_id", "nv", "nn", "cell")
    val sub = pqSubvectors(index, "neighbor_id", m, dimPer)
      .localCheckpoint() // reused per Lloyd round + final encoding
    // N from the plain index scan — a distinct over the m-times-exploded
    // subvector table would shuffle N·m rows to recover a known count
    val n = index.count()
    val codebook = trainPqCodebook(s, sub, n, "neighbor_id", m, ks, dimPer)
    def cbDf = s.createDataFrame(codebook).toDF("j", "code", "cb")
    // PQ-encoded corpus: m codes per vector (+ its IVF cell)
    val encoded = pqCodes(sub, codebook, "neighbor_id", m, ks, dimPer)
      .join(index.select(col("neighbor_id"), col("cell")), Seq("neighbor_id"))

    // query side: probed cells (coarse) + ADC contribution table
    val centroidDf = s.createDataFrame(model).toDF("cell", "cv")
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("cell"))
    val qs = queriesSet(s, d).withColumn("qu", expr("transform(qv, x -> x / qn)"))
    val queryCells = qs
      .join(broadcast(centroidDf), lit(true))
      .select(col("query_id"), col("cell"), dot(col("qu"), col("cv")).as("csim"))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("cell"))
    val qSubCol = expr(s"transform(sequence(0, ${m - 1}), " +
      s"j -> slice(qu, j * $dimPer + 1, $dimPer))")
    val adc = qs
      .select(col("query_id"), posexplode(qSubCol)).toDF("query_id", "j", "qsv")
      .join(broadcast(cbDf), Seq("j"))
      .select(col("query_id"), col("j"), col("code"),
        dot(col("qsv"), col("cb")).as("contrib"))

    // candidates from probed cells, scored by ADC: keyed joins only
    val approxW = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_sim").desc, col("neighbor_id"))
    val shortlist = encoded
      .join(queryCells, Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), posexplode(col("codes")))
      .toDF("query_id", "neighbor_id", "j", "code")
      .join(adc, Seq("query_id", "j", "code"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("contrib")).as("approx_sim"))
      .withColumn("rn", row_number().over(approxW))
      .filter(col("rn") <= rerank)
      .select(col("query_id"), col("neighbor_id"))

    // exact re-rank of the shortlist (true vectors, true cosine)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    shortlist
      .join(index.select(col("neighbor_id"), col("nv"), col("nn")), Seq("neighbor_id"))
      .join(qs.select(col("query_id"), col("qv"), col("qn")), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .orderBy(col("query_id"), col("rank"))
  }

  // ---- PERSISTED ANN index (IVF-PQ in versioned graft tables) ---------
  //
  // The rebuild-per-run gap closed: centroids, PQ codebooks, and the
  // encoded corpus live in graft tables (same lifecycle as Dedup's
  // dd_incr_persist index) — TRAIN once on the initial corpus, APPEND
  // new vectors encoded under the STORED model in one atomic commit (no
  // Lloyd re-run), PROBE any query batch against the stored index. At
  // 100 TB the quantizer is a fixed model artifact; re-running Lloyd
  // per query batch is not viable, and the versioned tables give the
  // index snapshots/branches/time-travel for free.

  private def annPre(cat: String, repoName: String, branch: String) =
    s"$cat.$repoName.$branch.ann"

  /** Create + train + encode: ONE atomic commit publishes all three
    * index tables, so a reader never observes vectors without the
    * model that encodes them. `ann/vectors` is PARTITIONED BY cell —
    * a probe's scan prunes to its nprobe cells' files.
    */
  def annIndexInit(s: SparkSession, cat: String,
      repo: graft.versioned.GraftRepo, branch: String,
      corpus: DataFrame, k: Int = 0, m: Int = 8, ks: Int = 16): Unit = {
    import s.implicits._
    val r = repo.root.getFileName.toString
    s.sql(s"CREATE TABLE ${annPre(cat, r, branch)}.centroids " +
      "(cell BIGINT, cv ARRAY<DOUBLE>)")
    s.sql(s"CREATE TABLE ${annPre(cat, r, branch)}.codebook " +
      "(j INT, code INT, cb ARRAY<DOUBLE>)")
    s.sql(s"CREATE TABLE ${annPre(cat, r, branch)}.vectors " +
      "(vec_id BIGINT, nv ARRAY<DOUBLE>, nn DOUBLE, cell BIGINT, " +
      "codes ARRAY<INT>) PARTITIONED BY (cell)")
    val dimPer = Dim / m
    val (idx, model) = kmeansIndexOf(s, corpus, k, 2)
    val index = idx.localCheckpoint() // feeds sub, count, and the store
    val sub = pqSubvectors(index, "vec_id", m, dimPer).localCheckpoint()
    val n = index.count()
    val codebook = trainPqCodebook(s, sub, n, "vec_id", m, ks, dimPer)
    val vectors = index
      .join(pqCodes(sub, codebook, "vec_id", m, ks, dimPer), Seq("vec_id"))
      .select(col("vec_id"), col("nv"), col("nn"), col("cell"), col("codes"))
      // cluster by cell BEFORE the partitioned write: one file per cell
      // instead of (tasks × cells) shards — a probe then opens exactly
      // its nprobe cells' files
      .repartition(col("cell"))
    graft.versioned.TableOps.atomicAppend(s, repo, branch, Seq(
      // the two model tables are driver-sized — one file each
      "ann/centroids" -> s.createDataFrame(model).toDF("cell", "cv").coalesce(1),
      "ann/codebook" ->
        s.createDataFrame(codebook).toDF("j", "code", "cb").coalesce(1),
      "ann/vectors" -> vectors), "ann index init")
  }

  /** Stored model (centroids + codebook) — both driver-sized by the
    * same guard that bounds training (k ≤ maxModelK, m·ks rows).
    */
  private def annModel(s: SparkSession, pre: String)
      : (Seq[(Long, Seq[Double])], Seq[(Int, Int, Seq[Double])]) = {
    val centroids = s.table(s"$pre.centroids")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    val codebook = s.table(s"$pre.codebook")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2))).toSeq
    (centroids, codebook)
  }

  /** Append a `(vec_id, nv)` delta encoded under the STORED model —
    * cell assignment against the stored centroids (broadcast model),
    * codes against the stored codebook (local typed-literal encode),
    * ONE atomic commit. No Lloyd re-run: the incremental path costs
    * O(delta), not O(corpus). Fresh ids are enforced the same way the
    * dedup index does (a clashing id would serve two vectors under one
    * identity — refuse loudly).
    */
  def annIndexAppend(s: SparkSession, cat: String,
      repo: graft.versioned.GraftRepo, branch: String,
      delta: DataFrame): Unit = {
    import s.implicits._
    val r = repo.root.getFileName.toString
    val pre = annPre(cat, r, branch)
    val (centroids, codebook) = annModel(s, pre)
    val m = codebook.map(_._1).max + 1
    val ks = codebook.map(_._2).max + 1
    val dimPer = codebook.head._3.size
    val deltaVecs = delta
      .select(col("vec_id").cast("long").as("vec_id"), col("nv"))
      .withColumn("nn", l2norm(col("nv")))
      .withColumn("u", expr("transform(nv, x -> x / nn)"))
      .localCheckpoint() // feeds clash guard, assign, and encode
    // ids must be unique WITHIN the delta too: a doubled vec_id would
    // store two vectors under one identity — the ADC sum would double
    // its approx score and the re-rank would emit duplicate neighbors
    val deltaCount = deltaVecs.count()
    val dups = deltaVecs.groupBy(col("vec_id")).count()
      .filter(col("count") > 1).limit(5).collect().map(_.getLong(0))
    require(dups.isEmpty,
      s"delta contains duplicated vec_ids: ${dups.mkString(", ")} — " +
        "incremental append requires unique ids")
    // delta ids must be fresh vs the STORED index. Same dispatch rule
    // as the dedup index's clash guard (Dedup.semiPrune): broadcast the
    // delta id set only while it is provably bounded; past the guard a
    // keyed semi join does the same check without an unbounded driver
    // collect (the stored vec_id column is scanned pruned either way).
    val bcastMax = s.conf.getOption("spark.graft.dedup.broadcastKeysMax")
      .flatMap(_.toIntOption).filter(_ > 0).getOrElse(4000000)
    val deltaIds = deltaVecs.select(col("vec_id"))
    val clash = s.table(s"$pre.vectors").select(col("vec_id"))
      .join(if (deltaCount <= bcastMax) broadcast(deltaIds) else deltaIds,
        Seq("vec_id"), "left_semi")
      .limit(5).collect().map(_.getLong(0))
    require(clash.isEmpty,
      s"delta vec_ids already present in $pre.vectors: " +
        s"${clash.mkString(", ")} — incremental append requires fresh ids")
    val centroidDf = s.createDataFrame(centroids).toDF("cell", "cv")
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("sim").desc, col("cell"))
    val assigned = deltaVecs
      .join(broadcast(centroidDf), lit(true)) // k-row model, not corpus
      .select(col("vec_id"), col("u"), col("nv"), col("nn"), col("cell"),
        dot(col("u"), col("cv")).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "sim")
      .localCheckpoint() // feeds sub AND the final projection
    val sub = pqSubvectors(assigned, "vec_id", m, dimPer)
    val rows = assigned
      .join(pqCodes(sub, codebook, "vec_id", m, ks, dimPer), Seq("vec_id"))
      .select(col("vec_id"), col("nv"), col("nn"), col("cell"), col("codes"))
      // same cell clustering as init: one file per TOUCHED cell per
      // append (accreted files bin-pack away via the generic
      // TableOps.compact, exactly like the dedup index's indexCompact)
      .repartition(col("cell"))
    graft.versioned.TableOps.atomicAppend(s, repo, branch,
      Seq("ann/vectors" -> rows), "ann index append")
  }

  /** Maintenance for the persisted index: bin-pack `ann/vectors` (each
    * [[annIndexAppend]] adds one file per TOUCHED cell — probes stay
    * CORRECT as files accrete, but pay O(appends-per-cell) file opens
    * until compacted). Delegates to the generic graft compaction:
    * logical rows unchanged, so a post-compaction probe is
    * bit-identical, and the commit carries the structural compaction
    * marker so incremental consumers of a synced index skip it.
    * Returns (files before, files after).
    */
  def annIndexCompact(s: SparkSession,
      repo: graft.versioned.GraftRepo, branch: String,
      targetFileBytes: Long = 128L << 20): (Int, Int) =
    graft.versioned.TableOps.compact(s, repo, branch, "ann/vectors",
      targetFileBytes)

  /** IVFADC probe of a `(query_id, qv, qn)` batch against the STORED
    * index. Scale shape: the probed-cell id set is model-sized (≤ k ≤
    * maxModelK), pushed as a scan filter so the partitioned vectors
    * table prunes to the probed cells' FILES; the ADC scan reads only
    * (vec_id, cell, codes) — column pruning keeps the true vectors out
    * of the candidate pass, exactly the PQ memory story — and the
    * exact re-rank reads (nv, nn) for the top-`rerank` shortlist only.
    * Every join is keyed or a model-sized broadcast; the corpus is
    * never broadcast, collected, or self-joined, so probe cost tracks
    * the query batch × cell width (nprobe·N/k), not the corpus.
    */
  def annIndexProbe(s: SparkSession, cat: String, repoName: String,
      branch: String, qs0: DataFrame, nprobe: Int = 8, rerank: Int = 50,
      topK: Int = K): DataFrame = {
    import s.implicits._
    val pre = annPre(cat, repoName, branch)
    val (centroids, codebook) = annModel(s, pre)
    val m = codebook.map(_._1).max + 1
    val dimPer = codebook.head._3.size
    val centroidDf = s.createDataFrame(centroids).toDF("cell", "cv")
    val qs = qs0.withColumn("qu", expr("transform(qv, x -> x / qn)"))
      .localCheckpoint() // feeds cells, ADC, and the re-rank
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("cell"))
    val queryCells = qs
      .join(broadcast(centroidDf), lit(true))
      .select(col("query_id"), col("cell"), dot(col("qu"), col("cv")).as("csim"))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("cell"))
      .localCheckpoint() // feeds the pruning id set AND the join
    // union of probed cells: ≤ k ids (model-sized) — pushed down so the
    // cell-partitioned scan prunes to the probed files
    val probed = queryCells.select(col("cell")).distinct()
      .collect().map(_.getLong(0))
    val candidates = s.table(s"$pre.vectors")
      .select(col("vec_id").as("neighbor_id"), col("cell"), col("codes"))
      .filter(col("cell").isin(probed: _*))
      .join(queryCells, Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
    val qSubCol = expr(s"transform(sequence(0, ${m - 1}), " +
      s"j -> slice(qu, j * $dimPer + 1, $dimPer))")
    val adc = qs
      .select(col("query_id"), posexplode(qSubCol)).toDF("query_id", "j", "qsv")
      .join(broadcast(s.createDataFrame(codebook).toDF("j", "code", "cb")),
        Seq("j"))
      .select(col("query_id"), col("j"), col("code"),
        dot(col("qsv"), col("cb")).as("contrib"))
    val approxW = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_sim").desc, col("neighbor_id"))
    val shortlist = candidates
      .select(col("query_id"), col("neighbor_id"), posexplode(col("codes")))
      .toDF("query_id", "neighbor_id", "j", "code")
      .join(adc, Seq("query_id", "j", "code"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("contrib")).as("approx_sim"))
      .withColumn("rn", row_number().over(approxW))
      .filter(col("rn") <= rerank)
      .select(col("query_id"), col("neighbor_id"))
    // exact re-rank from the stored true vectors (pruned to the same
    // probed cells — a shortlist member came from one of them)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    shortlist
      .join(s.table(s"$pre.vectors")
        .select(col("vec_id").as("neighbor_id"), col("nv"), col("nn"),
          col("cell"))
        .filter(col("cell").isin(probed: _*)).drop("cell"),
        Seq("neighbor_id"))
      .join(qs.select(col("query_id"), col("qv"), col("qn")), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .orderBy(col("query_id"), col("rank"))
  }

  /** End-to-end gate for the PERSISTED index: train on 2/3 of the
    * corpus, APPEND the remaining third encoded under the stored model
    * (no retrain), probe the standard query set against the stored
    * tables, and emit the hash-checkable recall row. The hit join
    * includes cos_sim, so it also proves the stored-index exact
    * re-rank is BIT-EQUAL to brute force on every recalled pair (same
    * vectors, same codegen'd kernel, same rounding).
    */
  private def annPersist(s: SparkSession, d: String): DataFrame = {
    val cat = "gann" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(10)
    // corpus-sized scratch (the encoded index) — reclaimed at JVM exit
    val root = GateScratch.register(
      java.nio.file.Files.createTempDirectory(s"graft-$cat"))
    s.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.catalog.GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root.toString)
    s.sql(s"CREATE NAMESPACE $cat.r")
    s.sql(s"CREATE NAMESPACE $cat.r.main.ann")
    val repo = graft.versioned.GraftRepo.open(root.resolve("r"))
    val emb = T.embeddings(s, d)
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("nv"))
    annIndexInit(s, cat, repo, "main", emb.filter(col("vec_id") % 3 =!= 0))
    annIndexAppend(s, cat, repo, "main", emb.filter(col("vec_id") % 3 === 0))
    val hits = annIndexProbe(s, cat, "r", "main", queriesSet(s, d))
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"))
    val exact = bruteCached(s, d)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"))
    val matched = hits.join(exact, Seq("query_id", "neighbor_id", "cos_sim"))
    exact
      .agg(countDistinct(col("query_id")).as("n_queries"),
        count(lit(1)).as("n_exact"))
      .crossJoin(matched.agg(count(lit(1)).as("n_hits"))) // 1-row × 1-row
      .select(col("n_queries"),
        (col("n_hits") >= col("n_exact") * 0.4).as("recall_ok"))
  }

  /** Exact cosine RANGE search (radius query): every corpus vector with
    * cos_sim >= tau for each query, not a fixed top-k. Same broadcast
    * guard and codegen'd dot kernel as [[bruteForceImpl]]; the result
    * size is data-driven (|matches|), which is the point — a top-k scan
    * can't express "all near-duplicate candidates above a similarity
    * bar". Rounding to 6 dp happens BEFORE the threshold compare so the
    * Spark and DuckDB filters see bit-identical doubles.
    */
  private val Tau = 0.3
  private def rangeSearch(s: SparkSession, d: String): DataFrame =
    scoredPairs(s, d, maxBroadcastQueries = 500000)
      .filter(col("cos_sim") >= Tau)
      .orderBy(col("query_id"), col("cos_sim").desc, col("neighbor_id"))

  /** Hash-checkable accuracy gate for the TRAINED ANN variants: recall@K
    * against the in-query exact brute-force answer, emitted as a row the
    * oracle reproduces independently — `n_queries` genuinely (DuckDB
    * counts the query set), `recall_ok` as the constant the assertion
    * must yield. A recall dip below `bound` flips the boolean and the
    * driver's hash compare fails, so the accuracy spec is now part of
    * the correctness gate (the k-means cell layout itself is
    * engine-specific and cannot be replayed in SQL — unlike the md5
    * plane scheme that makes sim_ann_lsh fully replayable). Bounds
    * mirror LlmOpsSpec's with the same head-room (ivf 0.5, ivfpq 0.4);
    * both paths are deterministic on fixed data, so the driver's sf0.01
    * run cannot flake. Cost: one extra broadcast-guarded brute pass.
    */
  private def recallGate(bound: Double)(
      approx: (SparkSession, String) => DataFrame)(
      s: SparkSession, d: String): DataFrame = {
    // skinny (query, neighbor) pairs off the per-JVM memoized brute
    // pass (bruteCached) — referenced by BOTH the hit join and the
    // count aggregate, and shared across every recall gate in the run
    val exact = bruteCached(s, d).select(col("query_id"), col("neighbor_id"))
    val hits = approx(s, d).select(col("query_id"), col("neighbor_id"))
      .join(exact, Seq("query_id", "neighbor_id"))
    exact
      .agg(countDistinct(col("query_id")).as("n_queries"),
        count(lit(1)).as("n_exact"))
      .crossJoin(hits.agg(count(lit(1)).as("n_hits"))) // 1-row × 1-row
      .select(col("n_queries"),
        (col("n_hits") >= col("n_exact") * bound).as("recall_ok"))
  }

  private val RecallGateOracle =
    """SELECT CAST(count(*) AS BIGINT) AS n_queries, true AS recall_ok
      |FROM embeddings WHERE vec_id % 50 = 0""".stripMargin

  val all: Seq[Q] = Seq(
    Q(
      "sim_range_search",
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |           FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 50 = 0)
         |SELECT query_id, neighbor_id, cos_sim FROM (
         |  SELECT q.query_id, e.vec_id AS neighbor_id,
         |         round(list_sum(list_transform(list_zip(q.qv, e.v), p -> p[1] * p[2])) /
         |               (sqrt(list_sum(list_transform(q.qv, x -> x * x))) *
         |                sqrt(list_sum(list_transform(e.v, x -> x * x)))), 6) AS cos_sim
         |  FROM q JOIN e ON e.vec_id <> q.query_id) t
         |WHERE cos_sim >= $Tau
         |ORDER BY query_id, cos_sim DESC, neighbor_id""".stripMargin
    )(rangeSearch),
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
    // The md5 plane scheme lets DuckDB rebuild every hyperplane and
    // replay the bucketing projections with ORDER-PRESERVING list
    // arithmetic (list_sum folds in element order, matching the
    // kernel's sequential loop) — the whole LSH pipeline is
    // oracle-checked bit-for-bit, candidates included.
    Q(
      "sim_ann_lsh",
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |           FROM embeddings),
         |planes AS (
         |  SELECT t.t AS tbl, b.b AS bit,
         |         list(CASE WHEN substr(md5(CAST(t.t * $LshBits + b.b AS VARCHAR) || ':' ||
         |                                  CAST(i.i AS VARCHAR)), 1, 1) >= '8'
         |                   THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END
         |              ORDER BY i.i) AS sgn
         |  FROM range($LshL) t(t), range($LshBits) b(b), range($Dim) i(i)
         |  GROUP BY t.t, b.b),
         |buck AS (
         |  SELECT e.vec_id, p.tbl,
         |         CAST(sum(CASE WHEN list_sum(list_transform(list_zip(e.v, p.sgn),
         |                                     z -> z[1] * z[2])) > 0
         |                       THEN 1 << p.bit ELSE 0 END) AS BIGINT) AS bucket
         |  FROM e CROSS JOIN planes p
         |  GROUP BY e.vec_id, p.tbl),
         |cand AS (
         |  SELECT DISTINCT q.vec_id AS query_id, n.vec_id AS neighbor_id
         |  FROM buck q JOIN buck n ON q.tbl = n.tbl AND q.bucket = n.bucket
         |  WHERE q.vec_id % 50 = 0 AND n.vec_id <> q.vec_id),
         |scored AS (
         |  SELECT c.query_id, c.neighbor_id,
         |         round(list_sum(list_transform(list_zip(a.v, b.v), z -> z[1] * z[2])) /
         |               (sqrt(list_sum(list_transform(a.v, x -> x * x))) *
         |                sqrt(list_sum(list_transform(b.v, x -> x * x)))), 6) AS cos_sim
         |  FROM cand c JOIN e a ON a.vec_id = c.query_id
         |              JOIN e b ON b.vec_id = c.neighbor_id)
         |SELECT query_id, neighbor_id, cos_sim, rank FROM (
         |  SELECT query_id, neighbor_id, cos_sim,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY cos_sim DESC, neighbor_id) AS rank
         |  FROM scored) t
         |WHERE rank <= $K
         |ORDER BY query_id, rank""".stripMargin
    )(lsh),
    Q("sim_ann_ivf", RecallGateOracle)(recallGate(0.5)(ivf(_, _))),
    Q("sim_ann_ivfpq", RecallGateOracle)(recallGate(0.4)(ivfpq(_, _))),
    Q("sim_ann_persist", RecallGateOracle)(annPersist)
  )
}
