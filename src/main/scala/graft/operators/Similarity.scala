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
  /** The model-size rule's constant: a centroid model collected or
    * broadcast by the driver-sized trainer may hold at most this many
    * rows. Past it, training and serving must go through the
    * DISTRIBUTED-centroid path ([[kmeansIndexDistributedOf]]).
    */
  private def maxModelK(s: SparkSession): Int =
    s.conf.getOption("spark.graft.kmeans.maxModelK")
      .flatMap(_.toIntOption).filter(_ > 0).getOrElse(4096)

  /** BELT for the model-size rule: the only way ANN code collects
    * centroid rows to the driver. Throws (rather than OOMing three
    * stages later) if the collect would exceed maxModelK — the
    * distributed path must never take it for the fine model, which the
    * lifecycle spec proves by running with a tiny maxModelK.
    */
  private[graft] def collectCentroids(s: SparkSession, df: DataFrame)
      : Seq[(Long, Seq[Double])] =
    collectCentroids(df, maxModelK(s))

  /** Cap-explicit variant: serve-time paths over a PERSISTED index
    * validate against the clamp the index was BUILT under (stored in
    * ann/meta), not the probing session's conf — a driver-mode index
    * legitimately built with a larger cap must stay probe-able from a
    * default-configured session.
    */
  private[graft] def collectCentroids(df: DataFrame, cap: Int)
      : Seq[(Long, Seq[Double])] = {
    val rows = df.limit(cap + 1).collect()
    require(rows.length <= cap,
      s"refusing driver-side collect of >$cap centroid rows — this model " +
        "must stay distributed (cap = the index's build-time " +
        "spark.graft.kmeans.maxModelK when stored in ann/meta, else the " +
        "session's)")
    rows.map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
  }

  // ---- row-local model scoring (the pqEncode shape, generalized) -------
  //
  // Every assignment/routing pass in this pack scores rows against a
  // DRIVER-RESIDENT `(cell, cv)` model (the Lloyd loop's centroids, the
  // coarse router, a collected stored model — all ≤ maxModelK rows by
  // the model-size belt). The original shape materialized N·k candidate
  // ROWS (broadcast join on lit(true)) and ran a window argmax over
  // them — at scale that is a full Exchange + Sort of N·k rows per
  // pass, the trainer's dominant shuffle. Embedding the model as ONE
  // typed literal turns the whole pass into a codegen'd PROJECTION:
  // zero extra rows, zero exchange, zero sort; same dots, same argmax,
  // same (sim desc, cell asc) tie-break, bit-identical assignment.

  /** `(sim, -cell, cell)` struct per model cell scored against `u` —
    * struct comparison realizes the (sim DESC, cell ASC) tie-break of
    * the old window argmax: max = highest sim, smallest cell on ties.
    */
  private def scoredCellsLocal(model: Seq[(Long, Seq[Double])],
      u: Column): Column =
    zip_with(typedlit(model.map(_._2)), typedlit(model.map(_._1)),
      (cv, cell) => struct(dot(u, cv).as("sim"),
        negate(cell).as("negcell"), cell.as("cell")))

  /** Argmax cell struct (fields `sim`, `cell`) of `u` against a
    * driver-resident model — one row-local array_max, no join/window.
    */
  private def bestCellLocal(model: Seq[(Long, Seq[Double])],
      u: Column): Column =
    array_max(scoredCellsLocal(model, u))

  /** The `probes` best cell ids of `u` against a driver-resident model,
    * best-first — row-local sort of k structs instead of a window over
    * N·k candidate rows.
    */
  private def topCellsLocal(model: Seq[(Long, Seq[Double])], u: Column,
      probes: Int): Column =
    transform(slice(reverse(array_sort(scoredCellsLocal(model, u))),
      1, probes), x => x.getField("cell"))

  /** `(vec_id, nv, nn, u)` CHECKPOINTED — the shared trainer input.
    * Inputs already carrying the normalized shape (kmeansIndexAuto
    * preps and checkpoints once for its sizing count) pass through
    * untouched, so the corpus is never materialized into block storage
    * twice on the dispatch path.
    */
  private def normalizedCorpus(corpusIn: DataFrame): DataFrame =
    if (corpusIn.columns.contains("u") && corpusIn.columns.contains("nn"))
      corpusIn
    else corpusIn
      .select(col("vec_id"), col("nv"))
      .withColumn("nn", l2norm(col("nv")))
      .withColumn("u", expr("transform(nv, x -> x / nn)")) // unit vectors
      .localCheckpoint() // reused per Lloyd round + final index

  private[graft] def kmeansIndexOf(s: SparkSession, corpusIn: DataFrame,
      k: Int = 0, lloydRounds: Int = 2,
      nKnown: Long = -1L): (DataFrame, Seq[(Long, Seq[Double])]) = {
    import s.implicits._
    val corpus = normalizedCorpus(corpusIn)
    // callers that already sized the corpus (kmeansIndexAuto) pass the
    // count through — the checkpointed re-count was a wasted job
    val n = if (nKnown >= 0) nKnown else corpus.count()
    // Model-size guard: the Lloyd loop collects the k×dim centroid model
    // to the driver (k·dim·8 bytes — at k=4096, dim=1024 that is ~32 MB,
    // a model parameter, not data). Beyond the cap the model stops being
    // driver-sized, so THIS trainer clamps k; the scale-up path past the
    // cap is [[kmeansIndexDistributedOf]] (centroids stay a (cell, cv)
    // TABLE, assignment is a keyed join through a coarse router), which
    // [[kmeansIndexAuto]] dispatches to. Override with
    // spark.graft.kmeans.maxModelK.
    val kk = math.min(
      if (k > 0) k else math.max(4, math.sqrt(n.toDouble).toInt), maxModelK(s))
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

    // row-local argmax against the driver-resident model (the pqEncode
    // shape — see scoredCellsLocal): the old broadcast-join + window put
    // N·k candidate rows through an Exchange + Sort per Lloyd pass; this
    // is a pure projection with the same dots and the same tie-break
    def assign(): DataFrame =
      corpus.select(col("vec_id"), col("u"), col("nv"), col("nn"),
        bestCellLocal(centroids, col("u")).getField("cell").as("cell"))

    for (_ <- 1 to lloydRounds) {
      val assigned = assign()
      // new centroid = normalized mean of member unit vectors: ONE
      // (cell, dim)-grained aggregation, k×dim rows back to the driver
      // (the model-sized payload this trainer collects anyway). The
      // per-cell vectors are assembled driver-side — the old second
      // groupBy + sort_array paid a whole extra Exchange per round to
      // assemble arrays the driver was about to take apart again.
      val means = assigned
        .select(col("cell"), posexplode(col("u")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (c, rows) =>
          val v = rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
          val nrm = math.sqrt(v.map(x => x * x).sum)
          (c, if (nrm == 0) v else v.map(_ / nrm))
        }.toSeq
      centroids = means
    }
    (assign().select(col("vec_id"), col("nv"), col("nn"), col("cell")), centroids)
  }

  // ---- DISTRIBUTED-centroid k-means (the scale path past maxModelK) ----
  //
  // Past ~16M vectors the √N rule wants k > maxModelK and the driver-
  // sized trainer above stops being honest (its clamp makes probe
  // candidate width grow linearly, nprobe·N/maxModelK). Here the fine
  // centroid model lives in a (cell, cv) DataFrame END TO END — never
  // collected, never broadcast. Assignment routes through a COARSE
  // router of kc ≤ maxModelK cells (√k — a model parameter like the PQ
  // codebook): each fine centroid homes to its nearest coarse cell, each
  // vector ranks the LIVE coarse cells (those holding ≥1 fine centroid,
  // so no vector is ever candidate-less) and meets only the fine
  // centroids homed to its top `coarseProbes` cells — a keyed equi-join
  // of N·p·(k/kc) candidate pairs instead of an N·k broadcast pass.
  // Assignment is approximate in exactly the sense IVF probing is; the
  // recall gates bound the effect.

  /** Fine centroids homed to their nearest coarse cell:
    * `(ccell, cell, cv)` — a k×kc distributed dot pass, kc broadcast.
    */
  private def homeCentroids(s: SparkSession, cents: DataFrame,
      coarse: Seq[(Long, Seq[Double])]): DataFrame =
    // row-local argmax against the driver-resident router (see
    // scoredCellsLocal): the k×kc candidate join + window became a
    // projection over the fine-centroid table
    cents.select(
      bestCellLocal(coarse, col("cv")).getField("cell").as("ccell"),
      col("cell"), col("cv"))

  /** The router restricted to LIVE coarse cells (those appearing in
    * `homed`): ≤ kc ids — model-sized by construction, so the collect
    * is bounded like any model parameter.
    */
  private def liveRouter(s: SparkSession, homed: DataFrame,
      coarse: Seq[(Long, Seq[Double])]): Seq[(Long, Seq[Double])] = {
    // the live set is a SUBSET of the coarse model's cells by
    // construction, so the model already in hand bounds the collect —
    // no session conf is consulted, so a cap mismatch between the
    // building and probing sessions can never masquerade as corruption.
    // A wider set really IS corruption: fine centroids homed to cells
    // the router does not know.
    val cap = coarse.size
    val rows = homed.select(col("ccell")).distinct()
      .limit(cap + 1).collect()
    require(rows.length <= cap,
      s"live router cells exceed the stored coarse model ($cap cells) — " +
        "fine centroids are homed to cells the router does not know " +
        "(corrupted homing)")
    val live = rows.map(_.getLong(0)).toSet
    coarse.filter(c => live(c._1))
  }

  /** Adds the `probes` nearest live-router cells to each row (unit
    * vectors in `uCol`): |rows|×kc codegen'd dots, ROW-LOCAL against the
    * driver-resident router (see scoredCellsLocal) — the old
    * broadcast-join + window shuffled |rows|·kc candidate rows; this
    * explodes exactly `probes` ids per row out of a local sort.
    */
  private def routeRows(rows: DataFrame, idCol: String, uCol: String,
      router: Seq[(Long, Seq[Double])], probes: Int): DataFrame =
    rows.withColumn("ccell",
      explode(topCellsLocal(router, col(uCol), probes)))

  /** Argmax assignment of `(vec_id, nv, nn, u)` rows to fine centroids
    * via the router: keyed equi-join on the coarse cell, window argmax
    * with the same tie-break as the driver-sized trainer.
    */
  private def assignByRouter(s: SparkSession, corpus: DataFrame,
      cents: DataFrame, coarse: Seq[(Long, Seq[Double])],
      probes: Int): DataFrame =
    assignByHomed(s, corpus,
      homeCentroids(s, cents, coarse).localCheckpoint(), coarse, probes)

  /** Same argmax assignment against ALREADY-HOMED centroids
    * `(ccell, cell, cv)` — the persisted index stores the homing, so
    * append never re-pays the k×kc pass.
    */
  private def assignByHomed(s: SparkSession, rows: DataFrame,
      homed: DataFrame, coarse: Seq[(Long, Seq[Double])],
      probes: Int): DataFrame = {
    val live = liveRouter(s, homed, coarse)
    // the candidate join stays KEYED (the fine model is a table, never
    // driver-resident on this path); the argmax is a max_by aggregate —
    // map-side partial aggregation collapses each vector's candidates
    // before the exchange, where the old window shuffled+sorted all
    // N·p·(k/kc) candidate rows. Same (sim DESC, cell ASC) tie-break.
    routeRows(rows, "vec_id", "u", live, probes)
      .join(homed, Seq("ccell"))
      .select(col("vec_id"), col("nv"), col("nn"), col("u"), col("cell"),
        dot(col("u"), col("cv")).as("sim"))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("nv"), col("nn"), col("u"), col("cell")),
        struct(col("sim"), negate(col("cell")))).as("best"))
      .select(col("vec_id"), col("best.nv").as("nv"),
        col("best.nn").as("nn"), col("best.u").as("u"),
        col("best.cell").as("cell"))
  }

  /** Distributed-centroid spherical k-means: same init rule, Lloyd
    * update and tie-breaks as [[kmeansIndexOf]], but k is NOT clamped —
    * centroids are a DataFrame throughout and every collect on this
    * path goes through the model-size belt (router ids and the coarse
    * model only, both ≤ kc ≤ maxModelK). Returns the assignment, the
    * fine centroid table, and the coarse router model.
    */
  private[graft] def kmeansIndexDistributedOf(s: SparkSession,
      corpusIn: DataFrame, kTarget: Int, lloydRounds: Int = 2,
      coarseProbes: Int = 4, nKnown: Long = -1L)
      : (DataFrame, DataFrame, Seq[(Long, Seq[Double])]) = {
    val corpus = normalizedCorpus(corpusIn)
    val n = if (nKnown >= 0) nKnown else corpus.count()
    val kk = if (kTarget > 0) kTarget
      else math.max(4, math.sqrt(n.toDouble).toInt)
    // deterministic init, fully DISTRIBUTED: one seed per
    // pmod(xxhash64(vec_id), kk) hash bucket — the bucket's min-vec_id
    // unit vector, picked by ONE keyed aggregate whose partial state is
    // ≤ kk candidates per task. Nothing funnels k·dim doubles through a
    // single task (the previous orderBy+limit gather was ~32 GB in one
    // task at k=4M × dim=1024 — the last single-point concentration on
    // this path). Hash bucketing is id-structure-free, so the id-sparse
    // fallback the modulo seeding needed is subsumed: a corpus with
    // n ≫ kk rows occupies essentially every bucket, and a smaller one
    // seeds one centroid per surviving bucket either way.
    var centroids = corpus
      .groupBy(pmod(xxhash64(col("vec_id")), lit(kk.toLong)).as("b"))
      .agg(min_by(struct(col("vec_id"), col("u")), col("vec_id")).as("sd"))
      .select(col("sd.vec_id").as("cell"), col("sd.u").as("cv"))
      .localCheckpoint()

    // the coarse ROUTER: kc ≈ √k ≤ maxModelK cells trained by the
    // driver-sized path on a deterministic hash sample of the corpus —
    // the router is a bounded model parameter; the FINE model is not
    val kc = math.min(maxModelK(s),
      math.max(4, math.ceil(math.sqrt(kk.toDouble)).toInt))
    val sampleEvery = math.max(1L, n / math.max(kc.toLong * 40L, 20000L))
    val sample = corpus
      .filter(pmod(xxhash64(col("vec_id")), lit(sampleEvery)) === 0)
      .select(col("vec_id"), col("nv"))
    val (_, coarse) = kmeansIndexOf(s, sample, kc, 1)

    for (_ <- 1 to lloydRounds) {
      val assigned = assignByRouter(s, corpus, centroids, coarse, coarseProbes)
      // normalized mean of member unit vectors — all DISTRIBUTED: the
      // (cell, dim) aggregation lands back in a (cell, cv) table
      centroids = assigned
        .select(col("cell"), posexplode(col("u")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .groupBy(col("cell"))
        .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("dims"))
        .select(col("cell"), expr("transform(dims, d -> d.m)").as("cv0"))
        .withColumn("nrm",
          sqrt(expr("aggregate(cv0, 0d, (acc, x) -> acc + x * x)")))
        .select(col("cell"),
          when(col("nrm") === 0, col("cv0"))
            .otherwise(expr("transform(cv0, x -> x / nrm)")).as("cv"))
        .localCheckpoint() // truncate per-round lineage
    }
    val finalAssign = assignByRouter(s, corpus, centroids, coarse, coarseProbes)
      .select(col("vec_id"), col("nv"), col("nn"), col("cell"))
    (finalAssign, centroids, coarse)
  }

  /** Auto dispatch on the √N rule vs maxModelK: the driver-sized
    * trainer below the clamp (bit-identical to every existing gate),
    * the distributed-centroid trainer past it. Returns the assignment,
    * the centroid TABLE, and the coarse router model (empty = driver
    * mode).
    */
  private[graft] def kmeansIndexAuto(s: SparkSession, corpusIn: DataFrame,
      k: Int = 0, lloydRounds: Int = 2)
      : (DataFrame, DataFrame, Seq[(Long, Seq[Double])], Long) = {
    // size the √N rule WITHOUT a second full-corpus pass OR a second
    // corpus copy in block storage: normalize+checkpoint ONCE here,
    // count ONCE, and hand both the prepped frame and the count to the
    // chosen trainer (the re-count per trainer was a wasted job). The
    // count rides out in the result so callers (annIndexInit's PQ
    // sizing) never re-count the assignment either.
    val corpus = normalizedCorpus(corpusIn)
    val n = corpus.count()
    val kWant = if (k > 0) k else math.max(4, math.sqrt(n.toDouble).toInt)
    if (kWant <= maxModelK(s)) {
      val (idx, model) = kmeansIndexOf(s, corpus, kWant, lloydRounds, n)
      (idx, s.createDataFrame(model).toDF("cell", "cv"), Nil, n)
    } else {
      val (idx, cents, coarse) =
        kmeansIndexDistributedOf(s, corpus, kWant, lloydRounds, nKnown = n)
      (idx, cents, coarse, n)
    }
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
      // one (j, code, pos)-grained aggregate; the m·ks·dimPer model rows
      // are assembled driver-side (same move as kmeansIndexOf's means —
      // the second groupBy's Exchange bought nothing)
      codebook = pqEncode(sub, codebook, idCol, m, ks, dimPer)
        .select(col("j"), col("code"), posexplode(col("sv")))
        .groupBy(col("j"), col("code"), col("pos"))
        .agg(avg(col("col")).as("c"))
        .collect()
        .groupBy(r => (r.getInt(0), r.getInt(1)))
        .map { case ((j, c), rows) =>
          (j, c, rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq)
        }.toSeq
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

  /** Create + train + encode: ONE atomic commit publishes every index
    * table, so a reader never observes vectors without the model that
    * encodes them. `ann/vectors` is PARTITIONED BY cell — a probe's
    * scan prunes to its nprobe cells' files. Tables:
    *
    *   centroids (cell, cv, ccell) — the fine quantizer; ccell = the
    *     coarse router cell each fine centroid homes to (−1 in driver
    *     mode, where the whole model broadcasts)
    *   coarse    (cell, cv)        — the router model (EMPTY in driver
    *     mode); always ≤ maxModelK rows, i.e. driver-sized
    *   codebook  (j, code, cb)     — the PQ model (m·ks rows)
    *   meta      (m, ks, dim_per, coarse_k) — the encode parameters,
    *     persisted EXPLICITLY (not inferred from surviving codebook
    *     rows) so the stored model is self-describing
    *   vectors   (vec_id, nv, nn, cell, codes) partitioned by cell
    *
    * Training dispatches on the √N rule vs maxModelK
    * ([[kmeansIndexAuto]]): past the clamp the fine model never touches
    * the driver — it streams from the Lloyd output straight into the
    * centroids table, and probes route through the stored coarse table.
    */
  def annIndexInit(s: SparkSession, cat: String,
      repo: graft.versioned.GraftRepo, branch: String,
      corpus: DataFrame, k: Int = 0, m: Int = 8, ks: Int = 16): Unit = {
    import s.implicits._
    val r = repo.root.getFileName.toString
    s.sql(s"CREATE TABLE ${annPre(cat, r, branch)}.centroids " +
      "(cell BIGINT, cv ARRAY<DOUBLE>, ccell BIGINT)")
    s.sql(s"CREATE TABLE ${annPre(cat, r, branch)}.coarse " +
      "(cell BIGINT, cv ARRAY<DOUBLE>)")
    s.sql(s"CREATE TABLE ${annPre(cat, r, branch)}.codebook " +
      "(j INT, code INT, cb ARRAY<DOUBLE>)")
    s.sql(s"CREATE TABLE ${annPre(cat, r, branch)}.meta " +
      "(m INT, ks INT, dim_per INT, coarse_k INT, max_model_k INT, " +
      "drift_ref DOUBLE)")
    s.sql(s"CREATE TABLE ${annPre(cat, r, branch)}.drift " +
      "(n_rows BIGINT, n_below BIGINT, frac_below DOUBLE)")
    s.sql(s"CREATE TABLE ${annPre(cat, r, branch)}.vectors " +
      "(vec_id BIGINT, nv ARRAY<DOUBLE>, nn DOUBLE, cell BIGINT, " +
      "codes ARRAY<INT>) PARTITIONED BY (cell)")
    val dimPer = Dim / m
    val (idx, centsDf, coarse, n) = kmeansIndexAuto(s, corpus, k, 2)
    val index = idx.localCheckpoint() // feeds sub and the store
    val sub = pqSubvectors(index, "vec_id", m, dimPer).localCheckpoint()
    // n (= |index|: every vector gets exactly one cell) rides out of the
    // trainer — the old per-init re-count was a wasted job
    val codebook = trainPqCodebook(s, sub, n, "vec_id", m, ks, dimPer)
    val vectors = index
      .join(pqCodes(sub, codebook, "vec_id", m, ks, dimPer), Seq("vec_id"))
      .select(col("vec_id"), col("nv"), col("nn"), col("cell"), col("codes"))
      // cluster by cell BEFORE the partitioned write: one file per cell
      // instead of (tasks × cells) shards — a probe then opens exactly
      // its nprobe cells' files
      .repartition(col("cell"))
    graft.versioned.TableOps.atomicAppend(s, repo, branch,
      shapeModelTables(s, index, centsDf, coarse, m, ks, dimPer) ++ Seq(
        "ann/codebook" ->
          s.createDataFrame(codebook).toDF("j", "code", "cb").coalesce(1),
        "ann/vectors" -> vectors), "ann index init")
  }

  /** Per-row top-1 cosine against a driver-sized `(cell, cv)` model —
    * the homing-quality measure behind the drift guard (the coarse
    * router in distributed mode, the fine model in driver mode; both
    * bounded by the build-time clamp, so the broadcast is a model
    * parameter).
    */
  private def top1ModelSim(rows: DataFrame, model: DataFrame): DataFrame =
    rows.select(col("vec_id"), col("u"))
      .join(broadcast(model.select(col("cv"))), lit(true))
      .groupBy(col("vec_id"))
      .agg(max(dot(col("u"), col("cv"))).as("top1"))

  /** One drift-log row from a batch's top-1 similarities: the count and
    * fraction homing WORSE than the model's init/retrain-time 5th
    * percentile (`ref`). A healthy batch sits near 0.05; a distribution
    * shift pushes it toward 1.
    */
  private def driftRow(top1: DataFrame, ref: Double): DataFrame =
    top1.agg(count(lit(1)).as("n_rows"),
      count(when(col("top1") < ref, 1)).as("n_below"))
      .select(col("n_rows"), col("n_below"),
        when(col("n_rows") === 0, lit(0.0))
          .otherwise(col("n_below").cast("double") / col("n_rows"))
          .as("frac_below"))

  /** The model-describing table contents init and retrain share: homed
    * centroids, the coarse router, self-describing meta — including a
    * freshly measured `drift_ref` (the 5th percentile of the corpus's
    * top-1 router similarity, the baseline every later append's drift
    * row compares against) — and the drift log's seed row.
    */
  private def shapeModelTables(s: SparkSession, index: DataFrame,
      centsDf: DataFrame, coarse: Seq[(Long, Seq[Double])],
      m: Int, ks: Int, dimPer: Int): Seq[(String, DataFrame)] = {
    import s.implicits._
    // centroids stored WITH their router homing, so probe/append never
    // re-pay the k×kc homing pass; driver mode stamps −1
    val storedCents =
      if (coarse.isEmpty) centsDf.withColumn("ccell", lit(-1L)).coalesce(1)
      else homeCentroids(s, centsDf, coarse)
        .select(col("cell"), col("cv"), col("ccell"))
        .coalesce(8) // k rows of doubles — small files, not driver data
    val withU = index.withColumn("u", expr("transform(nv, x -> x / nn)"))
    // driver mode: the assigned cell IS the fine-model argmax, so the
    // top-1 similarity is ONE dot per row against the assigned centroid
    // (a k-row broadcast equi-join) — not a second N·k pass duplicating
    // the assignment. Distributed mode measures top-1 against the
    // COARSE router (kc = √k rows): the same quantity every append's
    // drift row measures, so the baseline and the samples agree.
    val top1 = (if (coarse.isEmpty)
      withU.join(broadcast(centsDf), Seq("cell"))
        .select(col("vec_id"), dot(col("u"), col("cv")).as("top1"))
    else top1ModelSim(withU, s.createDataFrame(coarse).toDF("cell", "cv")))
      .localCheckpoint() // feeds the percentile AND the seed row
    val driftRef = top1
      .agg(percentile_approx(col("top1"), lit(0.05), lit(10000)))
      .head().getDouble(0)
    // max_model_k = the clamp the model was BUILT under: serve-time
    // collects validate against THIS, not the probing session's conf
    val metaDf = s.createDataFrame(
      Seq((m, ks, dimPer, coarse.size, maxModelK(s), driftRef)))
      .toDF("m", "ks", "dim_per", "coarse_k", "max_model_k", "drift_ref")
    Seq(
      "ann/centroids" -> storedCents,
      "ann/coarse" ->
        s.createDataFrame(coarse).toDF("cell", "cv").coalesce(1),
      "ann/meta" -> metaDf.coalesce(1),
      "ann/drift" -> driftRow(top1, driftRef).coalesce(1))
  }

  /** RETRAIN the fine quantizer (and router) on the index's CURRENT
    * live contents — the drift guard's remedy: appends encode under the
    * stored model forever, so after heavy accretion the coarse homing
    * degrades silently (the drift log makes it visible; this makes it
    * right). The stored PQ codebook and every stored CODE are KEPT —
    * codes depend only on the codebook, never on cell assignment — so
    * nothing is re-encoded: the cost is the Lloyd rounds plus one
    * clustered rewrite of the vectors table. Published as ONE atomic
    * multi-table replace (readers flip models all-or-nothing; the prior
    * model stays time-travelable), with `drift_ref` re-baselined and
    * the drift log re-seeded. Reading the live rows also materializes
    * any pending retire tombstones into the rewritten table.
    */
  def annIndexRetrain(s: SparkSession, cat: String,
      repo: graft.versioned.GraftRepo, branch: String, k: Int = 0): Unit = {
    val r = repo.root.getFileName.toString
    val pre = annPre(cat, r, branch)
    val meta = annMeta(s, pre)
    // retrain rewrites the r18-format model/drift tables; an index
    // created before they existed has nothing to re-baseline into —
    // refuse with the version gap named, not a column-mismatch error
    require(scala.util.Try(s.table(s"$pre.meta").columns
        .contains("drift_ref")).getOrElse(false) &&
      repo.headCommit(branch).tables.contains("ann/drift"),
      "annIndexRetrain needs an r18-format index (ann/meta.drift_ref + " +
        "the ann/drift log); rebuild older indexes with annIndexInit")
    // captured BEFORE the vectors read: a retire/append landing after
    // this point conflicts the replace instead of being silently undone
    val baseIds = repo.headCommit(branch).tables
    val stored = s.table(s"$pre.vectors")
      .select(col("vec_id"), col("nv"), col("codes"))
      .localCheckpoint() // feeds the trainer AND the codes re-join
    val (idx, centsDf, coarse, _) = kmeansIndexAuto(s,
      stored.select(col("vec_id"), col("nv")), k, 2)
    val index = idx.localCheckpoint() // feeds the store AND the drift ref
    val vectors = index
      .join(stored.select(col("vec_id"), col("codes")), Seq("vec_id"))
      .select(col("vec_id"), col("nv"), col("nn"), col("cell"), col("codes"))
      .repartition(col("cell")) // same one-file-per-cell clustering as init
    graft.versioned.TableOps.atomicReplace(s, repo, branch,
      shapeModelTables(s, index, centsDf, coarse, meta.m, meta.ks,
        meta.dimPer) :+ ("ann/vectors" -> vectors), "ann index retrain",
      expectBase = Map(baseIds.toSeq: _*))
  }

  /** Stored encode parameters. Falls back to inferring m/ks/dimPer from
    * surviving codebook rows for indexes created before the meta table
    * existed (coarse_k 0 = driver mode).
    */
  private case class AnnMeta(m: Int, ks: Int, dimPer: Int, coarseK: Int,
      maxModelK: Int, driftRef: Double)
  private def annMeta(s: SparkSession, pre: String): AnnMeta = {
    val fromMeta = scala.util.Try {
      val t = s.table(s"$pre.meta")
      val r = t.head()
      // indexes created before max_model_k / drift_ref existed fall
      // back to the session's clamp / NaN (drift logging skipped)
      val mk = if (t.columns.contains("max_model_k"))
        r.getInt(r.fieldIndex("max_model_k")) else maxModelK(s)
      val dr = if (t.columns.contains("drift_ref"))
        r.getDouble(r.fieldIndex("drift_ref")) else Double.NaN
      AnnMeta(r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), mk, dr)
    }.toOption
    fromMeta.getOrElse {
      val cb = s.table(s"$pre.codebook")
        .agg(max(col("j")), max(col("code")), first(size(col("cb")))).head()
      AnnMeta(cb.getInt(0) + 1, cb.getInt(1) + 1, cb.getInt(2), 0,
        maxModelK(s), Double.NaN)
    }
  }

  /** The PQ codebook is m·ks rows in EVERY mode — always driver-sized. */
  private def annCodebook(s: SparkSession, pre: String)
      : Seq[(Int, Int, Seq[Double])] =
    s.table(s"$pre.codebook")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2))).toSeq

  /** Per-JVM cache of driver-resident STORED-MODEL artifacts (ann/meta,
    * ann/codebook, driver-mode ann/centroids, ann/coarse + its live
    * subset): a serving node keeps the quantizer model in RAM —
    * re-collecting the same model tables from block storage on EVERY
    * probe/append was 3-4 small Spark jobs per call. Entries are keyed
    * by the table's SNAPSHOT ID (graft snapshots are immutable content
    * addresses): appends move only ann/vectors + ann/drift, so serving
    * keeps hitting; a retrain replaces the model tables in one atomic
    * commit, the id changes, and the next touch reloads. Payload sizes
    * are the SAME ones the collect belts already bound (meta 1 row,
    * codebook m·ks rows, centroids/coarse ≤ the build-time clamp).
    */
  private val storedModelCache = new java.util.concurrent
    .ConcurrentHashMap[(String, String, String), (String, AnyRef)]()

  /** Load-through wrapper for [[storedModelCache]]. Falls back to an
    * UNCACHED load when the catalog root or the table's snapshot id
    * cannot be resolved (e.g. a pre-meta-table index, whose decoded
    * clamp legitimately depends on the calling session's conf).
    */
  private def cachedModel[A <: AnyRef](s: SparkSession, cat: String,
      repoName: String, branch: String, table: String, kind: String = "")(
      load: => A): A = {
    val resolved: Option[(String, String)] =
      try s.conf.getOption(s"spark.sql.catalog.$cat.root").flatMap { root =>
        val repo = graft.versioned.GraftRepo.open(
          java.nio.file.Paths.get(root).resolve(repoName))
        repo.headCommit(branch).tables.get(table)
          .map(id => (s"$root/$repoName", id))
      } catch { case _: Exception => None }
    resolved match {
      case None => load
      case Some((rootKey, id)) =>
        val key = (rootKey, branch, s"$table#$kind")
        val cur = storedModelCache.get(key)
        if (cur != null && cur._1 == id) cur._2.asInstanceOf[A]
        else { val v = load; storedModelCache.put(key, (id, v)); v }
    }
  }

  /** The stored coarse router model — ≤ the BUILD-time maxModelK rows
    * by construction, which is the cap the collect validates against.
    */
  private def annCoarse(s: SparkSession, pre: String, cap: Int)
      : Seq[(Long, Seq[Double])] =
    collectCentroids(s.table(s"$pre.coarse"), cap)

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
    val meta = cachedModel(s, cat, r, branch, "ann/meta")(annMeta(s, pre))
    val codebook =
      cachedModel(s, cat, r, branch, "ann/codebook")(annCodebook(s, pre))
    val m = meta.m
    val ks = meta.ks
    val dimPer = meta.dimPer
    val deltaVecs = delta
      .select(col("vec_id").cast("long").as("vec_id"), col("nv"))
      .withColumn("nn", l2norm(col("nv")))
      .withColumn("u", expr("transform(nv, x -> x / nn)"))
      .localCheckpoint() // feeds clash guard, assign, and encode
    // ids must be unique WITHIN the delta too: a doubled vec_id would
    // store two vectors under one identity — the ADC sum would double
    // its approx score and the re-rank would emit duplicate neighbors.
    // One aggregate job yields the delta count AND the dup check (they
    // were two separate passes over the checkpointed delta).
    val idStats = deltaVecs.groupBy(col("vec_id"))
      .agg(count(lit(1)).as("cnt"))
      .agg(sum(col("cnt")).as("total"),
        count(when(col("cnt") > 1, 1)).as("n_dup"),
        min(when(col("cnt") > 1, col("vec_id"))).as("dup_id"))
      .head()
    val deltaCount = if (idStats.isNullAt(0)) 0L else idStats.getLong(0)
    require(idStats.getLong(1) == 0L,
      s"delta contains ${idStats.getLong(1)} duplicated vec_ids " +
        s"(e.g. ${idStats.get(2)}) — incremental append requires unique ids")
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
    // cell assignment under the STORED model, dispatched on its mode:
    // driver-sized models broadcast (the original shape); distributed
    // models route through the stored coarse table + homed centroids —
    // the fine model never reaches the driver
    val (assigned0, coarseDriftModel) = if (meta.coarseK == 0) {
      val centroids = cachedModel(s, cat, r, branch, "ann/centroids")(
        collectCentroids(
          s.table(s"$pre.centroids").select(col("cell"), col("cv")),
          meta.maxModelK))
      // row-local argmax against the collected driver-sized model (see
      // scoredCellsLocal) — no candidate join, no window. `sim` stays
      // through the checkpoint: the argmax row's sim IS the top-1 model
      // similarity, so the drift row below reads it for free instead of
      // re-running the delta×k model pass
      val best = bestCellLocal(centroids, col("u"))
      (deltaVecs
        .withColumn("best", best)
        .select(col("vec_id"), col("u"), col("nv"), col("nn"),
          col("best.cell").as("cell"), col("best.sim").as("sim")), None)
    } else {
      val homed = s.table(s"$pre.centroids")
        .select(col("ccell"), col("cell"), col("cv"))
      val coarseModel = cachedModel(s, cat, r, branch, "ann/coarse")(
        annCoarse(s, pre, meta.maxModelK))
      (assignByHomed(s, deltaVecs, homed, coarseModel, probes = 4)
        .select(col("vec_id"), col("u"), col("nv"), col("nn"), col("cell")),
        Some(s.createDataFrame(coarseModel).toDF("cell", "cv")))
    }
    val assigned =
      assigned0.localCheckpoint() // feeds sub AND the final projection
    val sub = pqSubvectors(assigned, "vec_id", m, dimPer)
    val rows = assigned
      .join(pqCodes(sub, codebook, "vec_id", m, ks, dimPer), Seq("vec_id"))
      .select(col("vec_id"), col("nv"), col("nn"), col("cell"), col("codes"))
      // same cell clustering as init: one file per TOUCHED cell per
      // append (accreted files bin-pack away via the generic
      // TableOps.compact, exactly like the dedup index's indexCompact)
      .repartition(col("cell"))
    // drift guard: one aggregate per append — the fraction of the delta
    // whose top-1 router similarity falls below the init/retrain-time
    // 5th percentile (meta.drift_ref). Driver mode reads the top-1 off
    // the checkpointed assignment (zero extra model passes);
    // distributed mode pays one delta×kc router pass (kc = √k —
    // small next to the assignment's candidate join). Logged in the
    // SAME commit as the vectors; read it via `ann/drift`, act on a
    // sustained rise via [[annIndexRetrain]]. Indexes from before the
    // drift tables existed skip the logging (NaN ref / missing table).
    val driftLog =
      if (meta.driftRef.isNaN ||
        !repo.headCommit(branch).tables.contains("ann/drift")) Nil
      else {
        val top1 = coarseDriftModel match {
          case None => assigned.select(col("vec_id"), col("sim").as("top1"))
          case Some(m) => top1ModelSim(deltaVecs, m)
        }
        // ONE action computes the 1-row drift log; the commit stores the
        // collected row as a local frame (the old checkpoint-then-head
        // was two jobs for one row)
        val r = driftRow(top1, meta.driftRef).head()
        val row = s.createDataFrame(Seq(
          (r.getLong(0), r.getLong(1), r.getDouble(2))))
          .toDF("n_rows", "n_below", "frac_below")
        // a batch whose below-baseline fraction exceeds the warn knob is
        // homing badly under the stored model — surface it at append
        // time (the log alone is silent until someone reads it)
        val warnFrac = s.conf.getOption("spark.graft.ann.drift.warnFrac")
          .flatMap(_.toDoubleOption).filter(f => f > 0 && f <= 1)
          .getOrElse(0.5)
        val frac = r.getDouble(2)
        if (frac >= warnFrac)
          System.err.println(f"[graft] WARNING: ann append drift " +
            f"frac_below=$frac%.3f >= $warnFrac%.2f (ref p05=" +
            f"${meta.driftRef}%.4f) — the delta homes poorly under the " +
            "stored router; consider Similarity.annIndexRetrain " +
            "(knob: spark.graft.ann.drift.warnFrac)")
        Seq("ann/drift" -> row)
      }
    graft.versioned.TableOps.atomicAppend(s, repo, branch,
      Seq("ann/vectors" -> rows) ++ driftLog, "ann index append")
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

  /** RETIRE vectors from the persisted index (the GDPR-style removal a
    * training-data index needs): ONE metadata commit appends an id
    * tombstone to `ann/vectors` — no data file is read or written, and
    * from the next read on a retired vector never surfaces as a
    * neighbor (every probe scan of the vectors table is tombstone-
    * aware, the ADC pass and the exact re-rank both). Retired ids
    * become appendable again only after [[annIndexCompact]]
    * materializes the removal (the clash guard reads the same
    * tombstone-aware scan, so a re-append before compaction is also
    * correct — the guard no longer sees the id).
    *
    * The id set becomes a metadata predicate, so it must be driver-
    * sized — bounded by `spark.graft.retire.maxIds` like the dedup
    * index's retire; bulk purges go through
    * [[graft.versioned.TableOps.atomicDeleteMoR]] with a column
    * predicate instead.
    */
  def annIndexRetire(s: SparkSession, repo: graft.versioned.GraftRepo,
      branch: String, vecIds: Seq[Long]): Unit = {
    require(vecIds.nonEmpty, "annIndexRetire needs at least one vec_id")
    val maxIds = s.conf.getOption("spark.graft.retire.maxIds")
      .flatMap(_.toIntOption).filter(_ > 0).getOrElse(100000)
    require(vecIds.size <= maxIds,
      s"retire batch of ${vecIds.size} ids exceeds " +
        s"spark.graft.retire.maxIds=$maxIds — split the batch or retire " +
        "by column predicate")
    graft.versioned.TableOps.atomicDeleteMoR(repo, branch,
      Seq("ann/vectors" -> Seq[org.apache.spark.sql.sources.Filter](
        org.apache.spark.sql.sources.In("vec_id",
          vecIds.map(Long.box).toArray[Any]))),
      s"ann index retire ${vecIds.size} vectors")
    Dedup.warnTombstoneBytes(s, repo, branch, Seq("ann/vectors"),
      "Similarity.annIndexCompact")
  }

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
    *
    * `allowed` (FILTERED search — the serving shape a real embedding
    * store runs: "top-k among vectors matching a metadata predicate"):
    * a `vec_id` set derived from any predicate, applied to the
    * candidate set BEFORE the ADC scoring pass — a selective filter
    * cuts scoring work, not just the result — as a keyed semi-join
    * (never collected; AQE broadcasts it when small). Selective
    * filters thin each probed cell, so callers should WIDEN `nprobe`
    * roughly by 1/selectivity to hold recall — the gate probes 2× for
    * a 25% filter.
    */
  def annIndexProbe(s: SparkSession, cat: String, repoName: String,
      branch: String, qs0: DataFrame, nprobe: Int = 8, rerank: Int = 50,
      topK: Int = K, allowed: Option[DataFrame] = None): DataFrame = {
    import s.implicits._
    val pre = annPre(cat, repoName, branch)
    val meta =
      cachedModel(s, cat, repoName, branch, "ann/meta")(annMeta(s, pre))
    val codebook = cachedModel(s, cat, repoName, branch, "ann/codebook")(
      annCodebook(s, pre))
    val m = meta.m
    val dimPer = meta.dimPer
    val qs = qs0.withColumn("qu", expr("transform(qv, x -> x / qn)"))
      .localCheckpoint() // feeds cells, ADC, and the re-rank
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("cell"))
    // nprobe fine cells per query, dispatched on the stored model's
    // mode: driver-sized models broadcast and rank all k cells (the
    // original shape); distributed models rank only the fine centroids
    // homed to each query's nearest coarse cells — a keyed join, the
    // fine model never broadcast or collected
    val queryCells = (if (meta.coarseK == 0) {
      // driver-sized model: the nprobe ranking is ROW-LOCAL against the
      // collected model (see scoredCellsLocal) — no |Q|·k candidate
      // join, no window
      val centroids = cachedModel(s, cat, repoName, branch, "ann/centroids")(
        collectCentroids(
          s.table(s"$pre.centroids").select(col("cell"), col("cv")),
          meta.maxModelK))
      qs.select(col("query_id"),
        explode(topCellsLocal(centroids, col("qu"), nprobe)).as("cell"))
    } else {
      // distributed model: candidates stay a KEYED join (the fine model
      // is a table); the per-query top-nprobe stays a window over the
      // ~nprobe·k/kc routed candidates. The LIVE router subset depends
      // only on the centroids table's content, so it caches under that
      // table's snapshot id like the other model artifacts.
      val homed = s.table(s"$pre.centroids")
        .select(col("ccell"), col("cell"), col("cv"))
      val live = cachedModel(s, cat, repoName, branch, "ann/centroids",
        kind = "live")(
        liveRouter(s, homed,
          cachedModel(s, cat, repoName, branch, "ann/coarse")(
            annCoarse(s, pre, meta.maxModelK))))
      routeRows(qs.select(col("query_id"), col("qu")), "query_id", "qu",
          live, probes = 4)
        .join(homed, Seq("ccell"))
        .select(col("query_id"), col("cell"),
          dot(col("qu"), col("cv")).as("csim"))
        .withColumn("rn", row_number().over(probeW))
        .filter(col("rn") <= nprobe)
        .select(col("query_id"), col("cell"))
    })
      .localCheckpoint() // feeds the pruning id set AND the join
    // union of probed cells, pushed down so the cell-partitioned scan
    // prunes to the probed files. The set is ≤ |Q|·nprobe ids — guarded:
    // past spark.graft.ann.pruneCellsMax (a huge query batch probing
    // most of the index) the static prune is SKIPPED and the keyed join
    // alone narrows candidates — correct either way, the prune is a
    // file-open optimization, never a filter the join doesn't re-apply
    val pruneMax = s.conf.getOption("spark.graft.ann.pruneCellsMax")
      .flatMap(_.toIntOption).filter(_ > 0).getOrElse(10000)
    val probedRows = queryCells.select(col("cell")).distinct()
      .limit(pruneMax + 1).collect()
    val probed: Option[Seq[Long]] =
      if (probedRows.length <= pruneMax) Some(probedRows.map(_.getLong(0)).toSeq)
      else None
    def pruneToProbed(df: DataFrame): DataFrame =
      probed.fold(df)(p => df.filter(col("cell").isin(p: _*)))
    val candidates0 = pruneToProbed(s.table(s"$pre.vectors")
      .select(col("vec_id").as("neighbor_id"), col("cell"), col("codes")))
      .join(queryCells, Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
    // metadata filter lands HERE — before any code is scored
    val candidates = allowed.fold(candidates0)(a =>
      candidates0.join(a.select(col("vec_id").as("neighbor_id")).distinct(),
        Seq("neighbor_id"), "left_semi"))
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
      .join(pruneToProbed(s.table(s"$pre.vectors")
        .select(col("vec_id").as("neighbor_id"), col("nv"), col("nn"),
          col("cell"))).drop("cell"),
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
  /** Per-JVM TEMPLATES of the gate index (train on 2/3 of the corpus,
    * append the remaining third under the stored model), byte-copied
    * per gate — the same fixture-template trick as the dedup lifecycle
    * gates: three gates (persist, retire, dist) each get a PRIVATE copy
    * to mutate/probe, but the ~same init+append cost is paid once per
    * JVM per mode, not per gate. "std" trains under the session's
    * maxModelK (driver-sized at gate scale); "dist" forces maxModelK=8
    * so the √N rule exceeds it and the DISTRIBUTED-centroid path
    * trains/serves (coarse router stored, fine model never collected).
    * Keyed by file identity so regenerated testdata rebuilds.
    */
  private val gateAnnTemplate = new java.util.concurrent
    .ConcurrentHashMap[(String, Long, Long, String), java.nio.file.Path]()

  private def annTemplateFor(s: SparkSession, d: String, mode: String)
      : java.nio.file.Path = {
    val f = java.nio.file.Paths.get(s"$d/embeddings.parquet")
    // the template's content depends on the EFFECTIVE clamp it was
    // built under — key it in, so a "std" template built while a caller
    // had a non-default maxModelK never serves the wrong mode later
    val effK = if (mode == "dist") 8 else maxModelK(s)
    val key = (d, java.nio.file.Files.getLastModifiedTime(f).toMillis,
      java.nio.file.Files.size(f), s"$mode:$effK")
    // "std" is "base" + the %3==0 append — materialize the base
    // template FIRST (outside std's computeIfAbsent: CHM forbids
    // re-entrant updates), then std's builder byte-copies it and runs
    // only the append, so the init TRAINING runs once per JVM for the
    // two driver-mode templates instead of once per mode
    val baseTpl: Option[java.nio.file.Path] =
      if (mode == "std") Some(annTemplateFor(s, d, "base")) else None
    gateAnnTemplate.computeIfAbsent(key, _ => {
      val cat0 = "gannt" + java.util.UUID.randomUUID().toString
        .replace("-", "").take(10)
      val root0 = GateScratch.register(
        java.nio.file.Files.createTempDirectory(s"graft-$cat0"))
      // build on an ISOLATED cloned session: the forced clamp must
      // never be visible to gates running concurrently on `s` (a
      // mutate-and-restore on the shared conf would clamp a racing
      // kmeansIndexOf to 8 cells mid-window)
      val sb: SparkSession = org.apache.spark.sql.graftbridge
        .SessionCloneBridge.withConf(s, Map(
          "spark.graft.kmeans.maxModelK" -> effK.toString,
          s"spark.sql.catalog.$cat0" ->
            classOf[graft.catalog.GraftCatalog].getName,
          s"spark.sql.catalog.$cat0.root" -> root0.toString))
      val emb = T.embeddings(sb, d)
        .select(col("vec_id"), toDoubleVec(col("embedding")).as("nv"))
      baseTpl match {
        case Some(base) =>
          GateScratch.copyTree(base, root0)
          val repo0 = graft.versioned.GraftRepo.open(root0.resolve("r"))
          annIndexAppend(sb, cat0, repo0, "main",
            emb.filter(col("vec_id") % 3 === 0))
        case None =>
          sb.sql(s"CREATE NAMESPACE $cat0.r")
          sb.sql(s"CREATE NAMESPACE $cat0.r.main.ann")
          val repo0 = graft.versioned.GraftRepo.open(root0.resolve("r"))
          annIndexInit(sb, cat0, repo0, "main",
            emb.filter(col("vec_id") % 3 =!= 0))
          // "base" = the trained index BEFORE any append — the streaming
          // gate ingests the remaining third itself, one micro-batch at
          // a time, and must start from a state that has never seen
          // those ids
          if (mode != "base")
            annIndexAppend(sb, cat0, repo0, "main",
              emb.filter(col("vec_id") % 3 === 0))
      }
      root0
    })
  }

  private def copiedAnnIndex(s: SparkSession, d: String, mode: String)
      : (String, graft.versioned.GraftRepo) = {
    val tpl = annTemplateFor(s, d, mode)
    val cat = "gann" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(10)
    val root = GateScratch.register(
      java.nio.file.Files.createTempDirectory(s"graft-$cat"))
    GateScratch.copyTree(tpl, root)
    s.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.catalog.GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root.toString)
    (cat, graft.versioned.GraftRepo.open(root.resolve("r")))
  }

  /** CONTINUOUS embedding ingestion — the streaming marriage of
    * sim_ann_persist, the production shape for an embedding store that
    * never stops ingesting (registered as `st_ann_persist` in the
    * streaming pack): an embedding stream runs
    * `foreachBatch(annIndexAppend)` against the PERSISTED index, so
    * each micro-batch encodes under the STORED model (no Lloyd re-run),
    * appends its vectors AND its router-drift row in ONE atomic commit,
    * and the clash guard makes admission exactly-once per vec_id (a
    * replayed batch refuses loudly instead of double-storing). The gate
    * starts from the append-free "base" template, streams the remaining
    * third in TWO micro-batches, and probes: the final stored state
    * equals sim_ann_persist's, so the same recall oracle applies;
    * `drift_logged` hash-proves one drift row landed per batch (seed +
    * 2 appends) — the accretion guard is exercised by the stream
    * itself.
    */
  private[operators] def annPersistStream(s: SparkSession,
      d: String): DataFrame = {
    val (cat, repo) = copiedAnnIndex(s, d, "base")
    val emb = T.embeddings(s, d)
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("nv"))
    // stage the ingestion batches as files with strictly-increasing
    // mtimes (the file source orders micro-batches by mtime) — the
    // %3==0 third split as %6 ∈ {0, 3}
    val dir = GateScratch.register(
      java.nio.file.Files.createTempDirectory("graft-stream-emb"))
    GateScratch.stageParquetBatch(dir, "b1",
      emb.filter(col("vec_id") % 6 === 0), 0L)
    GateScratch.stageParquetBatch(dir, "b2",
      emb.filter(col("vec_id") % 6 === 3), 2000L)
    val q = s.readStream
      .schema(emb.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        annIndexAppend(s, cat, repo, "main", batch)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val hits = annIndexProbe(s, cat, "r", "main", queriesSet(s, d))
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"))
    // the init seed row + exactly one drift row per streamed batch
    val driftLogged = s.table(s"$cat.r.main.ann.drift").count() == 3L
    persistRecallRow(s, d, hits, 0.4,
      Seq(lit(driftLogged).as("drift_logged")))
  }

  /** The recall row both persisted gates emit: hits joined to the
    * memoized exact pairs ON cos_sim TOO, so every recalled pair also
    * proves the stored-index exact re-rank bit-equal to brute force.
    */
  private def persistRecallRow(s: SparkSession, d: String, hits: DataFrame,
      bound: Double, extra: Seq[Column] = Nil): DataFrame = {
    val exact = bruteCached(s, d)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"))
    val matched = hits.join(exact, Seq("query_id", "neighbor_id", "cos_sim"))
    exact
      .agg(countDistinct(col("query_id")).as("n_queries"),
        count(lit(1)).as("n_exact"))
      .crossJoin(matched.agg(count(lit(1)).as("n_hits"))) // 1-row × 1-row
      .select((col("n_queries") +:
        (col("n_hits") >= col("n_exact") * bound).as("recall_ok") +:
        extra): _*)
  }

  /** End-to-end gate for the PERSISTED index: train on 2/3 of the
    * corpus, APPEND the remaining third encoded under the stored model
    * (no retrain — via the per-JVM template), probe the standard query
    * set against the stored tables, and emit the hash-checkable recall
    * row.
    */
  private def annPersist(s: SparkSession, d: String): DataFrame = {
    val (cat, _) = copiedAnnIndex(s, d, "std")
    val hits = annIndexProbe(s, cat, "r", "main", queriesSet(s, d))
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"))
    persistRecallRow(s, d, hits, 0.4)
  }

  /** Gate for FILTERED search over the stored index: top-k among the
    * vectors matching a metadata predicate (label%4==1, ~25% of the
    * corpus — the "only docs from source X" serving query). The filter
    * rides [[annIndexProbe]]'s `allowed` semi-join (applied BEFORE ADC
    * scoring), nprobe widened 2× per the selectivity note. Ground
    * truth is the FILTERED brute top-k — same kernel, rounding, and
    * tie-break as the brute gate, restricted to allowed neighbors —
    * NOT a filter over the unfiltered top-k: a selective predicate
    * surfaces neighbors far below the global top-k, which is exactly
    * what makes filtered search its own operator. Emits recall vs that
    * truth plus `all_allowed` (a single out-of-filter neighbor flips
    * the hash).
    */
  private def annFiltered(s: SparkSession, d: String): DataFrame = {
    val (cat, _) = copiedAnnIndex(s, d, "std")
    val allowed = T.embeddings(s, d).filter(col("label") % 4 === 1)
      .select(col("vec_id"))
      .localCheckpoint() // feeds the probe, the truth, and the leak check
    val hits = annIndexProbe(s, cat, "r", "main", queriesSet(s, d),
      nprobe = 16, allowed = Some(allowed))
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"))
      .localCheckpoint() // feeds the recall join AND the leak check
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    val corpus = T.embeddings(s, d)
      .join(allowed, Seq("vec_id"), "left_semi")
      .select(col("vec_id").as("neighbor_id"),
        toDoubleVec(col("embedding")).as("nv"))
      .withColumn("nn", l2norm(col("nv")))
    val exact = corpus
      .join(broadcast(queriesSet(s, d)),
        col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6)
          .as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"))
      .localCheckpoint() // feeds the recall join AND its own count agg
    val matched = hits.join(exact, Seq("query_id", "neighbor_id", "cos_sim"))
    exact
      .agg(countDistinct(col("query_id")).as("n_queries"),
        count(lit(1)).as("n_exact"))
      .crossJoin(matched.agg(count(lit(1)).as("n_hits"))) // 1-row × 1-row
      .crossJoin(hits.join(
        allowed.select(col("vec_id").as("neighbor_id")),
        Seq("neighbor_id"), "left_anti")
        .agg((count(lit(1)) === 0).as("all_allowed")))
      .select(col("n_queries"),
        (col("n_hits") >= col("n_exact") * 0.4).as("recall_ok"),
        col("all_allowed"))
  }

  /** Gate for the RETIRE path: tombstone the %7==0 vectors out of the
    * stored index (one metadata commit), probe, and prove BOTH that no
    * retired vector surfaces as a neighbor (`no_retired` — a single
    * leaked posting flips the hash) and that recall against the still-
    * live exact pairs holds. The exact side filters the memoized brute
    * pairs to non-retired neighbors — every one of those is still in
    * the index and still reachable.
    */
  private def annRetire(s: SparkSession, d: String): DataFrame = {
    val (cat, repo) = copiedAnnIndex(s, d, "std")
    val retired = T.embeddings(s, d)
      .filter(col("vec_id") % 7 === 0)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
    annIndexRetire(s, repo, "main", retired)
    val hits = annIndexProbe(s, cat, "r", "main", queriesSet(s, d))
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"))
      .localCheckpoint() // feeds the recall join AND the leak check
    val exact = bruteCached(s, d)
      .filter(col("neighbor_id") % 7 =!= 0) // still-live truth
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"))
    val matched = hits.join(exact, Seq("query_id", "neighbor_id", "cos_sim"))
    exact
      .agg(countDistinct(col("query_id")).as("n_queries"),
        count(lit(1)).as("n_exact"))
      .crossJoin(matched.agg(count(lit(1)).as("n_hits")))
      .crossJoin(hits.agg(
        (count(when(col("neighbor_id") % 7 === 0, 1)) === 0).as("no_retired")))
      .select(col("n_queries"),
        (col("n_hits") >= col("n_exact") * 0.4).as("recall_ok"),
        col("no_retired"))
  }

  /** Gate for the DISTRIBUTED-centroid path: the template trains with
    * maxModelK forced to 8, so the √N rule (k ≈ 18–45 at gate scale)
    * exceeds the clamp and init/append/probe all run the router path —
    * fine model in tables only, coarse router stored. `unclamped`
    * hash-proves the fine model really is bigger than the clamp (the
    * old behavior would have trained exactly 8 cells), recall proves
    * the routed probe still finds the true neighbors.
    */
  private def annDist(s: SparkSession, d: String): DataFrame = {
    val (cat, _) = copiedAnnIndex(s, d, "dist")
    val unclamped = s.table(s"$cat.r.main.ann.centroids").count() > 8 &&
      s.table(s"$cat.r.main.ann.coarse").count() > 0
    val hits = annIndexProbe(s, cat, "r", "main", queriesSet(s, d))
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"))
    persistRecallRow(s, d, hits, 0.4, Seq(lit(unclamped).as("unclamped")))
  }

  /** Symmetric per-dimension INT8 quantization of the embedding corpus
    * — the 4× memory cut a 100 TB embedding store takes before serving
    * (and the scalar-quantization baseline next to the PQ path above):
    * per-dim scale = max|x| over the corpus, code = clamp±127 of
    * round-half-up(x/scale·127), all in one (dim)-grained aggregate
    * (64 rows, broadcast back) plus a row-local encode pass. The gate
    * emits per vector the exact CODE SUM (order-independent, so the
    * hash proves every individual code) and the 6-dp max reconstruction
    * error — a single drifted code or a wrong scale flips the hash.
    */
  private def quantizeInt8(s: SparkSession, d: String): DataFrame = {
    val e = T.embeddings(s, d)
      .select(col("vec_id"), posexplode(toDoubleVec(col("embedding"))))
      .toDF("vec_id", "pos", "x")
      .localCheckpoint() // feeds BOTH the scales aggregate and the encode
    val scales = e.groupBy(col("pos")).agg(max(abs(col("x"))).as("scale"))
    e.join(broadcast(scales), Seq("pos"))
      .withColumn("code", when(col("scale") === 0, lit(0L)).otherwise(
        greatest(lit(-127L),
          least(lit(127L), floor(col("x") / col("scale") * 127 + 0.5)))))
      .withColumn("err", abs(col("code") * col("scale") / 127 - col("x")))
      .groupBy(col("vec_id"))
      .agg(sum(col("code")).as("code_sum"),
        round(max(col("err")), 6).as("max_err"))
      .orderBy(col("vec_id"))
  }

  /** QUANTIZED SERVING — top-k over the INT8-reconstructed store (the
    * query path a 4×-compressed embedding serving tier actually runs,
    * completing [[quantizeInt8]]'s encode with its decode+search half):
    * per-dim symmetric INT8 codes reconstruct as code·scale/127 and the
    * brute top-k runs over the RECONSTRUCTED vectors — one (dim)-grained
    * scale aggregate broadcast back, a row-local encode/decode pass, the
    * same size-guarded broadcast + codegen'd dot kernel as
    * [[bruteForceImpl]]. Every step is engine-replayable integer/double
    * arithmetic, so unlike the recall-bounded ANN gates this one is
    * HASH-EXACT: DuckDB reproduces every code, every reconstructed
    * coordinate, and every ranked neighbor bit-for-bit.
    */
  private def annQuantized(s: SparkSession, d: String): DataFrame = {
    val e = T.embeddings(s, d)
      .select(col("vec_id"), posexplode(toDoubleVec(col("embedding"))))
      .toDF("vec_id", "pos", "x")
      .localCheckpoint() // feeds the scale aggregate AND the encode
    val scales = e.groupBy(col("pos")).agg(max(abs(col("x"))).as("scale"))
    val recon = e.join(broadcast(scales), Seq("pos"))
      .withColumn("code", when(col("scale") === 0, lit(0L)).otherwise(
        greatest(lit(-127L),
          least(lit(127L), floor(col("x") / col("scale") * 127 + 0.5)))))
      .withColumn("r", col("code") * col("scale") / 127)
      .groupBy(col("vec_id"))
      .agg(sort_array(collect_list(struct(col("pos"), col("r")))).as("ds"))
      .select(col("vec_id"), expr("transform(ds, d -> d.r)").as("rv"))
      .withColumn("rn", l2norm(col("rv")))
      .localCheckpoint() // feeds BOTH sides of the search
    val qs = recon.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("rv").as("qv"),
        col("rn").as("qn"))
    // same size-guarded broadcast dispatch as scoredPairs: a huge query
    // batch falls back to the non-broadcast join rather than OOMing
    val qSide = if (qs.count() <= 500000) broadcast(qs) else qs
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    recon
      .select(col("vec_id").as("neighbor_id"), col("rv").as("nv"),
        col("rn").as("nn"))
      .join(qSide, col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6)
          .as("cos_sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .orderBy(col("query_id"), col("rank"))
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
    Q("sim_ann_persist", RecallGateOracle)(annPersist),
    Q(
      "sim_ann_filtered",
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, true AS recall_ok,
        |       true AS all_allowed
        |FROM embeddings WHERE vec_id % 50 = 0""".stripMargin
    )(annFiltered),
    Q(
      "sim_quantize_int8",
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |x AS (SELECT vec_id, unnest(v) AS x,
        |             unnest(generate_series(1, len(v))) AS pos FROM e),
        |s AS (SELECT pos, max(abs(x)) AS scale FROM x GROUP BY pos),
        |c AS (SELECT x.vec_id,
        |        CASE WHEN s.scale = 0 THEN 0
        |             ELSE greatest(-127, least(127, floor(x.x / s.scale * 127 + 0.5))) END AS code,
        |        s.scale, x.x
        |      FROM x JOIN s USING (pos))
        |SELECT vec_id, CAST(sum(code) AS BIGINT) AS code_sum,
        |       round(max(abs(code * scale / 127 - x)), 6) AS max_err
        |FROM c GROUP BY vec_id ORDER BY vec_id""".stripMargin
    )(quantizeInt8),
    Q(
      "sim_ann_quantized",
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |           FROM embeddings),
         |x AS (SELECT vec_id, unnest(v) AS x,
         |             unnest(generate_series(1, len(v))) AS pos FROM e),
         |s AS (SELECT pos, max(abs(x)) AS scale FROM x GROUP BY pos),
         |r AS (SELECT x.vec_id, x.pos,
         |        CASE WHEN s.scale = 0 THEN CAST(0 AS DOUBLE)
         |             ELSE greatest(-127, least(127,
         |                    floor(x.x / s.scale * 127 + 0.5)))
         |                  * s.scale / 127 END AS r
         |      FROM x JOIN s USING (pos)),
         |rv AS (SELECT vec_id, list(r ORDER BY pos) AS rv FROM r
         |       GROUP BY vec_id),
         |q AS (SELECT vec_id AS query_id, rv AS qv FROM rv
         |      WHERE vec_id % 50 = 0)
         |SELECT query_id, neighbor_id, cos_sim, rank FROM (
         |  SELECT q.query_id, n.vec_id AS neighbor_id,
         |         round(list_sum(list_transform(list_zip(q.qv, n.rv), p -> p[1] * p[2])) /
         |               (sqrt(list_sum(list_transform(q.qv, x -> x * x))) *
         |                sqrt(list_sum(list_transform(n.rv, x -> x * x)))), 6) AS cos_sim,
         |         row_number() OVER (PARTITION BY q.query_id
         |                            ORDER BY round(list_sum(list_transform(list_zip(q.qv, n.rv), p -> p[1] * p[2])) /
         |                                           (sqrt(list_sum(list_transform(q.qv, x -> x * x))) *
         |                                            sqrt(list_sum(list_transform(n.rv, x -> x * x)))), 6) DESC,
         |                            n.vec_id) AS rank
         |  FROM q JOIN rv n ON n.vec_id <> q.query_id) t
         |WHERE rank <= $K
         |ORDER BY query_id, rank""".stripMargin
    )(annQuantized),
    Q(
      "sim_ann_retire",
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, true AS recall_ok,
        |       true AS no_retired
        |FROM embeddings WHERE vec_id % 50 = 0""".stripMargin
    )(annRetire),
    Q(
      "sim_ann_dist",
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, true AS recall_ok,
        |       true AS unclamped
        |FROM embeddings WHERE vec_id % 50 = 0""".stripMargin
    )(annDist)
  )
}
