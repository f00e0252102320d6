package graft

import java.nio.file.Files

import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.sql.sources

import graft.versioned.{FileEntry, GraftRepo, Manifests, PartitionField, TableOps, Trees}

/** Metadata-layer SCALE micro-bench (no Spark session, no data files):
  * times the r7 segmentation claims at representative scale —
  *
  *  1. append COMMIT on a 1M-file table: manifest-segmented
  *     (O(changed files) objects) vs forced-inline (O(total files)
  *     JSON rewrite per commit);
  *  2. cold TABLE RESOLVE in a 10k-table repo: tree-segmented point
  *     lookup (one chunk) vs inline (whole-map parse);
  *  3. cold partition-pruned PLANNING over a 1M-file, 1024-partition
  *     table: chunks loaded should track the selected partition, not
  *     the table.
  *
  * Emits ONE JSON line (same contract as graft.Bench) for BASELINE.md.
  * Sizes via env: GRAFT_METABENCH_FILES (default 1,000,000),
  * GRAFT_METABENCH_TABLES (default 10,000). The correctness-side
  * regression gates (chunk reads == expected, object-count growth)
  * live in ManifestSpec/TreeSpec; this main records wall times.
  */
object MetaBench {

  private def ms[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e6)
  }

  private def withProp[A](k: String, v: String)(f: => A): A = {
    val old = Option(System.getProperty(k))
    System.setProperty(k, v)
    try f
    finally old.fold[AnyRef](System.clearProperty(k))(System.setProperty(k, _))
  }

  private val schemaJson = StructType(Seq(
    StructField("id", IntegerType), StructField("cat", StringType))).json

  /** Files are CLUSTERED by partition (contiguous runs), the layout a
    * partitioned writer actually produces — each manifest chunk then
    * spans few distinct tuples and gets a partition summary. A
    * round-robin layout would exceed PartSummaryMax in every chunk and
    * (correctly) disable summary pruning.
    */
  private def entry(i: Int, nFiles: Int, parts: Int): FileEntry =
    FileEntry(f"data/f$i%07d.parquet", rows = 100L,
      min = Map.empty, max = Map.empty,
      partitionValues = Some(Map("cat" -> s"c${i / math.max(1, nFiles / parts)}")),
      bytes = Some(1L << 20), seq = Some(1L))

  def main(args: Array[String]): Unit = {
    val nFiles = sys.env.getOrElse("GRAFT_METABENCH_FILES", "1000000").toInt
    val nTables = sys.env.getOrElse("GRAFT_METABENCH_TABLES", "10000").toInt
    val parts = 1024
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Any]
    out += ("files" -> nFiles)
    out += ("tables" -> nTables)

    // ---- 1. append commit: segmented vs inline -------------------------
    def appendBench(inline: Boolean): (Double, Double) = {
      val max = if (inline) Int.MaxValue.toString else "256"
      withProp("graft.manifest.inline.max", max) {
        val repo = GraftRepo.init(
          operators.GateScratch.register(Files.createTempDirectory(s"metabench-a$inline")))
        val base = (0 until nFiles).map(entry(_, nFiles, parts))
        val spec = Some(Seq(PartitionField("cat", "identity", "cat")))
        val (s0, initMs) = ms(repo.writeSnapshot("db/t", schemaJson, base, spec))
        var sid = s0.id
        val appends = if (inline) 2 else 5
        val times = (1 to appends).map { k =>
          val loaded = repo.snapshot(sid)
          val delta = (0 until 100).map(j => entry(nFiles + k * 100 + j, nFiles, parts))
          val (s, t) = ms(repo.writeSnapshot("db/t", schemaJson,
            Manifests.appended(loaded.files, delta), spec))
          sid = s.id
          t
        }.sorted
        (initMs, times(times.size / 2))
      }
    }
    val (segInit, segAppend) = appendBench(inline = false)
    out += ("commit_init_segmented_ms" -> math.round(segInit))
    out += ("commit_append_segmented_ms" -> math.round(segAppend))
    val (inlInit, inlAppend) = appendBench(inline = true)
    out += ("commit_init_inline_ms" -> math.round(inlInit))
    out += ("commit_append_inline_ms" -> math.round(inlAppend))

    // ---- 2. cold table resolve in an nTables repo ----------------------
    def resolveBench(inline: Boolean): Double = {
      val max = if (inline) Int.MaxValue.toString else "256"
      withProp("graft.tree.inline.max", max) {
        val repo = GraftRepo.init(
          operators.GateScratch.register(Files.createTempDirectory(s"metabench-r$inline")))
        val sid = repo.writeSnapshot("db/shared", schemaJson, Nil).id
        val tables = (0 until nTables).map(i => f"db/t$i%05d" -> sid).toMap
        repo.commitRetry("main", "bulk") { base => (tables, base.namespaces) }
        val probes = (0 until 20).map { i =>
          Trees.clearCache()
          val key = f"db/t${(i * 487) % nTables}%05d"
          ms(repo.headCommit("main").tables.get(key))._2
        }.sorted
        probes(probes.size / 2)
      }
    }
    val segResolve = resolveBench(inline = false)
    out += ("resolve_segmented_ms" -> (math.round(segResolve * 100) / 100.0))
    out += ("resolve_tree_chunk_reads" -> {
      // gate-style observability: one cold point-get reads exactly 1 chunk
      withProp("graft.tree.inline.max", "256") {
        val repo = GraftRepo.init(operators.GateScratch.register(Files.createTempDirectory("metabench-rc")))
        val sid = repo.writeSnapshot("db/shared", schemaJson, Nil).id
        val tables = (0 until nTables).map(i => f"db/t$i%05d" -> sid).toMap
        repo.commitRetry("main", "bulk") { base => (tables, base.namespaces) }
        Trees.clearCache()
        val before = Trees.chunkReadCount
        repo.headCommit("main").tables.get("db/t04999")
        Trees.chunkReadCount - before
      }
    })
    val inlResolve = resolveBench(inline = true)
    out += ("resolve_inline_ms" -> (math.round(inlResolve * 100) / 100.0))

    // ---- 2b. paged LISTING in an nTables repo: seek vs full walk -------
    // the REST listTables shape (r14): a cold mid-listing page of 100
    // binary-ranges the sorted chunk refs to the token and loads O(page)
    // chunks; the r13 shape materialized + sorted the WHOLE map per page
    withProp("graft.tree.inline.max", "256") {
      val repo = GraftRepo.init(operators.GateScratch.register(Files.createTempDirectory("metabench-l")))
      val sid = repo.writeSnapshot("db/shared", schemaJson, Nil).id
      val tables = (0 until nTables).map(i => f"db/t$i%05d" -> sid).toMap
      repo.commitRetry("main", "bulk") { base => (tables, base.namespaces) }
      val token = f"db/t${nTables / 2}%05d"
      def coldLazy = repo.headCommit("main").tables
        .asInstanceOf[Trees.LazyTableMap]
      val pages = (0 until 20).map { _ =>
        Trees.clearCache()
        val m = coldLazy
        ms(m.iteratorFrom(Some(token)).take(100).toList)._2
      }.sorted
      out += ("list_page_seek_ms" ->
        (math.round(pages(pages.size / 2) * 100) / 100.0))
      Trees.clearCache()
      val before = Trees.chunkReadCount
      coldLazy.iteratorFrom(Some(token)).take(100).toList
      out += ("list_page_chunk_reads" -> (Trees.chunkReadCount - before))
      val walks = (0 until 5).map { _ =>
        Trees.clearCache()
        val m = repo.headCommit("main").tables
        ms(m.toSeq.sortBy(_._1).dropWhile(_._1 <= token).take(100))._2
      }.sorted
      out += ("list_page_fullwalk_ms" -> math.round(walks(walks.size / 2)))
    }

    // ---- 3. cold partition-pruned planning -----------------------------
    {
      val repo = GraftRepo.init(operators.GateScratch.register(Files.createTempDirectory("metabench-p")))
      val schema = StructType(Seq(
        StructField("id", IntegerType), StructField("cat", StringType)))
      val files = (0 until nFiles).map(entry(_, nFiles, parts))
      val snap = repo.writeSnapshot("db/t", schemaJson, files,
        Some(Seq(PartitionField("cat", "identity", "cat"))))
      val loaded = repo.snapshot(snap.id)
      // JIT/classload warmup on another partition, then cold CACHE only
      TableOps.pruneFiles(loaded, schema, Seq(sources.EqualTo("cat", "c3")))
      Manifests.clearCache()
      val before = Manifests.chunkReadCount
      val (hit, t) = ms(TableOps.pruneFiles(loaded, schema,
        Seq(sources.EqualTo("cat", "c7"))))
      val read = Manifests.chunkReadCount - before
      val total = loaded.manifestRefs.size
      out += ("plan_pruned_ms" -> math.round(t))
      out += ("plan_pruned_files" -> hit.size)
      out += ("plan_chunks_read" -> read)
      out += ("plan_chunks_total" -> total)
      // cold FULL materialization for contrast
      Manifests.clearCache()
      val (_, tf) = ms(loaded.files.iterator.count(_ => true))
      out += ("plan_full_ms" -> math.round(tf))
    }

    val json = out.map {
      case (k, v: String) => s""""$k":"$v""""
      case (k, v) => s""""$k":$v"""
    }.mkString("{\"metric\":\"graft_meta\",", ",", "}")
    // ONE JSON line on stdout (driver/bench-log contract)
    println(json)
  }
}
