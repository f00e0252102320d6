package graft.versioned

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Incrementally-refreshed MATERIALIZED views over graft tables.
  *
  * An MV is an ordinary versioned table holding a grouped aggregate of a
  * source table, plus a commit-id WATERMARK stored in its snapshot
  * properties: the commit whose source state the materialized rows
  * reflect. `refresh` reads ONLY the source files appended since the
  * watermark (the [[TableOps.appendsBetween]] delta — O(delta), never a
  * source rescan), aggregates them, combines with the affected existing
  * MV rows, and publishes combined rows + the new watermark in ONE
  * commit (crash-safe: a refresh either fully lands or leaves the old
  * watermark, so a retry re-applies the same delta exactly once). At
  * 100 TB this is the difference between an hourly dashboard costing a
  * scan of the last hour vs a scan of three years.
  *
  * Incremental maintenance needs decomposable aggregates: sum, count,
  * min, max (avg = sum/count at query time). Append-only sources only —
  * if the source saw deletes/rewrites/tombstones since the watermark,
  * refresh detects it from the snapshot file diff and falls back to a
  * FULL recompute (correctness over cleverness; min/max can't be
  * incrementally maintained under deletes).
  */
object MaterializedView {

  val SrcProp = "graft.mv.source"
  val SinceProp = "graft.mv.since"
  val GroupProp = "graft.mv.groupCols"
  val AggProp = "graft.mv.aggs" // fn:srcCol:outCol;... fn ∈ sum,count,min,max

  /** (fn, srcCol, outCol) aggregate spec entry. */
  type Agg = (String, String, String)

  private def aggColumn(fn: String, src: String, out: String): Column = fn match {
    case "sum" => sum(col(src)).as(out)
    case "count" => count(lit(1)).as(out)
    case "min" => min(col(src)).as(out)
    case "max" => max(col(src)).as(out)
    case other => throw new IllegalArgumentException(
      s"aggregate $other is not incrementally maintainable (use sum/count/min/max)")
  }

  /** How an existing MV value combines with a delta value. NULL handling
    * must mirror a full recompute: sum ignores NULL inputs (a delta
    * batch whose values for a group are all NULL must not null the
    * running sum), but a group that has ONLY ever seen NULLs stays NULL.
    * least/greatest already skip NULL operands.
    */
  private def combine(fn: String, existing: Column, delta: Column): Column = fn match {
    case "count" => coalesce(existing, lit(0L)) + delta
    case "sum" =>
      when(existing.isNull && delta.isNull, lit(null))
        .otherwise(coalesce(existing, lit(0L)) + coalesce(delta, lit(0L)))
    case "min" => least(existing, delta)
    case "max" => greatest(existing, delta)
    case other => throw new IllegalArgumentException(other)
  }

  private def aggregate(df: DataFrame, groupCols: Seq[String], aggs: Seq[Agg]): DataFrame = {
    val cols = aggs.map { case (fn, s, o) => aggColumn(fn, s, o) }
    df.groupBy(groupCols.map(col): _*).agg(cols.head, cols.tail: _*)
  }

  private def encodeAggs(aggs: Seq[Agg]): String =
    aggs.map { case (f, s, o) => s"$f:$s:$o" }.mkString(";")
  private def decodeAggs(s: String): Seq[Agg] =
    s.split(';').toIndexedSeq.map { e =>
      val Array(f, sc, o) = e.split(':'); (f, sc, o)
    }

  /** Full recompute + publish with the new watermark (create's sibling,
    * also the fallback when incremental maintenance isn't sound).
    */
  private def refreshFull(spark: SparkSession, repo: GraftRepo,
      branch: String, mvKey: String, head: Commit, curSnap: Snapshot,
      groupCols: Seq[String], aggs: Seq[Agg]): String = {
    val full = aggregate(TableOps.readSnapshot(spark, repo, curSnap),
      groupCols, aggs)
    val files = TableOps.writeFiles(spark, repo, full, mvKey)
    repo.commitRetry(branch, s"refresh mv $mvKey (full)") { base =>
      val cur = repo.snapshot(base.tables(mvKey))
      val snap = repo.writeSnapshot(mvKey, cur.schemaJson, files,
        cur.partitionBy, cur.physicalNames,
        Some(cur.properties + (SinceProp -> head.id)), cur.retired)
      (base.tables + (mvKey -> snap.id), base.namespaces)
    }
    "full"
  }

  /** Full-compute + create the MV table in one commit, watermarked at
    * the commit whose source state was read.
    */
  def create(spark: SparkSession, repo: GraftRepo, branch: String,
      srcKey: String, mvKey: String, groupCols: Seq[String],
      aggs: Seq[Agg]): Unit = {
    // the spec round-trips through ','/';'/':'-separated snapshot
    // properties — a column name containing a separator would silently
    // mis-parse on refresh, so reject it up front
    (groupCols ++ aggs.flatMap { case (f, s, o) => Seq(f, s, o) })
      .find(n => n.exists(c => c == ',' || c == ';' || c == ':'))
      .foreach { n =>
        throw new IllegalArgumentException(
          s"column name '$n' contains a reserved separator (',', ';', ':')")
      }
    val head = repo.headCommit(branch)
    val srcSnap = repo.snapshot(head.tables.getOrElse(srcKey,
      throw new NoSuchElementException(s"no such table: $srcKey")))
    val full = aggregate(TableOps.readSnapshot(spark, repo, srcSnap),
      groupCols, aggs)
    val schemaJson = full.schema.json
    val files = TableOps.writeFiles(spark, repo, full, mvKey)
    val props = Map(SrcProp -> srcKey, SinceProp -> head.id,
      GroupProp -> groupCols.mkString(","), AggProp -> encodeAggs(aggs))
    repo.commitRetry(branch, s"create materialized view $mvKey") { base =>
      if (base.tables.contains(mvKey))
        throw new IllegalArgumentException(s"table exists: $mvKey")
      val snap = repo.writeSnapshot(mvKey, schemaJson, files, None, None,
        Some(props))
      (base.tables + (mvKey -> snap.id), base.namespaces)
    }
  }

  /** Refresh. Returns the mode taken: "incremental" (delta merged),
    * "full" (source had non-append changes → recompute), or "noop"
    * (nothing new; watermark advanced).
    *
    * Run ONE refresher per MV at a time (the usual scheduler contract):
    * a refresh is crash-safe and re-runnable, but two CONCURRENT
    * refreshes race between reading the MV state and publishing, and
    * the optimistic rebase can't detect that the other's combined rows
    * were computed against a stale MV snapshot.
    */
  def refresh(spark: SparkSession, repo: GraftRepo, branch: String,
      mvKey: String): String = {
    val head = repo.headCommit(branch)
    val mvSnap = repo.snapshot(head.tables.getOrElse(mvKey,
      throw new NoSuchElementException(s"no such materialized view: $mvKey")))
    val props = mvSnap.properties
    val srcKey = props(SrcProp)
    val since = props(SinceProp)
    val groupCols = props(GroupProp).split(',').toIndexedSeq
    val aggs = decodeAggs(props(AggProp))
    val curSnap = repo.snapshot(head.tables.getOrElse(srcKey,
      throw new NoSuchElementException(s"mv source dropped: $srcKey")))
    // the watermark commit can be GONE (expire_snapshots GC'd it):
    // unresolvable watermark → full recompute, never a bricked MV
    val oldSnap = scala.util.Try(repo.resolve(since)).toOption
      .flatMap(_.tables.get(srcKey)).map(repo.snapshot)
    // idle source -> TRUE no-op: no commit, or every scheduled refresh of
    // an idle source would grow the commit log forever (and the refresh
    // commit itself advances head, making the next run "new" again)
    if (since == head.id || oldSnap.exists(_.id == curSnap.id)) return "noop"
    val oldPaths = oldSnap.map(_.files.map(_.path).toSet).getOrElse(Set.empty)
    val appendOnly = oldSnap.isDefined &&
      oldPaths.subsetOf(curSnap.files.map(_.path).toSet) &&
      oldSnap.map(Tombstones.signature).getOrElse(Set.empty) ==
        Tombstones.signature(curSnap)
    def bumpWatermark(mode: String): String = {
      repo.commitRetry(branch, s"refresh mv $mvKey ($mode)") { base =>
        val cur = repo.snapshot(base.tables(mvKey))
        val snap = repo.writeSnapshot(mvKey, cur.schemaJson, cur.files,
          cur.partitionBy, cur.physicalNames,
          Some(cur.properties + (SinceProp -> head.id)), cur.retired)
        (base.tables + (mvKey -> snap.id), base.namespaces)
      }
      mode
    }
    if (!appendOnly) {
      // deletes/rewrites/tombstones since the watermark: recompute
      refreshFull(spark, repo, branch, mvKey, head, curSnap, groupCols, aggs)
    } else {
      val delta = TableOps.appendsBetween(spark, repo, since, head.id, srcKey)
      if (delta.isEmpty) bumpWatermark("noop")
      else {
        val deltaAgg = aggregate(delta, groupCols, aggs).localCheckpoint()
        // NULL group keys break the equality join below AND upsert's key
        // match (SQL equality never matches NULL): recompute instead of
        // silently duplicating the NULL group's row. deltaAgg is tiny.
        val nullGroup = deltaAgg
          .filter(groupCols.map(col(_).isNull).reduce(_ || _))
          .limit(1).count() > 0
        if (nullGroup) return refreshFull(spark, repo, branch, mvKey, head,
          curSnap, groupCols, aggs)
        val mvDf = TableOps.readSnapshot(spark, repo, mvSnap)
        // delta groups join their existing MV row (left: new groups get
        // nulls → combine() seeds them); untouched groups never move
        val outCols = groupCols.map(g => col(s"d.$g").as(g)) ++
          aggs.map { case (fn, _, o) =>
            combine(fn, col(s"m.$o"), col(s"d.$o")).as(o)
          }
        val combined = deltaAgg.as("d")
          .join(mvDf.as("m"),
            groupCols.map(g => col(s"d.$g") === col(s"m.$g")).reduce(_ && _),
            "left")
          .select(outCols: _*)
        // combined rows + the new watermark land in ONE commit
        TableOps.upsert(spark, repo, branch, mvKey, combined, groupCols,
          extraProps = Map(SinceProp -> head.id))
        "incremental"
      }
    }
  }
}
