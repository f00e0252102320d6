package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.versioned.{GraftRepo, Json, TableOps}

/** CDC streaming read of a graft table's OWN commit log — the
  * retraction-aware counterpart of the raw-append native stream
  * ([[GraftMicroBatchStream]]), and the graft-side twin of the external
  * `iceberg-changes` CDC mode:
  *
  * {{{
  * spark.readStream.format("graft-changes")
  *   .option("table", "db.t").option("branch", "main")
  *   .load("/path/to/repo/root")
  * }}}
  *
  * Each micro-batch emits the NET row changes of a commit range as
  * `table schema + _change_type` ('insert'|'delete') via
  * [[graft.versioned.TableOps.changesBetween]]: merge-on-read and
  * copy-on-write deletes stream as retractions, updates as
  * delete+insert of the modified rows only, compactions net to zero —
  * where the raw-append stream either re-emits rewritten rows or sees
  * nothing. Offsets name the COMMIT consumed through (an immutable id;
  * the initial batch is the full live table as inserts, or nothing
  * with `startFrom=latest`). Cost per batch is the changesBetween
  * contract — O(files the two snapshots disagree on), never a table
  * re-read. Batch staging/replay mechanics live in
  * [[StagedCdcStream]].
  *
  * Replayable as long as the offset commit's snapshot metadata exists
  * (`CALL expire_snapshots` with an age guard shorter than consumer
  * lag breaks resumability — the standard retention contract).
  */
final class GraftChangesProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-changes"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (repo, branch, key) = GraftChangesProvider.resolve(options)
    val head = repo.resolve(branch)
    val snap = repo.snapshot(head.tables.getOrElse(key,
      throw new NoSuchElementException(s"no such table: $key @ $branch")))
    val base = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    StructType(base.fields :+
      StructField("_change_type", StringType, nullable = false))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val (repo, branch, key) = GraftChangesProvider.resolve(opts)
    new GraftChangesTable(repo, branch, key, schema)
  }
}

private object GraftChangesProvider {
  // one live handle per repo root: every stream start resolves twice
  // (inferSchema, then getTable) and repeated opens would each rebuild
  // the repo's caches just to throw them away
  private val repos =
    new java.util.concurrent.ConcurrentHashMap[String, GraftRepo]()

  def resolve(options: CaseInsensitiveStringMap)
      : (GraftRepo, String, String) = {
    val root = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-changes needs a path: .load(<repo root>)"))
    val table = Option(options.get("table")).getOrElse(
      throw new IllegalArgumentException(
        "graft-changes needs .option(\"table\", \"db.t\")"))
    (repos.computeIfAbsent(root,
      r => GraftRepo.open(java.nio.file.Paths.get(r))),
      options.getOrDefault("branch", "main"),
      table.replace('.', '/'))
  }
}

final class GraftChangesTable(repo: GraftRepo, branch: String, key: String,
    schema0: StructType) extends Table with SupportsRead {
  override def name(): String = s"graft-changes($key@$branch)"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.Set.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = schema0
      override def toMicroBatchStream(checkpointLocation: String)
          : MicroBatchStream =
        new GraftCdcMicroBatchStream(repo, branch, key, schema0,
          startFromLatest =
            options.getOrDefault("startFrom", "earliest") == "latest",
          checkpointLoc = Option(checkpointLocation).filter(_.nonEmpty),
          maxStepsPerTrigger =
            Option(options.get("maxCommitsPerTrigger")).map(_.toInt))
    }
}

/** Offset: the commit id consumed THROUGH (`"" ` ⇒ nothing yet — the
  * next batch is the initial full-table insert load).
  */
final case class GraftCdcOffset(commit: String) extends Offset {
  override def json(): String = Json.write(Map("commit" -> commit))
}

final class GraftCdcMicroBatchStream(repo: GraftRepo, branch: String,
    key: String, protected val cdcSchema: StructType,
    startFromLatest: Boolean,
    protected val checkpointLoc: Option[String],
    protected val maxStepsPerTrigger: Option[Int] = None)
    extends StagedCdcStream {

  override protected def stageName: String = "graft-cdc-staged"
  // commit ids are c<sha1-hex> — filesystem-safe as-is
  override protected def tagOf(token: String): String =
    if (token.isEmpty) "0" else token

  override protected def computeDiff(from: Option[String],
      to: String): DataFrame =
    TableOps.changesBetween(SparkSession.active, repo, from, to, key)

  override protected def headToken: String = repo.resolve(branch).id

  /** `maxCommitsPerTrigger` stride: walk the head's first-parent chain
    * back to `from` and pick the `steps`-th commit past it WHOSE TABLE
    * SNAPSHOT CHANGED — commits that only touched other tables (or
    * predate the table) are free to cross, their diff is empty, and a
    * commit without the table can never be a diff endpoint. A `from`
    * that is not on the chain (branch reset/rewrite) falls through to
    * the head — changesBetween diffs the two STATES, not the path
    * between them. Walk cost is O(backlog commits).
    */
  override protected def boundedHead(from: String, steps: Int): String = {
    val head = headToken
    if (head == from) return head
    val chain =
      scala.collection.mutable.ListBuffer.empty[(String, Option[String])]
    var cur = head
    while (cur.nonEmpty && cur != from) {
      val c = repo.commit(cur)
      chain.prepend((cur, c.tables.get(key)))
      cur = c.parents.headOption.getOrElse("")
    }
    if (cur != from && from.nonEmpty) return head // off-chain from
    var prev =
      if (from.isEmpty) None else repo.commit(from).tables.get(key)
    val changes = chain.flatMap { case (id, snap) =>
      val changed = snap != prev
      prev = snap
      if (changed && snap.isDefined) Some(id) else None
    }
    if (changes.size <= steps) head else changes(steps - 1)
  }

  private def parseOffset(json: String): String = {
    val m = Json.readAny(json).asInstanceOf[Map[String, Any]]
    require(m.contains("commit"),
      s"offset $json is not a graft-changes CDC offset — this " +
        "checkpoint belongs to a different source; start the CDC " +
        "stream with a fresh checkpointLocation")
    m("commit").asInstanceOf[String]
  }

  override protected def tokenOf(o: Offset): String = o match {
    case c: GraftCdcOffset => c.commit
    case other => parseOffset(other.json())
  }

  override def initialOffset(): Offset =
    GraftCdcOffset(if (startFromLatest) headToken else "")

  override protected def mkOffset(token: String): Offset =
    GraftCdcOffset(token)

  override def deserializeOffset(json: String): Offset =
    GraftCdcOffset(parseOffset(json))

  override def toString: String = s"GraftCdcMicroBatchStream($key@$branch)"
}
