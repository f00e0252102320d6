package graft.versioned

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

/** CONTINUOUS Iceberg export ("sync mode"): once a (ref, table) is
  * registered with an export directory, every subsequent commit that
  * advances that ref re-emits the table's Iceberg metadata there —
  * new `v<N>.metadata.json`, manifests and version-hint — so ANY
  * Iceberg-aware external engine sees each graft commit immediately,
  * the live visibility the reference gets structurally from its
  * tables BEING Iceberg (`LakeFSTableOperations.java:115-147` commits
  * metadata per write; version-hint at :210-231). Point-in-time
  * `iceberg_export` remains the one-shot form; sync is the standing
  * subscription.
  *
  * Mechanics: registrations live in `<repo>/iceberg-sync.json` (one
  * tiny JSON file; its absence is the O(1) fast path every commit
  * takes). After any successful ref advance ([[GraftRepo]]'s CAS — the
  * single funnel all commits, merges and rollbacks pass through), each
  * registration on that ref compares the table's current snapshot id
  * against the `graft.source-snapshot` recorded in the dest's newest
  * metadata version and re-exports only on drift — self-healing (a
  * missed or failed emission is repaired by the next commit) and
  * idempotent (no-op when the table didn't change). Re-emission is
  * O(files) driver work (the export is metadata-only), so following a
  * commit costs what the reference's own metadata commit costs.
  *
  * Failure posture: a broken emission (e.g. merge-on-read tombstones
  * with no active SparkSession to write positional deletes) WARNS and
  * leaves the export one version behind rather than failing the user's
  * commit — the graft table itself is the source of truth; the export
  * is a follower that catches up on the next commit.
  */
object IcebergSync {

  final case class Reg(ref: String, table: String, dest: String,
      snapshots: Int)

  private def regPath(root: Path): Path = root.resolve("iceberg-sync.json")

  private def mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.registerModule(com.fasterxml.jackson.module.scala.DefaultScalaModule)
    m
  }

  def registrations(root: Path): Seq[Reg] = {
    val p = regPath(root)
    if (!Files.exists(p)) Nil
    else mapper.readValue(Files.readString(p),
      classOf[Array[Reg]]).toSeq
  }

  /** Record a standing export; idempotent on (ref, table, dest). */
  def register(root: Path, reg: Reg): Unit = {
    val cur = registrations(root)
      .filterNot(r => r.ref == reg.ref && r.table == reg.table &&
        r.dest == reg.dest)
    Files.writeString(regPath(root),
      mapper.writeValueAsString((cur :+ reg).toArray))
  }

  /** Newest existing metadata version in `dest` (0 = none yet). */
  def latestVersion(dest: Path): Int = {
    val metaDir = dest.resolve("metadata")
    if (!Files.isDirectory(metaDir)) 0
    else {
      val Re = """v(\d+)\.metadata\.json""".r
      Files.list(metaDir).iterator().asScala
        .flatMap(p => p.getFileName.toString match {
          case Re(n) => Some(n.toInt)
          case _ => None
        }).maxOption.getOrElse(0)
    }
  }

  /** The graft snapshot id the dest's newest metadata was exported
    * from, or None when nothing readable is there yet.
    */
  private def exportedSnapshot(dest: Path): Option[String] = {
    val v = latestVersion(dest)
    if (v == 0) None
    else scala.util.Try {
      val meta = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(Files.readString(
          dest.resolve("metadata").resolve(s"v$v.metadata.json")))
      meta.get("properties").get("graft.source-snapshot").asText()
    }.toOption
  }

  /** Export the next metadata version into `dest` (used by both the
    * sync-mode CALL and the post-commit follower). Returns the written
    * metadata path.
    */
  def syncExport(repo: GraftRepo, reg: Reg,
      spark: Option[org.apache.spark.sql.SparkSession]): Path =
    IcebergExport.export(repo, reg.ref, reg.table,
      java.nio.file.Paths.get(reg.dest), spark, reg.snapshots,
      latestVersion(java.nio.file.Paths.get(reg.dest)) + 1)

  /** Post-ref-advance hook: re-emit every drifted registration on
    * `branch`. Never throws — see failure posture above.
    */
  def onRefAdvance(repo: GraftRepo, branch: String): Unit = {
    if (!Files.exists(regPath(repo.root))) return // per-commit fast path
    registrations(repo.root).filter(_.ref == branch).foreach { reg =>
      try {
        val sid = repo.resolve(branch).tables.get(reg.table)
        sid match {
          case Some(s) if !exportedSnapshot(
              java.nio.file.Paths.get(reg.dest)).contains(s) =>
            syncExport(repo, reg,
              org.apache.spark.sql.SparkSession.getActiveSession)
          case _ => () // table unchanged (or dropped): nothing to emit
        }
      } catch {
        case e: Throwable => System.err.println(
          s"[graft] WARNING: iceberg sync export of ${reg.table} @ " +
            s"$branch -> ${reg.dest} failed (${e.getMessage}); the " +
            "export is one version behind and will catch up on the " +
            "next commit")
      }
    }
  }
}
