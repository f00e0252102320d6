package graft.operators

/** Temp dirs created by oracle-gate fixtures (per-run catalogs, the
  * persisted dedup/ANN indexes): they must outlive the gate call — the
  * returned DataFrame reads them lazily when the driver materializes
  * the result — so they are reclaimed by a JVM shutdown hook, keeping
  * repeated verify/bench rounds from accreting corpus-sized copies in
  * /tmp (the same failure mode Streaming's staged-dir cleanup covers
  * for the event streams).
  */
private[graft] object GateScratch {
  private val dirs = java.util.Collections.synchronizedList(
    new java.util.ArrayList[java.nio.file.Path]())

  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    dirs.forEach { d =>
      try
        scala.util.Using.resource(java.nio.file.Files.walk(d))(
          _.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(p => { java.nio.file.Files.deleteIfExists(p); () }))
      catch { case _: Exception => () } // best-effort exit cleanup
    }))

  def register(d: java.nio.file.Path): java.nio.file.Path = {
    dirs.add(d)
    d
  }

  /** Stage one streaming-ingestion micro-batch as a single parquet
    * file with a controlled mtime (the file source orders micro-batches
    * by mtime) — shared by the streaming lifecycle gates
    * (st_dedup_persist, st_ann_persist), so the staging protocol can
    * never diverge between them.
    */
  def stageParquetBatch(dir: java.nio.file.Path, name: String,
      df: org.apache.spark.sql.DataFrame, mtimeOffset: Long): Unit = {
    import scala.jdk.CollectionConverters._
    val tmp = dir.resolve(s"z_$name")
    df.coalesce(1).write.parquet(tmp.toString)
    val part = scala.util.Using.resource(java.nio.file.Files.list(tmp))(
      _.iterator().asScala.find(_.toString.endsWith(".parquet")).get)
    val out = dir.resolve(s"$name.parquet")
    java.nio.file.Files.move(part, out)
    java.nio.file.Files.setLastModifiedTime(out,
      java.nio.file.attribute.FileTime
        .fromMillis(System.currentTimeMillis() + mtimeOffset))
  }

  /** Recursive file-tree copy (template → per-gate working copy — the
    * vc fixture-template trick for the dd/ann lifecycle gates). */
  def copyTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit =
    scala.util.Using.resource(java.nio.file.Files.walk(src))(
      _.forEach { p =>
        val to = dst.resolve(src.relativize(p))
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(to)
        else java.nio.file.Files.copy(p, to,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      })
}
