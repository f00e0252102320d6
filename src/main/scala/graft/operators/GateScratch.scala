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
