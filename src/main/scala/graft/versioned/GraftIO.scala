package graft.versioned

import java.nio.file.{Files, Path, StandardOpenOption}
import java.util.UUID
import scala.jdk.CollectionConverters._
import scala.util.Using

/** Storage seam for every repo METADATA/sidecar byte the engine reads or
  * writes (commits, snapshots, refs, tags, bloom sidecars, purge). The
  * reference scopes all storage behind one FileIO for the same reason
  * (LakeFSFileIO.java:24 wraps any Hadoop FS into a repo+ref scope): the
  * engine must not care whether bytes live on a local disk, HDFS or an
  * object store. Data files (parquet) are written/read by Spark itself
  * and already go through Hadoop's FileSystem abstraction — this trait
  * covers the driver-side metadata I/O that would otherwise hard-wire
  * `java.nio` into every commit path.
  *
  * Contract every backend MUST supply:
  *
  *  - '''createExclusive is an atomic set-if-absent publish''': the call
  *    either (a) makes the FULL content visible at `path` and returns
  *    true, or (b) changes nothing and returns false because `path`
  *    already exists — even under concurrent callers. This is THE commit
  *    primitive: branch CAS, tag creation and commit/snapshot object
  *    writes all build on it (same role as the reference's fail-if-exists
  *    metadata write, LakeFSTableOperations.java:115-147). On a local FS
  *    it's a temp-file write + hard-link (below). On S3 it needs
  *    `If-None-Match: *` conditional PUT; on stores without one, an
  *    external coordinator (e.g. a DynamoDB conditional put) must guard
  *    the publish. A backend that implements createExclusive with
  *    check-then-write is BROKEN — two racing committers would both win.
  *  - Reads of existing objects are plain gets: metadata objects are
  *    immutable once published, so no read-after-overwrite anomalies
  *    exist by construction.
  *  - `list`/`walk` must reflect every completed createExclusive/write
  *    (S3 is strongly consistent since 2020; stores that aren't need a
  *    manifest layer).
  *  - `overwrite` is only used for non-racing maintenance writes (bloom
  *    sidecars, keyed by their immutable data file) — last-writer-wins
  *    is acceptable there and nowhere else.
  */
trait GraftIO {
  /** Atomic set-if-absent publish of `content` (see contract above).
    * @return true if this call published; false if `path` already existed. */
  def createExclusive(path: Path, content: String): Boolean

  /** Overwrite-allowed write (maintenance artifacts only — see contract). */
  def overwrite(path: Path, content: Array[Byte]): Unit

  def readString(path: Path): String
  def readBytes(path: Path): Array[Byte]

  /** Immediate children (not recursive); empty when `path` isn't a dir. */
  def list(path: Path): Seq[Path]
  /** Recursive descendants including `path` itself, depth-first order. */
  def walk(path: Path): Seq[Path]

  def isDirectory(path: Path): Boolean
  def isFile(path: Path): Boolean
  def size(path: Path): Long
  def mtimeMs(path: Path): Long

  def mkdirs(path: Path): Unit
  def delete(path: Path): Unit
  def deleteIfExists(path: Path): Boolean
  /** Best-effort freshness bump: advance `path`'s mtime to now so
    * age-guarded GC sweeps treat the object as freshly written. Called
    * when a content-addressed chunk is REUSED (createExclusive observed
    * "already exists"): the chunk may be an orphan a concurrent
    * [[GraftRepo.expireSnapshots]] pass already scanned, and the bump
    * puts it back inside the sweep's `olderThanMs` mtime guard until the
    * reusing writer's post-publish verifyLive has run. Backends that
    * cannot set mtimes (real object stores) may no-op — the sweep's
    * pre-delete reference re-check narrows the residual window there.
    */
  def touch(path: Path): Unit = ()

  /** Move `path` to `to`, failing if `to` exists. NOT guaranteed atomic:
    * object-store backends have no rename, so they copy-then-delete — a
    * crash in between may leave BOTH keys (callers must tolerate a
    * surviving source object; no engine metadata path relies on atomic
    * move). Filesystem backends use native atomic rename. */
  def move(path: Path, to: Path): Unit
}

/** Local-filesystem GraftIO. Set-if-absent = write a private temp file,
  * then hard-LINK it into place: link(2) atomically fails with EEXIST if
  * the target exists, and the full content is already durable when the
  * link appears — a crashed writer leaves only an orphan temp file,
  * never a partial object.
  */
final class LocalGraftIO extends GraftIO {
  override def createExclusive(path: Path, content: String): Boolean = {
    val tmp = path.resolveSibling(s".tmp-${UUID.randomUUID()}")
    Files.writeString(tmp, content, StandardOpenOption.CREATE_NEW)
    try { Files.createLink(path, tmp); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }
    finally Files.deleteIfExists(tmp)
  }
  override def overwrite(path: Path, content: Array[Byte]): Unit =
    Files.write(path, content)
  override def readString(path: Path): String = Files.readString(path)
  override def readBytes(path: Path): Array[Byte] = Files.readAllBytes(path)
  // streams closed eagerly (Using): these run on the driver once per
  // commit/read, so leaked directory fds add up
  override def list(path: Path): Seq[Path] =
    if (!Files.isDirectory(path)) Nil
    else Using.resource(Files.list(path))(_.iterator().asScala.toList)
  override def walk(path: Path): Seq[Path] =
    if (!Files.exists(path)) Nil
    else Using.resource(Files.walk(path))(_.iterator().asScala.toList)
  override def isDirectory(path: Path): Boolean = Files.isDirectory(path)
  override def isFile(path: Path): Boolean = Files.isRegularFile(path)
  override def size(path: Path): Long = Files.size(path)
  override def mtimeMs(path: Path): Long = Files.getLastModifiedTime(path).toMillis
  override def mkdirs(path: Path): Unit = Files.createDirectories(path)
  override def delete(path: Path): Unit = Files.delete(path)
  override def deleteIfExists(path: Path): Boolean = Files.deleteIfExists(path)
  override def touch(path: Path): Unit =
    try Files.setLastModifiedTime(path,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
    catch { case _: java.io.IOException => () } // vanished: verifyLive rewrites
  override def move(path: Path, to: Path): Unit = Files.move(path, to)
}

object LocalGraftIO {
  val instance: GraftIO = new LocalGraftIO
}

/** In-memory GraftIO: one concurrent map, no filesystem. Two jobs:
  *
  *  1. '''Executable proof the seam is complete''' — GraftIOSpec runs the
  *     whole version-graph lifecycle (init, commits, branch, tag, merge,
  *     cherry-pick, rollback, racing committers) against this backend;
  *     any engine code that slipped a direct `java.nio.Files` call past
  *     the seam would throw on the nonexistent paths.
  *  2. '''Reference shape for an object-store backend''' — the key-value
  *     model below is exactly S3's: no real directories (a "directory"
  *     exists iff keys live under its prefix, plus explicit markers from
  *     mkdirs, the way console-created S3 folders work), `putIfAbsent`
  *     as the atomic set-if-absent publish (S3: `If-None-Match: *`
  *     conditional PUT), strongly consistent list-after-put.
  *
  * Not a data-plane store: parquet data files go through Spark's own
  * Hadoop FileSystem — this backend only ever serves repo metadata.
  */
final class InMemoryGraftIO extends GraftIO {
  private val files =
    new java.util.concurrent.ConcurrentHashMap[String, (Array[Byte], Long)]()
  private val dirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def k(p: Path): String = p.toAbsolutePath.normalize.toString
  private def get(p: Path): (Array[Byte], Long) = {
    val v = files.get(k(p))
    if (v == null) throw new java.nio.file.NoSuchFileException(k(p))
    v
  }

  override def createExclusive(path: Path, content: String): Boolean =
    files.putIfAbsent(k(path),
      (content.getBytes("UTF-8"), System.currentTimeMillis())) == null
  override def overwrite(path: Path, content: Array[Byte]): Unit =
    files.put(k(path), (content, System.currentTimeMillis()))
  override def readString(path: Path): String =
    new String(get(path)._1, "UTF-8")
  override def readBytes(path: Path): Array[Byte] = get(path)._1

  override def list(path: Path): Seq[Path] = {
    import scala.jdk.CollectionConverters._
    val prefix = k(path) + "/"
    def firstSeg(key: String): Option[String] =
      if (key.startsWith(prefix))
        Some(key.substring(prefix.length).takeWhile(_ != '/'))
      else None
    (files.keySet().asScala.flatMap(firstSeg(_)) ++
      dirs.asScala.flatMap(firstSeg(_)))
      .filter(_.nonEmpty).toSeq.distinct.sorted
      .map(n => java.nio.file.Paths.get(k(path), n))
  }
  override def walk(path: Path): Seq[Path] = {
    import scala.jdk.CollectionConverters._
    val self = k(path)
    val prefix = self + "/"
    val under = (files.keySet().asScala ++ dirs.asScala)
      .filter(s => s == self || s.startsWith(prefix))
    // parents synthesized so callers' children-before-parent reverse
    // sorts behave like Files.walk output
    val withParents = under.flatMap { s =>
      Iterator.iterate(s)(x => x.substring(0, x.lastIndexOf('/')))
        .takeWhile(x => x.length >= self.length && x.contains('/'))
        .toSeq :+ self
    }
    withParents.toSeq.distinct.sorted.map(java.nio.file.Paths.get(_))
  }

  override def isDirectory(path: Path): Boolean = {
    import scala.jdk.CollectionConverters._
    val key = k(path)
    dirs.contains(key) || {
      val prefix = key + "/"
      files.keySet().asScala.exists(_.startsWith(prefix)) ||
        dirs.asScala.exists(_.startsWith(prefix))
    }
  }
  override def isFile(path: Path): Boolean = files.containsKey(k(path))
  override def size(path: Path): Long = get(path)._1.length.toLong
  override def mtimeMs(path: Path): Long = get(path)._2

  override def mkdirs(path: Path): Unit = {
    var p = path.toAbsolutePath.normalize
    while (p != null && p.getParent != null) { dirs.add(k(p)); p = p.getParent }
  }
  override def delete(path: Path): Unit =
    if (!deleteIfExists(path)) throw new java.nio.file.NoSuchFileException(k(path))
  override def deleteIfExists(path: Path): Boolean = {
    val key = k(path)
    if (files.remove(key) != null) true
    else if (dirs.contains(key)) {
      if (isDirectory(path) && list(path).nonEmpty)
        throw new java.nio.file.DirectoryNotEmptyException(key)
      dirs.remove(key)
    } else false
  }
  override def move(path: Path, to: Path): Unit = {
    val v = get(path) // throws NoSuchFileException like Files.move
    if (k(path) == k(to)) return // Files.move(p, p) is a no-op
    if (files.putIfAbsent(k(to), v) != null)
      throw new java.nio.file.FileAlreadyExistsException(k(to))
    files.remove(k(path))
  }
}
