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
  override def move(path: Path, to: Path): Unit = Files.move(path, to)
}

object LocalGraftIO {
  val instance: GraftIO = new LocalGraftIO
}
