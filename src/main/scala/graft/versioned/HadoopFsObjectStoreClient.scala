package graft.versioned

import org.apache.hadoop.fs.{FileAlreadyExistsException => HFileExists, FileSystem, Path => HPath}

/** [[ObjectStoreClient]] over `org.apache.hadoop.fs.FileSystem` — the
  * PRODUCTION binding for the object-store metadata plane without
  * adding a single dependency: Spark already ships the Hadoop client,
  * and every real store publishes a Hadoop connector (`s3a://`,
  * `gs://`, `abfs://`, `hdfs://`). Pointing this client at an S3A
  * filesystem with conditional writes enabled (Hadoop 3.4.1+,
  * HADOOP-19256: create(overwrite=false) maps to S3 `If-None-Match:*`)
  * gives [[ObjectStoreGraftIO]]'s commit protocol real S3 semantics;
  * pointing it at `file://` (raw, checksum-free) gives the test
  * topology where Spark's parquet writes and the metadata plane see
  * the same bytes — the same split the reference gets from scoping a
  * Hadoop FS per repo+ref (LakeFSFileIO.java:24-67).
  *
  * Key mapping: a key is an absolute path; the ObjectStoreGraftIO
  * `'<dir>/'` marker convention maps onto REAL directories here —
  * marker puts become mkdirs, marker gets become directory probes, and
  * listKeys emits a trailing-slash pseudo-key per (possibly empty)
  * subdirectory so empty directories stay visible, exactly like the
  * in-memory store's marker objects.
  *
  * Durability caveats (documented, not hidden): on HDFS/local,
  * `create(overwrite=false)` is exclusive but bytes stream — a reader
  * racing a writer can observe a partial file, unlike a real object
  * store's whole-object publish. Object-store connectors (S3A) publish
  * at close, so the whole-object contract holds where it matters.
  * Exclusive create is atomic everywhere: HDFS and conditional-write
  * S3A natively; the raw LOCAL FS via O_EXCL (`CREATE_NEW`) since
  * Hadoop's own local create is check-then-create and would let two
  * racing committers both "win".
  */
final class HadoopFsObjectStoreClient(fs: FileSystem) extends ObjectStoreClient {
  import ObjectStoreClient._

  private val localRaw =
    fs.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem]

  private def p(key: String): HPath = new HPath(key.stripSuffix("/"))
  private def isMarker(key: String): Boolean = key.endsWith("/")

  override def put(key: String, bytes: Array[Byte],
      ifNoneMatch: Boolean): PutResult = {
    if (isMarker(key)) { fs.mkdirs(p(key)); return PutResult.Ok }
    if (ifNoneMatch) {
      if (localRaw) {
        // Hadoop's local create(overwrite=false) is check-then-create —
        // two racing committers could both pass the check. O_EXCL is
        // the kernel-atomic equivalent of the store's If-None-Match.
        val nio = java.nio.file.Paths.get(key)
        try {
          Option(nio.getParent).foreach(java.nio.file.Files.createDirectories(_))
          java.nio.file.Files.write(nio, bytes,
            java.nio.file.StandardOpenOption.CREATE_NEW,
            java.nio.file.StandardOpenOption.WRITE)
          return PutResult.Ok
        } catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            return PutResult.PreconditionFailed
        }
      }
      try {
        val out = fs.create(p(key), false)
        try out.write(bytes) finally out.close()
        PutResult.Ok
      } catch {
        case _: HFileExists => PutResult.PreconditionFailed
        case _: java.io.IOException if fs.exists(p(key)) =>
          PutResult.PreconditionFailed
      }
    } else {
      val out = fs.create(p(key), true)
      try out.write(bytes) finally out.close()
      PutResult.Ok
    }
  }

  override def get(key: String): Option[(Array[Byte], Long)] = {
    val path = p(key)
    try {
      val st = fs.getFileStatus(path)
      if (isMarker(key)) {
        if (st.isDirectory) Some((Array.emptyByteArray, st.getModificationTime))
        else None // a FILE at the marker's path is not a directory marker
      } else if (st.isDirectory) None // directories are not objects
      else {
        val in = fs.open(path)
        try {
          val buf = new Array[Byte](st.getLen.toInt)
          in.readFully(0, buf)
          Some((buf, st.getModificationTime))
        } finally in.close()
      }
    } catch { case _: java.io.FileNotFoundException => None }
  }

  override def listKeys(prefix: String): Seq[String] = {
    // keysUnder always passes '<dir>/'; emit files as plain keys and
    // every subdirectory as a '<dir>/' pseudo-key (recursive walk)
    val root = p(prefix)
    if (!isMarker(prefix) || !fs.exists(root) ||
        !fs.getFileStatus(root).isDirectory) return Nil
    val out = Seq.newBuilder[String]
    def walk(dir: HPath): Unit =
      fs.listStatus(dir).foreach { st =>
        val uriPath = st.getPath.toUri.getPath
        if (st.isDirectory) { out += uriPath + "/"; walk(st.getPath) }
        else out += uriPath
      }
    walk(root)
    out.result().sorted
  }

  override def deleteKey(key: String): Boolean = {
    val path = p(key)
    try {
      val st = fs.getFileStatus(path)
      if (isMarker(key) != st.isDirectory) false // wrong kind for the key
      else fs.delete(path, false) // non-recursive: empty dirs + files only
    } catch { case _: java.io.FileNotFoundException => false }
  }
}

object HadoopFsObjectStoreClient {
  /** Client over the RAW local filesystem (no `.crc` sidecar files —
    * ChecksumFileSystem's sidecars would pollute key listings). */
  def local(): HadoopFsObjectStoreClient =
    new HadoopFsObjectStoreClient(
      FileSystem.getLocal(new org.apache.hadoop.conf.Configuration()).getRaw)
}
