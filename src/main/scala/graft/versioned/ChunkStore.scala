package graft.versioned

/** Shared machinery for the two content-defined, content-addressed
  * chunk stores — snapshot file lists ([[Manifests]]) and commit table
  * maps ([[Trees]]). One implementation of the hash/cut/cache logic so
  * a fix lands in both layers at once.
  */
private[versioned] object ChunkStore {

  /** FNV-1a 64-bit — stable across JVMs, cheap, and a pure function of
    * the key, which is what makes chunk boundaries survive edits
    * elsewhere in the sequence.
    */
  def fnv64(p: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < p.length) { h ^= p.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Content-defined cut decision: close the current chunk after the
    * entry with this key? Deterministic per entry.
    */
  def isCut(key: String, target: Int): Boolean =
    (fnv64(key) & Long.MaxValue) % target.toLong == 0L

  def shaHex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-1").digest(bytes)
      .map("%02x".format(_)).mkString

  def shaHex(s: String): String = shaHex(s.getBytes("UTF-8"))

  /** Split an ordered sequence into content-defined chunks: cut after an
    * entry when its key hash says so, with a 4×target hard cap bounding
    * the pathological no-cut run.
    */
  def chunkBy[E](items: Seq[E], keyOf: E => String, target: Int): Seq[Seq[E]] = {
    val cap = 4 * target
    val out = Seq.newBuilder[Seq[E]]
    var cur = Vector.newBuilder[E]
    var n = 0
    items.foreach { e =>
      cur += e; n += 1
      if (n >= cap || isCut(keyOf(e), target)) {
        out += cur.result(); cur = Vector.newBuilder; n = 0
      }
    }
    val last = cur.result()
    if (last.nonEmpty) out += last
    out.result()
  }

  /** Process-wide LRU cache for immutable chunk objects, capped by total
    * cached entry count (not chunk count) so one budget holds whatever
    * mix of chunk sizes shows up. Also counts cache-miss reads for
    * observability and the specs that prove pruned loading.
    */
  final class LruCache[V](cap: () => Long, sizeOf: V => Int) {
    private val cache =
      new java.util.LinkedHashMap[String, V](64, 0.75f, /*accessOrder=*/ true)
    private var cachedEntries = 0L
    private val reads = new java.util.concurrent.atomic.AtomicLong

    def get(key: String): Option[V] = cache.synchronized(Option(cache.get(key)))

    /** Load-through: returns the cached value or computes, counts the
      * miss, and caches it.
      */
    def getOrLoad(key: String)(load: => V): V =
      get(key).getOrElse {
        val v = load
        reads.incrementAndGet()
        put(key, v)
        v
      }

    private def put(key: String, v: V): Unit = cache.synchronized {
      if (cache.containsKey(key)) return
      cache.put(key, v)
      cachedEntries += sizeOf(v)
      val c = cap()
      val it = cache.entrySet().iterator()
      while (cachedEntries > c && it.hasNext) {
        val e = it.next()
        if (e.getKey != key) { cachedEntries -= sizeOf(e.getValue); it.remove() }
      }
    }

    def clear(): Unit = cache.synchronized { cache.clear(); cachedEntries = 0L }
    def size: Int = cache.synchronized(cache.size())
    def readCount: Long = reads.get()
  }
}
