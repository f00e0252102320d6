package graft.versioned

/** Minimal Apache Puffin WRITER for Iceberg v3 deletion vectors.
  *
  * Layout per the Puffin spec: the 4-byte magic `PFA1`, the blobs
  * back to back, then the footer — magic, an UNCOMPRESSED json
  * payload describing every blob, the payload length (4-byte LE),
  * 4 flag bytes (all zero: payload not compressed), magic. Readers
  * locate blobs either from the footer or — the Iceberg v3 path —
  * from the manifest entry's (content_offset, content_size_in_bytes)
  * coordinates, so the footer here is descriptive redundancy the
  * spec requires, not the read path.
  *
  * The deletion-vector blob itself ("deletion-vector-v1") is: a
  * 4-byte BIG-endian length of (magic + vector), the DV magic
  * D1 D3 39 64, the 64-bit roaring bitmap "portable" serialization
  * (8-byte LE bitmap count; per bitmap a 4-byte LE high-32 key and a
  * standard 32-bit roaring serialization), and a 4-byte BIG-endian
  * CRC-32 of (magic + vector). [[IcebergImport.parseDvBlob]] is the
  * independent decoder; the encode half lives here for the export
  * side (reference surface: lakefs-iceberg-catalog exposes Iceberg
  * metadata for external readers — LakeFSTableOperations.java:115-147
  * publishes whatever iceberg-core wrote, DVs included in v3).
  */
private[versioned] object Puffin {

  val FileMagic: Array[Byte] = Array('P', 'F', 'A', '1').map(_.toByte)
  private val DvMagic: Array[Byte] =
    Array(0xd1, 0xd3, 0x39, 0x64).map(_.toByte)

  /** A 64-bit position bitmap under construction (executor-side:
    * positions of one data file arrive unordered and possibly
    * duplicated across overlapping tombstone groups — roaring add is
    * idempotent, so the union/dedup the v3 "at most one DV per data
    * file" rule demands falls out for free).
    */
  final class Dv64 extends Serializable {
    private val buckets =
      new java.util.TreeMap[Integer, org.roaringbitmap.RoaringBitmap]()
    def add(pos: Long): Unit = {
      require(pos >= 0, s"negative delete position $pos")
      val key = (pos >>> 32).toInt
      var rb = buckets.get(key)
      if (rb == null) { rb = new org.roaringbitmap.RoaringBitmap(); buckets.put(key, rb) }
      rb.add((pos & 0xffffffffL).toInt)
    }
    def cardinality: Long = {
      var n = 0L
      buckets.values().forEach(rb => n += rb.getLongCardinality)
      n
    }
    /** The full blob: BE length prefix, magic, portable vector, BE CRC. */
    def blob(): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val dos = new java.io.DataOutputStream(bos)
      dos.writeLong(java.lang.Long.reverseBytes(buckets.size.toLong))
      buckets.forEach { (k, rb) =>
        dos.writeInt(java.lang.Integer.reverseBytes(k))
        rb.runOptimize()
        rb.serialize(dos)
      }
      dos.flush()
      val vector = bos.toByteArray
      val crc = new java.util.zip.CRC32()
      crc.update(DvMagic); crc.update(vector)
      val out = java.nio.ByteBuffer.allocate(12 + vector.length)
      out.putInt(4 + vector.length) // big-endian
      out.put(DvMagic).put(vector)
      out.putInt(crc.getValue.toInt) // big-endian
      out.array()
    }
  }

  /** Footer metadata of one written blob. `referencedDataFile` is the
    * exact manifest URI of the data file the DV scopes to — the v3
    * spec requires it (with `cardinality`) in the blob's properties.
    */
  final case class BlobMeta(snapshotId: Long, sequenceNumber: Long,
      offset: Long, length: Long, referencedDataFile: String,
      cardinality: Long)

  /** Serialize the footer (magic + json payload + LE length + flags +
    * magic) for blobs already written at their recorded offsets.
    */
  def footer(blobs: Seq[BlobMeta]): Array[Byte] = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.createObjectNode()
    val arr = root.putArray("blobs")
    blobs.foreach { b =>
      val n = arr.addObject()
      n.put("type", "deletion-vector-v1")
      n.putArray("fields")
      n.put("snapshot-id", b.snapshotId)
      n.put("sequence-number", b.sequenceNumber)
      n.put("offset", b.offset)
      n.put("length", b.length)
      val p = n.putObject("properties")
      p.put("referenced-data-file", b.referencedDataFile)
      p.put("cardinality", b.cardinality.toString)
    }
    root.putObject("properties").put("created-by", "graft")
    val payload = om.writeValueAsBytes(root)
    val bb = java.nio.ByteBuffer
      .allocate(FileMagic.length * 2 + payload.length + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(FileMagic).put(payload)
      .putInt(payload.length).putInt(0).put(FileMagic)
    bb.array()
  }
}
