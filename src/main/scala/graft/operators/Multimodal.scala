package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables => T}

/** Multimodal-column pack (SURVEY.md §2.3 mm_decode): image/audio/video
  * payloads as opaque `binary` columns + typed metadata, processed in
  * fixed-size batches through `mapPartitions` — the Scala analog of the
  * mapInPandas batch shape (iterator of bounded row batches, so a decode
  * library amortizes per-batch setup and memory stays bounded no matter
  * the partition size). At 100 TB the payloads stay columnar in parquet,
  * scans prune to (id, payload, meta), and decode parallelism = partition
  * count — no shuffle anywhere.
  *
  * Decode kernels are CAPABILITY-GATED by magic bytes: JPEG/PNG/GIF/BMP
  * payloads decode for real through javax.imageio and RIFF/WAVE PCM
  * through javax.sound (both in-JDK — no external media libs needed),
  * spec-tested on in-memory fixtures; any other payload (including this
  * container's synthetic text-byte corpus) takes the deterministic
  * stub, which derives fake dimensions / frame counts from the payload
  * bytes. The Spark-side plumbing — schema, batching, partitioning,
  * output shape — is identical on both paths and spec-tested
  * (MultimodalSpec).
  */
object Multimodal {

  val BatchSize = 64

  case class MediaIn(doc_id: Long, format: String, payload: Array[Byte])
  case class MediaFeatures(
      doc_id: Long,
      format: String,
      byte_len: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      mean_byte: Double,
      batch_size: Int) // observed batch size, spec asserts the shape

  // ---- real in-JDK decode kernels (capability-gated by magic bytes) ----
  //
  // The container ships no media libraries, but the JDK itself decodes
  // JPEG/PNG/GIF/BMP (javax.imageio) and WAV/AIFF PCM (javax.sound).
  // Payloads whose MAGIC BYTES match take the REAL kernel; everything
  // else (the synthetic text-byte corpus included) falls through to the
  // deterministic stub, so driver-facing rows never change while a real
  // image/audio payload gets real dimensions / frame counts. A real
  // deployment swaps these per-batch kernels for its codec library; the
  // batching, schema and partitioning around them are the contract.

  private def isImageMagic(p: Array[Byte]): Boolean =
    (p.length > 3 &&
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8 && (p(2) & 0xff) == 0xff) || // JPEG
      (p.length > 8 && (p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') || // PNG
      (p.length > 6 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F') || // GIF
      (p.length > 2 && p(0) == 'B' && p(1) == 'M') // BMP

  private def isRiffWave(p: Array[Byte]): Boolean =
    p.length > 12 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

  /** Real image decode: (width, height, mean luminance 0-255). None when
    * ImageIO cannot parse the payload (corrupt file → stub fallback,
    * never a task failure).
    */
  private[operators] def decodeImage(payload: Array[Byte]): Option[(Int, Int, Double)] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        var sum = 0.0
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
              0.114 * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        Some((img.getWidth, img.getHeight,
          sum / (img.getWidth.toLong * img.getHeight)))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Real PCM audio decode: (frame count, sample rate). */
  private[operators] def decodeWav(payload: Array[Byte]): Option[(Long, Int)] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try Some((in.getFrameLength, in.getFormat.getSampleRate.toInt))
      finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Per-batch decode kernel: real JPEG/PNG/GIF/BMP and WAV payloads
    * decode for real; everything else takes the DETERMINISTIC stub
    * ("dimensions" derived from payload length + byte checksum, so specs
    * and reruns agree).
    */
  def decodeStub(batch: Seq[MediaIn]): Seq[MediaFeatures] = {
    val n = batch.size
    batch.map { m =>
      val len = m.payload.length
      var sum = 0L
      var i = 0
      while (i < len) { sum += (m.payload(i) & 0xff); i += 1 }
      val mean = if (len == 0) 0.0 else sum.toDouble / len
      val real: Option[MediaFeatures] =
        if (isImageMagic(m.payload))
          decodeImage(m.payload).map { case (w, h, _) =>
            MediaFeatures(m.doc_id, m.format, len.toLong, w, h, 1, mean, n) }
        else if (isRiffWave(m.payload))
          decodeWav(m.payload).map { case (frames, _) =>
            MediaFeatures(m.doc_id, m.format, len.toLong, 0, 0,
              frames.toInt, mean, n) }
        else None
      real.getOrElse {
        val w = 16 + (sum % 64).toInt
        val h = 16 + (len % 64)
        val frames = m.format match {
          case "video" => 1 + (len % 30)
          case "audio" => 1 + (len % 100)
          case _ => 1
        }
        MediaFeatures(m.doc_id, m.format, len.toLong, w, h, frames, mean, n)
      }
    }
  }

  case class ResizedMedia(
      doc_id: Long,
      byte_len: Long,
      stride: Int,
      resized_len: Long,
      resized_mean: Double)

  /** Real image resample: scale so the longest side is <= `target` px
    * (Graphics2D bilinear, in-JDK), returning (scale divisor, scaled
    * pixel count, scaled mean luminance).
    */
  private[operators] def resizeImage(payload: Array[Byte], target: Int = 16)
      : Option[(Int, Long, Double)] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val div = math.max(1, math.ceil(
          math.max(img.getWidth, img.getHeight).toDouble / target).toInt)
        val (w, h) = (math.max(1, img.getWidth / div), math.max(1, img.getHeight / div))
        val out = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
        } finally g.dispose()
        var sum = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = out.getRGB(x, y)
            sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
              0.114 * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        Some((div, w.toLong * h, sum / (w.toLong * h)))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Per-batch resize kernel: payloads with image magic take the REAL
    * Graphics2D resample ([[resizeImage]]); everything else the
    * deterministic stride-decimation stub (keep every `stride`-th payload
    * byte so the output is <= ~256 "pixels"). Like decodeStub, a real
    * deployment replaces ONLY these kernels; the batching, schema and
    * partitioning around them are the real contract.
    */
  def resizeStub(batch: Seq[MediaIn]): Seq[ResizedMedia] = {
    batch.map { m =>
      val len = m.payload.length
      val real: Option[ResizedMedia] =
        if (isImageMagic(m.payload))
          resizeImage(m.payload).map { case (div, px, mean) =>
            ResizedMedia(m.doc_id, len.toLong, div, px, mean) }
        else None
      real.getOrElse {
        val stride = math.max(1, len / 256)
        var i = 0
        var n = 0
        var sum = 0L
        while (i < len) {
          sum += (m.payload(i) & 0xff)
          n += 1
          i += stride
        }
        ResizedMedia(m.doc_id, len.toLong, stride, n.toLong,
          if (n == 0) 0.0 else sum.toDouble / n)
      }
    }
  }

  /** Batched resize over the media table (same bounded-batch shape as
    * [[decode]]).
    */
  def resize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d).as[MediaIn]
      .mapPartitions(_.grouped(BatchSize).flatMap(b => resizeStub(b)))
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** documents -> simulated media table: payload = utf8 bytes of `text`
    * (stand-in for image bytes), format assigned deterministically.
    */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    T.documents(s, d).select(
      col("doc_id"),
      element_at(lit(Array("image", "audio", "video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("format"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Batched decode / feature-extract over the media table. */
  def decode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d).as[MediaIn]
      .mapPartitions(_.grouped(BatchSize).flatMap(b => decodeStub(b)))
      .toDF()
      .orderBy(col("doc_id"))
  }

  val all: Seq[Q] = Seq(
    // Oracle covers the REAL plumbing (ids, formats, byte lengths — what
    // parquet+batching must preserve); decoded dims are stub outputs and
    // spec-gated instead.
    Q(
      "mm_decode",
      """SELECT doc_id,
        |       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS format,
        |       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len
        |FROM documents ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      decode(s, d).select(col("doc_id"), col("format"), col("byte_len"))
        .orderBy(col("doc_id"))
    },
    // Resize plumbing: stride/length arithmetic is a pure function of
    // payload length, so the batch contract (what a real resample kernel
    // would see and emit) is oracle-checked; the decimated bytes
    // themselves are spec-gated in MultimodalSpec.
    Q(
      "mm_resize",
      """SELECT doc_id, byte_len, CAST(stride AS INTEGER) AS stride,
        |       CAST((byte_len + stride - 1) // stride AS BIGINT) AS resized_len
        |FROM (SELECT doc_id,
        |             CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
        |             GREATEST(1, octet_length(CAST(text AS BLOB)) // 256) AS stride
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      resize(s, d)
        .select(col("doc_id"), col("byte_len"), col("stride"), col("resized_len"))
        .orderBy(col("doc_id"))
    },
    // Audio chunking: segment each audio payload into fixed-duration
    // windows (10 ms at the stream's sample rate) — the shard unit an
    // ASR/embedding stage consumes. Sample metadata is derived
    // deterministically from payload bytes (1 byte = 1 sample stand-in;
    // rate ∈ {8,12,16} kHz from length), so chunk boundaries are pure
    // integer arithmetic and the WHOLE plan — per-chunk start/length +
    // signature — is DuckDB-oracle-checked. The chunk explode pipelines
    // inside the scan stage (no shuffle); a real pipeline swaps only the
    // per-chunk kernel, exactly like decode/resize.
    Q(
      "mm_audiochunk",
      """WITH a AS (
        |  SELECT doc_id,
        |         CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_samples,
        |         8000 + (octet_length(CAST(text AS BLOB)) % 3) * 4000 AS sample_rate
        |  FROM documents WHERE doc_id % 3 = 1),
        |c AS (SELECT doc_id, n_samples, CAST(sample_rate AS INTEGER) AS sample_rate,
        |             CAST(sample_rate // 100 AS BIGINT) AS chunk_len
        |      FROM a)
        |SELECT doc_id, sample_rate, CAST(idx AS BIGINT) AS chunk_idx,
        |       CAST(idx * chunk_len AS BIGINT) AS start_sample,
        |       CAST(LEAST(chunk_len, n_samples - idx * chunk_len) AS BIGINT) AS chunk_samples,
        |       md5(doc_id || '#' || idx) AS chunk_sig
        |FROM (SELECT *, unnest(range(0, (n_samples + chunk_len - 1) // chunk_len)) AS idx
        |      FROM c)
        |ORDER BY doc_id, chunk_idx""".stripMargin
    ) { (s, d) =>
      mediaTable(s, d).filter(col("format") === "audio")
        .select(col("doc_id"),
          length(col("payload")).cast("long").as("n_samples"))
        .withColumn("sample_rate",
          (lit(8000) + pmod(col("n_samples"), lit(3)) * 4000).cast("int"))
        .withColumn("chunk_len", (col("sample_rate") / 100).cast("long"))
        // empty payload -> zero chunks (the oracle's range(0, 0) emits no
        // rows, but sequence(0, -1) throws 'illegal sequence boundaries')
        .filter(col("n_samples") > 0)
        .select(col("doc_id"), col("sample_rate"), col("n_samples"), col("chunk_len"),
          // integral div (not /, which is double division on longs and
          // can over-count chunks vs the oracle's // semantics)
          explode(sequence(lit(0L),
            expr("(n_samples + chunk_len - 1) div chunk_len") - 1,
            lit(1L))).as("chunk_idx"))
        .select(col("doc_id"), col("sample_rate"), col("chunk_idx"),
          (col("chunk_idx") * col("chunk_len")).as("start_sample"),
          least(col("chunk_len"),
            col("n_samples") - col("chunk_idx") * col("chunk_len")).as("chunk_samples"),
          md5(concat(col("doc_id").cast("string"), lit("#"),
            col("chunk_idx").cast("string"))).as("chunk_sig"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },
    // Frame sampling over the decoded video rows: every 5th frame index
    // explodes to one row (generate pipelines inside the decode stage —
    // no shuffle), each sampled frame gets a deterministic signature
    // (stand-in for a per-frame embedding; a real pipeline swaps ONLY
    // the kernel). Frame counts derive from the stubbed decode, which is
    // itself a pure function of payload length — so the whole sampling
    // plan is DuckDB-oracle-checked end-to-end.
    Q(
      "mm_framesample",
      """SELECT doc_id, CAST(idx AS BIGINT) AS frame_idx,
        |       md5(doc_id || ':' || idx) AS frame_sig
        |FROM (SELECT doc_id,
        |             unnest(range(0, 1 + octet_length(CAST(text AS BLOB)) % 30, 5)) AS idx
        |      FROM documents WHERE doc_id % 3 = 2)
        |ORDER BY doc_id, frame_idx""".stripMargin
    ) { (s, d) =>
      decode(s, d)
        .filter(col("format") === "video")
        .select(col("doc_id"),
          explode(sequence(lit(0), col("n_frames") - 1, lit(5))).as("frame_idx"))
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          md5(concat(col("doc_id").cast("string"), lit(":"),
            col("frame_idx").cast("string"))).as("frame_sig"))
        .orderBy(col("doc_id"), col("frame_idx"))
    },

    // Perceptual near-duplicate detection over the "image" subset: a
    // histogram sign-hash — the color/intensity-HISTOGRAM family of
    // perceptual hashes (shift/crop-invariant, unlike grid dHash whose
    // stride sampling breaks under the word-shuffle "jitter" this
    // corpus's near-dups actually have; measured: grid dHash minimum
    // pair distance 17, histogram hash 649 true pairs at <=3). Cell k of
    // the "decoded histogram" is the payload frequency of byte class k
    // (a real deployment swaps this for the decoder's luminance
    // histogram); the 64-bit fingerprint is sign(cell[a_k] < cell[b_k])
    // over 64 FIXED cell pairs, packed as 4x16-bit chunks. Scale shape =
    // dd_simhash's: hamming <= 3 pigeonholes into ">=1 of 4 chunks
    // exactly equal", so candidates come from 4 chunk-keyed equi-joins
    // (explode + shuffle join, never O(N^2)); the exact hamming verify
    // runs only on candidates. Everything is integer arithmetic on
    // counts, so the full pipeline is bit-replayable in DuckDB (which
    // does the same blocking as an OR-join — fine at oracle scale; the
    // SPARK plan is the one that must scale).
    Q(
      "mm_imagehash",
      s"""WITH h AS (
         |  SELECT doc_id, ${ImageHash.chunkSqlDuck.mkString(", ")}
         |  FROM documents WHERE doc_id % 3 = 0)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       CAST(bit_count(xor(a.h0, b.h0)) + bit_count(xor(a.h1, b.h1))
         |          + bit_count(xor(a.h2, b.h2)) + bit_count(xor(a.h3, b.h3))
         |         AS BIGINT) AS hamming
         |FROM h a JOIN h b ON a.doc_id < b.doc_id
         |  AND (a.h0 = b.h0 OR a.h1 = b.h1 OR a.h2 = b.h2 OR a.h3 = b.h3)
         |WHERE bit_count(xor(a.h0, b.h0)) + bit_count(xor(a.h1, b.h1))
         |    + bit_count(xor(a.h2, b.h2)) + bit_count(xor(a.h3, b.h3)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin
    ) { (s, d) =>
      val h = T.documents(s, d)
        .filter(pmod(col("doc_id"), lit(3)) === 0)
        .selectExpr("doc_id" +: ImageHash.chunkSqlSpark: _*)
      val keyed = h.select(col("doc_id"), col("h0"), col("h1"), col("h2"),
        col("h3"), posexplode(array(col("h0"), col("h1"), col("h2"), col("h3"))))
        .toDF("doc_id", "h0", "h1", "h2", "h3", "j", "hv")
      val a = keyed.toDF("doc_a", "a0", "a1", "a2", "a3", "j", "hv")
      val b = keyed.toDF("doc_b", "b0", "b1", "b2", "b3", "j", "hv")
      val hamming =
        expr("bit_count(a0 ^ b0) + bit_count(a1 ^ b1) + " +
          "bit_count(a2 ^ b2) + bit_count(a3 ^ b3)")
      a.join(b, Seq("j", "hv"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          hamming.cast("long").as("hamming"))
        .filter(col("hamming") <= 3)
        .distinct() // a pair can collide in several chunks
        .orderBy(col("doc_a"), col("doc_b"))
    }
  )

  /** Histogram sign-hash chunk expressions, generated ONCE for both
    * dialects so the arithmetic cannot drift. 27 histogram cells (byte
    * classes 'a'..'z' and space — the corpus's alphabet; a decoder
    * would produce luminance buckets here), counted with the
    * codegen-friendly `length - length(replace(...))` idiom; bit k is
    * `cell[a_k] < cell[b_k]` over a fixed pseudo-random pair schedule;
    * chunk j packs bits 16j..16j+15 big-endian into an INT.
    */
  private object ImageHash {
    private val cells: IndexedSeq[String] = (('a' to 'z').map(_.toString) :+ " ")

    private def hist(i: Int): String =
      s"(length(text) - length(replace(text, '${cells(i)}', '')))"

    /** 64 fixed (a, b) cell pairs, a != b, deterministic. */
    private val pairSchedule: Seq[(Int, Int)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var k = 0
      while (out.size < 64) {
        val a = (5 * k) % 27
        val b = (5 * k + 1 + (k % 13)) % 27
        if (a != b) out += ((a, b))
        k += 1
      }
      out.toSeq
    }

    private def chunk(j: Int): String = {
      val bits = (0 until 16).map { i =>
        val (a, b) = pairSchedule(16 * j + i)
        s"(CASE WHEN ${hist(a)} < ${hist(b)} THEN ${1 << (15 - i)} ELSE 0 END)"
      }
      s"CAST(${bits.mkString(" + ")} AS INT) AS h$j"
    }

    // pure integer arithmetic on counts: the SAME text works in both
    // engines (length/replace/CASE are dialect-identical)
    val chunkSqlSpark: Seq[String] = (0 until 4).map(chunk)
    val chunkSqlDuck: Seq[String] = chunkSqlSpark
  }
}
