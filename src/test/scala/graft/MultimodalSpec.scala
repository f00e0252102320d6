package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.scalatest.matchers.should.Matchers

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaFeatures, MediaIn}

/** Spec gate for the multimodal plumbing (SURVEY.md §2.3 mm_decode):
  * batch shape, determinism, schema, and distributed execution.
  */
class MultimodalSpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("decode batches are bounded at BatchSize and cover every row") {
    val out = Multimodal.decode(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir).count()
    out.length.toLong shouldBe docs
    all(out.map(_.getAs[Int]("batch_size"))) should be <= Multimodal.BatchSize
    all(out.map(_.getAs[Int]("batch_size"))) should be > 0
  }

  test("stub decode is deterministic and format-dependent") {
    val a = Multimodal.decodeStub(Seq(MediaIn(1, "video", "abcdef".getBytes)))
    val b = Multimodal.decodeStub(Seq(MediaIn(1, "video", "abcdef".getBytes)))
    a shouldBe b
    val img = Multimodal.decodeStub(Seq(MediaIn(1, "image", "abcdef".getBytes))).head
    img.n_frames shouldBe 1
    a.head.n_frames should be > 1
  }

  test("output schema is the typed feature record") {
    Multimodal.decode(spark, sfDir).schema.fieldNames shouldBe
      classOf[MediaFeatures].getDeclaredFields.map(_.getName)
  }

  test("stub resize decimates by stride: exact bytes, mean, determinism") {
    val bytes = (0 until 1000).map(i => ((i * 37) % 251).toByte).toArray
    val r = Multimodal.resizeStub(Seq(MediaIn(7, "image", bytes))).head
    r.stride shouldBe 1000 / 256
    val sampled = bytes.indices.by(r.stride).map(i => bytes(i) & 0xff)
    r.resized_len shouldBe sampled.length.toLong
    r.resized_mean shouldBe sampled.sum.toDouble / sampled.length
    Multimodal.resizeStub(Seq(MediaIn(7, "image", bytes))).head shouldBe r
    // short payloads: stride clamps to 1, output = input length
    val tiny = Multimodal.resizeStub(Seq(MediaIn(8, "image", "ab".getBytes))).head
    tiny.stride shouldBe 1
    tiny.resized_len shouldBe 2L
  }

  test("real media kernels: JPEG/PNG decode to true dimensions, WAV to " +
    "true frame count, resize scales a real image; non-media payloads " +
    "keep the stub path") {
    import java.io.ByteArrayOutputStream
    // in-memory JPEG fixture: 23x17 gradient, encoded by the JDK itself
    def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, ((x * 11) % 256 << 16) | ((y * 13) % 256 << 8) | 128)
      val out = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, out)
      out.toByteArray
    }
    // in-memory WAV fixture: 100 frames of 8 kHz 16-bit mono PCM
    def wavBytes(frames: Int): Array[Byte] = {
      import javax.sound.sampled._
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      val pcm = new Array[Byte](frames * 2)
      val in = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val out = new ByteArrayOutputStream()
      AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val jpeg = imageBytes("jpg", 23, 17)
    val png = imageBytes("png", 9, 31)
    val wav = wavBytes(100)
    val text = "just words no magic".getBytes("UTF-8")
    val feats = Multimodal.decodeStub(Seq(
      MediaIn(1, "image", jpeg), MediaIn(2, "image", png),
      MediaIn(3, "audio", wav), MediaIn(4, "image", text)))
    feats(0).width shouldBe 23; feats(0).height shouldBe 17
    feats(1).width shouldBe 9; feats(1).height shouldBe 31
    feats(2).n_frames shouldBe 100
    // stub fallback for non-media bytes: checksum-derived dims unchanged
    val sum = text.map(_ & 0xff).sum
    feats(3).width shouldBe 16 + (sum % 64)
    feats(3).height shouldBe 16 + (text.length % 64)
    // real resample: longest side (23) scales under 16 with the exact
    // integer divisor, and the mean is a plausible luminance
    val rz = Multimodal.resizeStub(Seq(MediaIn(1, "image", png))).head
    rz.stride shouldBe 2 // ceil(31/16)
    rz.resized_len shouldBe (9 / 2).toLong * (31 / 2)
    rz.resized_mean should (be >= 0.0 and be <= 255.0)
    // corrupt image magic falls back to the stub, never throws
    val corrupt = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0x00)
    Multimodal.decodeStub(Seq(MediaIn(5, "image", corrupt))).head
      .byte_len shouldBe 4L
  }

  test("payload stays binary, metadata typed, partition-parallel") {
    val media = Multimodal.mediaTable(spark, sfDir)
    media.schema("payload").dataType.typeName shouldBe "binary"
    media.schema("format").dataType.typeName shouldBe "string"
    // repartitioned decode still covers all rows exactly once
    import spark.implicits._
    val out = media.repartition(7).as[MediaIn]
      .mapPartitions(_.grouped(Multimodal.BatchSize).flatMap(Multimodal.decodeStub))
    out.count() shouldBe media.count()
  }
}
