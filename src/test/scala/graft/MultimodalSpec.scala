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
