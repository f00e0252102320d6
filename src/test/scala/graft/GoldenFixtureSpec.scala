package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.scalatest.matchers.should.Matchers

import graft.versioned.IcebergImport

/** The FROZEN Iceberg export fixtures (committed bytes — see
  * GoldenFixtureGen for provenance): the r7 v2 fixture under
  * `src/test/resources/iceberg-golden/` (partitioned merge-on-read,
  * positional + equality delete files) and the r11 v3 fixture under
  * `iceberg-golden-v3/` (Puffin deletion vectors, row lineage,
  * 4-snapshot history). Reading the committed layouts — not layouts
  * written by the code under test in the same run — means any
  * writer/reader change that silently breaks compatibility with
  * previously-exported tables (field ids, avro schemas, sequence
  * semantics, partition values, DV blob framing) fails HERE even when
  * the live round-trip specs still agree with themselves.
  */
class GoldenFixtureSpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("frozen export fixture imports with the exact expected rows " +
    "(positional + equality deletes applied, partitioned v2 layout)") {
    val res = Paths.get("src/test/resources/iceberg-golden")
    assume(Files.isDirectory(res), s"fixture missing at $res")
    // manifests embed absolute URIs — restore the trees to the exact
    // paths the fixture was generated against
    GoldenFixtureGen.deleteTree(GoldenFixtureGen.SrcRoot)
    GoldenFixtureGen.deleteTree(GoldenFixtureGen.ExportRoot)
    GoldenFixtureGen.copyTree(res.resolve("src"), GoldenFixtureGen.SrcRoot)
    GoldenFixtureGen.copyTree(res.resolve("export"), GoldenFixtureGen.ExportRoot)

    val plan = IcebergImport.plan(GoldenFixtureGen.ExportRoot)
    plan.formatVersion shouldBe 2
    plan.dataFiles should not be empty
    plan.positionDeletes should not be empty // DELETE WHERE id < 4
    plan.equalityDeletes should not be empty // DELETE WHERE id = 27

    val got = IcebergImport.read(spark, GoldenFixtureGen.ExportRoot)
      .orderBy("id").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    val expected = (4 until 30).filter(_ != 27).map { i =>
      val cat = (i % 3) match { case 0 => "x"; case 1 => "y"; case _ => "z" }
      (i, cat, i.toDouble)
    }
    got shouldBe expected
  }

  test("frozen v3 fixture imports with Puffin deletion vectors, row " +
    "lineage and history applied; incremental append scan over the " +
    "committed bytes delivers exactly the appended rows") {
    val res = Paths.get("src/test/resources/iceberg-golden-v3")
    assume(Files.isDirectory(res), s"fixture missing at $res")
    GoldenFixtureGen.deleteTree(GoldenFixtureGen.V3SrcRoot)
    GoldenFixtureGen.deleteTree(GoldenFixtureGen.V3ExportRoot)
    GoldenFixtureGen.copyTree(res.resolve("src"), GoldenFixtureGen.V3SrcRoot)
    GoldenFixtureGen.copyTree(res.resolve("export"),
      GoldenFixtureGen.V3ExportRoot)

    val metaLoc = IcebergImport.resolveMetadataLoc(
      GoldenFixtureGen.V3ExportRoot.toString)
    val plan = IcebergImport.plan(metaLoc, None)
    plan.formatVersion shouldBe 3
    plan.dataFiles should not be empty
    // the positional MoR delete froze as a PUFFIN deletion-vector blob
    val dvs = plan.deleteFiles.filter(_.dv.isDefined)
    dvs should not be empty
    dvs.foreach { d =>
      d.format shouldBe "PUFFIN"
      d.dv.get.length should be > 0L
    }
    plan.equalityDeletes should not be empty // DELETE WHERE id = 27

    // row-lineage metadata froze: next-row-id at the table level,
    // first-row-id per snapshot
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = om.readTree(Files.readString(Paths.get(metaLoc)))
    meta.get("format-version").asInt() shouldBe 3
    meta.get("next-row-id").asLong() should be > 0L
    val snaps = meta.get("snapshots")
    snaps.size() shouldBe 4
    (0 until snaps.size()).foreach { i =>
      snaps.get(i).get("first-row-id").asLong() should be >= 0L
    }

    // full read: DVs + equality delete applied to the committed layout
    val got = IcebergImport.read(spark, Paths.get(metaLoc))
      .orderBy("id").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    val expected = (4 until 30).filter(_ != 27).map { i =>
      val cat = (i % 3) match { case 0 => "x"; case 1 => "y"; case _ => "z" }
      (i, cat, i.toDouble)
    }
    got shouldBe expected

    // history time travel over the committed bytes
    val ids = (0 until snaps.size())
      .map(i => snaps.get(i).get("snapshot-id").asLong())
    IcebergImport.read(spark, Paths.get(metaLoc), Some(ids.head))
      .count() shouldBe 20

    // incremental append scan between the two frozen append snapshots
    IcebergImport.readChanges(spark, metaLoc, Some(ids(0)), Some(ids(1)))
      .orderBy("id").collect().map(_.getInt(0)) shouldBe (20 until 30)
  }
}
