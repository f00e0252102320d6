package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.scalatest.matchers.should.Matchers

import graft.versioned.IcebergImport

/** The FROZEN round-7 Iceberg export fixture (committed bytes under
  * `src/test/resources/iceberg-golden/` — see GoldenFixtureGen for
  * provenance): a partitioned merge-on-read table exported with v2
  * positional + equality delete files. Reading the committed layouts —
  * not layouts written by the code under test in the same run — means
  * any writer/reader change that silently breaks compatibility with
  * previously-exported tables (field ids, avro schemas, sequence
  * semantics, partition values) fails HERE even when the live
  * round-trip specs still agree with themselves.
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
}
