package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.scalatest.matchers.should.Matchers

/** Randomized MODEL test of the CDC contract, for both CDC streams
  * (native `graft-changes` over the commit log, external
  * `iceberg-changes` cdc=true over a live sync dest).
  *
  * A random script of inserts / CoW deletes / MoR deletes / updates /
  * compactions runs against one table while a CDC stream follows it;
  * the accumulated change rows must RECONSTRUCT the final table state:
  * multiset(inserts) − multiset(deletes) == final rows. This is the
  * defining property of a net change feed — it holds regardless of how
  * the engine slices micro-batches, which commits coalesce into one
  * version range, or how copy-on-write rewrites shuffle rows between
  * files — so a seeded random walk is a real adversary, not just the
  * scripted cases the oracle queries replay.
  */
class CdcModelSpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.catalog.g", classOf[graft.catalog.GraftCatalog].getName)
    .config("spark.sql.catalog.g.root",
      Files.createTempDirectory("graft-cdcmodel").toString)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def sql(q: String) = spark.sql(q)

  /** Run `steps` random ops against `tbl`, calling `tick()` after a
    * random subset of them (so version ranges of varying width arise),
    * and return the table's final rows.
    */
  private def randomWalk(tbl: String, rnd: scala.util.Random, steps: Int,
      canCompact: Boolean)(tick: () => Unit): Seq[(Int, Int)] = {
    var nextId = 1000
    (0 until steps).foreach { _ =>
      rnd.nextInt(5) match {
        case 0 | 1 => // insert a small batch
          val rows = (0 until 1 + rnd.nextInt(3)).map { _ =>
            nextId += 1; s"($nextId, ${rnd.nextInt(50)})"
          }
          sql(s"INSERT INTO $tbl VALUES ${rows.mkString(", ")}")
        case 2 => // delete a random value slice (CoW or MoR per table)
          sql(s"DELETE FROM $tbl WHERE v = ${rnd.nextInt(50)}")
        case 3 => // update a random slice
          sql(s"UPDATE $tbl SET v = v + 100 WHERE v = ${rnd.nextInt(50)}")
        case _ =>
          if (canCompact && rnd.nextBoolean()) {
            val Array(_, repo, _, db, t) = tbl.split('.')
            sql(s"CALL g.system.compact('$repo', 'main', '$db.$t')")
          } else {
            nextId += 1
            sql(s"INSERT INTO $tbl VALUES ($nextId, ${rnd.nextInt(50)})")
          }
      }
      if (rnd.nextBoolean()) tick()
    }
    tick()
    spark.table(tbl).collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
  }

  /** multiset(inserts) − multiset(deletes) from an accumulated CDC
    * sink. */
  private def reconstruct(sink: String): Seq[(Int, Int)] = {
    val rows = spark.table(sink).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2)))
    val state = scala.collection.mutable.Buffer.empty[(Int, Int)]
    // inserts and deletes may interleave arbitrarily across batches;
    // apply inserts first then deletes WITHIN the multiset (a delete
    // always retracts a previously inserted row, so the net is
    // order-independent)
    rows.filter(_._3 == "insert").foreach(r => state += ((r._1, r._2)))
    rows.filter(_._3 == "delete").foreach { r =>
      val i = state.indexOf((r._1, r._2))
      withClue(s"retraction of a never-inserted row: $r") { i should be >= 0 }
      state.remove(i)
    }
    state.toSeq
  }

  private def mkTable(ns: String, mor: Boolean): String = {
    sql(s"CREATE NAMESPACE g.$ns")
    sql(s"CREATE NAMESPACE g.$ns.main.db")
    val props =
      if (mor) " TBLPROPERTIES ('graft.delete.mode'='merge-on-read', " +
        "'graft.update.mode'='merge-on-read')"
      else ""
    sql(s"CREATE TABLE g.$ns.main.db.t (id INT, v INT)$props")
    sql(s"INSERT INTO g.$ns.main.db.t VALUES (1, 1), (2, 2), (3, 3)")
    s"g.$ns.main.db.t"
  }

  test("native graft-changes: random CoW walk — accumulated CDC " +
    "reconstructs the final state") {
    val tbl = mkTable("m1", mor = false)
    val root = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.catalog.g.root"), "m1")
    val q = spark.readStream.format("graft-changes")
      .option("table", "db.t").load(root.toString)
      .writeStream.format("memory").queryName("cdc_m1")
      .outputMode("append").start()
    try {
      val fin = randomWalk(tbl, new scala.util.Random(7), 14,
        canCompact = true)(() => q.processAllAvailable())
      reconstruct("cdc_m1").sorted shouldBe fin.sorted
    } finally q.stop()
  }

  test("native graft-changes: random MoR walk (tombstones + rate cap) " +
    "— accumulated CDC reconstructs the final state") {
    val tbl = mkTable("m2", mor = true)
    val root = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.catalog.g.root"), "m2")
    val q = spark.readStream.format("graft-changes")
      .option("table", "db.t").option("maxCommitsPerTrigger", "2")
      .load(root.toString)
      .writeStream.format("memory").queryName("cdc_m2")
      .outputMode("append").start()
    try {
      val fin = randomWalk(tbl, new scala.util.Random(21), 14,
        canCompact = true)(() => q.processAllAvailable())
      reconstruct("cdc_m2").sorted shouldBe fin.sorted
    } finally q.stop()
  }

  /** Random walk constrained so (id) stays a unique key: updates key on
    * id, inserts use fresh ids, deletes hit id slices.
    */
  private def keyedWalk(tbl: String, rnd: scala.util.Random, steps: Int)(
      tick: () => Unit): Seq[(Int, Int)] = {
    var nextId = 1000
    val live = scala.collection.mutable.Set(1, 2, 3)
    (0 until steps).foreach { _ =>
      rnd.nextInt(4) match {
        case 0 | 1 =>
          val rows = (0 until 1 + rnd.nextInt(3)).map { _ =>
            nextId += 1; live += nextId; s"($nextId, ${rnd.nextInt(50)})"
          }
          sql(s"INSERT INTO $tbl VALUES ${rows.mkString(", ")}")
        case 2 if live.nonEmpty =>
          val id = live.toSeq(rnd.nextInt(live.size))
          live -= id
          sql(s"DELETE FROM $tbl WHERE id = $id")
        case _ if live.nonEmpty =>
          val id = live.toSeq(rnd.nextInt(live.size))
          sql(s"UPDATE $tbl SET v = v + 1000 WHERE id = $id")
        case _ => ()
      }
      if (rnd.nextBoolean()) tick()
    }
    tick()
    spark.table(tbl).collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
  }

  test("applyCdc replication: a graft table mirrors into another repo " +
    "through the CDC stream, state-equal after a random keyed walk") {
    val src = mkTable("m4", mor = true)
    sql("CREATE NAMESPACE g.m4mirror")
    sql("CREATE NAMESPACE g.m4mirror.main.db")
    sql("CREATE TABLE g.m4mirror.main.db.t (id INT, v INT)")
    val root = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.catalog.g.root"), "m4")
    val q = spark.readStream.format("graft-changes")
      .option("table", "db.t").load(root.toString)
      .writeStream
      .foreachBatch(graft.versioned.TableOps.applyCdc(
        "g.m4mirror.main.db.t", Seq("id")))
      .start()
    try {
      val fin = keyedWalk(src, new scala.util.Random(11), 12)(
        () => q.processAllAvailable())
      spark.table("g.m4mirror.main.db.t").collect()
        .map(r => (r.getInt(0), r.getInt(1))).toSeq.sorted shouldBe fin.sorted
    } finally q.stop()
  }

  test("applyCdc replication: continuous ADOPTION of a live external " +
    "Iceberg table into a graft mirror via cdc=true") {
    val src = mkTable("m5", mor = true)
    val dest = Files.createTempDirectory("cdc-adopt-dest")
    sql(s"CALL g.system.iceberg_export('m5', 'main', 'db.t', '$dest', " +
      "sync => true)")
    sql("CREATE NAMESPACE g.m5mirror")
    sql("CREATE NAMESPACE g.m5mirror.main.db")
    sql("CREATE TABLE g.m5mirror.main.db.t (id INT, v INT)")
    val q = spark.readStream.format("iceberg-changes")
      .option("cdc", "true").load(dest.toString)
      .writeStream
      .foreachBatch(graft.versioned.TableOps.applyCdc(
        "g.m5mirror.main.db.t", Seq("id")))
      .start()
    try {
      val fin = keyedWalk(src, new scala.util.Random(13), 10)(
        () => q.processAllAvailable())
      spark.table("g.m5mirror.main.db.t").collect()
        .map(r => (r.getInt(0), r.getInt(1))).toSeq.sorted shouldBe fin.sorted
    } finally q.stop()
  }

  test("external iceberg-changes cdc=true: random MoR walk through a " +
    "live sync dest — accumulated CDC reconstructs the final state") {
    val tbl = mkTable("m3", mor = true)
    val dest = Files.createTempDirectory("cdc-model-dest")
    sql(s"CALL g.system.iceberg_export('m3', 'main', 'db.t', '$dest', " +
      "sync => true)")
    val q = spark.readStream.format("iceberg-changes")
      .option("cdc", "true").load(dest.toString)
      .writeStream.format("memory").queryName("cdc_m3")
      .outputMode("append").start()
    try {
      val fin = randomWalk(tbl, new scala.util.Random(42), 12,
        canCompact = true)(() => q.processAllAvailable())
      reconstruct("cdc_m3").sorted shouldBe fin.sorted
    } finally q.stop()
  }
}
