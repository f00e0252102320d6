package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.scalatest.matchers.should.Matchers

import graft.versioned.{GraftRepo, TableOps}

/** Randomized MODEL test of the whole versioned-repo contract.
  *
  * A seeded random walk of keyed DML (INSERT / UPDATE / DELETE /
  * MERGE-upsert / compaction) runs against a graft table while a pure
  * in-memory model (`Map[id → v]`) shadows every step, snapshotting the
  * model at every commit. Branching copies the model, a dev-side walk
  * mutates only the branch, merge folds it back. The walk then checks
  * FOUR independent read surfaces against the recorded snapshots:
  *
  *  1. live state per branch           == model state
  *  2. `VERSION AS OF c`               == snapshot at c   (every commit)
  *  3. `changesBetween(ci, cj)` applied
  *     to snapshot(ci)                 == snapshot(cj)    (random pairs,
  *     spanning merges and state-neutral compactions)
  *  4. `CALL rollback(c)` then read    == snapshot at c
  *
  * The scripted specs (VersionedSpec, CdcModelSpec) each pin ONE flow;
  * this walk composes them in random interleavings, so invariants that
  * only break across operation boundaries (a compaction between the two
  * refs of a changes diff, time travel to a commit that predates a
  * merge, ...) get adversarial coverage.
  */
class RepoModelSpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.catalog.g", classOf[graft.catalog.GraftCatalog].getName)
    .config("spark.sql.catalog.g.root",
      Files.createTempDirectory("graft-repomodel").toString)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def sql(q: String) = spark.sql(q)

  private type State = Map[Int, Int]

  /** One branch's shadow: current model state + (commit, snapshot) log. */
  private final class Shadow(var state: State) {
    val log = scala.collection.mutable.Buffer.empty[(String, State)]
  }

  private def readState(tbl: String): State =
    spark.table(tbl).collect().map(r => (r.getInt(0), r.getInt(1))).toMap

  private def readAsOf(tbl: String, commit: String): State =
    sql(s"SELECT * FROM $tbl VERSION AS OF '$commit'")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toMap

  /** Apply one random keyed op to BOTH the table and the model, then
    * record the branch head commit + model snapshot.
    */
  private def step(repo: GraftRepo, ns: String, branch: String,
      sh: Shadow, rnd: scala.util.Random, nextId: () => Int): Unit = {
    val tbl = s"g.$ns.$branch.db.t"
    rnd.nextInt(6) match {
      case 0 | 1 => // insert fresh keys
        val rows = (0 until 1 + rnd.nextInt(3)).map { _ =>
          val id = nextId(); (id, rnd.nextInt(50))
        }
        sql(s"INSERT INTO $tbl VALUES " +
          rows.map { case (i, v) => s"($i, $v)" }.mkString(", "))
        sh.state = sh.state ++ rows
      case 2 if sh.state.nonEmpty => // update a random live slice
        val ids = rnd.shuffle(sh.state.keys.toSeq).take(1 + rnd.nextInt(3))
        sql(s"UPDATE $tbl SET v = v + 1000 " +
          s"WHERE id IN (${ids.mkString(", ")})")
        sh.state = sh.state ++ ids.map(i => i -> (sh.state(i) + 1000))
      case 3 if sh.state.nonEmpty => // delete a random live slice
        val ids = rnd.shuffle(sh.state.keys.toSeq).take(1 + rnd.nextInt(2))
        sql(s"DELETE FROM $tbl WHERE id IN (${ids.mkString(", ")})")
        sh.state = sh.state -- ids
      case 4 => // MERGE upsert: touch one live key, insert one fresh key
        val fresh = nextId()
        val hit = if (sh.state.nonEmpty)
          sh.state.keys.toSeq(rnd.nextInt(sh.state.size)) else fresh
        sql(
          s"""MERGE INTO $tbl t
             |USING (SELECT * FROM VALUES ($hit, 7777), ($fresh, 8888)
             |       AS s(id, v)) s
             |ON t.id = s.id
             |WHEN MATCHED THEN UPDATE SET v = s.v
             |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)
             |""".stripMargin)
        sh.state = sh.state + (hit -> 7777) + (fresh -> 8888)
      case _ if sh.state.nonEmpty => // state-neutral compaction commit
        sql(s"CALL g.system.compact('$ns', '$branch', 'db.t')")
      case _ => // nothing live yet — seed a row instead
        val i = nextId(); val v = rnd.nextInt(50)
        sql(s"INSERT INTO $tbl VALUES ($i, $v)")
        sh.state = sh.state + (i -> v)
    }
    sh.log += ((repo.headCommit(branch).id, sh.state))
  }

  /** Net-change application: snapshot(from) + changesBetween == to. */
  private def applyChanges(repo: GraftRepo, from: (String, State),
      to: (String, State)): Unit = {
    val ch = TableOps.changesBetween(spark, repo, from._1, to._1, "db/t")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2)))
    val afterDel = ch.filter(_._3 == "delete").foldLeft(from._2) {
      case (st, (id, v, _)) =>
        withClue(s"retracting a row the model never had: ($id, $v)") {
          st.get(id) shouldBe Some(v)
        }
        st - id
    }
    val fin = ch.filter(_._3 == "insert").foldLeft(afterDel) {
      case (st, (id, v, _)) => st + (id -> v)
    }
    fin shouldBe to._2
  }

  private def runWalk(ns: String, mor: Boolean, seed: Int): Unit = {
    sql(s"CREATE NAMESPACE g.$ns")
    sql(s"CREATE NAMESPACE g.$ns.main.db")
    val props =
      if (mor) " TBLPROPERTIES ('graft.delete.mode'='merge-on-read', " +
        "'graft.update.mode'='merge-on-read')"
      else ""
    sql(s"CREATE TABLE g.$ns.main.db.t (id INT, v INT)$props")
    val root = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.catalog.g.root"), ns)
    val repo = GraftRepo.open(root)
    val rnd = new scala.util.Random(seed)
    var id = 0
    val nextId = () => { id += 1; id }

    // phase 1: main-only walk
    val main = new Shadow(Map.empty)
    (0 until 8).foreach(_ => step(repo, ns, "main", main, rnd, nextId))

    // branch dev off main's head, walk ONLY dev, merge back
    sql(s"CREATE NAMESPACE g.$ns.dev")
    val dev = new Shadow(main.state)
    dev.log += ((repo.headCommit("dev").id, dev.state))
    (0 until 6).foreach(_ => step(repo, ns, "dev", dev, rnd, nextId))
    sql(s"CALL g.system.merge('$ns', 'dev', 'main')")
    main.state = dev.state
    main.log += ((repo.headCommit("main").id, main.state))

    // phase 3: diverge — more ops on main; dev stays frozen
    (0 until 5).foreach(_ => step(repo, ns, "main", main, rnd, nextId))

    // 1. live state, both branches
    readState(s"g.$ns.main.db.t") shouldBe main.state
    readState(s"g.$ns.dev.db.t") shouldBe dev.state

    // 2. time travel to EVERY recorded main commit
    main.log.foreach { case (c, snap) =>
      withClue(s"VERSION AS OF $c") {
        readAsOf(s"g.$ns.main.db.t", c) shouldBe snap
      }
    }

    // 3. changesBetween over random commit pairs (and the full span)
    val picks = Seq.fill(5) {
      val i = rnd.nextInt(main.log.size - 1)
      (i, i + 1 + rnd.nextInt(main.log.size - 1 - i))
    } :+ ((0, main.log.size - 1))
    picks.foreach { case (i, j) =>
      withClue(s"changes ${i}→$j of ${main.log.size}") {
        applyChanges(repo, main.log(i), main.log(j))
      }
    }

    // 4. rollback main to a random mid commit
    val (backTo, backState) = main.log(main.log.size / 2)
    sql(s"CALL g.system.rollback('$ns', 'main', '$backTo')")
    readState(s"g.$ns.main.db.t") shouldBe backState
  }

  test("random DML/branch/merge walk, copy-on-write: live state, time " +
    "travel, changes, and rollback all agree with the model") {
    runWalk("rm1", mor = false, seed = 17)
  }

  test("random DML/branch/merge walk, merge-on-read: tombstoned reads " +
    "agree with the model on every surface") {
    runWalk("rm2", mor = true, seed = 23)
  }
}
