package graft

import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.URI
import java.nio.file.Files

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.scalatest.matchers.should.Matchers

import graft.versioned.{GraftRepo, IcebergRestServer}

/** The embedded Iceberg REST catalog served over a live graft repo,
  * exercised with a plain JDK HTTP client exactly as an external
  * engine's REST client would: config → namespace walk → table listing
  * → loadTable — then the served `metadata-location` is ACTUALLY READ
  * through the independent `iceberg_import` reader and compared to the
  * graft table, closing the loop a remote engine would close. Covers
  * branch + tag refs, on-demand re-export after DML (new metadata
  * version, old one still readable), memoized re-serve (no new
  * version), the spec's 0x1F multi-level namespace encoding, spec-shaped
  * 404/405 ErrorResponses, and read-only enforcement.
  */
class IcebergRestServerSpec extends AnyFunSuite with Matchers
    with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.catalog.g", classOf[graft.catalog.GraftCatalog].getName)
    .config("spark.sql.catalog.g.root",
      Files.createTempDirectory("graft-rest").toString)
    .getOrCreate()

  private val mapper = new ObjectMapper()
  private val http = HttpClient.newHttpClient()

  private var server: IcebergRestServer = _
  private var base: String = _

  private def sql(q: String) = spark.sql(q)

  private def get(path: String): (Int, JsonNode) = {
    val r = http.send(
      HttpRequest.newBuilder(URI.create(s"$base$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), mapper.readTree(r.body()))
  }

  /** Namespace levels → URL segment (spec: %1F-joined). */
  private def enc(levels: String*): String =
    java.net.URLEncoder.encode(levels.mkString(""), "UTF-8")

  override def beforeAll(): Unit = {
    sql("CREATE NAMESPACE g.rest")
    sql("CREATE NAMESPACE g.rest.main.db")
    sql("CREATE TABLE g.rest.main.db.t (id INT, v STRING)")
    sql("INSERT INTO g.rest.main.db.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    sql("CREATE TABLE g.rest.main.db.u (k INT)")
    sql("INSERT INTO g.rest.main.db.u VALUES (10)")
    sql("CALL g.system.create_tag('rest', 'v1', 'main')")
    sql("CREATE NAMESPACE g.rest.dev") // zero-copy branch
    sql("INSERT INTO g.rest.dev.db.t VALUES (4, 'd')")
    val root = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.catalog.g.root"), "rest")
    server = IcebergRestServer.start(GraftRepo.open(root),
      Files.createTempDirectory("graft-rest-exports"), Some(spark))
    base = server.uri
  }

  override def afterAll(): Unit = {
    if (server != null) server.close()
    spark.stop()
  }

  test("config endpoint answers the spec shape") {
    val (code, body) = get("/v1/config")
    code shouldBe 200
    body.has("defaults") shouldBe true
    body.has("overrides") shouldBe true
  }

  test("namespace walk: refs at the top level, dbs under a ref, " +
    "identifiers under a db") {
    val (c1, roots) = get("/v1/namespaces")
    c1 shouldBe 200
    val tops = roots.get("namespaces").asScala()
    tops should contain allOf (Seq("main"), Seq("dev"), Seq("v1"))

    val (c2, dbs) = get(s"/v1/namespaces?parent=${enc("main")}")
    c2 shouldBe 200
    dbs.get("namespaces").asScala() shouldBe
      Seq(Seq("main", "db"))

    val (c3, ids) = get(s"/v1/namespaces/${enc("main", "db")}/tables")
    c3 shouldBe 200
    val names = {
      val it = ids.get("identifiers").elements()
      Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
        .map(_.get("name").asText()).toSeq
    }
    names.sorted shouldBe Seq("t", "u")

    val (c4, ns) = get(s"/v1/namespaces/${enc("main")}")
    c4 shouldBe 200
    ns.get("properties").get("graft.kind").asText() shouldBe "branch"
    ns.get("properties").has("graft.head") shouldBe true
  }

  private implicit class NsIter(it: JsonNode) {
    def asScala(): Seq[Seq[String]] = {
      val e = it.elements()
      Iterator.continually(e).takeWhile(_.hasNext).map(_.next())
        .map { arr =>
          val ee = arr.elements()
          Iterator.continually(ee).takeWhile(_.hasNext)
            .map(_.next().asText()).toSeq
        }.toSeq
    }
  }

  /** loadTable → import the served metadata-location → rows. */
  private def loadRows(ref: String, table: String): (JsonNode, Seq[(Int, String)]) = {
    val (code, body) = get(s"/v1/namespaces/${enc(ref, "db")}/tables/$table")
    withClue(body.toString) { code shouldBe 200 }
    val loc = body.get("metadata-location").asText()
    val view = "rest_" + java.util.UUID.randomUUID().toString.take(8)
    sql(s"CALL g.system.iceberg_import('$loc', '$view')")
    val rows = spark.table(view).collect()
      .map(r => (r.getInt(0), if (r.schema.length > 1) r.getString(1) else ""))
      .toSeq.sorted
    (body, rows)
  }

  test("loadTable serves real metadata an independent Iceberg reader " +
    "round-trips; branch and tag refs see their own versions") {
    val (body, rows) = loadRows("main", "t")
    rows shouldBe Seq((1, "a"), (2, "b"), (3, "c"))
    body.get("metadata").get("format-version").asInt() should be >= 1
    body.get("metadata").has("current-snapshot-id") shouldBe true
    java.nio.file.Paths.get(
      body.get("metadata-location").asText()).toFile.exists() shouldBe true

    val (_, devRows) = loadRows("dev", "t")
    devRows shouldBe Seq((1, "a"), (2, "b"), (3, "c"), (4, "d"))

    val (_, tagRows) = loadRows("v1", "t")
    tagRows shouldBe Seq((1, "a"), (2, "b"), (3, "c"))
  }

  test("re-serve is memoized; DML re-exports at the next version and " +
    "the old metadata stays readable in place") {
    val (b1, _) = loadRows("main", "u")
    val (b2, _) = loadRows("main", "u")
    b2.get("metadata-location").asText() shouldBe
      b1.get("metadata-location").asText()

    sql("INSERT INTO g.rest.main.db.u VALUES (20)")
    val (b3, rows) = loadRows("main", "u")
    rows.map(_._1) shouldBe Seq(10, 20)
    b3.get("metadata-location").asText() should not be
      b1.get("metadata-location").asText()
    // an external reader mid-poll on the OLD location keeps working
    java.nio.file.Paths.get(
      b1.get("metadata-location").asText()).toFile.exists() shouldBe true
  }

  test("warehouse mode: config?warehouse hands out the prefix, prefixed " +
    "routes serve every repo under the root, missing prefix is actionable") {
    sql("CREATE NAMESPACE g.wh2")
    sql("CREATE NAMESPACE g.wh2.main.db")
    sql("CREATE TABLE g.wh2.main.db.z (a INT)")
    sql("INSERT INTO g.wh2.main.db.z VALUES (42)")
    val reposRoot = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.catalog.g.root"))
    val srv2 = IcebergRestServer.startWarehouse(reposRoot,
      Files.createTempDirectory("graft-wh-exports"), Some(spark))
    def getAt(path: String): (Int, JsonNode) = {
      val r = http.send(
        HttpRequest.newBuilder(URI.create(s"${srv2.uri}$path")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      (r.statusCode(), mapper.readTree(r.body()))
    }
    try {
      val (c0, cfg) = getAt("/v1/config?warehouse=wh2")
      c0 shouldBe 200
      cfg.get("overrides").get("prefix").asText() shouldBe "wh2"
      getAt("/v1/config?warehouse=nope")._1 shouldBe 404

      // both repos reachable through their prefixes, fully isolated
      val (c1, body) = getAt(
        s"/v1/wh2/namespaces/${enc("main", "db")}/tables/z")
      withClue(body.toString) { c1 shouldBe 200 }
      val view = "wh_" + java.util.UUID.randomUUID().toString.take(8)
      sql(s"CALL g.system.iceberg_import(" +
        s"'${body.get("metadata-location").asText()}', '$view')")
      spark.table(view).collect().map(_.getInt(0)).toSeq shouldBe Seq(42)

      val (c2, roots) = getAt("/v1/rest/namespaces")
      c2 shouldBe 200
      roots.get("namespaces").asScala() should contain (Seq("main"))

      // unprefixed namespace routes don't resolve in warehouse mode
      val (c3, err) = getAt("/v1/namespaces")
      c3 shouldBe 404
      err.get("error").get("message").asText() should include ("warehouse")
    } finally srv2.close()
  }

  test("HEAD table: 200 when present, bodyless 404 when missing") {
    def head(path: String): Int = http.send(
      HttpRequest.newBuilder(URI.create(s"$base$path"))
        .method("HEAD", HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString()).statusCode()
    head(s"/v1/namespaces/${enc("main", "db")}/tables/t") shouldBe 200
    head(s"/v1/namespaces/${enc("main", "db")}/tables/nope") shouldBe 404
  }

  test("concurrent loadTable during live DML always serves a complete, " +
    "self-consistent metadata version") {
    sql("CREATE TABLE g.rest.main.db.c (n INT)")
    sql("INSERT INTO g.rest.main.db.c VALUES (0)")
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val readers = (1 to 4).map { _ =>
      new Thread(() => {
        while (!stop.get()) {
          val (code, body) =
            get(s"/v1/namespaces/${enc("main", "db")}/tables/c")
          if (code != 200) bad.add(s"$code: $body")
          else {
            // the inline metadata must be a complete table-metadata doc
            // whose location exists — never a torn/partial publish
            if (!body.get("metadata").has("current-snapshot-id") ||
              !java.nio.file.Files.exists(java.nio.file.Paths.get(
                body.get("metadata-location").asText())))
              bad.add(s"torn: $body")
          }
        }
      })
    }
    readers.foreach(_.start())
    try (1 to 6).foreach { i =>
      sql(s"INSERT INTO g.rest.main.db.c VALUES ($i)")
    } finally {
      stop.set(true); readers.foreach(_.join(20000))
    }
    bad.asScalaQ shouldBe empty
    // after the dust settles the newest serve reflects the final state
    val (_, fin) = get(s"/v1/namespaces/${enc("main", "db")}/tables/c")
    val view = "cc_" + java.util.UUID.randomUUID().toString.take(8)
    sql(s"CALL g.system.iceberg_import(" +
      s"'${fin.get("metadata-location").asText()}', '$view')")
    spark.table(view).collect().map(_.getInt(0)).toSeq.sorted shouldBe
      (0 to 6)
  }

  private implicit class QOps(q: java.util.concurrent.ConcurrentLinkedQueue[String]) {
    def asScalaQ: Seq[String] = {
      val it = q.iterator()
      Iterator.continually(it).takeWhile(_.hasNext).map(_.next()).toSeq
    }
  }

  test("spec-shaped errors: 404 NoSuchTable/NoSuchNamespace, 405 on " +
    "writes") {
    val (c1, e1) = get(s"/v1/namespaces/${enc("main", "db")}/tables/nope")
    c1 shouldBe 404
    e1.get("error").get("type").asText() shouldBe "NoSuchTableException"
    e1.get("error").get("code").asInt() shouldBe 404

    val (c2, e2) = get(s"/v1/namespaces/${enc("nobranch")}")
    c2 shouldBe 404
    e2.get("error").get("type").asText() shouldBe "NoSuchNamespaceException"

    val r = http.send(
      HttpRequest.newBuilder(URI.create(s"$base/v1/namespaces"))
        .POST(HttpRequest.BodyPublishers.ofString("{}")).build(),
      HttpResponse.BodyHandlers.ofString())
    r.statusCode() shouldBe 405
    mapper.readTree(r.body()).get("error").get("type").asText() shouldBe
      "UnsupportedOperationException"
  }
}
