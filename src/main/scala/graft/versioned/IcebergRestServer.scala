package graft.versioned

import java.net.InetSocketAddress
import java.nio.file.{Files, Path}
import java.util.concurrent.{ConcurrentHashMap, Executors}

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.SparkSession

/** Embedded read-only Apache Iceberg REST catalog over graft repos.
  *
  * The reference is an Iceberg CATALOG ADAPTER — external engines reach
  * versioned tables through the Iceberg catalog API
  * (`LakeFSCatalog.java:42-334`). graft's native surface is a Spark DSv2
  * catalog, so this server re-expresses the same attachability in the
  * direction external engines actually speak today: the public Iceberg
  * REST Catalog protocol (apache/iceberg
  * `open-api/rest-catalog-open-api.yaml`). Any engine with an Iceberg
  * REST client (Spark, Trino, PyIceberg, DuckDB) can list and load graft
  * tables — on any branch or tag — without graft code on its classpath.
  *
  * Mapping: a REST namespace is `[ref]` (branch or tag) or
  * `[ref, db...]`; a table identifier is `{namespace: [ref, db],
  * name: t}` for graft key `db/t` read at `ref`. Multi-level namespaces
  * use the spec's 0x1F unit-separator encoding in URLs.
  *
  * Two serving modes:
  *  - [[IcebergRestServer.start]] — ONE repo at `/v1/namespaces/...`.
  *  - [[IcebergRestServer.startWarehouse]] — every repo under a root
  *    dir, routed by the spec's `prefix` path segment
  *    (`/v1/{repo}/namespaces/...`); a client asking
  *    `GET /v1/config?warehouse=<repo>` is answered with the prefix
  *    override, which is exactly how multi-tenant REST catalogs hand
  *    out routing.
  *
  * `loadTable` serves REAL Iceberg metadata: the graft snapshot exports
  * on demand into `exportRoot/(<repo>/)<ref>/<key>` ([[IcebergExport]] —
  * data files referenced zero-copy in place), memoized by the snapshot
  * id stamped in the exported metadata (`graft.source-snapshot`), so an
  * unchanged table re-serves its existing metadata with zero work and a
  * changed table re-exports O(changed chunks) at the NEXT version number
  * (readers polling older metadata keep reading it in place — same
  * contract as sync dests). Read-only: every mutating verb answers 405
  * with a spec-shaped ErrorResponse; commits stay graft's (the
  * reference's write path is its engine-side catalog, not REST).
  */
final class IcebergRestServer private (single: Option[GraftRepo],
    reposRoot: Option[Path], exportRoot: Path, spark: Option[SparkSession],
    maxSnapshots: Int, formatVersion: Int, server: HttpServer) {

  def port: Int = server.getAddress.getPort

  def uri: String = s"http://127.0.0.1:$port"

  def close(): Unit = server.stop(0)

  private val mapper = new ObjectMapper()
  private val exportLocks = new ConcurrentHashMap[String, Object]()
  private val repoCache = new ConcurrentHashMap[String, GraftRepo]()

  /** The repo a request's optional `{prefix}` segment addresses. */
  private def repoFor(prefix: Option[String]): GraftRepo = (prefix, single) match {
    case (None, Some(r)) => r
    case (Some(p), None) =>
      val root = reposRoot.get.resolve(p)
      if (p.contains("/") || p.contains("..") ||
        !Files.isDirectory(root.resolve("refs")))
        throw new NoSuchElementException(s"no such repo (prefix): $p")
      repoCache.computeIfAbsent(p, _ => GraftRepo.open(root))
    case (Some(p), Some(_)) =>
      throw new NoSuchElementException(
        s"no such route: this server hosts one repo, got prefix $p")
    case (None, None) =>
      throw new NoSuchElementException(
        "missing {prefix}: this server hosts a warehouse — ask " +
          "GET /v1/config?warehouse=<repo> for your prefix")
  }

  // ---- request routing ---------------------------------------------------

  private[versioned] def handle(ex: HttpExchange): Unit = {
    val method = ex.getRequestMethod
    // URI.getPath is percent-DECODED: a %1F namespace separator is
    // already the raw 0x1F char here
    val segs = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty).toSeq
    val query = Option(ex.getRequestURI.getRawQuery)
    try {
      // /v1/config and /v1[/{prefix}]/namespaces/...
      val (prefix, route) = segs match {
        case "v1" +: tail => tail match {
          case "config" +: _ => (None, tail)
          case "namespaces" +: _ => (None, tail)
          case p +: rest if rest.headOption.contains("namespaces") =>
            (Some(p), rest)
          case _ => (None, tail)
        }
        case _ => (None, segs)
      }
      (method, route) match {
        case ("GET", Seq("config")) =>
          reply(ex, 200, config(query))
        case ("GET", Seq("namespaces")) =>
          reply(ex, 200, listNamespaces(repoFor(prefix), query))
        case ("GET", Seq("namespaces", ns)) =>
          reply(ex, 200, describeNamespace(repoFor(prefix), levels(ns)))
        case ("GET", Seq("namespaces", ns, "tables")) =>
          reply(ex, 200, listTables(repoFor(prefix), levels(ns)))
        case ("GET", Seq("namespaces", ns, "tables", t)) =>
          reply(ex, 200, loadTable(repoFor(prefix), prefix, levels(ns), t))
        case ("HEAD", Seq("namespaces", ns, "tables", t)) =>
          resolveKey(repoFor(prefix), levels(ns), t) // throws -> 404
          ex.sendResponseHeaders(200, -1); ex.close()
        case ("GET" | "HEAD", _) =>
          throw new NoSuchElementException(
            s"no such route: ${segs.mkString("/")}")
        case _ =>
          replyError(ex, 405, "UnsupportedOperationException",
            s"graft REST catalog is read-only: $method not supported")
      }
    } catch {
      case e: NoSuchElementException =>
        val msg = Option(e.getMessage).getOrElse("not found")
        val t = if (msg.startsWith("no such table")) "NoSuchTableException"
        else "NoSuchNamespaceException"
        replyError(ex, 404, t, msg)
      case e: Exception =>
        replyError(ex, 500, e.getClass.getSimpleName,
          Option(e.getMessage).getOrElse("internal error"))
    }
  }

  /** Namespace URL segment → levels (spec: joined by 0x1F). */
  private def levels(seg: String): Seq[String] =
    seg.split('\u001F').filter(_.nonEmpty).toSeq

  private def queryParam(rawQuery: Option[String], name: String): Option[String] =
    rawQuery.flatMap(_.split("&").collectFirst {
      case kv if kv.startsWith(s"$name=") =>
        java.net.URLDecoder.decode(kv.drop(name.length + 1), "UTF-8")
    })

  // ---- endpoint bodies ---------------------------------------------------

  private def config(rawQuery: Option[String]): ObjectNode = {
    val o = mapper.createObjectNode()
    o.set[ObjectNode]("defaults", mapper.createObjectNode())
    val overrides = mapper.createObjectNode()
    queryParam(rawQuery, "warehouse").filter(_ => single.isEmpty)
      .foreach { w =>
        repoFor(Some(w)) // 404 on an unknown repo
        overrides.put("prefix", w)
      }
    o.set[ObjectNode]("overrides", overrides)
    o
  }

  private def refNames(repo: GraftRepo): Seq[String] =
    repo.branches ++ repo.tags

  /** Table keys visible at `ref`, as path-segment lists. */
  private def keysAt(repo: GraftRepo, ref: String): Seq[Seq[String]] =
    repo.resolve(ref).tables.keys.toSeq.sorted.map(_.split('/').toSeq)

  private def listNamespaces(repo: GraftRepo,
      rawQuery: Option[String]): ObjectNode = {
    val parent = queryParam(rawQuery, "parent").map(levels).getOrElse(Nil)
    val children: Seq[Seq[String]] = parent match {
      case Nil => refNames(repo).map(Seq(_))
      case ref +: dirs =>
        if (!refNames(repo).contains(ref)) throwNoNs(parent)
        keysAt(repo, ref)
          .filter(k => k.length > dirs.length + 1 && k.startsWith(dirs))
          .map(k => parent :+ k(dirs.length)).distinct
    }
    val o = mapper.createObjectNode()
    val arr = o.putArray("namespaces")
    children.foreach { ns =>
      val a = arr.addArray(); ns.foreach(a.add)
    }
    o
  }

  private def throwNoNs(ns: Seq[String]): Nothing =
    throw new NoSuchElementException(
      s"no such namespace: ${ns.mkString(".")}")

  private def describeNamespace(repo: GraftRepo,
      ns: Seq[String]): ObjectNode = {
    val props = mapper.createObjectNode()
    ns match {
      case Seq(ref) if repo.branchExists(ref) =>
        props.put("graft.kind", "branch")
        props.put("graft.head", repo.headCommit(ref).id)
      case Seq(ref) if repo.tagExists(ref) =>
        props.put("graft.kind", "tag")
      case ref +: dirs if refNames(repo).contains(ref) && dirs.nonEmpty &&
        keysAt(repo, ref).exists(k => k.length > dirs.length &&
          k.startsWith(dirs)) => ()
      case _ => throwNoNs(ns)
    }
    val o = mapper.createObjectNode()
    val a = o.putArray("namespace"); ns.foreach(a.add)
    o.set[ObjectNode]("properties", props)
    o
  }

  private def listTables(repo: GraftRepo, ns: Seq[String]): ObjectNode =
    ns match {
      case ref +: dirs if refNames(repo).contains(ref) =>
        val o = mapper.createObjectNode()
        val arr = o.putArray("identifiers")
        keysAt(repo, ref).filter(k => k.length == dirs.length + 1 &&
          k.startsWith(dirs)).foreach { k =>
          val id = arr.addObject()
          val a = id.putArray("namespace"); ns.foreach(a.add)
          id.put("name", k.last)
        }
        o
      case _ => throwNoNs(ns)
    }

  /** `(ref, graft table key)` for an identifier, or NoSuchElement. */
  private def resolveKey(repo: GraftRepo, ns: Seq[String],
      name: String): (String, String) = ns match {
    case ref +: dirs if dirs.nonEmpty =>
      val key = (dirs :+ name).mkString("/")
      if (!refNames(repo).contains(ref) ||
        !repo.resolve(ref).tables.contains(key))
        throw new NoSuchElementException(s"no such table: $key @ $ref")
      (ref, key)
    case _ => throw new NoSuchElementException(
      s"no such table: ${(ns :+ name).mkString(".")}")
  }

  private def loadTable(repo: GraftRepo, prefix: Option[String],
      ns: Seq[String], name: String): ObjectNode = {
    val (ref, key) = resolveKey(repo, ns, name)
    val dest = prefix.fold(exportRoot)(exportRoot.resolve)
      .resolve(ref).resolve(key)
    val lock = exportLocks.computeIfAbsent(dest.toString, _ => new Object)
    val metaPath = lock.synchronized {
      val want = repo.resolve(ref).tables(key)
      val v = IcebergSync.latestVersion(dest)
      val served = if (v == 0) None else scala.util.Try {
        mapper.readTree(Files.readString(
          dest.resolve(s"metadata/v$v.metadata.json")))
          .get("properties").get("graft.source-snapshot").asText()
      }.toOption
      if (served.contains(want)) dest.resolve(s"metadata/v$v.metadata.json")
      else IcebergExport.export(repo, ref, key, dest, spark,
        maxSnapshots, v + 1, formatVersion)
    }
    val o = mapper.createObjectNode()
    o.put("metadata-location", metaPath.toString)
    o.set[ObjectNode]("metadata",
      mapper.readTree(Files.readString(metaPath)).asInstanceOf[ObjectNode])
    o.set[ObjectNode]("config", mapper.createObjectNode())
    o
  }

  // ---- plumbing ----------------------------------------------------------

  private def reply(ex: HttpExchange, code: Int, body: ObjectNode): Unit = {
    val bytes = mapper.writeValueAsBytes(body)
    ex.getResponseHeaders.add("Content-Type", "application/json")
    if (ex.getRequestMethod == "HEAD") { // a HEAD response has no body
      ex.sendResponseHeaders(code, -1)
    } else {
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
    }
    ex.close()
  }

  /** Spec ErrorResponse: `{"error": {message, type, code}}`. */
  private def replyError(ex: HttpExchange, code: Int, typ: String,
      msg: String): Unit = {
    val o = mapper.createObjectNode()
    val e = o.putObject("error")
    e.put("message", msg); e.put("type", typ); e.put("code", code)
    reply(ex, code, o)
  }
}

object IcebergRestServer {

  /** Start serving ONE `repo` on 127.0.0.1:`port` (0 = ephemeral; read
    * the bound port back from [[IcebergRestServer.port]]). `exportRoot`
    * holds the on-demand per-(ref, table) Iceberg export dests — give a
    * persistent path to keep exports warm across server restarts.
    * `maxSnapshots` / `formatVersion` pass through to
    * [[IcebergExport.export]] (history depth; 0 = auto format).
    */
  def start(repo: GraftRepo, exportRoot: Path,
      spark: Option[SparkSession] = None, port: Int = 0,
      maxSnapshots: Int = 1, formatVersion: Int = 0): IcebergRestServer =
    boot(Some(repo), None, exportRoot, spark, port, maxSnapshots,
      formatVersion)

  /** Start serving EVERY repo under `reposRoot` (a graft catalog root:
    * each child dir with a `refs/` dir is a repo), routed by the spec's
    * `{prefix}` segment — `/v1/<repo>/namespaces/...`. Clients discover
    * their prefix the spec way: `GET /v1/config?warehouse=<repo>`
    * answers `{"overrides": {"prefix": "<repo>"}}`. Repos created after
    * the server started are served on first touch (no restart).
    */
  def startWarehouse(reposRoot: Path, exportRoot: Path,
      spark: Option[SparkSession] = None, port: Int = 0,
      maxSnapshots: Int = 1, formatVersion: Int = 0): IcebergRestServer =
    boot(None, Some(reposRoot), exportRoot, spark, port, maxSnapshots,
      formatVersion)

  private def boot(single: Option[GraftRepo], reposRoot: Option[Path],
      exportRoot: Path, spark: Option[SparkSession], port: Int,
      maxSnapshots: Int, formatVersion: Int): IcebergRestServer = {
    Files.createDirectories(exportRoot)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    val srv = new IcebergRestServer(single, reposRoot, exportRoot, spark,
      maxSnapshots, formatVersion, server)
    server.createContext("/", (ex: HttpExchange) => srv.handle(ex))
    server.setExecutor(Executors.newFixedThreadPool(4, r => {
      val t = new Thread(r, "graft-rest-catalog"); t.setDaemon(true); t
    }))
    server.start()
    srv
  }
}
