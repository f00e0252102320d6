package graft.catalog

import java.nio.file.{Path, Paths}
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NonEmptyNamespaceException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.versioned.{GraftIO, GraftRepo, HadoopFsObjectStoreClient, LocalGraftIO, ObjectStoreGraftIO, TableOps}

/** Spark TableCatalog over graft repos: identifiers are
  * `<catalog>.<repo>.<branch>.<db>.<table>`, the same addressing scheme
  * the reference exposes (LakeFSCatalog.java:42 — `lakefs.repo.branch
  * .db.table`). Register with:
  * {{{
  *   spark.sql.catalog.g      = graft.catalog.GraftCatalog
  *   spark.sql.catalog.g.root = /path/to/warehouse
  * }}}
  * Namespace levels: `[repo]`, `[repo, branch]`, `[repo, branch, db]`.
  * `CREATE NAMESPACE g.repo` initializes a repo (with branch `main`);
  * `CREATE NAMESPACE g.repo.dev` creates branch `dev` from `main`
  * (zero-copy); `CREATE NAMESPACE g.repo.main.db` creates a database on
  * that branch (a commit). `USE g.repo.branch.db`, `SHOW TABLES`,
  * SELECT/INSERT/DELETE and `VERSION AS OF '<commitId>'` all work from
  * SQL; branch/commit/merge/diff are Scala API (graft.versioned).
  *
  * Rename is unsupported, mirroring the reference
  * (LakeFSCatalog.java:218).
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog
    with FunctionCatalog
    with org.apache.spark.sql.connector.catalog.StagingTableCatalog
    with org.apache.spark.sql.connector.catalog.ViewCatalog {

  private var catalogName: String = _
  private var root: Path = _
  // the storage seam every repo opened by this catalog uses — selected
  // by the catalog option `io` so a deployment picks its metadata
  // backend in spark conf (GraftIO docs spell out the set-if-absent
  // contract a backend must supply):
  //   (absent) | local      -> direct filesystem calls (default)
  //   hadoop-object-store   -> ObjectStoreGraftIO over the Hadoop
  //                            FileSystem API (file://, and s3a://
  //                            with conditional writes, HADOOP-19256).
  //                            Data files must live on the same store
  //                            Spark's parquet writers target — the
  //                            production split the reference gets from
  //                            a per-repo Hadoop FS.
  protected var io: GraftIO = LocalGraftIO.instance
  // catalog option `dataRoot`: base Hadoop-FS URI under which each
  // created repo's DATA plane lives (`<dataRoot>/<repo>`) — the
  // object-store-native posture (s3a://bucket) the reference's FileIO
  // has; metadata stays under `root` through `io`. Persisted per repo
  // at create time, so openers need no option.
  private var dataRootBase: Option[String] = None

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    dataRootBase = Option(options.get("dataRoot"))
    io = Option(options.get("io")).getOrElse("local") match {
      case "local" => LocalGraftIO.instance
      case "hadoop-object-store" =>
        new ObjectStoreGraftIO(HadoopFsObjectStoreClient.local())
      case other => throw new IllegalArgumentException(
        s"unknown io backend: $other (local/hadoop-object-store)")
    }
    root = Paths.get(Option(options.get("root")).getOrElse(
      sys.props("java.io.tmpdir") + s"/graft-$name"))
    io.mkdirs(root)
  }

  override def name(): String = catalogName

  // ---- FunctionCatalog: partition-transform functions ------------------
  // Spark resolves a `bucket` transform reported in a scan's
  // KeyGroupedPartitioning (storage-partitioned joins) by loading the
  // function from the TABLE'S catalog with an empty namespace.
  override def listFunctions(ns: Array[String]): Array[Identifier] =
    if (ns.isEmpty)
      GraftFunctions.transforms.keys.toArray.sorted
        .map(n => Identifier.of(Array.empty, n))
    else { checkNs(ns); Array.empty }

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.namespace.isEmpty) GraftFunctions.transforms.getOrElse(ident.name,
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident))
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident)

  private def repoPath(repo: String): Path = root.resolve(repo)
  private def repoExists(repo: String): Boolean =
    GraftRepo.exists(repoPath(repo), io)
  private def repo(ns: Array[String]): GraftRepo = {
    if (!repoExists(ns(0))) throw new NoSuchNamespaceException(ns)
    GraftRepo.open(repoPath(ns(0)), io)
  }
  private def tableKey(ident: Identifier): String =
    s"${ident.namespace()(2)}/${ident.name()}"

  private def checkNs(ns: Array[String]): Unit =
    if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns)

  // ---- versioned SQL views (ViewCatalog) -------------------------------
  //
  // A view definition lives IN the commit, next to the table pointers:
  // CREATE VIEW on a branch is a commit, branches see their own view
  // set (zero-copy at branch create), merge three-ways them, VERSION AS
  // OF-era commits keep the definitions they had. At load the BRANCH
  // segment of the stored resolution namespace is rebound to the branch
  // being read, so a view written with RELATIVE table references
  // follows the reader's branch — views behave like code checked into
  // the repo, the semantics a lakeFS user expects. Fully-qualified
  // references in the view text stay pinned to their branch (the
  // author's explicit choice).

  import org.apache.spark.sql.catalyst.analysis.{NoSuchViewException, ViewAlreadyExistsException}
  import org.apache.spark.sql.connector.catalog.{View, ViewChange, ViewInfo}
  import graft.versioned.ViewDef

  private def viewKey(ident: Identifier): String =
    s"${ident.namespace()(2)}/${ident.name()}"

  private def graftView(ident: Identifier, vd: ViewDef): View = {
    val branch = ident.namespace()(1)
    // rebind the branch segment when the stored context points into
    // this catalog's 3-level namespace shape
    val boundNs =
      if (vd.namespace.length == 3 && vd.catalog == catalogName)
        Array(vd.namespace(0), branch, vd.namespace(2))
      else vd.namespace.toArray
    new View {
      override def name(): String = ident.toString
      override def query(): String = vd.sql
      override def currentCatalog(): String = vd.catalog
      override def currentNamespace(): Array[String] = boundNs
      override def schema(): StructType =
        org.apache.spark.sql.types.DataType.fromJson(vd.schemaJson)
          .asInstanceOf[StructType]
      override def queryColumnNames(): Array[String] = vd.queryColumnNames.toArray
      override def columnAliases(): Array[String] = vd.columnAliases.toArray
      override def columnComments(): Array[String] = vd.columnComments.toArray
      override def properties(): java.util.Map[String, String] =
        vd.properties.asJava
    }
  }

  override def loadView(ident: Identifier): View = {
    val ns = ident.namespace()
    val g = viewRepo(ident) // missing repo/branch -> NoSuchViewException
    g.headCommit(ns(1)).viewMap.get(viewKey(ident)) match {
      case Some(vd) => graftView(ident, vd)
      case None => throw new NoSuchViewException(ident)
    }
  }

  override def createView(info: ViewInfo): View = {
    val ident = info.ident()
    val ns = ident.namespace()
    if (ns.length != 3) throw new NoSuchNamespaceException(ns)
    checkNs(ns)
    val g = repo(ns)
    val key = viewKey(ident)
    val vd = ViewDef(
      sql = info.sql(),
      catalog = info.currentCatalog(),
      namespace = info.currentNamespace().toIndexedSeq,
      schemaJson = info.schema().json,
      queryColumnNames = info.queryColumnNames().toIndexedSeq,
      columnAliases = info.columnAliases().toIndexedSeq,
      columnComments = info.columnComments().toIndexedSeq,
      // reserved keys (comment/owner/engine versions) are kept verbatim:
      // they're catalog-managed metadata, and this catalog stores them
      // in the commit like any other view property
      properties = info.properties().asScala.toMap,
      // canonical [repo, branch, db...] shape marker — lets the REST
      // serve path skip the legacy ref-shape sniff (a degenerate
      // creation namespace keeps 0 and falls back to the heuristic)
      nsForm = if (info.currentNamespace().length >= 2) 2 else 0)
    g.commitRetryViews(ns(1), s"create view $key") { base =>
      if (base.viewMap.contains(key) || base.tables.contains(key))
        throw new ViewAlreadyExistsException(ident)
      base.viewMap + (key -> vd)
    }
    graftView(ident, vd)
  }

  /** Shared shape/existence validation: every ViewCatalog entry point
    * reports a malformed identifier or a missing branch as
    * NoSuchViewException, never an index error or raw IO failure.
    */
  private def viewRepo(ident: Identifier): GraftRepo = {
    val ns = ident.namespace()
    if (ns.length != 3 || !repoExists(ns(0)))
      throw new NoSuchViewException(ident)
    val g = repo(ns)
    if (!g.branchExists(ns(1))) throw new NoSuchViewException(ident)
    g
  }

  override def alterView(ident: Identifier, changes: ViewChange*): View = {
    val ns = ident.namespace()
    val g = viewRepo(ident)
    val key = viewKey(ident)
    val committed = g.commitRetryViews(ns(1), s"alter view $key") { base =>
      val vd = base.viewMap.getOrElse(key, throw new NoSuchViewException(ident))
      val props = changes.foldLeft(vd.properties) {
        case (acc, sp: ViewChange.SetProperty) => acc + (sp.property() -> sp.value())
        case (acc, rp: ViewChange.RemoveProperty) => acc - rp.property()
        case (_, other) => throw new UnsupportedOperationException(
          s"unsupported view change: $other")
      }
      base.viewMap + (key -> vd.copy(properties = props))
    }
    graftView(ident, committed.viewMap(key))
  }

  override def dropView(ident: Identifier): Boolean = {
    val ns = ident.namespace()
    if (ns.length != 3 || !repoExists(ns(0))) return false
    val g = repo(ns)
    if (!g.branchExists(ns(1))) return false
    val key = viewKey(ident)
    if (!g.headCommit(ns(1)).viewMap.contains(key)) return false
    g.commitRetryViews(ns(1), s"drop view $key")(base => base.viewMap - key)
    true
  }

  override def renameView(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val ns = oldIdent.namespace()
    if (!ns.sameElements(newIdent.namespace()))
      throw new UnsupportedOperationException(
        "renaming a view across namespaces is not supported")
    val g = viewRepo(oldIdent)
    val oldKey = viewKey(oldIdent); val newKey = viewKey(newIdent)
    g.commitRetryViews(ns(1), s"rename view $oldKey -> $newKey") { base =>
      val vd = base.viewMap.getOrElse(oldKey,
        throw new NoSuchViewException(oldIdent))
      if (base.viewMap.contains(newKey) || base.tables.contains(newKey))
        throw new ViewAlreadyExistsException(newIdent)
      base.viewMap - oldKey + (newKey -> vd)
    }
  }

  override def listViews(namespace: String*): Array[Identifier] = {
    val ns = namespace.toArray
    if (ns.length != 3) return Array.empty
    checkNs(ns)
    repo(ns).headCommit(ns(1)).viewMap.keys.toArray.sorted
      .filter(_.startsWith(ns(2) + "/"))
      .map(k => Identifier.of(ns, k.substring(ns(2).length + 1)))
  }

  // ---- stored procedures (CALL g.system.<proc>(...)) -------------------

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    if (!ident.namespace().sameElements(Array("system")))
      throw new UnsupportedOperationException(s"unknown procedure namespace: $ident")
    GraftProcedures.load(root, ident.name(), io).getOrElse(
      throw new UnsupportedOperationException(s"unknown procedure: $ident"))
  }

  override def listProcedures(ns: Array[String]): Array[Identifier] =
    if (ns.isEmpty || ns.sameElements(Array("system")))
      GraftProcedures.names.map(n => Identifier.of(Array("system"), n)).toArray
    else Array.empty

  // ---- namespaces ------------------------------------------------------

  override def listNamespaces(): Array[Array[String]] =
    io.list(root)
      .filter(p => GraftRepo.exists(p, io))
      .map(p => Array(p.getFileName.toString)).toArray.sortBy(_.head)

  override def listNamespaces(ns: Array[String]): Array[Array[String]] = ns match {
    case Array() => listNamespaces()
    case Array(r) =>
      repo(ns).branches.map(b => Array(r, b)).toArray
    case Array(r, b) =>
      val g = repo(ns)
      if (!g.branchExists(b)) throw new NoSuchNamespaceException(ns)
      g.headCommit(b).namespaces.keys.toSeq.sorted.map(db => Array(r, b, db)).toArray
    case Array(_, _, _) => checkNs(ns); Array.empty
    case _ => throw new NoSuchNamespaceException(ns)
  }

  override def namespaceExists(ns: Array[String]): Boolean = ns match {
    case Array(r) => repoExists(r)
    case Array(r, b) => repoExists(r) && GraftRepo.open(repoPath(r), io).branchExists(b)
    case Array(r, b, db) =>
      repoExists(r) && {
        val g = GraftRepo.open(repoPath(r), io)
        g.branchExists(b) && {
          val c = g.headCommit(b)
          c.namespaces.contains(db) || c.tables.keys.exists(_.startsWith(db + "/"))
        }
      }
    case _ => false
  }

  override def loadNamespaceMetadata(ns: Array[String]): JMap[String, String] = {
    checkNs(ns)
    ns match {
      case Array(_, b, db) =>
        repo(ns).headCommit(b).namespaces.getOrElse(db, Map.empty).asJava
      case _ => Map.empty[String, String].asJava
    }
  }

  override def createNamespace(ns: Array[String], props: JMap[String, String]): Unit = {
    if (namespaceExists(ns)) throw new NamespaceAlreadyExistsException(ns)
    ns match {
      case Array(r) =>
        // per-repo data root: the CREATE NAMESPACE property wins, else
        // the catalog-level `dataRoot` option (a base URI; each repo
        // gets `<base>/<repo>`), else data lives under the repo root.
        val dataRoot = Option(props.get("dataRoot"))
          .orElse(dataRootBase.map(b => s"${b.stripSuffix("/")}/$r"))
        GraftRepo.init(repoPath(r), io, dataRoot)
      case Array(_, b) =>
        // branch create from `from` property (default main) — zero-copy ref
        repo(ns).createBranch(b, Option(props.get("from")).getOrElse("main"))
      case Array(_, b, db) =>
        val g = repo(ns)
        if (!g.branchExists(b)) throw new NoSuchNamespaceException(ns.take(2))
        g.commitRetry(b, s"create namespace $db") { base =>
          (base.tables, base.namespaces + (db -> props.asScala.toMap))
        }
      case _ => throw new NoSuchNamespaceException(ns)
    }
  }

  override def alterNamespace(ns: Array[String], changes: NamespaceChange*): Unit = {
    checkNs(ns)
    ns match {
      case Array(_, b, db) =>
        repo(ns).commitRetry(b, s"alter namespace $db") { base =>
          var props = base.namespaces.getOrElse(db, Map.empty)
          changes.foreach {
            case s: NamespaceChange.SetProperty => props += (s.property() -> s.value())
            case r: NamespaceChange.RemoveProperty => props -= r.property()
            case _ => ()
          }
          (base.tables, base.namespaces + (db -> props))
        }
      case _ => throw new UnsupportedOperationException(
        "only db-level namespaces carry properties")
    }
  }

  override def dropNamespace(ns: Array[String], cascade: Boolean): Boolean = {
    if (!namespaceExists(ns)) return false
    ns match {
      case Array(_, b, db) =>
        val g = repo(ns)
        val head = g.headCommit(b)
        // VIEWS under the namespace count as content too: dropping db
        // without them would leave ghost views that still resolve
        val tables = head.tables.keys.filter(_.startsWith(db + "/"))
        val views = head.viewMap.keys.filter(_.startsWith(db + "/"))
        if ((tables.nonEmpty || views.nonEmpty) && !cascade)
          throw new NonEmptyNamespaceException(ns)
        g.commitRetryAll(b, s"drop namespace $db") { base =>
          (base.tables.view.filterKeys(!_.startsWith(db + "/")).toMap,
            base.namespaces - db,
            base.viewMap.view.filterKeys(!_.startsWith(db + "/")).toMap)
        }
        true
      case Array(_, b) =>
        // a branch whose head still has tables (or views) is non-empty:
        // a plain DROP NAMESPACE must not destroy it (the reference
        // refuses too, LakeFSCatalog.java:312 NamespaceNotEmptyException)
        val g = repo(ns)
        val h = g.headCommit(b)
        if (!cascade && (h.tables.nonEmpty || h.viewMap.nonEmpty))
          throw new NonEmptyNamespaceException(ns)
        g.dropBranch(b); true
      case Array(r) =>
        // repo-level drop deletes every branch/commit/data file — require
        // CASCADE whenever any branch head still has tables
        val g = repo(ns)
        if (!cascade && g.branches.exists { b =>
            val h = g.headCommit(b)
            h.tables.nonEmpty || h.viewMap.nonEmpty
          }) throw new NonEmptyNamespaceException(ns)
        // a URI dataRoot lives OUTSIDE repoPath — sweep the data plane
        // through the dataIO seam first, or every parquet + bloom
        // sidecar under the external root would be orphaned forever
        if (g.dataRootUri.isDefined) {
          g.dataIO.walkFiles("").foreach(g.dataIO.delete)
          g.dataIO.walkDirs("").sorted(Ordering[String].reverse)
            .foreach(g.dataIO.delete)
        }
        val p = repoPath(r)
        io.walk(p).sorted(Ordering[Path].reverse).foreach(io.delete)
        true
      case _ => false
    }
  }

  // ---- tables ----------------------------------------------------------

  override def listTables(ns: Array[String]): Array[Identifier] = {
    checkNs(ns)
    val Array(_, b, db) = ns: @unchecked
    repo(ns).headCommit(b).tables.keys.toSeq
      .filter(_.startsWith(db + "/")).sorted
      .map(k => Identifier.of(ns, k.substring(db.length + 1))).toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val ns = ident.namespace()
    // Iceberg-style metadata tables: g.repo.branch.db.t.files / .history /
    // .snapshots parse as a 4-level namespace whose last level is the table
    if (ns.length == 4 && MetaTable.kinds.contains(ident.name())) {
      val g = repo(ns)
      if (!g.branchExists(ns(1))) throw new NoSuchTableException(ident)
      val key = s"${ns(2)}/${ns(3)}"
      if (!g.headCommit(ns(1)).tables.contains(key))
        throw new NoSuchTableException(ident)
      return new MetaTable(g, ns(1), key, ident.name(), ident)
    }
    if (ns.length != 3) throw new NoSuchTableException(ident)
    val g = repo(ns)
    if (!g.branchExists(ns(1))) throw new NoSuchTableException(ident)
    val c = g.headCommit(ns(1))
    val key = tableKey(ident)
    c.tables.get(key) match {
      case Some(sid) => new GraftTable(g, Some(ns(1)), key, g.snapshot(sid), ident)
      case None => throw new NoSuchTableException(ident)
    }
  }

  /** Time travel: `VERSION AS OF '<commitId | tag | branch>'`. Read-only. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val ns = ident.namespace()
    val g = repo(ns)
    val c = try g.resolve(version) catch {
      case _: java.nio.file.NoSuchFileException => throw new NoSuchTableException(ident)
    }
    val key = tableKey(ident)
    c.tables.get(key) match {
      case Some(sid) => new GraftTable(g, None, key, g.snapshot(sid), ident)
      case None => throw new NoSuchTableException(ident)
    }
  }

  /** Time travel: `TIMESTAMP AS OF` (micros) — latest first-parent commit
    * at or before the timestamp.
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val ns = ident.namespace()
    val g = repo(ns)
    if (!g.branchExists(ns(1))) throw new NoSuchTableException(ident)
    val tsMillis = timestamp / 1000
    var c = g.headCommit(ns(1))
    while (c.ts > tsMillis && c.parents.nonEmpty) c = g.commit(c.parents.head)
    if (c.ts > tsMillis) throw new NoSuchTableException(ident)
    val key = tableKey(ident)
    c.tables.get(key) match {
      case Some(sid) => new GraftTable(g, None, key, g.snapshot(sid), ident)
      case None => throw new NoSuchTableException(ident)
    }
  }

  /** Translate DSv2 partition transforms to the graft spec. Supported:
    * identity(col), bucket(n, col), the temporal family years/months/
    * days/hours(ts) (the workhorse layout for time-series at scale), and
    * truncate(w, col) for integral/string sources — the Iceberg
    * transform set. Anything else fails loudly instead of being
    * silently dropped.
    */
  private def parseTransforms(schema: StructType,
      partitions: Array[Transform]): Seq[graft.versioned.PartitionField] = {
    val spec = partitions.toIndexedSeq.map { t =>
      def sourceCol: String = {
        val refs = t.references()
        if (refs.length != 1 || refs(0).fieldNames().length != 1)
          throw new UnsupportedOperationException(
            s"partition transform must reference one top-level column: $t")
        refs(0).fieldNames()(0)
      }
      def intArg(what: String): Int = t.arguments().collectFirst {
        case l: org.apache.spark.sql.connector.expressions.Literal[_]
          if l.value().isInstanceOf[Number] => l.value().asInstanceOf[Number].intValue()
      }.getOrElse(throw new IllegalArgumentException(s"$what needs a count: $t"))
      t.name() match {
        case "identity" =>
          graft.versioned.PartitionField(sourceCol, "identity", sourceCol)
        case "bucket" =>
          graft.versioned.PartitionField(
            s"${sourceCol}_bucket", "bucket", sourceCol, intArg("bucket"))
        case tn @ ("years" | "months" | "days" | "hours") =>
          graft.versioned.PartitionField(
            s"${sourceCol}_${tn.stripSuffix("s")}", tn, sourceCol)
        case "truncate" =>
          graft.versioned.PartitionField(
            s"${sourceCol}_trunc", "truncate", sourceCol, intArg("truncate"))
        case other => throw new UnsupportedOperationException(
          s"unsupported partition transform: $other " +
            "(identity/bucket/years/months/days/hours/truncate)")
      }
    }
    // one shared rule set with set_partition_spec (source existence,
    // transform/source-type compatibility, positive widths)
    TableOps.validateSpec(schema, spec)
    spec
  }

  // ---- atomic CTAS / RTAS (StagingTableCatalog) ------------------------

  private def stage(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String],
      mode: String): org.apache.spark.sql.connector.catalog.StagedTable = {
    val ns = ident.namespace()
    if (ns.length != 3) throw new NoSuchNamespaceException(ns)
    val g = repo(ns)
    if (!g.branchExists(ns(1))) throw new NoSuchNamespaceException(ns)
    val key = tableKey(ident)
    // early existence check for fail-fast UX; the commit re-validates
    // atomically inside the ref race
    val exists = g.headCommit(ns(1)).tables.contains(key)
    if (mode == "create" && exists) throw new TableAlreadyExistsException(ident)
    if (mode == "replace" && !exists)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    val spec = parseTransforms(schema, partitions)
    val userProps = properties.asScala.toMap --
      Seq("provider", "location", "owner", "external")
    new GraftStagedTable(g, ns(1), key, ident, schema, spec, userProps, ns(2), mode)
  }

  private def toStruct(columns: Array[org.apache.spark.sql.connector.catalog.Column]): StructType =
    StructType(columns.map(c =>
      org.apache.spark.sql.types.StructField(c.name(), c.dataType(), c.nullable())))

  override def stageCreate(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String])
      : org.apache.spark.sql.connector.catalog.StagedTable =
    stage(ident, schema, partitions, properties, "create")

  override def stageCreate(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[Transform], properties: JMap[String, String])
      : org.apache.spark.sql.connector.catalog.StagedTable =
    stage(ident, toStruct(columns), partitions, properties, "create")

  override def stageReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String])
      : org.apache.spark.sql.connector.catalog.StagedTable =
    stage(ident, schema, partitions, properties, "replace")

  override def stageReplace(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[Transform], properties: JMap[String, String])
      : org.apache.spark.sql.connector.catalog.StagedTable =
    stage(ident, toStruct(columns), partitions, properties, "replace")

  override def stageCreateOrReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String])
      : org.apache.spark.sql.connector.catalog.StagedTable =
    stage(ident, schema, partitions, properties, "createOrReplace")

  override def stageCreateOrReplace(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[Transform], properties: JMap[String, String])
      : org.apache.spark.sql.connector.catalog.StagedTable =
    stage(ident, toStruct(columns), partitions, properties, "createOrReplace")

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    val ns = ident.namespace()
    if (ns.length != 3) throw new NoSuchNamespaceException(ns)
    val g = repo(ns)
    if (!g.branchExists(ns(1))) throw new NoSuchNamespaceException(ns)
    val key = tableKey(ident)
    if (g.headCommit(ns(1)).tables.contains(key))
      throw new TableAlreadyExistsException(ident)
    val spec = parseTransforms(schema, partitions)
    // user TBLPROPERTIES travel with the snapshot; engine-reserved keys
    // (provider/location/owner) are not user state
    val userProps = properties.asScala.toMap --
      Seq("provider", "location", "owner", "external")
    g.commitRetry(ns(1), s"create table $key") { base =>
      if (base.tables.contains(key)) throw new TableAlreadyExistsException(ident)
      if (base.viewMap.contains(key))
        throw new org.apache.spark.sql.catalyst.analysis.ViewAlreadyExistsException(ident)
      val snap = g.writeSnapshot(key, schema.json, Nil,
        if (spec.isEmpty) None else Some(spec),
        None,
        if (userProps.isEmpty) None else Some(userProps))
      (base.tables + (key -> snap.id),
        // implicit db namespace, like path-based catalogs
        if (base.namespaces.contains(ns(2))) base.namespaces
        else base.namespaces + (ns(2) -> Map.empty[String, String]))
    }
    loadTable(ident)
  }

  /** Schema evolution, metadata-only (like Iceberg) — the shared core
    * lives in [[graft.versioned.SchemaEvolution]] (also driven by the
    * REST catalog's update-schema commits); this front end adapts DSv2
    * `TableChange`s and commits the evolved snapshot. Table rename
    * stays rejected, mirroring the reference (LakeFSCatalog.java:218).
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val ns = ident.namespace()
    val g = repo(ns)
    val key = tableKey(ident)
    g.commitRetry(ns(1), s"alter table $key") { base =>
      val snapId = base.tables.getOrElse(key, throw new NoSuchTableException(ident))
      val snap = g.snapshot(snapId)
      val ev = graft.versioned.SchemaEvolution.evolve(snap, changes)
      val newSnap = g.writeSnapshot(key, ev.schema.json, snap.files,
        if (ev.spec.isEmpty) None else Some(ev.spec),
        if (ev.mapping.isEmpty) None else Some(ev.mapping),
        if (ev.props.isEmpty) None else Some(ev.props),
        if (ev.retired.isEmpty) None else Some(ev.retired.toSeq.sorted))
      (base.tables + (key -> newSnap.id), base.namespaces)
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val ns = ident.namespace()
    if (ns.length != 3 || !repoExists(ns(0))) return false
    val g = repo(ns)
    if (!g.branchExists(ns(1))) return false
    val key = tableKey(ident)
    if (!g.headCommit(ns(1)).tables.contains(key)) return false
    g.commitRetry(ns(1), s"drop table $key") { base =>
      (base.tables - key, base.namespaces)
    }
    true
  }

  /** DROP TABLE ... PURGE: drop the table from the branch head AND
    * delete its data files immediately — the reference's
    * `dropTable(purge=true)` contract (LakeFSCatalog.java:186-215,
    * Iceberg purge semantics). Like Iceberg, purge discards history:
    * time travel to commits that referenced this table's files will no
    * longer find them. Non-purge `dropTable` keeps files for ancestor
    * commits and defers deletion to `vacuum()`.
    *
    * Files still referenced by ANY table at ANY live head survive —
    * zero-copy clones share the victim's exact file paths under a
    * DIFFERENT key, so the reference walk must cover every table, not
    * just the purged key (the same all-referents invariant vacuum's
    * sweep holds).
    */
  override def purgeTable(ident: Identifier): Boolean = {
    val ns = ident.namespace()
    if (ns.length != 3 || !repoExists(ns(0))) return false
    val g = repo(ns)
    val key = tableKey(ident)
    val victim = g.headCommit(ns(1)).tables.get(key).map(g.snapshot)
    if (victim.isEmpty || !dropTable(ident)) return false
    // purge discards this branch's history for the table, never another
    // branch's (or another table's) present
    val liveHeads = g.branches.map(g.headCommit) ++ g.tags.map(g.resolve)
    val stillReferenced = liveHeads
      .flatMap(_.tables.values).distinct.map(g.snapshot)
      .flatMap(_.files).map(_.path).toSet
    victim.get.files.filterNot(f => stillReferenced.contains(f.path))
      .foreach { f =>
        g.dataIO.delete(f.path)
        g.dataIO.delete(f.path + ".bloom")
      }
    true
  }

  /** RENAME TABLE as a metadata-only commit-map re-key. The reference
    * throws here (LakeFSCatalog.java:218) because its table identity is
    * the storage path; graft's commit maps table KEYS to immutable
    * snapshot ids, so a rename within one repo+branch is one commit
    * that moves the key — no file, snapshot, or history object is
    * touched, and time travel to pre-rename commits still sees the old
    * name (names are per-commit, exactly like branch isolation).
    * Cross-repo or cross-branch renames stay rejected: they would alias
    * one table's snapshots into another line of history.
    */
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val ons = oldIdent.namespace()
    val nns = newIdent.namespace()
    if (ons.length != 3) throw new NoSuchTableException(oldIdent)
    if (nns.length != 3 || ons(0) != nns(0) || ons(1) != nns(1))
      throw new UnsupportedOperationException(
        "rename across repos or branches is not supported — tables are " +
          "versioned per branch; use clone for cross-branch copies")
    val g = repo(ons)
    if (!g.branchExists(ons(1))) throw new NoSuchTableException(oldIdent)
    val oldKey = tableKey(oldIdent)
    val newKey = tableKey(newIdent)
    if (oldKey == newKey) return
    g.commitRetry(ons(1), s"rename table $oldKey to $newKey") { base =>
      val snapId = base.tables.getOrElse(oldKey,
        throw new NoSuchTableException(oldIdent))
      if (base.tables.contains(newKey))
        throw new TableAlreadyExistsException(newIdent)
      if (base.viewMap.contains(newKey))
        throw new org.apache.spark.sql.catalyst.analysis
          .ViewAlreadyExistsException(newIdent)
      (base.tables - oldKey + (newKey -> snapId),
        // implicit db namespace for the destination, like createTable
        if (base.namespaces.contains(nns(2))) base.namespaces
        else base.namespaces + (nns(2) -> Map.empty[String, String]))
    }
    ()
  }
}
