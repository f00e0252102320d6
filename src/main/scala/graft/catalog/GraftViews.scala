package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.Identifier

/** Execution helper for versioned views (Spark 4.1 ships the
  * `ViewCatalog` connector interface but no analyzer rules that consume
  * it — engines wire their own, e.g. via session extensions; this
  * helper is graft's minimal runner until then).
  *
  * Resolves the view at the identifier's BRANCH head and runs its
  * stored SQL under the stored resolution context — with the branch
  * segment rebound to the branch being read (GraftCatalog.graftView),
  * so relative table references follow the reader's branch like code
  * checked into the repo.
  */
object GraftViews {

  /** `select(spark, "g.repo.branch.db.view")` → DataFrame of the view. */
  def select(spark: SparkSession, fqName: String): DataFrame = {
    val parts = fqName.split('.')
    require(parts.length == 5,
      s"expected catalog.repo.branch.db.view, got: $fqName")
    val view = viewCatalog(spark, parts(0)).loadView(
      Identifier.of(Array(parts(1), parts(2), parts(3)), parts(4)))
    // run the view text in its own resolution context (catalog AND
    // namespace both matter for relative references) — isolated from
    // the session's context, which concurrent queries may be using;
    // the result is re-bound to the CALLER's session so temp-view
    // registration etc. land where the caller expects
    org.apache.spark.sql.graftbridge.ViewContextBridge.sqlWithOn(
      spark, view.currentCatalog(), view.currentNamespace(), view.query())
  }

  /** The GraftCatalog registered under `name` in this session. */
  def viewCatalog(spark: SparkSession, name: String): GraftCatalog = {
    // instantiate through the public config rather than reaching into
    // the private CatalogManager registry: same class, same root
    val cat = new GraftCatalog
    cat.initialize(name, new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("root", spark.conf.get(s"spark.sql.catalog.$name.root"))))
    cat
  }
}
