package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.graftbridge.{CatalogBridge, ViewContextBridge}

/** Analyzer rule making `SELECT … FROM g.repo.branch.db.view` just work:
  * Spark 4.1 ships the DSv2 `ViewCatalog` interface but no analyzer
  * wiring that consumes it, so without this rule a graft view is only
  * reachable through the [[GraftViews.select]] runner. Injected via
  * [[graft.GraftExtensions]] (`spark.sql.extensions=graft.GraftExtensions`).
  *
  * A five-part relation whose head names a session [[GraftCatalog]] and
  * that resolves to a stored VIEW (tables win nothing here — loadView
  * refuses them and normal table resolution proceeds) is substituted
  * with its stored SQL, ANALYZED under the stored resolution context
  * with the branch segment rebound to the branch being read
  * (GraftCatalog.graftView) — so relative references follow the
  * reader's branch, the versioned-views contract. Running the nested
  * analysis eagerly (rather than splicing unresolved SQL) keeps CTE
  * names, subqueries and context-relative references exactly as the
  * runner resolves them, and a view referencing another graft view
  * recurses through this same rule inside that nested analysis. Spark's
  * DeduplicateRelations then rewrites attribute ids when one view
  * appears twice in a query (self-join).
  *
  * Mutual view recursion is not guarded here beyond the JVM stack —
  * creating such views is already impossible through this catalog (the
  * referenced view must exist at create time).
  */
final class GraftViewResolution(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUpWithSubqueries {
      case u: UnresolvedRelation if !u.isStreaming =>
        substitute(u).getOrElse(u)
    }

  /** Expand the relation parts exactly the way Spark's own
    * CatalogAndIdentifier does — head names a registered catalog, or
    * the current catalog owns the whole identifier, with the current
    * namespace completing single-part names — so relative view
    * references inside views (and after `USE g.repo.branch.db`) reach
    * the same (catalog, repo, branch, db, view) a table reference
    * would. Temp views and CTEs never get here: CTESubstitution runs
    * in an earlier batch, and ResolveRelations resolves temp views
    * earlier in each fixpoint iteration than this appended rule.
    */
  private def expand(parts: Seq[String])
      : Option[(String, Array[String], String)] = {
    if (parts.length == 5 &&
        CatalogBridge.isCatalogRegistered(spark, parts.head))
      return Some((parts.head, parts.slice(1, 4).toArray, parts(4)))
    if (parts.length <= 4 &&
        !CatalogBridge.isCatalogRegistered(spark, parts.head)) {
      val cur = CatalogBridge.currentCatalogName(spark)
      if (parts.length == 1) {
        val ns = CatalogBridge.currentNamespace(spark)
        if (ns.length == 3) return Some((cur, ns, parts.head))
      } else if (parts.length == 4)
        return Some((cur, parts.slice(0, 3).toArray, parts(3)))
    }
    None
  }

  private def substitute(u: UnresolvedRelation): Option[LogicalPlan] = {
    val (catName, ns, name) = expand(u.multipartIdentifier).getOrElse(return None)
    CatalogBridge.catalog(spark, catName) match {
      case Some(g: GraftCatalog) =>
        val ident = Identifier.of(ns, name)
        val view =
          try g.loadView(ident)
          catch { case _: Exception => return None } // a table, or absent
        // a view created OUTSIDE a Spark session (the REST catalog's
        // CreateViewRequest) carries no engine catalog name and a
        // namespace that is not this catalog's 3-level shape — resolve
        // it in the READER's context instead: same branch-following
        // semantics, just anchored where the view is being read
        val effCat = Option(view.currentCatalog()).filter(_.nonEmpty)
          .getOrElse(catName)
        val effNs =
          if (view.currentNamespace() != null &&
              view.currentNamespace().length == 3) view.currentNamespace()
          else ns
        val analyzed = ViewContextBridge.sqlWith(spark,
          effCat, effNs, view.query())
          .queryExecution.analyzed
        val aliased =
          if (view.columnAliases() == null || view.columnAliases().isEmpty)
            analyzed
          else Project(view.columnAliases().toIndexedSeq
            .zip(analyzed.output)
            .map { case (a, attr) => Alias(attr, a)() }, analyzed)
        Some(SubqueryAlias(name, aliased))
      case _ => None
    }
  }
}
