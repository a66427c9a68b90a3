package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedRelation}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{CreateView, DropView, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewCatalog, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** Persisted SQL VIEWS over graft catalogs.
  *
  * Spark 4.1 ships the DSv2 `ViewCatalog` interface but wires NO
  * analyzer support to it — `CREATE VIEW cat.ns.v` on a non-session
  * catalog dies in `ResolveSessionCatalog`
  * (MISSING_CATALOG_ABILITY.VIEWS) before any injected resolution
  * rule can run, and nothing ever calls `loadView`. The public shape
  * for engine view support is therefore session-extension rules (the
  * same route Iceberg's Spark integration takes):
  *
  *  - [[GraftViewParser]] wraps the SQL parser: a parsed
  *    `CreateView`/`DropView` whose target identifier names a graft
  *    [[ViewCatalog]] rewrites — at PARSE time, deterministically
  *    ahead of any analyzer race — into runnable commands that drive
  *    the catalog's createView/dropView.
  *  - [[ResolveGraftViews]] resolves reads: an `UnresolvedRelation`
  *    naming a stored view substitutes the view's PARSED SQL text
  *    (`SubqueryAlias(viewName, parse(viewText))`), and the analyzer
  *    then resolves that subtree against CURRENT table state — views
  *    follow schema evolution and snapshot growth with zero
  *    maintenance, and scans under a view keep pruning/pushdown.
  *
  * View text must be self-contained (fully qualified table names) —
  * the create-time analysis check enforces that it resolves from a
  * neutral context. Column-alias lists are rejected at CREATE
  * (loudly), not silently dropped. A view may reference other views;
  * a reference CYCLE fails analysis at the fixed-point iteration
  * limit rather than looping.
  */
object GraftViews {

  /** `parts` → (catalog plugin, view identifier) when the leading
    * segment names a registered graft catalog (the only catalogs that
    * store graft views). No current-catalog fallback: graft view DDL
    * is always written catalog-qualified.
    */
  private[plans] def target(spark: SparkSession, parts: Seq[String])
      : Option[(graft.sources.GraftCatalog, Identifier)] = {
    if (parts.length < 2) return None
    val cm = spark.sessionState.catalogManager
    try cm.catalog(parts.head) match {
      case g: graft.sources.GraftCatalog =>
        Some((g, Identifier.of(parts.tail.init.toArray, parts.last)))
      case _ => None
    } catch { case _: Exception => None }
  }

  /** Relations in `parsed` that would make the view text CONTEXT-
    * DEPENDENT: temp views (session-lifetime — gone or DIFFERENT for
    * the next reader) and names that don't lead with a registered
    * catalog (they'd resolve against the reader's current catalog /
    * namespace, not the creator's). Stored view SQL re-resolves in
    * every reader's session, so anything here validates at CREATE but
    * silently means something else at read time — reject it loudly.
    * CTE names defined inside the text itself are self-contained and
    * skipped.
    */
  private[plans] def contextDependentRelations(spark: SparkSession,
      parsed: LogicalPlan): Seq[String] = {
    val cteNames = parsed.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith =>
        w.cteRelations.map(_._1)
    }.flatten.map(_.toLowerCase).toSet
    val cm = spark.sessionState.catalogManager
    parsed.collect {
      case u: UnresolvedRelation =>
        val parts = u.multipartIdentifier
        val name = parts.mkString(".")
        if (parts.length == 1 && cteNames.contains(parts.head.toLowerCase)) None
        else if (spark.sessionState.catalog.isTempView(parts))
          Some(s"$name (temporary view)")
        else if (parts.length < 2 || !cm.isCatalogRegistered(parts.head))
          Some(s"$name (not catalog-qualified)")
        else None
    }.flatten
  }
}

/** Parser wrap: rewrite view DDL that targets a graft catalog. All
  * other parsing delegates verbatim.
  */
class GraftViewParser(spark: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    // MATERIALIZED VIEW DDL (CREATE / DROP / REFRESH) is not in
    // Spark's grammar at all — intercept raw text BEFORE delegating
    GraftMatViews.intercept(spark, delegate, sqlText).getOrElse(
    delegate.parsePlan(sqlText) match {
      case cv @ CreateView(UnresolvedIdentifier(parts, _), userCols, comment, _,
          props, originalText, _, allowExisting, replace, _) =>
        GraftViews.target(spark, parts) match {
          case Some((_, ident)) =>
            require(userCols.isEmpty,
              "graft views do not support column-alias lists; alias in the SELECT")
            val sql = originalText.getOrElse(throw new IllegalArgumentException(
              "CREATE VIEW requires literal SQL text for a graft view"))
            GraftCreateViewCommand(parts.head, ident, sql, comment,
              props, allowExisting, replace)
          case None => cv
        }
      case dv @ DropView(UnresolvedIdentifier(parts, _), ifExists) =>
        GraftViews.target(spark, parts) match {
          case Some((_, ident)) => GraftDropViewCommand(parts.head, ident, ifExists)
          case None => dv
        }
      case other => other
    })

  override def parseExpression(sqlText: String) = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String) = delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String) = delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String) = delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String) = delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String) = delegate.parseDataType(sqlText)
  override def parseQuery(sqlText: String) = delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String) = delegate.parseRoutineParam(sqlText)
}

/** Executes `CREATE [OR REPLACE] VIEW` against the graft catalog: the
  * view SQL is ANALYZED NOW (from a neutral context, so unqualified
  * names fail at DDL time instead of first read) to validate it and
  * capture the creation-time schema, then stored as metadata.
  */
final case class GraftCreateViewCommand(catalogName: String, ident: Identifier,
    sql: String, comment: Option[String], props: Map[String, String],
    allowExisting: Boolean, replace: Boolean) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val cm = spark.sessionState.catalogManager
    val cat = cm.catalog(catalogName).asInstanceOf[ViewCatalog]
    if (cat.viewExists(ident) && !replace) {
      if (allowExisting) return Nil
      else throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(ident)
    }
    // Validate BEFORE touching any existing definition: a CREATE OR
    // REPLACE whose new SQL fails analysis must leave the old view
    // intact (replace is atomic-on-failure), so the drop happens only
    // after the new text has fully analyzed.
    val parsed = spark.sessionState.sqlParser.parsePlan(sql)
    val ctxDep = GraftViews.contextDependentRelations(spark, parsed)
    require(ctxDep.isEmpty,
      "graft view SQL must be self-contained (it re-resolves in every " +
        "reader's session); context-dependent relations: " +
        ctxDep.mkString(", "))
    val analyzed = spark.sessionState.executePlan(parsed).analyzed
    if (cat.viewExists(ident)) { cat.dropView(ident): Unit }
    val properties = new java.util.HashMap[String, String]()
    props.foreach { case (k, v) => properties.put(k, v): Unit }
    comment.foreach(c => properties.put(ViewCatalog.PROP_COMMENT, c): Unit)
    cat.createView(new ViewInfo(ident, sql, catalogName, Array.empty,
      analyzed.schema, analyzed.output.map(_.name).toArray,
      Array.empty, Array.empty, properties)): Unit
    Nil
  }
}

final case class GraftDropViewCommand(catalogName: String, ident: Identifier,
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = spark.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[ViewCatalog]
    if (!cat.dropView(ident) && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
    Nil
  }
}

/** Read-side resolution: substitute a stored view's parsed SQL for
  * the unresolved relation; the analyzer resolves the subtree against
  * current table state in the same fixed point.
  */
final case class ResolveGraftViews(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case u: UnresolvedRelation if !u.isStreaming =>
      GraftViews.target(spark, u.multipartIdentifier) match {
        case Some((cat, ident)) if cat.viewExists(ident) =>
          val view = cat.loadView(ident)
          SubqueryAlias(u.multipartIdentifier.last,
            spark.sessionState.sqlParser.parsePlan(view.query))
        case _ => u
      }
  }
}
