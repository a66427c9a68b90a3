package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand

import graft.lake.MaterializedView

/** `CREATE MATERIALIZED VIEW` for graft catalogs — the DDL face of
  * the incremental join-MV machinery. Spark's grammar has no
  * MATERIALIZED VIEW statement at all, so [[GraftViewParser]]
  * intercepts the RAW SQL text before delegating (the same
  * parser-wrap route as graft views, one step earlier because the
  * delegate cannot even parse the statement).
  *
  * Supported defining-query grammar — exactly the SIGNED-DISTRIBUTIVE
  * shape the delta-join maintenance law ([[graft.lake.IncrementalJoinMv]])
  * can fold incrementally, rejected loudly otherwise:
  *
  * {{{
  * SELECT <group cols…>, COUNT(*) AS n [, SUM(<expr>) AS <name> …]
  * FROM <cat.ns.fact> JOIN <cat.ns.dim> USING (<key>)
  * GROUP BY <group cols…>
  * }}}
  *
  * `COUNT(*)` must alias to `n` (it IS the structural signed count —
  * the group-liveness criterion); every non-aggregate select item
  * must appear in GROUP BY; both relations must be catalog-qualified
  * graft lake tables (the stored definition re-resolves by path, not
  * in the creator's session). The defining text is also ANALYZED as
  * a plain query at DDL time, so unknown tables/columns fail at
  * CREATE, not first refresh.
  */
object GraftMatViews {

  private val createRe =
    "(?is)^\\s*CREATE\\s+MATERIALIZED\\s+VIEW\\s+([\\w.`]+)\\s+AS\\s+(SELECT\\b.*)$".r

  private val selectRe =
    ("(?is)^\\s*SELECT\\s+(.*?)\\s+FROM\\s+([\\w.`]+)\\s+JOIN\\s+([\\w.`]+)" +
      "\\s+USING\\s*\\(\\s*([\\w`]+)\\s*\\)\\s+GROUP\\s+BY\\s+(.*?)\\s*;?\\s*$").r

  /** Single-table shape → the MIN/MAX (group-targeted-recompute) MV. */
  private val selectMinMaxRe =
    ("(?is)^\\s*SELECT\\s+(.*?)\\s+FROM\\s+([\\w.`]+)" +
      "\\s+GROUP\\s+BY\\s+(.*?)\\s*;?\\s*$").r

  private val countRe = "(?is)^COUNT\\(\\s*\\*\\s*\\)\\s+AS\\s+(\\w+)$".r
  private val sumRe = "(?is)^SUM\\((.+)\\)\\s+AS\\s+(\\w+)$".r
  private val minRe = "(?is)^MIN\\(\\s*([\\w`]+)\\s*\\)\\s+AS\\s+(\\w+)$".r
  private val maxRe = "(?is)^MAX\\(\\s*([\\w`]+)\\s*\\)\\s+AS\\s+(\\w+)$".r

  private def unquote(s: String) = s.replace("`", "")

  /** Split at top-level commas (never inside parentheses). */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    val sb = new StringBuilder
    s.foreach {
      case '(' => depth += 1; sb.append('('): Unit
      case ')' => depth -= 1; sb.append(')'): Unit
      case ',' if depth == 0 => out += sb.toString.trim; sb.clear()
      case c => sb.append(c): Unit
    }
    out += sb.toString.trim
    out.result()
  }

  private def grammarError(what: String): Nothing =
    throw new IllegalArgumentException(
      s"CREATE MATERIALIZED VIEW: $what. Supported defining-query " +
        "grammar (the incrementally-maintainable signed-distributive " +
        "shape): SELECT <group cols>, COUNT(*) AS n [, SUM(<expr>) AS " +
        "<name> ...] FROM <fact> JOIN <dim> USING (<key>) GROUP BY " +
        "<group cols>")

  /** Intercept `CREATE MATERIALIZED VIEW` text whose target names a
    * graft catalog; None lets the delegate parser handle the text.
    */
  def interceptCreate(spark: SparkSession,
      delegate: org.apache.spark.sql.catalyst.parser.ParserInterface,
      sqlText: String): Option[LogicalPlan] = sqlText match {
    case createRe(identText, select) =>
      val parts = delegate.parseMultipartIdentifier(identText)
      GraftViews.target(spark, parts).map { case (_, ident) =>
        GraftCreateMatViewCommand(parts.head, ident, select.trim)
      }
    case _ => None
  }

  /** Parse the constrained defining query into its IVM components:
    * (select items, fact parts, dim parts, key, group cols).
    */
  private[plans] def parseDefining(spark: SparkSession, select: String)
      : (MaterializedView.MvDef, Seq[String], Seq[String]) = select match {
    case selectRe(items, factId, dimId, key, groupBy) =>
      val groupCols = splitTop(groupBy).map(unquote)
      groupCols.foreach(g => if (!g.matches("\\w+"))
        grammarError(s"GROUP BY item '$g' must be a plain column"))
      val bare = Seq.newBuilder[String]
      val sums = Seq.newBuilder[(String, String)]
      var sawCount = false
      splitTop(items).foreach {
        case countRe(alias) =>
          if (unquote(alias).toLowerCase != graft.lake.IncrementalJoinMv.CountCol)
            grammarError(s"COUNT(*) must alias to '" +
              graft.lake.IncrementalJoinMv.CountCol +
              s"' (the structural signed count), got '$alias'")
          sawCount = true
        case sumRe(e, name) =>
          val nm = unquote(name)
          if (nm.toLowerCase == graft.lake.IncrementalJoinMv.CountCol)
            grammarError(s"measure name '$nm' is reserved for COUNT(*)")
          sums += ((nm, e.trim))
        case item if unquote(item).matches("\\w+") =>
          bare += unquote(item)
        case item =>
          grammarError(s"unsupported select item '$item'")
      }
      if (!sawCount) grammarError("the select list must include COUNT(*) AS n")
      val bareCols = bare.result()
      if (bareCols.sorted != groupCols.sorted)
        grammarError(s"plain select columns (${bareCols.mkString(", ")}) " +
          s"must match GROUP BY (${groupCols.mkString(", ")})")
      if (groupCols.isEmpty) grammarError("at least one group column is required")
      val factParts = spark.sessionState.sqlParser
        .parseMultipartIdentifier(unquote(factId))
      val dimParts = spark.sessionState.sqlParser
        .parseMultipartIdentifier(unquote(dimId))
      (MaterializedView.MvDef("", "", unquote(key), groupCols,
        sums.result(), select), factParts, dimParts)
    case selectMinMaxRe(items, factId, groupBy) =>
      // single-table MIN/MAX view — maintained by GROUP-TARGETED
      // RECOMPUTE (graft.lake.MinMaxMv), the law non-distributive
      // aggregates need under deletes
      val groupCols = splitTop(groupBy).map(unquote)
      if (groupCols.size != 1 || !groupCols.head.matches("\\w+"))
        grammarError("MIN/MAX views group by exactly one plain column")
      var sawCount = false
      var minPart: Option[(String, String)] = None // (value, alias)
      var maxPart: Option[(String, String)] = None
      val bare = Seq.newBuilder[String]
      splitTop(items).foreach {
        case countRe(alias) =>
          if (unquote(alias).toLowerCase != graft.lake.IncrementalJoinMv.CountCol)
            grammarError("COUNT(*) must alias to '" +
              graft.lake.IncrementalJoinMv.CountCol + s"', got '$alias'")
          sawCount = true
        case minRe(v, a) =>
          if (minPart.nonEmpty) grammarError("one MIN measure only")
          minPart = Some((unquote(v), unquote(a)))
        case maxRe(v, a) =>
          if (maxPart.nonEmpty) grammarError("one MAX measure only")
          maxPart = Some((unquote(v), unquote(a)))
        case item if unquote(item).matches("\\w+") =>
          bare += unquote(item)
        case item => grammarError(s"unsupported select item '$item' " +
          "(single-table views support COUNT(*) AS n, MIN(col) AS m, MAX(col) AS x)")
      }
      if (!sawCount) grammarError("the select list must include COUNT(*) AS n")
      if (bare.result() != groupCols)
        grammarError("plain select columns must match GROUP BY")
      (minPart, maxPart) match {
        case (Some((vMin, aMin)), Some((vMax, aMax))) =>
          if (vMin != vMax)
            grammarError(s"MIN($vMin)/MAX($vMax) must aggregate the same column")
          val factParts = spark.sessionState.sqlParser
            .parseMultipartIdentifier(unquote(factId))
          (MaterializedView.MvDef("", "", "", groupCols, Nil, select,
            kind = "minmax", value = vMin, minName = aMin, maxName = aMax),
            factParts, Nil)
        case _ => grammarError("MIN/MAX views need BOTH a MIN and a MAX measure")
      }
    case _ =>
      grammarError("defining query does not match the supported shape")
  }

  /** Resolve a catalog-qualified relation to its lake-table dir. */
  private[plans] def dirOf(spark: SparkSession, parts: Seq[String]): String =
    GraftViews.target(spark, parts) match {
      case Some((cat, ident)) =>
        cat.tableDir((ident.namespace() :+ ident.name()).mkString("."))
      case None =>
        grammarError(s"relation ${parts.mkString(".")} must be a " +
          "catalog-qualified graft lake table (the stored definition " +
          "re-resolves by path in any session)")
    }
}

/** Executes `CREATE MATERIALIZED VIEW`: validates the defining query
  * (full analysis at DDL time), compiles it to the IVM definition,
  * materializes via [[graft.lake.MaterializedView.create]] (one lake
  * commit whose note carries the (fact, dim) basis), and persists the
  * definition beside the MV's manifests.
  */
final case class GraftCreateMatViewCommand(catalogName: String,
    ident: org.apache.spark.sql.connector.catalog.Identifier,
    selectSql: String) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val cat = spark.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[graft.sources.GraftCatalog]
    // the defining query must analyze as a plain query NOW — unknown
    // tables/columns/types fail at CREATE, not at first refresh
    val analyzed = spark.sessionState
      .executePlan(spark.sessionState.sqlParser.parsePlan(selectSql)).analyzed
    val (d0, factParts, dimParts) = GraftMatViews.parseDefining(spark, selectSql)
    val outCols = analyzed.output.map(_.name.toLowerCase).toSet
    require(outCols.contains(graft.lake.IncrementalJoinMv.CountCol),
      "defining query lost the structural count column")
    val d = d0.copy(fact = GraftMatViews.dirOf(spark, factParts),
      dim = if (dimParts.isEmpty) ""
            else GraftMatViews.dirOf(spark, dimParts))
    val mvDir = cat.newTableDir(
      (ident.namespace() :+ ident.name()).mkString("."))
    MaterializedView.create(spark, mvDir, d): Unit
    Nil
  }
}
