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
  * Supported defining-query grammar — exactly the shapes with an
  * incremental maintenance law, rejected loudly otherwise:
  *
  * {{{
  * -- join kind (delta-join law, IncrementalJoinMv):
  * SELECT <group cols…>, COUNT(*) AS n [, SUM(<expr>) AS <name> …]
  * FROM <cat.ns.fact> JOIN <cat.ns.dim> USING (<key>)
  * GROUP BY <group cols…>
  *
  * -- single kind (append-only fold + full fallback, IncrementalMv):
  * SELECT <group cols…>, COUNT(*) AS n [, SUM(e) AS s …] [, AVG(e) AS a …]
  * FROM <cat.ns.fact> GROUP BY <group cols…>
  *
  * -- minmax kind (group-targeted recompute, MinMaxMv); extra
  * -- SUM/AVG measures recompute alongside:
  * SELECT <g>, COUNT(*) AS n, MIN(v) AS mn, MAX(v) AS mx [, SUM … AVG …]
  * FROM <cat.ns.fact> GROUP BY <g>
  * }}}
  *
  * `COUNT(*)` must alias to `n` (it IS the structural signed count —
  * the group-liveness criterion); every non-aggregate select item
  * must appear in GROUP BY; relations must be catalog-qualified
  * graft lake tables (the stored definition re-resolves by path, not
  * in the creator's session). In the `single` kind each AVG argument
  * must also appear as a SUM — AVG is a derived read-time column
  * (sum / n), zero new maintenance law. The defining text is also
  * ANALYZED as a plain query at DDL time, so unknown tables/columns
  * fail at CREATE, not first refresh.
  */
object GraftMatViews {

  private val createRe =
    ("(?is)^\\s*CREATE\\s+(OR\\s+REPLACE\\s+)?MATERIALIZED\\s+VIEW\\s+" +
      "(IF\\s+NOT\\s+EXISTS\\s+)?([\\w.`]+)" +
      "(?:\\s+WITH\\s*\\(([^)]*)\\))?\\s+AS\\s+(SELECT\\b.*)$").r

  /** `WITH (k = 'v', …)` view properties on CREATE — currently the
    * distinct kind's state representation:
    * `distinct_kind = 'bitmap', distinct_domain = <N>`.
    */
  private def parseProps(txt: String): Map[String, String] =
    if (txt == null || txt.trim.isEmpty) Map.empty
    else splitTop(txt).map { kv =>
      kv.split("=", 2) match {
        case Array(k, v) =>
          k.trim.toLowerCase -> v.trim.stripPrefix("'").stripSuffix("'")
        case _ => grammarError(s"malformed WITH property '$kv' " +
          "(expected key = value)")
      }
    }.toMap

  private val dropRe =
    "(?is)^\\s*DROP\\s+MATERIALIZED\\s+VIEW\\s+(IF\\s+EXISTS\\s+)?([\\w.`]+)\\s*;?\\s*$".r

  private val refreshRe =
    "(?is)^\\s*REFRESH\\s+MATERIALIZED\\s+VIEW\\s+([\\w.`]+)\\s*;?\\s*$".r

  private val showRe =
    "(?is)^\\s*SHOW\\s+MATERIALIZED\\s+VIEWS\\s+(?:IN|FROM)\\s+([\\w.`]+)\\s*;?\\s*$".r

  private val selectRe =
    ("(?is)^\\s*SELECT\\s+(.*?)\\s+FROM\\s+([\\w.`]+)" +
      "((?:\\s+JOIN\\s+[\\w.`]+\\s+USING\\s*\\([^)]*\\))+)" +
      "\\s+GROUP\\s+BY\\s+(.*?)\\s*;?\\s*$").r

  private val joinPartRe =
    "(?is)\\s+JOIN\\s+([\\w.`]+)\\s+USING\\s*\\(([^)]*)\\)".r

  /** Single-table shape → `single` (COUNT/SUM fold) or `minmax`
    * (group-targeted recompute) depending on the measures present.
    */
  private val selectSingleRe =
    ("(?is)^\\s*SELECT\\s+(.*?)\\s+FROM\\s+([\\w.`]+)" +
      "\\s+GROUP\\s+BY\\s+(.*?)\\s*;?\\s*$").r

  private val countRe = "(?is)^COUNT\\(\\s*\\*\\s*\\)\\s+AS\\s+(\\w+)$".r
  // the `distinct` kind's measure — COUNT(DISTINCT <plain col>) AS
  // <name>; maintained exactly via the hidden (group, key) signed
  // state ([[graft.lake.DistinctMv]])
  private val countDistinctRe =
    "(?is)^COUNT\\(\\s*DISTINCT\\s+([\\w`]+)\\s*\\)\\s+AS\\s+(\\w+)$".r
  private val sumRe = "(?is)^SUM\\((.+)\\)\\s+AS\\s+(\\w+)$".r
  private val avgRe = "(?is)^AVG\\((.+)\\)\\s+AS\\s+(\\w+)$".r
  private val minRe = "(?is)^MIN\\(\\s*([\\w`]+)\\s*\\)\\s+AS\\s+(\\w+)$".r
  private val maxRe = "(?is)^MAX\\(\\s*([\\w`]+)\\s*\\)\\s+AS\\s+(\\w+)$".r
  // an EXPRESSION select item (`date_trunc('DAY', ts) AS d`) — tried
  // only after every aggregate shape above has failed to match
  private val exprAsRe = "(?is)^(.+?)\\s+AS\\s+(\\w+)$".r
  // aggregate-function text inside an expression item: shapes the
  // dedicated regexes above DON'T match (COUNT(DISTINCT x) AS c,
  // SUM(x)+1 AS s) would otherwise fall through to exprAsRe and get
  // classified as expression GROUP columns — surfacing later as a
  // confusing 'GROUP BY mismatch' instead of the unsupported-item
  // message
  private val aggTextRe =
    ("(?is)\\b(count|sum|avg|mean|min|max|first|last|any_value|" +
      "stddev(?:_samp|_pop)?|var(?:iance|_samp|_pop)?|" +
      "percentile(?:_approx|_cont|_disc)?|median|mode|" +
      "collect_(?:list|set)|approx_count_distinct|listagg|string_agg|" +
      "bit_(?:and|or|xor)|bool_(?:and|or)|every|some|corr|" +
      "covar_(?:samp|pop)|kurtosis|skewness|grouping(?:_id)?)\\s*\\(").r

  private def unquote(s: String) = s.replace("`", "")

  private def normTxt(x: String) =
    unquote(x).replaceAll("\\s+", " ").trim.toLowerCase

  /** Canonical parsed-tree key of an expression text (attribute and
    * function names case-folded) — the SEMANTIC comparison behind
    * GROUP BY item resolution; None when the text does not parse.
    */
  private def parsedKey(spark: SparkSession, txt: String): Option[String] =
    scala.util.Try {
      import org.apache.spark.sql.catalyst.analysis.{
        UnresolvedAttribute, UnresolvedFunction}
      spark.sessionState.sqlParser.parseExpression(unquote(txt))
        .transformUp {
          case a: UnresolvedAttribute =>
            UnresolvedAttribute(a.nameParts.map(_.toLowerCase))
          case f: UnresolvedFunction =>
            f.copy(nameParts = f.nameParts.map(_.toLowerCase))
        }.toString
    }.toOption

  /** Resolve each GROUP BY item to its OUTPUT column: a plain select
    * column by name, or an expression select item by its ALIAS, its
    * whitespace-normalized TEXT, or its parsed tree — shared by the
    * single-table and join branches.
    */
  private def resolveGroups(spark: SparkSession, groupItems: Seq[String],
      bareList: Seq[String], exprList: Seq[(String, String)]): Seq[String] =
    groupItems.map { gi =>
      val n0 = normTxt(gi)
      lazy val giKey = parsedKey(spark, gi)
      bareList.find(_.toLowerCase == n0).getOrElse(
        exprList.find(x => x._1.toLowerCase == n0 || normTxt(x._2) == n0 ||
            (giKey.isDefined && parsedKey(spark, x._2) == giKey))
          .map(_._1).getOrElse(grammarError(s"GROUP BY item '$gi' matches " +
            "neither a plain select column nor an expression select item")))
    }

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
        "shapes (each with an incremental maintenance law): " +
        "[join] SELECT <group cols>, COUNT(*) AS n [, SUM(e) AS s ...] " +
        "FROM <fact> JOIN <dim> USING (<key>) GROUP BY <group cols>; " +
        "[single-table] SELECT <group cols>, COUNT(*) AS n " +
        "[, SUM(e) AS s ...] [, AVG(e) AS a ...] " +
        "[, MIN(col) AS m, MAX(col) AS x] FROM <fact> GROUP BY <group cols>")

  /** Intercept MATERIALIZED VIEW statements (CREATE / DROP / REFRESH
    * — none of them in Spark's grammar) whose target names a graft
    * catalog; None lets the delegate parser handle the text.
    */
  def intercept(spark: SparkSession,
      delegate: org.apache.spark.sql.catalyst.parser.ParserInterface,
      sqlText: String): Option[LogicalPlan] = sqlText match {
    case createRe(orReplace, ifNotExists, identText, propsText, select) =>
      if (orReplace != null && ifNotExists != null)
        grammarError("OR REPLACE and IF NOT EXISTS cannot be combined")
      val parts = delegate.parseMultipartIdentifier(identText)
      GraftViews.target(spark, parts).map { case (_, ident) =>
        GraftCreateMatViewCommand(parts.head, ident, select.trim,
          replace = orReplace != null, ifNotExists = ifNotExists != null,
          props = parseProps(propsText))
      }
    case dropRe(ifExists, identText) =>
      val parts = delegate.parseMultipartIdentifier(identText)
      GraftViews.target(spark, parts).map { case (_, ident) =>
        GraftDropMatViewCommand(parts.head, ident, ifExists != null)
      }
    case refreshRe(identText) =>
      val parts = delegate.parseMultipartIdentifier(identText)
      GraftViews.target(spark, parts).map { case (_, ident) =>
        GraftRefreshMatViewCommand(parts.head, ident)
      }
    case showRe(nsText) =>
      val parts = delegate.parseMultipartIdentifier(nsText)
      val isGraft = try spark.sessionState.catalogManager.catalog(parts.head)
          .isInstanceOf[graft.sources.GraftCatalog]
        catch { case _: Exception => false }
      if (isGraft) Some(GraftShowMatViewsCommand(parts.head, parts.tail))
      else None
    case _ => None
  }

  /** Parse the constrained defining query into its IVM components:
    * the definition (roots unresolved), the fact identifier parts,
    * and one identifier-parts list PER JOINED DIMENSION (empty for
    * single-table shapes).
    */
  private[plans] def parseDefining(spark: SparkSession, select: String)
      : (MaterializedView.MvDef, Seq[String], Seq[Seq[String]]) = select match {
    case selectRe(items, factId, joinChain, groupBy) =>
      // one or more `JOIN <dim> USING (<k1>[, <k2> …])` steps — a
      // multi-dimension star with composite keys is the same delta
      // law with one signed staircase term per relation
      val joins = joinPartRe.findAllMatchIn(joinChain).map { m =>
        val keys = m.group(2).split(",").map(k => unquote(k.trim)).toSeq
        keys.foreach(k => if (!k.matches("\\w+"))
          grammarError(s"USING column '$k' must be a plain column"))
        if (keys.isEmpty || keys.forall(_.isEmpty))
          grammarError(s"JOIN ${m.group(1)} has an empty USING list")
        (m.group(1), keys)
      }.toSeq
      val groupItems = splitTop(groupBy)
      if (groupItems.isEmpty || groupItems.forall(_.isEmpty))
        grammarError("at least one group column is required")
      val bare = Seq.newBuilder[String]
      val sums = Seq.newBuilder[(String, String)]
      val exprGroups = Seq.newBuilder[(String, String)] // (alias, text)
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
        case avgRe(e, name) =>
          grammarError(s"AVG($e) AS ${unquote(name)} cannot be maintained " +
            "by the signed-distributive delta-join law — store " +
            s"SUM($e) and derive AVG at read (sum / n)")
        case item if unquote(item).matches("\\w+") =>
          bare += unquote(item)
        case exprAsRe(e, name) =>
          // an EXPRESSION GROUP column for the star too (the
          // time-bucketed dimensional rollup — GROUP BY
          // date_trunc(ts), dim.attr): the staircase terms re-derive
          // the bucket over exactly the joined change rows they fold
          if (aggTextRe.findFirstIn(e).isDefined)
            grammarError(s"unsupported select item '${e.trim} AS " +
              s"${unquote(name)}': join-view aggregates are limited to " +
              "COUNT(*) AS n and SUM(expr) AS s — DISTINCT, FILTER, " +
              "arithmetic over aggregates and MIN/MAX have no " +
              "signed-distributive law")
          val nm = unquote(name)
          if (nm.toLowerCase == graft.lake.IncrementalJoinMv.CountCol)
            grammarError(s"group alias '$nm' is reserved for COUNT(*)")
          exprGroups += ((nm, e.trim))
        case item =>
          grammarError(s"unsupported select item '$item'")
      }
      if (!sawCount) grammarError("the select list must include COUNT(*) AS n")
      val bareCols = bare.result()
      val exprList = exprGroups.result()
      val groupCols = resolveGroups(spark, groupItems, bareCols, exprList)
      if ((bareCols ++ exprList.map(_._1)).sorted != groupCols.sorted)
        grammarError("select group columns must match GROUP BY exactly " +
          "(every plain column and every <expr> AS <alias> item grouped once)")
      (graft.lake.IncrementalJoinMv.CountCol +: (sums.result().map(_._1) ++
        bareCols ++ exprList.map(_._1))).groupBy(_.toLowerCase)
        .collectFirst { case (_, vs) if vs.size > 1 => vs.head }
        .foreach(nm => grammarError(s"duplicate column name '$nm'"))
      val factParts = spark.sessionState.sqlParser
        .parseMultipartIdentifier(unquote(factId))
      val dimPartsList = joins.map(j => spark.sessionState.sqlParser
        .parseMultipartIdentifier(unquote(j._1)))
      // roots are filled in by the command after catalog resolution;
      // the legacy (dim, key) pair mirrors the first dimension
      (MaterializedView.MvDef("", "", joins.head._2.mkString(","), groupCols,
        sums.result(), select, dims = joins.map(j => ("", j._2)),
        groupExprs = exprList),
        factParts, dimPartsList)
    case selectSingleRe(items, factId, groupBy) =>
      // single-table view — TWO maintenance laws behind one shape:
      //  * COUNT/SUM (+ AVG sugar) only → `single` kind, the
      //    append-only incremental fold with full-recompute fallback
      //    (graft.lake.IncrementalMv) — the commonest MV in any
      //    warehouse;
      //  * any MIN/MAX present → `minmax` kind, GROUP-TARGETED
      //    RECOMPUTE (graft.lake.MinMaxMv) — the law non-distributive
      //    aggregates need under deletes; extra SUM/AVG measures
      //    recompute alongside exactly.
      val groupItems = splitTop(groupBy)
      if (groupItems.isEmpty || groupItems.forall(_.isEmpty))
        grammarError("at least one group column is required")
      var sawCount = false
      var minPart: Option[(String, String)] = None // (value, alias)
      var maxPart: Option[(String, String)] = None
      val sums = Seq.newBuilder[(String, String)]
      val avgs = Seq.newBuilder[(String, String)]
      val bare = Seq.newBuilder[String]
      val exprGroups = Seq.newBuilder[(String, String)] // (alias, text)
      val reserved = graft.lake.IncrementalJoinMv.CountCol
      def checkName(nm: String): String = {
        if (nm.toLowerCase == reserved)
          grammarError(s"measure name '$nm' is reserved for COUNT(*)")
        nm
      }
      val distinctParts = Seq.newBuilder[(String, String)] // (col, alias)
      splitTop(items).foreach {
        case countRe(alias) =>
          if (unquote(alias).toLowerCase != reserved)
            grammarError(s"COUNT(*) must alias to '$reserved', got '$alias'")
          sawCount = true
        case countDistinctRe(v, a) =>
          // any number of COUNT(DISTINCT) measures: each gets its own
          // hidden (group, key) state table, all folded by the same
          // signed law (`uniq_users, uniq_sessions` is ONE view)
          distinctParts += ((unquote(v), checkName(unquote(a))))
        case minRe(v, a) =>
          if (minPart.nonEmpty) grammarError("one MIN measure only")
          minPart = Some((unquote(v), checkName(unquote(a))))
        case maxRe(v, a) =>
          if (maxPart.nonEmpty) grammarError("one MAX measure only")
          maxPart = Some((unquote(v), checkName(unquote(a))))
        case sumRe(e, name) => sums += ((checkName(unquote(name)), e.trim))
        case avgRe(e, name) => avgs += ((checkName(unquote(name)), e.trim))
        case item if unquote(item).matches("\\w+") =>
          bare += unquote(item)
        case exprAsRe(e, name) =>
          // an EXPRESSION GROUP column (time bucket et al.) — the
          // alias is the MV's stored column; refresh re-derives it
          // over the base rows before grouping. Aggregate-ish text
          // (COUNT(DISTINCT x), SUM(x)+1) is NOT a group column —
          // reject it HERE with the unsupported-item message rather
          // than letting it surface as a GROUP BY mismatch below
          if (aggTextRe.findFirstIn(e).isDefined)
            grammarError(s"unsupported select item '${e.trim} AS " +
              s"${unquote(name)}': aggregate expressions are limited to " +
              "COUNT(*) AS n, COUNT(DISTINCT col) AS d, SUM(expr) AS s, " +
              "AVG(expr) AS a, MIN(col) AS m, MAX(col) AS x — FILTER " +
              "clauses and arithmetic over aggregates have no " +
              "incremental maintenance law here")
          exprGroups += ((checkName(unquote(name)), e.trim))
        case item => grammarError(s"unsupported select item '$item' " +
          "(single-table views support COUNT(*) AS n, SUM(expr) AS s, " +
          "AVG(expr) AS a, MIN(col) AS m, MAX(col) AS x, and " +
          "<expr> AS <alias> group columns)")
      }
      if (!sawCount) grammarError("the select list must include COUNT(*) AS n")
      // resolve each GROUP BY item to its OUTPUT column — by plain
      // name, expression alias, normalized text, or parsed tree
      val exprList = exprGroups.result()
      val bareList = bare.result()
      val groupCols = resolveGroups(spark, groupItems, bareList, exprList)
      if ((bareList ++ exprList.map(_._1)).sorted != groupCols.sorted)
        grammarError("select group columns must match GROUP BY exactly " +
          "(every plain column and every <expr> AS <alias> item grouped once)")
      val names = Seq.newBuilder[String]
      names += reserved // a bare/alias column named 'n' collides too
      names ++= sums.result().map(_._1) ++= avgs.result().map(_._1)
      names ++= bareList ++= exprList.map(_._1) // group columns collide too
      minPart.foreach(names += _._2); maxPart.foreach(names += _._2)
      distinctParts.result().foreach(names += _._2)
      val dup = names.result().groupBy(_.toLowerCase).collectFirst {
        case (_, vs) if vs.size > 1 => vs.head }
      dup.foreach(nm => grammarError(s"duplicate column name '$nm'"))
      val factParts = spark.sessionState.sqlParser
        .parseMultipartIdentifier(unquote(factId))
      val dParts = distinctParts.result()
      if (dParts.nonEmpty) {
        // `distinct` kind: exact COUNT(DISTINCT) via one hidden
        // (group, key) signed state PER measure — MIN/MAX have no
        // retirement law over that state, and a derived bucket
        // cannot key it (v1)
        if (minPart.nonEmpty || maxPart.nonEmpty)
          grammarError("MIN/MAX measures cannot share a view with " +
            "COUNT(DISTINCT) — the distinct kind's signed (group, key) " +
            "state has no min/max retirement law; create a second view")
        avgs.result().foreach { case (aName, aExpr) =>
          if (!sums.result().exists(_._2.trim == aExpr.trim))
            grammarError(s"AVG($aExpr) AS $aName derives from a stored " +
              s"SUM: add SUM($aExpr) AS <name> to the select list")
        }
        dParts.foreach { case (dCol, _) =>
          if (bareList.exists(_.toLowerCase == dCol.toLowerCase))
            grammarError(s"COUNT(DISTINCT $dCol) over its own group " +
              "column is constant 1 per group — drop the measure or the " +
              "group column")
          if (exprList.exists(_._1.equalsIgnoreCase(dCol)))
            grammarError(s"COUNT(DISTINCT $dCol) names an expression group " +
              "alias — the distinct key must be a stored fact column")
        }
        dParts.groupBy(_._1.toLowerCase).collectFirst {
          case (_, vs) if vs.size > 1 => vs.head._1
        }.foreach(c => grammarError(
          s"duplicate COUNT(DISTINCT $c) — one measure per column"))
        return (MaterializedView.MvDef("", "", "", groupCols, sums.result(),
          select, kind = "distinct", avgs = avgs.result(),
          distinctCol = dParts.head._1, distinctName = dParts.head._2,
          extraDistincts = dParts.tail,
          groupExprs = exprList), factParts, Nil)
      }
      (minPart, maxPart) match {
        case (None, None) =>
          // `single` kind: AVG is read-time sugar over a stored SUM —
          // each AVG argument must appear as a SUM too (the fold law
          // maintains sums and counts; avg = sum / n at every commit)
          avgs.result().foreach { case (aName, aExpr) =>
            if (!sums.result().exists(_._2.trim == aExpr.trim))
              grammarError(s"AVG($aExpr) AS $aName in a COUNT/SUM view " +
                s"derives from a stored SUM: add SUM($aExpr) AS <name> to " +
                "the select list (or include MIN/MAX measures to use the " +
                "group-targeted-recompute kind, which stores AVG directly)")
          }
          (MaterializedView.MvDef("", "", "", groupCols, sums.result(),
            select, kind = "single", avgs = avgs.result(),
            groupExprs = exprList), factParts, Nil)
        case (Some((vMin, aMin)), Some((vMax, aMax))) =>
          if (vMin != vMax)
            grammarError(s"MIN($vMin)/MAX($vMax) must aggregate the same column")
          // expression groups (time buckets) are accepted — each
          // recompute re-derives them over the fact rows it reads —
          // but the targeted recompute's IN filter and the fold's
          // equality-delete mask must key on a STORED FACT column
          // (the changelog names it; the mask equality-applies), so
          // at least one plain group column is required
          if (exprList.nonEmpty && bareList.isEmpty)
            grammarError("a MIN/MAX view grouped ONLY by expression " +
              "columns cannot key its group-targeted recompute — add a " +
              "plain group column (the recompute's IN filter and delete " +
              "mask key on it) or materialize the bucket as a table column")
          // composite groups: the targeted recompute keys its IN
          // filter and eq-delete mask on the LEADING group column
          // (the join kind's convention) — sub-groups ride along
          (MaterializedView.MvDef("", "", "", groupCols, sums.result(),
            select, kind = "minmax", value = vMin, minName = aMin,
            maxName = aMax, avgs = avgs.result(),
            groupExprs = exprList), factParts, Nil)
        case _ => grammarError("MIN/MAX views need BOTH a MIN and a MAX " +
          "measure (a view with only one bound cannot retire the other " +
          "on deletes; COUNT/SUM-only views need neither)")
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
    selectSql: String, replace: Boolean = false,
    ifNotExists: Boolean = false,
    props: Map[String, String] = Map.empty) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val cat = spark.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[graft.sources.GraftCatalog]
    // IF NOT EXISTS on an existing name is a NO-OP by contract —
    // before any validation, so an idempotent deploy script keeps
    // working even if the (ignored) definition no longer analyzes
    if (ifNotExists && cat.tableExists(ident)) return Nil
    // VALIDATE FIRST — the defining query must analyze as a plain
    // query NOW (unknown tables/columns/types fail at CREATE, not at
    // first refresh), and EVERY validation — analysis, grammar,
    // catalog resolution of fact and dims — must pass BEFORE an OR
    // REPLACE touches the existing view: a typo'd redefinition must
    // cost an error message, never the old MV and its data
    val analyzed = spark.sessionState
      .executePlan(spark.sessionState.sqlParser.parsePlan(selectSql)).analyzed
    // whole-plan re-derivability: the analyzer PULLS OUT
    // non-deterministic grouping expressions into a Project below the
    // Aggregate (so the grouping list alone would look clean), and
    // Catalyst marks current_date()/current_timestamp() DETERMINISTIC
    // (evaluated once per query) although each refresh would bind a
    // NEW clock — both families break refresh re-derivation
    require(!analyzed.exists(p => p.expressions.exists(e =>
      !e.deterministic || e.exists {
        case _: org.apache.spark.sql.catalyst.expressions.CurrentDate => true
        case _: org.apache.spark.sql.catalyst.expressions.CurrentTimestampLike => true
        case _: org.apache.spark.sql.catalyst.expressions.LocalTimestamp => true
        case _ => false
      })),
      "CREATE MATERIALIZED VIEW: non-deterministic or current-time " +
        "expressions cannot be re-derived by refresh")
    val (d00, factParts, dimPartsList) = GraftMatViews.parseDefining(spark, selectSql)
    // ---- WITH properties: the distinct kind's state representation
    val unknownProps = props.keySet --
      Set("distinct_kind", "distinct_domain", "distinct_precision")
    require(unknownProps.isEmpty,
      s"CREATE MATERIALIZED VIEW: unknown WITH propert" +
        s"${if (unknownProps.size > 1) "ies" else "y"} " +
        unknownProps.mkString(", ") +
        " (supported: distinct_kind, distinct_domain, distinct_precision)")
    val d0 = props.getOrElse("distinct_kind", "") match {
      case "" | "exact" =>
        require(!props.contains("distinct_domain") ||
          props.get("distinct_kind").contains("bitmap"),
          "CREATE MATERIALIZED VIEW: distinct_domain only applies with " +
            "distinct_kind = 'bitmap'")
        require(!props.contains("distinct_precision"),
          "CREATE MATERIALIZED VIEW: distinct_precision only applies with " +
            "distinct_kind = 'hll'")
        d00
      case "bitmap" =>
        require(d00.kind == "distinct",
          "CREATE MATERIALIZED VIEW: distinct_kind = 'bitmap' needs a " +
            "COUNT(DISTINCT col) measure in the select list")
        require(d00.extraDistincts.isEmpty,
          "CREATE MATERIALIZED VIEW: the bitmap distinct kind supports " +
            "ONE COUNT(DISTINCT) measure per view")
        require(d00.sums.isEmpty && d00.avgs.isEmpty,
          "CREATE MATERIALIZED VIEW: the bitmap distinct kind stores " +
            "bit words, not signed partials — SUM/AVG measures need the " +
            "exact distinct kind")
        require(d00.groupExprs.isEmpty,
          "CREATE MATERIALIZED VIEW: the bitmap distinct kind does not " +
            "take expression group columns (v1)")
        val dom = props.get("distinct_domain")
          .flatMap(v => scala.util.Try(v.toLong).toOption)
          .getOrElse(sys.error("CREATE MATERIALIZED VIEW: distinct_kind " +
            "= 'bitmap' needs distinct_domain = <positive key bound>"))
        require(dom > 0, "CREATE MATERIALIZED VIEW: distinct_domain " +
          "must be positive (keys live in [0, domain))")
        require(!props.contains("distinct_precision"),
          "CREATE MATERIALIZED VIEW: distinct_precision only applies " +
            "with distinct_kind = 'hll'")
        d00.copy(distinctKind = "bitmap", distinctDomain = dom)
      case "hll" =>
        require(d00.kind == "distinct",
          "CREATE MATERIALIZED VIEW: distinct_kind = 'hll' needs a " +
            "COUNT(DISTINCT col) measure in the select list")
        require(d00.extraDistincts.isEmpty,
          "CREATE MATERIALIZED VIEW: the hll distinct kind supports " +
            "ONE COUNT(DISTINCT) measure per view")
        require(d00.sums.isEmpty && d00.avgs.isEmpty,
          "CREATE MATERIALIZED VIEW: the hll distinct kind stores " +
            "sketch registers, not signed partials — SUM/AVG measures " +
            "need the exact distinct kind")
        // expression group columns (time buckets) are accepted — the
        // canonical "approximate daily uniques" shape: every state
        // derivation re-derives the bucket via the shared prep hook;
        // appends keep the register-max fold, deletes fall back to
        // one full sketch recompute (a derived bucket cannot key the
        // group-targeted IN-pruned scan)
        require(!props.contains("distinct_domain"),
          "CREATE MATERIALIZED VIEW: distinct_domain only applies with " +
            "distinct_kind = 'bitmap'")
        val p = props.get("distinct_precision")
          .map(v => scala.util.Try(v.toInt).getOrElse(sys.error(
            "CREATE MATERIALIZED VIEW: distinct_precision must be an " +
              "integer register-index bit width")))
          .getOrElse(12)
        require(p >= 8 && p <= 16,
          "CREATE MATERIALIZED VIEW: distinct_precision must sit in " +
            "[8, 16] (2^p sketch registers per group; relative error " +
            "~1.04/sqrt(2^p))")
        d00.copy(distinctKind = "hll", distinctPrecision = p)
      case other =>
        sys.error(s"CREATE MATERIALIZED VIEW: unknown distinct_kind " +
          s"'$other' (supported: exact, bitmap, hll)")
    }
    // join kind: the refresh fold's equality-delete mask needs at
    // least one group column of a type the DSv2 read path applies
    // eq-deletes on — a star grouped ONLY by timestamp bucket(s)
    // would brick its own reads after the first dim-moving refresh
    if (d0.kind == "join") {
      val outTypes = analyzed.output.map(a => a.name.toLowerCase -> a.dataType).toMap
      val ok = d0.group.exists(g => outTypes.get(g.toLowerCase)
        .exists(_ != org.apache.spark.sql.types.TimestampType))
      require(ok, "CREATE MATERIALIZED VIEW: a join view grouped only " +
        "by timestamp-typed columns cannot maintain its equality-delete " +
        "fold mask — add a non-timestamp group column (a dimension " +
        "attribute) or materialize the bucket as a table column")
    }
    // minmax kind with expression groups: the targeted recompute's IN
    // filter and the fold's equality-delete mask key on a plain fact
    // group column, and timestamps cannot equality-apply — require one
    // usable key column at DDL, not at first refresh
    if (d0.kind == "minmax" && d0.groupExprs.nonEmpty) {
      val exprNames = d0.groupExprs.map(_._1.toLowerCase).toSet
      val outTypes = analyzed.output.map(a => a.name.toLowerCase -> a.dataType).toMap
      val ok = d0.group.exists(g => !exprNames.contains(g.toLowerCase) &&
        outTypes.get(g.toLowerCase)
          .exists(_ != org.apache.spark.sql.types.TimestampType))
      require(ok, "CREATE MATERIALIZED VIEW: a MIN/MAX view with " +
        "expression group columns needs a plain NON-TIMESTAMP group " +
        "column to key its group-targeted recompute (IN filter + " +
        "equality-delete mask) — add one or materialize the bucket " +
        "as a table column")
    }
    val outCols = analyzed.output.map(_.name.toLowerCase).toSet
    require(outCols.contains(graft.lake.IncrementalJoinMv.CountCol),
      "defining query lost the structural count column")
    // resolve the fact/dim roots BEFORE any drop: a FROM that is not
    // a catalog-qualified graft lake table must error while the old
    // MV still exists
    val dimDirs = dimPartsList.map(GraftMatViews.dirOf(spark, _))
    val d = d0.copy(fact = GraftMatViews.dirOf(spark, factParts),
      dim = dimDirs.headOption.getOrElse(""),
      dims = dimDirs.zip(d0.dims).map { case (dir, (_, keys)) => (dir, keys) })
    // bitmap distinct kind: the key must be INTEGRAL (a bit index
    // needs one) — checked at DDL against the fact's stored schema,
    // value bounds checked distributedly at create (checkDomain)
    if (d.distinctKind == "bitmap") {
      import org.apache.spark.sql.types._
      val ft = graft.lake.LakeTable.storedSchemaOf(d.fact).flatMap(
        _.fields.find(_.name.equalsIgnoreCase(d.distinctCol))
          .map(_.dataType))
      require(ft.exists {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }, s"CREATE MATERIALIZED VIEW: COUNT(DISTINCT ${d.distinctCol}) " +
        s"with distinct_kind = 'bitmap' needs an integral key column " +
        s"(got ${ft.map(_.simpleString).getOrElse("<no stored schema>")}) " +
        "— use the exact distinct kind")
    }
    if (cat.tableExists(ident)) {
      val name = (ident.namespace() :+ ident.name()).mkString(".")
      if (!replace)
        throw new org.apache.spark.sql.catalyst.analysis
          .TableAlreadyExistsException(
            (ident.namespace() :+ ident.name()).toSeq)
      // OR REPLACE only replaces a MATERIALIZED VIEW — never silently
      // swallows a plain table that happens to hold the name
      val mvDir = cat.tableDir(name)
      require(MaterializedView.isMv(mvDir),
        s"$name is a table, not a materialized view — " +
          "CREATE OR REPLACE MATERIALIZED VIEW will not replace it")
      val oldFact =
        scala.util.Try(MaterializedView.readDef(mvDir).fact).toOption
      // DATA-DEPENDENT failures (ANSI overflow, an unreadable base
      // file, executor loss) surface while MATERIALIZING the
      // replacement — after every static validation above. The old
      // view must survive those too: move it ASIDE (a rename leaves
      // its absolute-path'd manifests valid-for-restore), build the
      // replacement at the ORIGINAL path (so the new manifests record
      // the right absolute paths), and discard the old incarnation
      // only on success. On any create failure the old directory
      // moves back verbatim — name, data, refresh basis all intact.
      import java.nio.file.{Files, Paths, Path}
      val target = Paths.get(mvDir)
      val backup = target.resolveSibling(
        s".${target.getFileName}.orreplace.${System.nanoTime()}")
      Files.move(target, backup)
      def rmTree(p: Path): Unit = if (Files.exists(p)) {
        val w = Files.walk(p)
        try w.sorted(java.util.Comparator.reverseOrder())
          .forEach(x => { Files.deleteIfExists(x): Unit })
        finally w.close()
      }
      try MaterializedView.create(spark, mvDir, d): Unit
      catch {
        case e: Throwable =>
          rmTree(target); Files.move(backup, target); throw e
      }
      rmTree(backup)
      // create registered (new fact → mvDir); a prior ref under a
      // DIFFERENT fact would accrete dead — deregister it eagerly
      oldFact.filterNot(_ == d.fact)
        .foreach(MaterializedView.deregisterRef(_, mvDir))
      return Nil
    }
    val mvDir = cat.newTableDir(
      (ident.namespace() :+ ident.name()).mkString("."))
    MaterializedView.create(spark, mvDir, d): Unit
    Nil
  }
}

/** Executes `DROP MATERIALIZED VIEW [IF EXISTS]`: verifies the target
  * really is an MV (a plain table gets a pointed redirect to DROP
  * TABLE — the statements must not be interchangeable by accident),
  * EAGERLY removes the fact-side `_mv_refs.json` entry so the
  * rewrite registry and `t.mvs` forget it at once, then drops the
  * table. MVs are tables, so DROP TABLE also works — this statement
  * is the symmetric lifecycle verb plus the eager deregistration.
  */
final case class GraftDropMatViewCommand(catalogName: String,
    ident: org.apache.spark.sql.connector.catalog.Identifier,
    ifExists: Boolean) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val cat = spark.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[graft.sources.GraftCatalog]
    val name = (ident.namespace() :+ ident.name()).mkString(".")
    if (!cat.tableExists(ident)) {
      if (ifExists) return Nil
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchTableException(ident)
    }
    val mvDir = cat.tableDir(name)
    require(MaterializedView.isMv(mvDir),
      s"$name is a table, not a materialized view — use DROP TABLE")
    // read the definition BEFORE the delete: the fact root it names
    // is where the eager deregistration must land
    val factDir = scala.util.Try(MaterializedView.readDef(mvDir).fact).toOption
    factDir.foreach(MaterializedView.deregisterRef(_, mvDir))
    cat.dropTable(ident): Unit
    Nil
  }
}

/** Executes `REFRESH MATERIALIZED VIEW` — statement sugar over the
  * same dispatch as `CALL graft.system.refresh_mv` (one verb, every
  * kind); returns the new basis vector as the CALL form does.
  */
final case class GraftRefreshMatViewCommand(catalogName: String,
    ident: org.apache.spark.sql.connector.catalog.Identifier)
    extends LeafRunnableCommand {

  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "basis", org.apache.spark.sql.types.StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val cat = spark.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[graft.sources.GraftCatalog]
    val name = (ident.namespace() :+ ident.name()).mkString(".")
    if (!cat.tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchTableException(ident)
    val mvDir = cat.tableDir(name)
    require(MaterializedView.isMv(mvDir),
      s"$name is a table, not a materialized view — only CREATE " +
        "MATERIALIZED VIEW targets can be refreshed")
    Seq(Row(MaterializedView.refreshStatus(spark, mvDir)))
  }
}

/** Executes `SHOW MATERIALIZED VIEWS IN <catalog>.<namespace>`: the
  * namespace-wide MV inventory — one row per MV table (name, fact
  * root, kind, FRESHNESS of its basis vector against every base
  * head). The per-fact view of the same information is the `t.mvs`
  * metadata table; this is the operator's catalog sweep. Metadata
  * IO only — no data files open at any table size.
  */
final case class GraftShowMatViewsCommand(catalogName: String,
    namespace: Seq[String]) extends LeafRunnableCommand {

  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] = {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.types.{BooleanType, StringType}
    Seq(AttributeReference("name", StringType, nullable = false)(),
      AttributeReference("fact", StringType, nullable = false)(),
      AttributeReference("kind", StringType, nullable = false)(),
      AttributeReference("fresh", BooleanType, nullable = false)())
  }

  override def run(spark: SparkSession): Seq[Row] = {
    val cat = spark.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[graft.sources.GraftCatalog]
    cat.listTables(namespace.toArray).toSeq.flatMap { ident =>
      val dir = cat.tableDir((ident.namespace() :+ ident.name()).mkString("."))
      if (!MaterializedView.isMv(dir)) None
      else scala.util.Try {
        val (kind, fact, fresh) = MaterializedView.summary(dir)
        Row(ident.name(), fact, kind, fresh)
      }.toOption // a mid-DROP race renders no row, never fails the SHOW
    }.sortBy(_.getString(0))
  }
}
