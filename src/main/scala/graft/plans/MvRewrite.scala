package graft.plans

import scala.util.Try

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.lake.{IncrementalJoinMv, IncrementalMv, LakeTable, MaterializedView, MinMaxMv}
import graft.sources.GraftLakeTable

/** AUTOMATIC QUERY REWRITE over materialized views — the read-side
  * half of the MV contract (the refresh laws are the write side): an
  * aggregate over a fact table is answered from an MV built on that
  * fact when the MV provably holds the identical answer, without the
  * query mentioning the MV at all. At 100 TB this turns a full fact
  * scan + shuffle into a scan of a table the size of the group-key
  * domain — the reason warehouses build rollups in the first place.
  *
  * Soundness gates (ALL must hold, else the query runs as written):
  *  - the MV's recorded basis equals the EXACT snapshot this scan
  *    would read ([[GraftLakeTable.resolvedSnapshot]] — so a stale MV
  *    never serves, and a time-travel read rewrites only when the MV
  *    reflects precisely that version);
  *  - the aggregate's shape maps 1:1 onto stored measures
  *    (COUNT(*) → `n`, SUM/AVG by semantic equality of the argument
  *    against the stored definition, MIN/MAX against the minmax
  *    kind's value column), no DISTINCT, no FILTER clauses;
  *  - result types match the stored column types exactly (the single
  *    kind stores bigint sums — a double SUM never maps);
  *  - any WHERE below the aggregate references group columns only
  *    (such a filter commutes with the grouping, so it applies to
  *    the MV rows unchanged).
  *
  * Two tiers:
  *  - EXACT: query groups = MV groups → a projection of MV rows
  *    (the aggregate disappears entirely);
  *  - ROLLUP: query groups ⊂ MV groups → re-aggregate the MV
  *    (COUNT(*) → SUM(n), SUM → SUM, MIN → MIN, MAX → MAX — the
  *    distributive laws; AVG does not roll up from stored state and
  *    a global (no-group) aggregate is excluded because an EMPTY MV
  *    would yield NULL where the fact yields a 0-count row).
  *
  * Candidates come from the fact-side `meta/_mv_refs.json` registry
  * ([[MaterializedView.refsOf]]) — O(1) from the scan's own root, no
  * catalog walk on the query path. Disable with
  * `spark.graft.mv.rewrite=false`.
  */
case class MvRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.conf.get("spark.graft.mv.rewrite", "true").toBoolean) plan
    else plan.transformDown {
      // metadata races (concurrent DROP of the MV mid-planning) fall
      // back to the plan as written, never fail the query
      case agg: Aggregate => Try(tryRewrite(agg)).toOption.flatten.getOrElse(agg)
    }
  }

  /** Peel column-pruning Projects and deterministic Filters off the
    * aggregate's child down to a graft lake scan; conjuncts combine.
    */
  private def destructure(p: LogicalPlan, conds: Seq[Expression])
      : Option[(Option[Expression], DataSourceV2Relation, GraftLakeTable)] =
    p match {
      case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        destructure(c, conds)
      case Filter(cond, c) if cond.deterministic =>
        destructure(c, conds :+ cond)
      case r: DataSourceV2Relation => r.table match {
        case t: GraftLakeTable if !t.isChangeFeed =>
          Some((conds.reduceOption(And), r, t))
        case _ => None
      }
      case _ => None
    }

  /** Parse a stored measure-argument text and bind it to the fact
    * scan's attributes (name-insensitive), filling session timezones
    * the way the analyzer would — so `semanticEquals` against the
    * user's analyzed aggregate argument is apples-to-apples.
    */
  private def resolveStored(text: String, out: Seq[Attribute]): Option[Expression] =
    Try {
      val bound = spark.sessionState.sqlParser.parseExpression(text).transformUp {
        case u: UnresolvedAttribute if u.nameParts.size == 1 =>
          out.find(_.name.equalsIgnoreCase(u.nameParts.head)).getOrElse(u)
      }
      bound.transformUp {
        case tz: TimeZoneAwareExpression if tz.timeZoneId.isEmpty =>
          tz.withTimeZone(spark.sessionState.conf.sessionLocalTimeZone)
      }
    }.toOption.filter(_.resolved)

  /** The MV column a user aggregate function maps to, or None. */
  private def measureCol(fn: AggregateFunction, d: MaterializedView.MvDef,
      relOut: Seq[Attribute]): Option[String] = fn match {
    case Count(Seq(Literal(v, _))) if v != null =>
      Some(IncrementalJoinMv.CountCol) // COUNT(*) analyzes to COUNT(1)
    case s: Sum => d.sums.collectFirst {
      case (nm, txt) if resolveStored(txt, relOut).exists(_.semanticEquals(s.child)) => nm
    }
    case a: Average => d.avgs.collectFirst {
      case (nm, txt) if resolveStored(txt, relOut).exists(_.semanticEquals(a.child)) => nm
    }
    case m: Min => m.child match {
      case ar: AttributeReference
          if d.kind == "minmax" && ar.name.equalsIgnoreCase(d.value) =>
        Some(d.minName)
      case _ => None
    }
    case m: Max => m.child match {
      case ar: AttributeReference
          if d.kind == "minmax" && ar.name.equalsIgnoreCase(d.value) =>
        Some(d.maxName)
      case _ => None
    }
    case _ => None
  }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    val (cond, rel, table) = destructure(agg.child, Nil).getOrElse(return None)
    val refs = MaterializedView.refsOf(table.root)
    if (refs.isEmpty) return None
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference => a
      case _ => return None
    }
    if (groupAttrs.map(_.exprId).distinct.size != groupAttrs.size) return None
    // fresh candidates only: basis == the snapshot THIS scan reads
    val defs = refs.flatMap { mvDir =>
      Try(MaterializedView.readDef(mvDir)).toOption.map(mvDir -> _)
    }.filter { case (mvDir, d) =>
      (d.kind == "single" || d.kind == "minmax") &&
        Try(d.kind match {
          case "single" => IncrementalMv.basis(mvDir)
          case _ => MinMaxMv.basis(mvDir)
        }).toOption.contains(table.resolvedSnapshot)
    }
    if (defs.isEmpty) return None
    defs.view.flatMap { case (mvDir, d) =>
      rewriteExact(agg, rel, groupAttrs, cond, mvDir, d)
    }.headOption.orElse(defs.view.flatMap { case (mvDir, d) =>
      rewriteRollup(agg, rel, groupAttrs, cond, mvDir, d)
    }.headOption)
  }

  /** A fresh analyzed DSv2 scan of the MV table — the same relation
    * a catalog read resolves to (manifest-stats pushdown, reported
    * statistics for CBO/broadcast decisions). ExprIds are new; the
    * rewrite's output aliases pin the ORIGINAL ids, so parents —
    * HAVING, ORDER BY — resolve unchanged.
    */
  private def mvScan(mvDir: String): Option[LogicalPlan] =
    Try(spark.read.format("graft-lake").load(mvDir)
      .queryExecution.analyzed).toOption

  /** Remap a fact-attribute filter onto MV attributes, iff every
    * referenced column is an MV group column of identical type.
    */
  private def remapCond(cond: Option[Expression], d: MaterializedView.MvDef,
      mvOut: Seq[Attribute]): Option[Option[Expression]] = {
    val groupSet = d.group.map(_.toLowerCase).toSet
    cond match {
      case None => Some(None)
      case Some(c) =>
        if (!c.references.forall(a => groupSet.contains(a.name.toLowerCase)))
          return None
        var ok = true
        val mapped = c.transformUp {
          case a: AttributeReference =>
            mvOut.find(m => m.name.equalsIgnoreCase(a.name) &&
              m.dataType == a.dataType) match {
              case Some(m) => m
              case None => ok = false; a
            }
        }
        if (ok) Some(Some(mapped)) else None
    }
  }

  /** Map an aggregate-output expression onto the MV: aggregate
    * functions via `mapAgg`, grouping attributes via `mapAttr`,
    * scalar structure (casts, arithmetic, string ops over either)
    * preserved around them. Any leaf neither handler accepts — a
    * non-group fact column outside an aggregate, a DISTINCT/FILTER
    * aggregate, an unstored measure — vetoes the whole rewrite.
    */
  private def mapExpr(e: Expression,
      mapAgg: AggregateExpression => Option[Expression],
      mapAttr: AttributeReference => Option[Expression]): Option[Expression] =
    e match {
      case ae: AggregateExpression => mapAgg(ae)
      case a: AttributeReference => mapAttr(a)
      case other =>
        val kids = other.children.map(mapExpr(_, mapAgg, mapAttr))
        if (kids.exists(_.isEmpty)) None
        else Some(other.withNewChildren(kids.map(_.get)))
    }

  /** The full output list mapped via [[mapExpr]], original exprIds
    * pinned so parents (HAVING, ORDER BY) resolve unchanged.
    */
  private def mapOutputs(outs: Seq[NamedExpression],
      mapAgg: AggregateExpression => Option[Expression],
      mapAttr: AttributeReference => Option[Expression])
      : Option[Seq[NamedExpression]] = {
    val mapped = outs.map {
      case a: AttributeReference =>
        mapAttr(a).map(Alias(_, a.name)(exprId = a.exprId, qualifier = a.qualifier))
      case al: Alias =>
        mapExpr(al.child, mapAgg, mapAttr)
          .map(Alias(_, al.name)(exprId = al.exprId, qualifier = al.qualifier))
      case _ => None
    }
    if (mapped.exists(_.isEmpty)) None else Some(mapped.map(_.get))
  }

  /** EXACT tier: same grouping → project MV rows 1:1. */
  private def rewriteExact(agg: Aggregate, rel: DataSourceV2Relation,
      groupAttrs: Seq[AttributeReference], cond: Option[Expression],
      mvDir: String, d: MaterializedView.MvDef): Option[LogicalPlan] = {
    val qg = groupAttrs.map(_.name.toLowerCase)
    if (qg.toSet != d.group.map(_.toLowerCase).toSet ||
      qg.size != d.group.size) return None
    val mv = mvScan(mvDir).getOrElse(return None)
    def mvAttr(n: String) = mv.output.find(_.name.equalsIgnoreCase(n))
    val cond2 = remapCond(cond, d, mv.output).getOrElse(return None)
    val groupSet = qg.toSet
    val projList = mapOutputs(agg.aggregateExpressions,
      mapAgg = {
        case ae @ AggregateExpression(fn, Complete, false, None, _) =>
          measureCol(fn, d, rel.output).flatMap(mvAttr)
            .filter(_.dataType == ae.dataType)
        case _ => None
      },
      mapAttr = a =>
        if (groupSet.contains(a.name.toLowerCase))
          mvAttr(a.name).filter(_.dataType == a.dataType)
        else None).getOrElse(return None)
    Some(Project(projList, cond2.map(Filter(_, mv)).getOrElse(mv)))
  }

  /** ROLLUP tier: strict group subset → re-aggregate the MV by the
    * distributive laws. The filter may reference ANY MV group column
    * (grouped-away dimensions included — `WHERE ub = 1 GROUP BY
    * event_type` over an (event_type, ub) MV is the classic slice).
    */
  private def rewriteRollup(agg: Aggregate, rel: DataSourceV2Relation,
      groupAttrs: Seq[AttributeReference], cond: Option[Expression],
      mvDir: String, d: MaterializedView.MvDef): Option[LogicalPlan] = {
    val qg = groupAttrs.map(_.name.toLowerCase)
    val mg = d.group.map(_.toLowerCase).toSet
    // strict, non-empty subset: a global aggregate over an EMPTY MV
    // would return NULL where the fact returns a zero-count row
    if (qg.isEmpty || !qg.forall(mg.contains) || qg.toSet == mg) return None
    val mv = mvScan(mvDir).getOrElse(return None)
    def mvAttr(n: String) = mv.output.find(_.name.equalsIgnoreCase(n))
    val cond2 = remapCond(cond, d, mv.output).getOrElse(return None)
    val groupMv = groupAttrs.map(a =>
      mvAttr(a.name).filter(_.dataType == a.dataType).getOrElse(return None))
    val groupSet = qg.toSet
    val aggExprs = mapOutputs(agg.aggregateExpressions,
      mapAgg = {
        case ae @ AggregateExpression(fn, Complete, false, None, _) =>
          val rolled: Option[AggregateFunction] = fn match {
            case Count(Seq(Literal(v, _))) if v != null =>
              mvAttr(IncrementalJoinMv.CountCol).map(new Sum(_))
            case s: Sum =>
              measureCol(s, d, rel.output).flatMap(mvAttr).map(new Sum(_))
            case m: Min =>
              measureCol(m, d, rel.output).flatMap(mvAttr).map(Min(_))
            case m: Max =>
              measureCol(m, d, rel.output).flatMap(mvAttr).map(Max(_))
            case _ => None // AVG does not roll up from stored state
          }
          rolled.filter(_.dataType == ae.dataType)
            .map(f => ae.copy(aggregateFunction = f))
        case _ => None
      },
      mapAttr = a =>
        if (groupSet.contains(a.name.toLowerCase))
          mvAttr(a.name).filter(_.dataType == a.dataType)
        else None).getOrElse(return None)
    Some(Aggregate(groupMv, aggExprs,
      cond2.map(Filter(_, mv)).getOrElse(mv), None))
  }
}
