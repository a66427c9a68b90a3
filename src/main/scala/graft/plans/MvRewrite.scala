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
case class MvRewrite(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.conf.get("spark.graft.mv.rewrite", "true").toBoolean) plan
    else plan.transformDown {
      // metadata races (concurrent DROP of the MV mid-planning) fall
      // back to the plan as written, never fail the query
      case agg: Aggregate => Try(tryRewrite(agg)).toOption.flatten.getOrElse(agg)
    }
  }

  /** Peel column-pruning Projects, deterministic Filters and INNER
    * equi-join structure off the aggregate's child down to graft
    * lake scans: every predicate — WHERE conjuncts wherever the
    * optimizer pushed them AND join conditions — lands in one
    * conjunct pool, every relation in one list. Anything else
    * (outer joins, non-graft sources, non-deterministic filters)
    * vetoes the rewrite.
    */
  private def flatten(p: LogicalPlan)
      : Option[(Seq[Expression], Seq[DataSourceV2Relation])] = p match {
    case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      flatten(c)
    case Filter(cond, c) if cond.deterministic =>
      flatten(c).map { case (cs, rs) =>
        (cs ++ splitConjunctivePredicates(cond), rs)
      }
    case Join(l, r, org.apache.spark.sql.catalyst.plans.Inner, cond, _) =>
      for { (lc, lr) <- flatten(l); (rc, rr) <- flatten(r) }
        yield (lc ++ rc ++ cond.toSeq.flatMap(splitConjunctivePredicates), lr ++ rr)
    case r: DataSourceV2Relation => r.table match {
      case t: GraftLakeTable if !t.isChangeFeed => Some((Nil, Seq(r)))
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
    val (conds, rels) = flatten(agg.child).getOrElse(return None)
    if (rels.isEmpty) return None
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference => a
      case _ => return None
    }
    if (groupAttrs.map(_.exprId).distinct.size != groupAttrs.size) return None
    val roots = rels.map(_.table.asInstanceOf[GraftLakeTable].root)
    if (roots.distinct.size != roots.size) return None // self-joins: bail
    val refs = roots.flatMap(MaterializedView.refsOf).distinct
    if (refs.isEmpty) return None
    val defs = refs.flatMap { mvDir =>
      Try(MaterializedView.readDef(mvDir)).toOption.map(mvDir -> _)
    }
    // candidates whose structure AND freshness match this exact scan
    // set: (residual group-col predicate, combined binding output)
    val matched: Seq[(String, MaterializedView.MvDef, Option[Expression], Seq[Attribute])] =
      if (rels.size == 1) {
        val table = rels.head.table.asInstanceOf[GraftLakeTable]
        defs.collect {
          case (mvDir, d)
              if (d.kind == "single" || d.kind == "minmax") &&
                Try(d.kind match {
                  case "single" => IncrementalMv.basis(mvDir)
                  case _ => MinMaxMv.basis(mvDir)
                }).toOption.contains(table.resolvedSnapshot) =>
            (mvDir, d, conds.reduceOption(And), rels.head.output)
        }
      } else defs.filter(_._2.kind == "join").flatMap { case (mvDir, d) =>
        matchJoin(mvDir, d, conds, rels).map { case (residual, bindOut) =>
          (mvDir, d, residual, bindOut)
        }
      }
    if (matched.isEmpty) return None
    matched.view.flatMap { case (mvDir, d, cond, bindOut) =>
      rewriteExact(agg, bindOut, groupAttrs, cond, mvDir, d)
    }.headOption.orElse(matched.view.flatMap { case (mvDir, d, cond, bindOut) =>
      rewriteRollup(agg, bindOut, groupAttrs, cond, mvDir, d)
    }.headOption)
  }

  /** Match a join-kind MV against the flattened scan set: exactly
    * one relation is the MV's fact, the rest biject onto its
    * dimensions by root, and the conjunct pool decomposes into
    *  (a) the expected key equalities (every (fact.k = dim.k) pair
    *      of every dimension, either orientation, all present),
    *  (b) IsNotNull on join-key attributes (implied by the inner
    *      equi-join — tautological on MV rows), and
    *  (c) a residual the caller must commute onto group columns.
    * Freshness: the MV's basis VECTOR equals each relation's
    * resolved snapshot — fact and every dimension.
    * Returns (residual predicate, fact-first binding output).
    */
  private def matchJoin(mvDir: String, d: MaterializedView.MvDef,
      conds: Seq[Expression], rels: Seq[DataSourceV2Relation])
      : Option[(Option[Expression], Seq[Attribute])] = {
    val byRoot = rels.map(r =>
      r.table.asInstanceOf[GraftLakeTable].root -> r).toMap
    val factRel = byRoot.getOrElse(d.fact, return None)
    val dimSpecs = d.joinDims
    if (dimSpecs.map(_.root).distinct.size != dimSpecs.size) return None
    val dimRels = dimSpecs.map(ds => byRoot.getOrElse(ds.root, return None))
    if (rels.size != 1 + dimSpecs.size) return None
    // freshness: the full basis vector against the full scan set
    val basis = Try(IncrementalJoinMv.basisAll(mvDir)).toOption.getOrElse(return None)
    val snaps = (factRel +: dimRels)
      .map(_.table.asInstanceOf[GraftLakeTable].resolvedSnapshot)
    if (basis != snaps) return None
    // expected key-equality pairs, by exprId
    def attrOf(rel: DataSourceV2Relation, name: String): Option[Attribute] =
      rel.output.find(_.name.equalsIgnoreCase(name))
    val pairs: Seq[(Attribute, Attribute)] = dimSpecs.zip(dimRels).flatMap {
      case (ds, dr) => ds.keys.map { k =>
        (attrOf(factRel, k).getOrElse(return None),
          attrOf(dr, k).getOrElse(return None))
      }
    }
    val pairIds = pairs.map { case (a, b) => Set(a.exprId, b.exprId) }
    val keyIds = pairIds.flatten.toSet
    val covered = scala.collection.mutable.Set.empty[Set[ExprId]]
    val residual = Seq.newBuilder[Expression]
    conds.foreach {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if pairIds.contains(Set(a.exprId, b.exprId)) =>
        covered += Set(a.exprId, b.exprId)
      case IsNotNull(a: AttributeReference) if keyIds.contains(a.exprId) =>
        () // implied by the inner equi-join
      case other => residual += other
    }
    if (covered.size != pairIds.distinct.size) return None // a key missing
    Some((residual.result().reduceOption(And),
      factRel.output ++ dimRels.flatMap(_.output)))
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

  /** Column names that appear on MORE THAN ONE side of the scan set
    * and are NOT join keys: a name-based remap of such a column could
    * silently pick the wrong side's values, so any reference to one
    * vetoes the rewrite. Join keys are exempt — the inner equi-join
    * equates both sides on every surviving row. Empty for
    * single-table scans by construction.
    */
  private def unsafeNames(bindOut: Seq[Attribute],
      d: MaterializedView.MvDef): Set[String] = {
    val keys =
      if (d.kind == "join") d.joinDims.flatMap(_.keys).map(_.toLowerCase).toSet
      else Set.empty[String]
    bindOut.groupBy(_.name.toLowerCase).collect {
      case (n, vs) if vs.size > 1 => n
    }.toSet -- keys
  }

  /** Remap a base-attribute filter onto MV attributes, iff every
    * referenced column is an MV group column of identical type and
    * unambiguous in the scan set.
    */
  private def remapCond(cond: Option[Expression], d: MaterializedView.MvDef,
      mvOut: Seq[Attribute], unsafe: Set[String]): Option[Option[Expression]] = {
    val groupSet = d.group.map(_.toLowerCase).toSet
    cond match {
      case None => Some(None)
      case Some(c) =>
        if (!c.references.forall(a => groupSet.contains(a.name.toLowerCase) &&
            !unsafe.contains(a.name.toLowerCase)))
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
  private def rewriteExact(agg: Aggregate, bindOut: Seq[Attribute],
      groupAttrs: Seq[AttributeReference], cond: Option[Expression],
      mvDir: String, d: MaterializedView.MvDef): Option[LogicalPlan] = {
    val qg = groupAttrs.map(_.name.toLowerCase)
    if (qg.toSet != d.group.map(_.toLowerCase).toSet ||
      qg.size != d.group.size) return None
    val mv = mvScan(mvDir).getOrElse(return None)
    def mvAttr(n: String) = mv.output.find(_.name.equalsIgnoreCase(n))
    val unsafe = unsafeNames(bindOut, d)
    val cond2 = remapCond(cond, d, mv.output, unsafe).getOrElse(return None)
    val groupSet = qg.toSet
    val projList = mapOutputs(agg.aggregateExpressions,
      mapAgg = {
        case ae @ AggregateExpression(fn, Complete, false, None, _) =>
          measureCol(fn, d, bindOut).flatMap(mvAttr)
            .filter(_.dataType == ae.dataType)
        case _ => None
      },
      mapAttr = a =>
        if (groupSet.contains(a.name.toLowerCase) &&
            !unsafe.contains(a.name.toLowerCase))
          mvAttr(a.name).filter(_.dataType == a.dataType)
        else None).getOrElse(return None)
    Some(Project(projList, cond2.map(Filter(_, mv)).getOrElse(mv)))
  }

  /** ROLLUP tier: strict group subset → re-aggregate the MV by the
    * distributive laws. The filter may reference ANY MV group column
    * (grouped-away dimensions included — `WHERE ub = 1 GROUP BY
    * event_type` over an (event_type, ub) MV is the classic slice).
    */
  private def rewriteRollup(agg: Aggregate, bindOut: Seq[Attribute],
      groupAttrs: Seq[AttributeReference], cond: Option[Expression],
      mvDir: String, d: MaterializedView.MvDef): Option[LogicalPlan] = {
    val qg = groupAttrs.map(_.name.toLowerCase)
    val mg = d.group.map(_.toLowerCase).toSet
    // strict, non-empty subset: a global aggregate over an EMPTY MV
    // would return NULL where the fact returns a zero-count row
    if (qg.isEmpty || !qg.forall(mg.contains) || qg.toSet == mg) return None
    val mv = mvScan(mvDir).getOrElse(return None)
    def mvAttr(n: String) = mv.output.find(_.name.equalsIgnoreCase(n))
    val unsafe = unsafeNames(bindOut, d)
    if (qg.exists(unsafe.contains)) return None
    val cond2 = remapCond(cond, d, mv.output, unsafe).getOrElse(return None)
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
              measureCol(s, d, bindOut).flatMap(mvAttr).map(new Sum(_))
            case m: Min =>
              measureCol(m, d, bindOut).flatMap(mvAttr).map(Min(_))
            case m: Max =>
              measureCol(m, d, bindOut).flatMap(mvAttr).map(Max(_))
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
