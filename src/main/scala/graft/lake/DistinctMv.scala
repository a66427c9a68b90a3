package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.writer.BlockWriter

/** DISTINCT-COUNT materialized views — exact `COUNT(DISTINCT x)`
  * rollups maintained incrementally: arguably THE most common
  * warehouse view ("daily unique users per dimension") and the one
  * aggregate the other MV kinds must reject (no signed fold exists
  * over the *visible* state: per-group distinct counts can neither
  * add under inserts of possibly-seen keys nor subtract under
  * deletes of possibly-duplicated keys).
  *
  * The law: keep HIDDEN state at (group, key) grain — one row per
  * live (g, x) pair with the signed multiplicity `cnt` of fact rows
  * carrying it (plus one signed SUM partial per extra measure). That
  * state IS signed-distributive: the lake's own change feed
  * ([[LakeTable.changelogRead]] — inserts +1, delete pre-images -1,
  * MERGEs as delete+insert pairs) folds per (g, x) with one
  * hash-shuffle on the state grain; a key retires exactly when its
  * multiplicity reaches 0. The VISIBLE view then derives:
  *
  *  - `COUNT(DISTINCT x)` = the group's live non-null key count,
  *  - `COUNT(*)`          = the group's summed multiplicities,
  *  - `SUM(e)`            = the group's summed signed partials,
  *
  * each exact at every basis — including across MoR deletes and
  * merges, where the single kind must fall back to a full recompute.
  * Refresh cost: O(changed rows) to read the feed, one shuffle at
  * (g, x) grain to fold — never a fact scan (mode `signed`) — and
  * O(touched cells) WRITES: the fold lands as one MoR MERGE keyed on
  * the stored cell key ([[SKeyCol]]), so only the delta's cells
  * re-land, retired cells (multiplicity 0) drop via the commit's
  * equality-delete mask, and untouched state files survive
  * byte-identical (the MinMaxMv upsert-and-retire shape). At
  * stream-mv cadence this is what survives 100 TB: a daily-uniques
  * state of ~10^10 (day, uid) rows takes per-trigger writes
  * proportional to the trigger's changed cells, not a state-sized
  * rewrite per micro-batch. Only a retention-expired changelog range
  * forces the `full` fallback (one state rewrite). The VISIBLE view
  * stays a rewrite — it is group-domain-sized by construction.
  *
  * LAYOUT: the state lives as its own lake table NESTED INSIDE the
  * MV directory (`<mv>/_dstate`) — invisible to the catalog (tables
  * list one level), dropped/cloned/moved with its MV, and excluded
  * from the MV root's own orphan sweeps (those walk `<mv>/data`
  * only). Crash safety between the two commits: the state commits
  * FIRST, stamping its own basis note; a crash before the MV commit
  * leaves state-basis > mv-basis, and the next refresh skips the
  * fold and just re-derives the visible rows from the state head —
  * both commits are idempotent re-derivations of the state.
  *
  * At 100 TB: the state table is |group domain × key domain| rows —
  * the exact-COUNT(DISTINCT) floor; a refresh reads the delta plus
  * the touched lead groups' state files (IN-pruned scan under the
  * `graft.mvrefresh.maxgroups` cap; whole-state scan past it) and
  * writes only the touched cells. (When the key domain itself is too
  * large for (g, x) state, the BITMAP kind — [[BitmapDistinctMv]],
  * per-group word-sharded bitsets over bounded integral keys,
  * OR-distributive under appends — is the built scale path.)
  */
object DistinctMv {

  private val noteRe = "^dmv-basis-(\\d+)-(signed|full)$".r
  private val stateNoteRe = "^dmvs-basis-(\\d+)-(signed|full)$".r

  /** Multiplicity column of the hidden state table. */
  val CntCol = "_cnt"

  /** Stored CELL KEY of the state table: one string per (group, key)
    * tuple, deterministic and injective, so [[LakeTable.merge]]'s
    * single-column equality-delete mask can retire exactly the
    * touched cells — the composite state grain folded into the one
    * key shape the mask machinery speaks.
    */
  val SKeyCol = "_skey"

  /** The cell-key encoding: per column, NULL → a lone `\\u0000`
    * marker, else `=` + a value encoding that can never contain the
    * `\\u0001` separator (strings/binary via base64; timestamps as
    * epoch micros — session-TZ-independent, a refresh from another
    * timezone must produce the SAME key for the same cell; everything
    * else via Spark's deterministic string cast). Injective per
    * column and unambiguous under the separator ⇒ injective for the
    * tuple.
    */
  private def skeyExpr(schema: StructType, cols: Seq[String]): Column = {
    def enc(c: Column, dt: DataType): Column = dt match {
      case StringType => base64(encode(c, "UTF-8"))
      case BinaryType => base64(c)
      case TimestampType => unix_micros(c).cast("string")
      case _ => c.cast("string")
    }
    val parts = cols.map { n =>
      val dt = schema(schema.fieldIndex(n)).dataType
      when(col(n).isNull, lit("\u0000"))
        .otherwise(concat(lit("="), enc(col(n), dt)))
    }
    parts.reduce((a, b) => concat(a, lit("\u0001"), b))
  }

  /** The hidden state table's root, nested inside the MV dir. */
  def stateRoot(mvRoot: String): String =
    java.nio.file.Paths.get(mvRoot, "_dstate").toString

  /** The fact snapshot the VISIBLE MV head reflects. */
  def basis(mvRoot: String): Int = {
    require(LakeTable.currentSnapshot(mvRoot) > 0, s"$mvRoot has no MV state")
    LakeTable.findContentNote(mvRoot) {
      case noteRe(f, _) => Some(f.toInt)
      case _ => None
    }.getOrElse(sys.error(
      s"$mvRoot carries no dmv-basis note in its live chain — " +
        "not a distinct-count MV (or its basis commits were expired)"))
  }

  /** Maintenance mode of the newest refresh the head reflects
    * (`signed` — the change-feed fold — or `full`, the CREATE /
    * expired-range recompute).
    */
  def mode(mvRoot: String): String =
    LakeTable.findContentNote(mvRoot) {
      case noteRe(_, m) => Some(m)
      case _ => None
    }.getOrElse("?")

  private def stateBasis(stRoot: String): (Int, String) =
    LakeTable.findContentNote(stRoot) {
      case stateNoteRe(f, m) => Some((f.toInt, m))
      case _ => None
    }.getOrElse(sys.error(s"$stRoot carries no dmvs-basis note"))

  /** The fact snapshot the HIDDEN state table reflects — the rewrite
    * rule's state-rollup tier serves from the state only when this
    * equals the scanned snapshot exactly (a crash between the two
    * refresh commits leaves the state AHEAD of the visible view;
    * serving it then would leak newer data into a pinned read).
    */
  def stateBasisOf(mvRoot: String): Int = stateBasis(stateRoot(mvRoot))._1

  /** (state snapshot, fact basis it reflects) read CONSISTENTLY — the
    * head is re-checked after the note walk so the pair describes one
    * state incarnation even if a refresh commits mid-read. The
    * rewrite tiers carry this pair on the CANDIDATE and pin their
    * state scans to it: validating against live heads at serve time
    * is a TOCTOU (a refresh landing between candidate validation and
    * the serve would advance state and visible bases together, pass a
    * live-alignment check, and leak newer state rows into a read
    * pinned at the older fact snapshot).
    */
  def stateBasisPinned(mvRoot: String): Option[(Int, Int)] = {
    val stRoot = stateRoot(mvRoot)
    var attempts = 0
    while (attempts < 3) {
      val snap = scala.util.Try(LakeTable.currentSnapshot(stRoot))
        .getOrElse(return None)
      if (snap <= 0) return None
      val b = scala.util.Try(stateBasis(stRoot)._1).getOrElse(return None)
      if (LakeTable.currentSnapshot(stRoot) == snap) return Some((snap, b))
      attempts += 1
    }
    None
  }

  /** The (group, key) state of a base read: multiplicity + one
    * signed SUM partial per extra measure. A partial is NULL exactly
    * when every contributing value is NULL — matching SUM's
    * NULL-ignoring semantics through the fold.
    */
  private def stateOf(base: DataFrame, group: Seq[String], keyCol: String,
      sums: Seq[(String, String)], signed: Boolean): DataFrame = {
    val sign: Column =
      if (!signed) lit(1L)
      else when(col("_change_type") === "insert", lit(1L)).otherwise(lit(-1L))
    val st = base.groupBy((group :+ keyCol).map(col): _*)
      .agg(sum(sign).cast("bigint").as(CntCol),
        sums.map { case (nm, e) =>
          sum(sign * expr(e)).cast("bigint").as(nm) }: _*)
    st.withColumn(SKeyCol, skeyExpr(st.schema, group :+ keyCol))
  }

  /** Derive the VISIBLE MV rows from a state frame: n = summed
    * multiplicities, the distinct measure = live non-null key count,
    * extra SUMs = summed partials, AVGs = sum / n read-time sugar.
    */
  private def derive(st: DataFrame, group: Seq[String], keyCol: String,
      distinctName: String, sums: Seq[(String, String)],
      derived: Seq[(String, Column)]): DataFrame = {
    val out = st.groupBy(group.map(col): _*)
      .agg(sum(col(CntCol)).cast("bigint").as(IncrementalJoinMv.CountCol),
        count(col(keyCol)).cast("bigint").as(distinctName) +:
          sums.map { case (nm, _) => sum(col(nm)).cast("bigint").as(nm) }: _*)
    derived.foldLeft(out) { case (d, (n, c)) => d.withColumn(n, c) }
  }

  private def stateCfg(group: Seq[String]): BlockWriter.Config =
    BlockWriter.Config(group.head, group.head, maxRecordsPerFile = 1 << 20)

  /** Materialize state + view from the fact head; returns the MV
    * snapshot. `keyCol` is the COUNT(DISTINCT) argument (a plain fact
    * column), `sums` the extra signed-foldable measures, `derived`
    * the read-time AVG sugar over stored SUMs.
    */
  def create(s: SparkSession, factRoot: String, mvRoot: String,
      group: Seq[String], keyCol: String, distinctName: String,
      cfg: BlockWriter.Config, sums: Seq[(String, String)] = Nil,
      derived: Seq[(String, Column)] = Nil,
      prep: DataFrame => DataFrame = identity): Int = {
    val f = LakeTable.currentSnapshot(factRoot)
    val st = stateOf(prep(LakeTable.read(s, factRoot, Some(f))), group, keyCol,
      sums, signed = false)
    LakeTable.commit(s, stateRoot(mvRoot), st, stateCfg(group), group,
      note = s"dmvs-basis-$f-full")
    LakeTable.commit(s, mvRoot,
      derive(LakeTable.read(s, stateRoot(mvRoot)), group, keyCol,
        distinctName, sums, derived),
      cfg, group, note = s"dmv-basis-$f-full")
  }

  /** Fold fact changes since the basis through the (g, x) state and
    * re-derive the visible rows; returns the new fact basis. SIGNED
    * mode folds the change feed (appends, MoR deletes and merges all
    * included — content-preserving maintenance emits zero change
    * rows) as ONE MoR MERGE over the touched cells — O(Δ) writes,
    * untouched state files byte-identical; an expired changelog range
    * falls back to one full state recompute (rewrite). Both commits
    * re-derive from durable state, so a crash between them completes
    * on the next call.
    */
  def refresh(s: SparkSession, factRoot: String, mvRoot: String,
      group: Seq[String], keyCol: String, distinctName: String,
      cfg: BlockWriter.Config, sums: Seq[(String, String)] = Nil,
      derived: Seq[(String, Column)] = Nil,
      prep: DataFrame => DataFrame = identity): Int = {
    val f0 = basis(mvRoot)
    val f1 = LakeTable.currentSnapshot(factRoot)
    val stRoot = stateRoot(mvRoot)
    val (sb, sbMode) = stateBasis(stRoot)
    if (f0 == f1 && sb == f0) return f0
    // fold the state forward when it is behind the fact head (sb may
    // already be at f1 if a prior refresh crashed after the state
    // commit — then only the visible derivation below is owed)
    var mode = sbMode
    var visibleDone = false
    if (sb < f1) {
      var cached: Option[DataFrame] = None
      try {
        val signedDelta: Option[DataFrame] = try {
          val changes = LakeTable.changelogRead(s, factRoot, sb, f1)
          // prep derives expression group columns (time buckets) over
          // the change rows — insert and delete pre-images of a row
          // derive the same bucket, so signed folds cancel exactly
          val delta = stateOf(prep(changes), group, keyCol, sums, signed = true)
            .persist()
          cached = Some(delta)
          // a pure-maintenance range (compaction, rewrite_manifests)
          // emits zero change rows: skip both commits, leave the
          // basis put — the next content refresh folds across it for
          // free (only when the VISIBLE view is already at the state
          // basis; a crash-interrupted refresh still owes the
          // derivation below, served from the state head as-is)
          if (delta.isEmpty && sb == f0) return f0
          if (delta.isEmpty) None else Some(delta)
        } catch {
          case _: IllegalStateException => // expired changelog range
            cached.foreach(_.unpersist()); cached = None
            mode = "full"
            val full = stateOf(prep(LakeTable.read(s, factRoot, Some(f1))),
              group, keyCol, sums, signed = false)
            LakeTable.rewrite(s, stRoot, full, stateCfg(group), group,
              note = s"dmvs-basis-$f1-full"): Unit
            None
        }
        // SIGNED fold as ONE MoR MERGE — O(Δ) writes, never a state
        // rewrite: the change feed names exactly the touched (g, x)
        // cells; fold the delta against ONLY those state rows and land
        // the result as a merge keyed on the stored cell key. Touched
        // cells re-land as new files, cells whose multiplicity reached
        // 0 retire via the same commit's equality-delete mask, and
        // every untouched state file survives BYTE-IDENTICAL (the
        // MinMaxMv upsert-and-retire shape). The state READ is pruned
        // to the delta's lead-group extents when they are
        // metadata-scale (IN filter → manifest stat pruning; a
        // clustered state reads only touched partitions); past the
        // cap it scans the state once — the WRITE stays O(Δ) either
        // way.
        signedDelta.foreach { delta =>
          mode = "signed"
          val stored = LakeTable.storedSchemaOf(stRoot).getOrElse(sys.error(
            s"$stRoot carries no stored schema — not a distinct-MV state"))
          val names = stored.fieldNames.toIndexedSeq
          val cap = AutoMaintain.policies(mvRoot)
            .getOrElse(AutoMaintain.MvMaxGroupsKey, MinMaxMv.DefaultMaxGroups)
          val leadRows = delta.select(col(group.head)).distinct().persist()
          // touched LEAD-group values, collected only when
          // metadata-scale (the MinMaxMv cap discipline) — they drive
          // both the pruned state read here and the targeted visible
          // fold below
          val leadsOpt: Option[Seq[Any]] =
            try {
              if (leadRows.count() <= cap)
                Some(leadRows.collect().map(_.get(0)).toSeq)
              else None
            } finally { leadRows.unpersist(); () }
          def prunedState(): DataFrame = leadsOpt match {
            case Some(leads) =>
              val nn = leads.filterNot(_ == null)
              val pred =
                if (nn.isEmpty) col(group.head).isNull
                else if (nn.size < leads.size)
                  col(group.head).isin(nn: _*) || col(group.head).isNull
                else col(group.head).isin(nn: _*)
              s.read.format("graft-lake").load(stRoot).filter(pred)
            case None => LakeTable.read(s, stRoot)
          }
          val stateRead = prunedState()
          val touchedKeys = delta.select(col(SKeyCol)).distinct()
          val folded = stateRead.select(names.map(col): _*)
            .join(touchedKeys, Seq(SKeyCol), "left_semi")
            .unionByName(delta.select(names.map(col): _*))
            .groupBy((group :+ keyCol :+ SKeyCol).map(col): _*)
            .agg(sum(col(CntCol)).cast("bigint").as(CntCol),
              sums.map { case (nm, _) =>
                sum(col(nm)).cast("bigint").as(nm) }: _*)
            .filter(col(CntCol) =!= 0L)
          // re-stamp with the EXACT stored schema (merge's schema gate
          // compares full JSON incl. nullability)
          val live = s.createDataFrame(
            folded.select(names.map(col): _*).rdd, stored).persist()
          try {
            if (live.isEmpty)
              // every touched cell retired: pure mask commit
              LakeTable.deleteWhere(s, stRoot, SKeyCol, touchedKeys,
                note = s"dmvs-basis-$f1-signed"): Unit
            else
              LakeTable.merge(s, stRoot, SKeyCol, live, stateCfg(group),
                group, note = s"dmvs-basis-$f1-signed",
                extraDeleteKeys = Some(touchedKeys)): Unit
          } finally { live.unpersist(); () }
          // VISIBLE fold, same discipline: only the touched lead
          // groups' visible rows change, so re-derive THEM from the
          // pruned post-merge state and land one merge keyed on the
          // lead column — vanished leads retire via the mask,
          // untouched visible files stay byte-identical, and the
          // whole refresh (state + view) reads nothing but the delta
          // and the touched lead groups' files. Requires an
          // equality-maskable lead (non-timestamp, no NULL touched
          // lead, under the cap) — otherwise the group-domain-sized
          // rewrite below stands in.
          val visStored = LakeTable.storedSchemaOf(mvRoot)
          val leadMaskable = leadsOpt.exists(ls =>
            !ls.contains(null) && visStored.exists(
              _.fields.find(_.name == group.head)
                .exists(_.dataType != TimestampType)))
          if (leadMaskable) {
            val vs = visStored.get
            val vis = derive(prunedState(), group, keyCol, distinctName,
              sums, derived)
            val liveV = s.createDataFrame(
              vis.select(vs.fieldNames.toIndexedSeq.map(col): _*).rdd, vs)
              .persist()
            val leadsDf = s.createDataFrame(
              java.util.Arrays.asList(leadsOpt.get.map(v =>
                org.apache.spark.sql.Row(v)): _*),
              StructType(Seq(vs(group.head))))
            try {
              if (liveV.isEmpty)
                LakeTable.deleteWhere(s, mvRoot, group.head, leadsDf,
                  note = s"dmv-basis-$f1-signed"): Unit
              else
                LakeTable.merge(s, mvRoot, group.head, liveV, cfg, group,
                  note = s"dmv-basis-$f1-signed",
                  extraDeleteKeys = Some(leadsDf)): Unit
            } finally { liveV.unpersist(); () }
            visibleDone = true
          }
        }
      } finally { cached.foreach(_.unpersist()); () }
    }
    if (!visibleDone)
      LakeTable.rewrite(s, mvRoot,
        derive(LakeTable.read(s, stRoot), group, keyCol, distinctName,
          sums, derived),
        cfg, group, note = s"dmv-basis-$f1-$mode"): Unit
    f1
  }
}
