package graft.lake

import java.nio.file.{Files, Paths}

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession

/** AUTO-MAINTENANCE policies — unattended small-file and metadata
  * hygiene, the guardrail a stream-fed lake needs (the reference's
  * 60 s flush cadence, main.go:75, makes small-file accumulation the
  * DEFAULT failure mode; today's alternative is a human remembering
  * to `CALL graft.system.compact`).
  *
  * Declared as TBLPROPERTIES on the catalog table:
  *  - `graft.autocompact.files = N`   — after a triggering commit, if
  *    the head references ≥ N live data files, rewrite the head into
  *    task-sized files (the exact `CALL compact` path: declared
  *    layouts re-cluster, MoR debt folds, avro planes re-pack);
  *  - `graft.automanifest.parts = M`  — if the head's manifest part
  *    chain is ≥ M parts long, consolidate it to one part
  *    (`rewrite_manifests`).
  *
  * Firing rules, in order of importance:
  *  - POST-COMMIT, BEST-EFFORT: policies run after the triggering
  *    commit has durably succeeded, and any maintenance failure is
  *    swallowed — a compaction problem must never fail the append
  *    that triggered it.
  *  - CAS-SAFE: the compaction rewrite carries `basis = head`, so an
  *    append racing it wins and the maintenance attempt simply
  *    abandons (it will re-fire on the racer's own post-commit);
  *    manifest consolidation is already CAS-arbitrated internally.
  *  - NON-REENTRANT: maintenance commits are replace/consolidate
  *    commits, which never trigger policies, and a per-root in-flight
  *    guard stops a policy from firing inside its own maintenance.
  *
  * The thresholds are per-table METADATA (`meta/_policy.json`, the
  * CHECK-constraint pattern) — path-API writers and SQL writers get
  * the same unattended hygiene.
  */
object AutoMaintain {

  val AutoCompactKey = "graft.autocompact.files"
  val AutoManifestKey = "graft.automanifest.parts"
  /** Optional compaction fan-out (files written per auto-compaction);
    * defaults to the session's shuffle parallelism. The knob a
    * deployment turns when task-sized output files matter more than
    * rewrite speed.
    */
  val AutoParallelismKey = "graft.autocompact.parallelism"

  /** Touched-group cap for targeted MV refreshes ([[MinMaxMv]]):
    * past it a refresh recomputes the whole view instead of driver-
    * collecting the Δ-group IN list.
    */
  val MvMaxGroupsKey = "graft.mvrefresh.maxgroups"

  /** Declared on a FACT table (any value ≥ 1): every append-shaped
    * commit refreshes the registered MVs over it
    * ([[MaterializedView.refreshStale]]) before returning — rollups
    * stay continuously fresh (and the query-rewrite rule keeps
    * serving them) without an external refresh scheduler. Failures
    * skip like every other maintenance action: the MV stays VISIBLY
    * stale in `t.mvs` for the next refresh to catch. Dimension-side
    * commits don't trigger (the registry hangs off the fact).
    */
  val AutoRefreshMvKey = "graft.autorefresh.mvs"

  /** RETENTION as a policy — `graft.autoexpire.keep = N`: after a
    * triggering commit, expire every snapshot older than the newest N
    * ([[LakeTable.expire]] — TAG-PINNED snapshots and their files
    * always survive regardless of age, published-branch guards
    * apply, the head always survives). This was the one hygiene verb
    * a production table still needed a human or external cron for;
    * now it rides the same post-commit/best-effort/non-reentrant
    * rules as every policy (expiry never commits, so it cannot
    * re-enter the engine). Operational note: keep N at least as wide
    * as any change-feed consumer's checkpoint lag — the changelog
    * cannot outlive the manifests (an expired range fails pointedly
    * on read, naming the snapshots and the remedy).
    */
  val AutoExpireKey = "graft.autoexpire.keep"

  /** STATS freshness as a policy — `graft.autoanalyze.files = N`:
    * after a triggering commit, if the head references ≥ N data files
    * ABSENT from the `_colstats.json` sidecar, run the incremental
    * ANALYZE (only the un-sketched files are read — the append, never
    * the table). With it, CBO distinct counts, scan-time column stats
    * and histogram bins stay fresh under unattended appends with zero
    * manual ANALYZE calls. Optional companion
    * `graft.autoanalyze.drift = P` (permille): after each auto pass,
    * if any column's merged-histogram HEAVIEST bin holds > P‰ of its
    * rows (equi-height degraded toward equi-width — boundary drift),
    * the sidecar is rebuilt from scratch so fresh quantile boundaries
    * re-derive over the CURRENT data. The rebuild is the expensive
    * path by design and fires only past the declared bound.
    */
  val AutoAnalyzeKey = "graft.autoanalyze.files"
  val AutoAnalyzeDriftKey = "graft.autoanalyze.drift"

  private def policyPath(root: String) = Paths.get(root, "meta", "_policy.json")

  def setPolicy(root: String, key: String, value: Long): Unit = {
    require(key == AutoCompactKey || key == AutoManifestKey ||
      key == AutoParallelismKey || key == MvMaxGroupsKey ||
      key == AutoRefreshMvKey || key == AutoExpireKey ||
      key == AutoAnalyzeKey || key == AutoAnalyzeDriftKey,
      s"unknown maintenance policy '$key'")
    // thresholds below 2 would fire on every commit; a fan-out of 1
    // (compact into ONE file), a 1-group refresh cap, the on/off
    // auto-refresh flag and keep-only-the-head retention are
    // legitimate targets, though
    val floor = if (key == AutoParallelismKey || key == MvMaxGroupsKey ||
      key == AutoRefreshMvKey || key == AutoExpireKey ||
      key == AutoAnalyzeKey || key == AutoAnalyzeDriftKey) 1 else 2
    require(value >= floor, s"$key must be ≥ $floor (got $value)")
    write(root, policies(root) + (key -> value))
  }

  def dropPolicy(root: String, key: String): Unit =
    write(root, policies(root) - key)

  def policies(root: String): Map[String, Long] = {
    val p = policyPath(root)
    if (!Files.exists(p)) Map.empty
    else "\"([^\"]+)\"\\s*:\\s*(\\d+)".r.findAllMatchIn(Files.readString(p))
      .map(m => m.group(1) -> m.group(2).toLong).toMap
  }

  private def write(root: String, pol: Map[String, Long]): Unit = {
    val p = policyPath(root)
    if (pol.isEmpty) { Files.deleteIfExists(p): Unit; return }
    Files.createDirectories(p.getParent)
    Files.writeString(p, pol.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")): Unit
  }

  // per-root in-flight guard: a maintenance rewrite's own commit must
  // not re-enter the policy engine
  private val inFlight = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  // roots whose hook was SKIPPED because another thread held the
  // guard: the holder re-runs once after releasing, so a commit that
  // raced an in-progress refresh still gets its freshness pass (the
  // actions re-read the head — idempotent; retries are bounded by
  // actual skipped commits, not unbounded recursion)
  private val skipped = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Spec surface: completed (compactions, consolidations) per root. */
  private val fired = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
  def firedCounts(root: String): (Long, Long) = fired.getOrDefault(root, (0L, 0L))

  /** Spec surface: completed auto-ANALYZE passes per root. */
  private val analyzed = new java.util.concurrent.ConcurrentHashMap[String, Long]()
  def analyzedCount(root: String): Long = analyzed.getOrDefault(root, 0L)

  /** Post-commit hook, called by the append-shaped verbs (commit,
    * merge, appendAvro). Cheap when no policy is declared: one
    * Files.exists probe.
    */
  private[lake] def afterCommit(spark: SparkSession, root: String): Unit = {
    val pol =
      try policies(root)
      catch { case NonFatal(_) => return }
    if (pol.isEmpty) return
    if (!inFlight.add(root)) { skipped.add(root): Unit; return }
    try {
      pol.get(AutoManifestKey).foreach { cap =>
        try {
          val head = LakeTable.currentSnapshot(root)
          if (head > 0 && LakeTable.partCount(root, head) >= cap) {
            LakeTable.rewriteManifests(root)
            fired.merge(root, (0L, 1L), (a, b) => (a._1 + b._1, a._2 + b._2))
          }
        } catch { case NonFatal(_) => () }
      }
      pol.get(AutoCompactKey).foreach { cap =>
        try {
          val head = LakeTable.currentSnapshot(root)
          if (head > 0 && LakeTable.manifest(root, head).files.size >= cap) {
            compact(spark, root, head)
            fired.merge(root, (1L, 0L), (a, b) => (a._1 + b._1, a._2 + b._2))
          }
        } catch { case NonFatal(_) => () }
      }
      pol.get(AutoRefreshMvKey).foreach { _ =>
        // refresh the registered MVs over this fact — their commits
        // land on the MV roots (not re-entering this root's guard),
        // and each MV's own afterCommit is a no-op without policies
        try MaterializedView.refreshStale(spark, root): Unit
        catch { case NonFatal(_) => () }
      }
      pol.get(AutoAnalyzeKey).foreach { cap =>
        try {
          val head = LakeTable.currentSnapshot(root)
          if (head > 0 && LakeTable.unsketchedCount(root, head) >= cap) {
            LakeTable.analyze(spark, root): Unit
            // boundary-drift check AFTER the incremental pass: a
            // heaviest merged bin past the bound means the fixed
            // boundaries no longer equi-height the data — rebuild the
            // sidecar so quantiles re-derive over the current table
            pol.get(AutoAnalyzeDriftKey).foreach { permille =>
              if (LakeTable.histTopBinPermille(root).exists(_ > permille)) {
                LakeTable.dropColStats(root)
                LakeTable.analyze(spark, root): Unit
              }
            }
            analyzed.merge(root, 1L, _ + _): Unit
          }
        } catch { case NonFatal(_) => () }
      }
      pol.get(AutoExpireKey).foreach { keepN =>
        try {
          // LAST, after any auto-compaction added its head: retention
          // then reclaims the rewritten-away files in the same pass.
          val head = LakeTable.currentSnapshot(root)
          val keepFrom = head - keepN.toInt + 1
          // cheap trigger probe: the NEWEST expiry candidate's
          // manifest still on disk means there is history to reclaim
          // (a TAG-pinned manifest just below keepFrom re-triggers
          // the walk — expire itself skips pinned snapshots, so the
          // re-run is bounded metadata work, never data loss)
          if (keepFrom > 1 && Files.exists(
              Paths.get(root, "meta", s"manifest-${keepFrom - 1}.json")))
            LakeTable.expire(root, keepFrom): Unit
        } catch { case NonFatal(_) => () }
      }
    } finally inFlight.remove(root): Unit
    // a commit that raced this hook was skipped above — run its pass
    // now so a burst-then-idle writer doesn't strand stale MVs
    if (skipped.remove(root)) afterCommit(spark, root)
  }

  /** The `CALL compact` path with `basis = head`: a racing append
    * wins the CAS and this attempt abandons (the racer's own
    * post-commit re-fires the policy).
    */
  private def compact(spark: SparkSession, root: String, head: Int): Unit = {
    val m = LakeTable.manifest(root, head)
    if (m.files.exists(_.path.endsWith(".avro"))) {
      // avro plane: container re-pack (delete debt folds). Stat
      // columns carry over as the UNION across files — per-append
      // `stats` options may differ, and dropping any file's tracked
      // column would silently stop pruning on it
      val statCols = m.files.flatMap(_.stats.keys).distinct.sorted
      LakeTable.rewriteAvro(spark, root, statCols,
        policies(root).get(AutoParallelismKey).map(_.toInt).getOrElse(
          math.max(1, spark.sessionState.conf.numShufflePartitions / 8))): Unit
    } else {
      val data = LakeTable.read(spark, root, Some(head))
      val (cfg0, stats, _, rc, zc) = graft.sources.LakeFormatWrite.config(
        org.apache.spark.sql.util.CaseInsensitiveStringMap.empty(), data.schema, root)
      val cfg = policies(root).get(AutoParallelismKey) match {
        case Some(n) =>
          // the knob pins the OUTPUT FILE COUNT, so records-per-file
          // must follow the table's size (manifest row counts —
          // metadata), or the row cap would re-split what the fan-out
          // just merged
          val rows = m.files.map(_.rows).sum
          cfg0.copy(parallelism = Some(n.toInt),
            maxRecordsPerFile = math.max(cfg0.maxRecordsPerFile,
              (rows / math.max(1L, n) + 1L).toInt))
        case None => cfg0
      }
      LakeTable.rewrite(spark, root, data, cfg, stats,
        rangeCluster = rc, basis = Some(head),
        clusterBy = graft.sources.LakeFormatWrite.zClusterOf(zc, data),
        note = "autocompact"): Unit
    }
  }
}
