package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lake.LakeTable
import graft.writer.BlockWriter

/** CDC CONSUMPTION — apply change-feed batches to a downstream
  * MIRROR lake table. The consumer half of the change-data-feed pair
  * ([[graft.sources.GraftCdfSource]] produces the batches): a mirror
  * maintained purely from attributed change rows, never by
  * re-reading the upstream table, with write amplification
  * O(changed rows) per upstream commit.
  *
  * Apply rule, per upstream snapshot IN ORDER within the batch —
  * ONE mirror commit per upstream snapshot:
  *  - insert rows present → one atomic MERGE carrying the snapshot's
  *    pure-delete keys (delete pre-image keys MINUS its insert keys)
  *    as EXTRA equality-delete keys: adds + eq-delete of the insert
  *    keys + eq-delete of the pure deletes, all scoped to files
  *    below the merge snap — the upsert fold of the delete+insert
  *    changelog encoding, and an upstream atomic merge-with-deletes
  *    becomes an equally atomic mirror commit (commit cadence
  *    matches the upstream 1:1, never 2:1);
  *  - delete-only snapshot → one MoR equality-delete commit.
  *
  * Exactly-once: foreachBatch is at-least-once under driver crash,
  * so every mirror commit stamps `cdc:<snap>:<verb>` in its manifest
  * note and the loop SKIPS snapshots already stamped — checkpoint
  * offsets dedupe across drains, note markers dedupe within a
  * replayed batch. The replay ledger is read through an
  * applied-snapshot WATERMARK (see [[wmFile]]), so per-batch
  * metadata IO is O(batch snapshots), never O(mirror history).
  */
object CdcApply {

  private val CT = "_change_type"
  private val CS = "_change_snap"

  /** APPLIED-SNAPSHOT WATERMARK (mirror meta, advisory): `snap` is
    * the highest upstream snapshot fully applied, `mirror_head` the
    * mirror's head when it was written. Invariant (watermark written
    * AFTER a batch's commits, foreachBatch serial): any cdc mark for
    * an upstream snapshot > `snap` lives in a mirror manifest >
    * `mirror_head` — so a batch reads the watermark (one small file)
    * plus only the manifests SINCE it, making replay-ledger metadata
    * IO O(commits since last watermark) ≈ O(batch snapshots) per
    * applied batch instead of O(mirror commit history); a year-old
    * streaming-cadence mirror (~500k commits) stays O(batch). Losing
    * the file is safe: the fallback walks the full ledger once and
    * the note markers still dedupe exactly.
    */
  private def wmFile(mirrorRoot: String) =
    java.nio.file.Paths.get(mirrorRoot, "meta", "_cdc_watermark.json")

  /** (snap, mirror_head, prev_head, empty): `prev_head` is the
    * mirror head the PREVIOUS watermark recorded — marks of the most
    * recently applied batch live in (prev_head, mirror_head], which
    * is what the skip VALIDATION needs to clear a crash-replayed
    * batch in O(batch) manifest reads. `empty` lists applied
    * snapshots that produced ZERO mirror commits (a delete-only
    * snapshot landing on an empty mirror — possible when consumption
    * is seeded mid-stream): they have no cdc mark anywhere, so the
    * validation must learn them from here or a crash-replay would
    * brick on a snapshot that WAS correctly applied. The list only
    * ever gains seed-time entries, so it stays tiny. Old files read
    * with prev_head == mirror_head and no empties (validation then
    * falls back to the cached full note set — correct, one-time
    * cost).
    */
  private def readWatermark(mirrorRoot: String)
      : (Int, Int, Int, Set[Int], Boolean) = {
    val p = wmFile(mirrorRoot)
    if (!java.nio.file.Files.exists(p)) (0, 0, 0, Set.empty, false)
    else {
      val body = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      def field(name: String): Option[String] =
        (java.util.regex.Pattern.quote("\"" + name + "\"") + "\\s*:\\s*(\\d+)")
          .r.findFirstMatchIn(body).map(_.group(1))
      val s0 = field("snap").map(_.toInt).getOrElse(0)
      val h0 = field("mirror_head").map(_.toInt).getOrElse(0)
      val ph = field("prev_head").map(_.toInt).getOrElse(h0)
      val empty = """"empty"\s*:\s*\[([0-9, ]*)\]""".r.findFirstMatchIn(body)
        .map(_.group(1).split(",").map(_.trim).filter(_.nonEmpty)
          .map(_.toInt).toSet)
        .getOrElse(Set.empty[Int])
      // a PRE-`empty`-ERA watermark cannot distinguish a correctly-
      // applied zero-commit snapshot from out-of-order delivery — the
      // validation must not hard-fail a crash-replayed legacy batch.
      // Keyed on the ABSENCE OF `empty` ALONE: `prev_head` predates
      // the empty ledger, so an intermediate-era file (prev_head
      // present, no empty list) is just as blind to zero-commit
      // applications; new-format writes always emit `empty` (even
      // `[]`), so this never misfires on a current file.
      val legacy = !body.contains("\"empty\"")
      (s0, h0, ph, empty, legacy)
    }
  }

  private def writeWatermark(mirrorRoot: String, snap: Int, mirrorHead: Int,
      prevHead: Int, empty: Set[Int]): Unit = {
    val p = wmFile(mirrorRoot)
    java.nio.file.Files.createDirectories(p.getParent)
    val tmp = p.resolveSibling(s"._cdc_watermark.${System.nanoTime()}.tmp")
    java.nio.file.Files.write(tmp,
      (s"""{"snap":$snap,"mirror_head":$mirrorHead,"prev_head":$prevHead,""" +
        s""""empty":[${empty.toSeq.sorted.mkString(",")}]}""").getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** The cdc marks recorded in mirror manifests (`sinceHead`, head] —
    * with the watermark invariant above this is the complete set of
    * marks for any upstream snapshot the batch could still need to
    * dedupe against.
    */
  private def marksSince(mirrorRoot: String, sinceHead: Int,
      head: Int): scala.collection.mutable.Set[String] = {
    val s = scala.collection.mutable.Set.empty[String]
    (math.max(1, sinceHead + 1) to head).foreach(i =>
      s += LakeTable.manifest(mirrorRoot, i).note)
    s
  }

  /** Apply one change-feed micro-batch (columns: the table's schema
    * plus `_change_type`/`_change_snap`) to the mirror at
    * `mirrorRoot`. Idempotent: re-applying a batch (or any prefix of
    * one) is a no-op. Returns the number of mirror commits made.
    */
  /** Range note of a coalesced apply: covers upstream (from, to]. */
  private val rangeMarkRe = "^cdc:(\\d+)-(\\d+):range$".r

  /** Whether `sn` is covered by any mark in `notes` — an individual
    * `cdc:<sn>:<verb>` mark or a coalesced `cdc:<a>-<b>:range` note.
    */
  private def covered(sn: Int, notes: Iterable[String]): Boolean =
    notes.exists {
      case n if n == s"cdc:$sn:delete" || n == s"cdc:$sn:upsert" => true
      case rangeMarkRe(a, b) => a.toInt <= sn && sn <= b.toInt
      case _ => false
    }

  def applyBatch(s: SparkSession, mirrorRoot: String, batch: DataFrame,
      keyCol: String, cfg: BlockWriter.Config, statCols: Seq[String],
      coalesce: Boolean = false): Int = {
    val b = batch.persist()
    // ONE pass over the batch computes, per snapshot, the insert-row
    // count and the PURE-DELETE key count (delete pre-image keys
    // minus that snapshot's insert keys). The per-snapshot
    // filter/exceptAll/isEmpty probes this replaces cost one shuffle
    // job EACH — O(batch snapshots) jobs over the persisted batch —
    // while these two jobs are O(1) per applied batch however many
    // snapshots it carries. `perKey` stays cached so each snapshot's
    // pure-delete key frame is a cheap cached filter, not a rescan.
    val perKey = b.groupBy(col(CS), col(keyCol))
      .agg(
        sum(when(col(CT) === "insert", 1L).otherwise(0L)).as("_ins"),
        sum(when(col(CT) === "delete", 1L).otherwise(0L)).as("_del"))
      .persist()
    try {
      val stats = perKey.groupBy(col(CS))
        .agg(sum(col("_ins")).as("i"),
          sum(when(col("_del") > 0 && col("_ins") === 0, 1L)
            .otherwise(0L)).as("pd"))
        .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      val allSnaps = stats.keys.toArray.sorted
      var commits = 0
      // watermark + tail marks, read ONCE per batch; commits made
      // below are appended to the local set, never re-read from
      // manifests — O(batch) metadata IO however old the mirror is
      val (wm, wmHead, prevHead, knownEmpty, legacyWm) = readWatermark(mirrorRoot)
      // tail marks cover (prev_head, head]: this batch's dedupe range
      // PLUS the previous batch's marks, so a crash-replayed batch
      // (the common at-least-once path) validates without touching
      // older history — still O(batch) manifest IO per applied batch
      val seen = marksSince(mirrorRoot, math.min(prevHead, wmHead),
        LakeTable.currentSnapshot(mirrorRoot))
      val snaps = allSnaps.filter(_ > wm)
      // VALIDATE the monotonic-delivery invariant instead of assuming
      // it: a snapshot at-or-below the watermark is only skippable if
      // its cdc mark exists in the mirror ledger (tail marks for
      // recent ones, the cached full note set for older) OR it is a
      // recorded zero-commit application (the watermark's `empty`
      // list — a delete-only snapshot applied to an empty mirror
      // leaves no mark to find). An out-of-order or re-seeded
      // consumer replaying a range the mirror never applied fails
      // POINTEDLY here rather than silently diverging.
      val emptyApplied = scala.collection.mutable.Set.empty[Int]
      val skipped = allSnaps.filter(_ <= wm)
      if (skipped.nonEmpty) {
        lazy val allNotes = LakeTable.manifestNotes(mirrorRoot)
        val unapplied = skipped.filterNot { sn =>
          knownEmpty.contains(sn) ||
            covered(sn, seen) || covered(sn, allNotes)
        }
        // A LEGACY (pre-`empty`-list) watermark cannot vouch for a
        // zero-commit application: a delete-only snapshot correctly
        // applied to an empty mirror pre-upgrade left neither a cdc
        // mark nor an `empty` entry, so hard-failing would brick its
        // crash-replay. Adopt mark-less skipped snapshots into the
        // empty ledger instead — a ONE-TIME migration exemption made
        // durable (the watermark below writes new-format, so every
        // later batch validates strictly against the adopted list).
        if (legacyWm) unapplied.foreach(sn => { emptyApplied += sn: Unit })
        else require(unapplied.isEmpty,
          s"cdc apply: batch carries upstream snapshot(s) " +
            s"${unapplied.mkString(", ")} at-or-below the applied " +
            s"watermark $wm of $mirrorRoot, but no cdc mark for them " +
            "exists in the mirror ledger — out-of-order or re-seeded " +
            "delivery would silently diverge the mirror")
      }
      // ---- OPT-IN CADENCE COALESCING: apply the batch's N upstream
      // snapshots as ONE folded mirror commit under a range note —
      // latest-wins per key across the range (the same algebra the
      // in-batch per-snapshot window already applies, widened to the
      // batch): a key's final state is its LAST touching snapshot's
      // state — insert there → upsert that row, delete-only there →
      // pure delete. Exactly-once rides the same ledger (a replayed
      // batch sees its range note and no-ops; the skip validation
      // above accepts range coverage). Trade-off is by design:
      // 1 commit per BATCH instead of per upstream snapshot — the
      // mirror's history no longer mirrors upstream cadence 1:1, so
      // it stays opt-in. Falls back to the 1:1 path when any of the
      // range's snapshots already carries an individual mark (a mode
      // flip over a partially-applied history must not re-fold).
      val rangeMark =
        if (snaps.length > 1) s"cdc:${snaps.head}-${snaps.last}:range" else ""
      // the MODE-FLIP fallback keys on INDIVIDUAL marks only: a range
      // note in the ledger must keep the batch on the coalesced path
      // (where the rangeMark guard below makes its replay a no-op) —
      // testing `covered` here would see the batch's OWN range note on
      // a crash-replay (range committed, watermark write lost), force
      // coalesced=false, and the per-snapshot loop would re-apply
      // every snapshot individually, regressing keys mid-loop
      def indivMark(sn: Int): Boolean =
        seen.contains(s"cdc:$sn:delete") || seen.contains(s"cdc:$sn:upsert")
      val coalesced = coalesce && snaps.length > 1 && !snaps.exists(indivMark)
      if (coalesced && !seen.contains(rangeMark)) {
        // final state per key: the per-key aggregate row of the key's
        // LAST touching snapshot decides upsert-vs-delete
        val lastTouch = perKey.groupBy(col(keyCol).as("_k"))
          .agg(max(col(CS)).as("_sn"))
        val finals = perKey.join(lastTouch,
          perKey(keyCol) === col("_k") && perKey(CS) === col("_sn"))
          .persist()
        val winners = b.filter(col(CT) === "insert")
          .join(finals.filter(col("_ins") > 0)
            .select(col("_k"), col("_sn")),
            b(keyCol) === col("_k") && b(CS) === col("_sn"), "left_semi")
          .drop(CT, CS)
        val delKeys = finals.filter(col("_ins") === 0 && col("_del") > 0)
          .select(col("_k").as(keyCol))
        val mirrorLive = LakeTable.currentSnapshot(mirrorRoot) > 0
        // ONE aggregate job answers both mode questions (was two
        // limit(1) probes, each re-deriving the finals join); the
        // persist above keeps the join cached for winners/delKeys
        val probe = finals.agg(
          count(when(col("_ins") > 0, lit(1))).as("_i"),
          count(when(col("_ins") === 0 && col("_del") > 0, lit(1))).as("_d"))
          .head()
        val hasIns = probe.getLong(0) > 0
        val hasDel = mirrorLive && probe.getLong(1) > 0
        try {
          if (hasIns && !mirrorLive)
            LakeTable.commit(s, mirrorRoot, winners, cfg, statCols,
              note = rangeMark)
          else if (hasIns) {
            val aligned = winners.to(LakeTable.read(s, mirrorRoot).schema)
            LakeTable.merge(s, mirrorRoot, keyCol, aligned, cfg, statCols,
              note = rangeMark,
              extraDeleteKeys = if (hasDel) Some(delKeys) else None)
          } else if (hasDel)
            LakeTable.deleteWhere(s, mirrorRoot, keyCol, delKeys,
              note = rangeMark)
        } finally { finals.unpersist(); () }
        if (hasIns || hasDel) { seen += rangeMark; commits += 1 }
        else snaps.foreach(sn => { emptyApplied += sn: Unit })
      }
      // a coalesced range — freshly applied or replay-skipped via its
      // range note — never also walks the per-snapshot path
      if (!coalesced)
      snaps.foreach { sn =>
        val delMark = s"cdc:$sn:delete"; val upsMark = s"cdc:$sn:upsert"
        // a snapshot covered by a RANGE note was applied by a
        // coalesced batch (both halves folded into the range commit):
        // the 1:1 path must skip it entirely — a coalesce→1:1 mode
        // flip over a partially-watermarked history re-applying it
        // would regress keys to earlier-snapshot values
        val rangeCovered = seen.exists {
          case rangeMarkRe(a, b2) => a.toInt <= sn && sn <= b2.toInt
          case _ => false
        }
        val before = commits
        val (insRows, pureDelKeys) = stats(sn)
        def ins = b.filter(col(CS) === sn && col(CT) === "insert")
          .drop(CT, CS)
        // the snapshot's pure-delete keys, off the cached per-key
        // aggregate (already distinct by construction)
        def delOnly = perKey
          .filter(col(CS) === sn && col("_del") > 0 && col("_ins") === 0)
          .select(col(keyCol))
        val mirrorLive = LakeTable.currentSnapshot(mirrorRoot) > 0
        // the delete half still pending? (delMark only ever appears
        // in ledgers written by the LEGACY two-commit flow — current
        // folded commits carry upsMark alone)
        val needDel = !rangeCovered && !seen.contains(delMark) &&
          mirrorLive && pureDelKeys > 0
        if (!rangeCovered && !seen.contains(upsMark) && insRows > 0) {
          if (!mirrorLive)
            LakeTable.commit(s, mirrorRoot, ins, cfg, statCols, note = upsMark)
          else {
            // ONE atomic commit per upstream snapshot: the pure-delete
            // keys ride the MERGE as extra equality-delete keys (both
            // delete families scope to files with seq < the merge
            // snap — the exact mirror state the legacy
            // delete-then-merge pair produced, at HALF the commit
            // cadence for mixed snapshots). A crash-replay of the
            // legacy format (delMark already in the ledger) carries
            // nothing twice: the delete half rides only while its own
            // mark is absent.
            // merge's schema gate is strict on nullability — align
            // the changelog frame to the mirror's read schema
            val aligned = ins.to(LakeTable.read(s, mirrorRoot).schema)
            LakeTable.merge(s, mirrorRoot, keyCol, aligned, cfg, statCols,
              note = upsMark,
              extraDeleteKeys = if (needDel) Some(delOnly) else None)
          }
          seen += upsMark
          commits += 1
        } else if (!rangeCovered && !seen.contains(upsMark) && needDel) {
          // delete-only snapshot: the eq-delete commit stands alone
          // under its own mark. NEVER reached when upsMark is present
          // — a folded commit already applied the delete half, and
          // re-deleting here after a later snapshot re-inserted the
          // key would diverge the mirror on crash-replay.
          LakeTable.deleteWhere(s, mirrorRoot, keyCol, delOnly, note = delMark)
          seen += delMark
          commits += 1
        }
        // a snapshot that produced NO commit and has no prior mark
        // (delete-only onto an empty mirror — mid-stream seeding) must
        // be remembered in the watermark, or its crash-replay would
        // fail the skip validation despite being correctly applied
        if (commits == before && !rangeCovered &&
            !seen.contains(delMark) && !seen.contains(upsMark))
          emptyApplied += sn: Unit
      }
      // advance the watermark AFTER the batch's commits (the ordering
      // the invariant needs); a crash before this line just means the
      // next batch walks a slightly longer manifest tail
      val newWm = if (snaps.nonEmpty) snaps.last else wm
      if (newWm > wm || commits > 0 || emptyApplied.nonEmpty)
        writeWatermark(mirrorRoot, newWm,
          LakeTable.currentSnapshot(mirrorRoot), wmHead,
          knownEmpty ++ emptyApplied)
      commits
    } finally { perKey.unpersist(); b.unpersist(); () }
  }
}
