package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.lake.LakeTable
import graft.writer.BlockWriter

/** The change-data-feed STREAMING source:
  * `readStream.format("graft-lake").option("changeFeed", "true")`
  * (v1 Source path — [[graft.sources.GraftCdfSource]]).
  */
class CdfStreamSpec extends AnyFunSuite {
  import TestSpark._

  private def drain(root: String, sink: String, ckpt: String): Unit = {
    val q = spark.readStream.format("graft-lake")
      .option("changeFeed", "true").load(root)
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("changeFeed stream: inserts then MoR-delete pre-images, exactly once across restarts") {
    val s = spark
    import s.implicits._
    val root = graft.util.Scratch.dir("graft_cdfspec_")
    val sink = graft.util.Scratch.dir("graft_cdfspec_sink_")
    val ckpt = graft.util.Scratch.dir("graft_cdfspec_ck_")
    val base = (1L to 20L).map(i => (i, i % 4, s"k$i")).toDF("id", "grp", "name")
    val cfg = BlockWriter.Config("grp", "id", maxRecordsPerFile = 8)
    LakeTable.commit(s, root, base.filter($"id" <= 10), cfg, Seq("id"))

    drain(root, sink, ckpt)
    val after1 = s.read.parquet(sink)
    assert(after1.count() === 10L)
    assert(after1.select("_change_type").distinct().as[String].collect().toSet === Set("insert"))
    assert(after1.select("_change_snap").distinct().as[Int].collect().toSet === Set(1))

    // two commits land between drains: an append and a positional
    // delete; the second drain must deliver ONLY their changes
    LakeTable.commit(s, root, base.filter($"id" > 10), cfg, Seq("id"))
    val coords = LakeTable.withRowCoords(s, root).filter($"grp" === 0)
      .select(col(LakeTable.CoordPath), col(LakeTable.CoordIdx))
    LakeTable.deletePositions(s, root, coords)
    drain(root, sink, ckpt)

    val out = s.read.parquet(sink)
      .select($"_change_type", $"_change_snap", $"id")
      .as[(String, Int, Long)].collect()
    // snapshot 1: ids 1..10 inserted (never re-delivered)
    assert(out.count(r => r._1 == "insert" && r._2 == 1) === 10)
    // snapshot 2: ids 11..20 inserted
    assert(out.filter(r => r._1 == "insert" && r._2 == 2).map(_._3).sorted
      === (11L to 20L).toArray)
    // snapshot 3: the delete pre-images (grp==0 ⇒ id % 4 == 0)
    assert(out.filter(r => r._1 == "delete").map(_._3).sorted
      === (1L to 20L).filter(_ % 4 == 0).toArray)
    assert(out.filter(r => r._1 == "delete").forall(_._2 == 3))
    assert(out.length === 10 + 10 + 5)

    // a content-preserving REPLACE commit (compaction) emits ZERO
    // change rows — maintenance is invisible to the feed
    LakeTable.foldDeletes(s, root, cfg, Seq("id"))
    drain(root, sink, ckpt)
    assert(s.read.parquet(sink).count() === 25L)
  }

  test("changeFeed stream on a plain-append readStream is refused; plain tailing still rides DSv2") {
    val s = spark
    import s.implicits._
    val root = graft.util.Scratch.dir("graft_cdfspec2_")
    val cfg = BlockWriter.Config("grp", "id", maxRecordsPerFile = 8)
    LakeTable.commit(s, root,
      (1L to 6L).map(i => (i, i % 2, s"k$i")).toDF("id", "grp", "name"),
      cfg, Seq("id"))
    // without changeFeed the DSv2 micro-batch path serves appends —
    // the frame has the table schema, no _change_type column
    val plain = s.readStream.format("graft-lake").load(root)
    assert(!plain.schema.fieldNames.contains("_change_type"))
    // with changeFeed the v1 source serves the changelog schema
    val cdf = s.readStream.format("graft-lake")
      .option("changeFeed", "true").load(root)
    assert(cdf.schema.fieldNames.takeRight(2).toSeq
      === Seq("_change_type", "_change_snap"))
  }

  test("CdcApply: mirror follows append/merge/delete; replayed and prefix batches are no-ops") {
    val s = spark
    import s.implicits._
    import graft.streaming.CdcApply
    val up = graft.util.Scratch.dir("graft_cdcap_up_")
    val mir = graft.util.Scratch.dir("graft_cdcap_mir_")
    val base = (1L to 20L).map(i => (i, i % 4, i * 10.0)).toDF("id", "grp", "v")
    val cfg = BlockWriter.Config("grp", "id", maxRecordsPerFile = 8)
    LakeTable.commit(s, up, base.filter($"id" <= 10), cfg, Seq("id"))
    LakeTable.merge(s, up, "id",
      base.filter($"id" <= 10 && $"id" % 2 === 0).withColumn("v", $"v" + 1000.0),
      cfg, Seq("id"))
    LakeTable.deleteWhere(s, up, "id", Seq(3L, 5L).toDF("id"))

    val batch = LakeTable.changelogRead(s, up, 0, 3)
    val n1 = CdcApply.applyBatch(s, mir, batch, "id", cfg, Seq("id"))
    assert(n1 === 3, "snap1 commit + snap2 merge + snap3 delete")
    val head = LakeTable.currentSnapshot(mir)

    // mirror content == upstream content, exactly
    val a = LakeTable.read(s, up)
    val m = LakeTable.read(s, mir).select(a.columns.map(col).toIndexedSeq: _*)
    assert(a.exceptAll(m).count() === 0L)
    assert(m.exceptAll(a).count() === 0L)

    // a replayed batch re-applies nothing (note markers)
    assert(CdcApply.applyBatch(s, mir, batch, "id", cfg, Seq("id")) === 0)
    assert(LakeTable.currentSnapshot(mir) === head)
    // a replayed PREFIX (crash between snapshots) is also a no-op
    assert(CdcApply.applyBatch(s, mir,
      batch.filter($"_change_snap" <= 2), "id", cfg, Seq("id")) === 0)
    assert(LakeTable.currentSnapshot(mir) === head)
  }

  test("CdcApply folds a mixed snapshot into ONE mirror commit; crash-replay after the fold never re-deletes; legacy half-applied state completes") {
    val s = spark
    import s.implicits._
    import graft.streaming.CdcApply
    val up = graft.util.Scratch.dir("graft_cdcfold_up_")
    val mir = graft.util.Scratch.dir("graft_cdcfold_mir_")
    val cfg = BlockWriter.Config("grp", "id", maxRecordsPerFile = 8)
    val base = (1L to 8L).map(i => (i, i % 2, i * 1.0)).toDF("id", "grp", "v")
    LakeTable.commit(s, up, base, cfg, Seq("id"))
    // snap2: ATOMIC merge-with-deletes (upsert 2, delete 5 and 6 in
    // the same upstream commit — the extraDeleteKeys shape)
    LakeTable.merge(s, up, "id", Seq((2L, 0L, 200.0)).toDF("id", "grp", "v"),
      cfg, Seq("id"), extraDeleteKeys = Some(Seq(5L, 6L).toDF("id")))
    // snap3: RE-INSERT key 5 (arms the crash-replay divergence hazard)
    LakeTable.merge(s, up, "id", Seq((5L, 1L, 555.0)).toDF("id", "grp", "v"),
      cfg, Seq("id"))
    val batch = LakeTable.changelogRead(s, up, 0, 3)
    val n = CdcApply.applyBatch(s, mir, batch, "id", cfg, Seq("id"))
    assert(n === 3, "ONE commit per upstream snapshot — the mixed " +
      s"snapshot must not split into delete+merge (got $n)")
    assert(LakeTable.currentSnapshot(mir) === 3)
    def mirrors(m0: String): Unit = {
      val a = LakeTable.read(s, up)
      val m = LakeTable.read(s, m0).select(a.columns.map(col).toIndexedSeq: _*)
      assert(a.exceptAll(m).count() === 0L && m.exceptAll(a).count() === 0L)
    }
    mirrors(mir)
    // full-batch crash-replay: a naive replayer would see no
    // cdc:2:delete mark, re-issue the eq-delete of key 5 at head, and
    // kill the row snap3 re-inserted. The folded format treats the
    // upsert mark as covering BOTH halves: replay is a pure no-op.
    assert(CdcApply.applyBatch(s, mir, batch, "id", cfg, Seq("id")) === 0)
    assert(LakeTable.currentSnapshot(mir) === 3)
    mirrors(mir)
    // LEGACY interop: a mirror that crashed between the old flow's
    // delete commit and merge commit (delete mark present, upsert
    // absent) completes with the INSERT half only — the delete half
    // never rides twice
    val mir2 = graft.util.Scratch.dir("graft_cdcfold_mir2_")
    CdcApply.applyBatch(s, mir2, LakeTable.changelogRead(s, up, 0, 1),
      "id", cfg, Seq("id")): Unit
    LakeTable.deleteWhere(s, mir2, "id", Seq(5L, 6L).toDF("id"),
      note = "cdc:2:delete") // the legacy first half, hand-stamped
    assert(CdcApply.applyBatch(s, mir2, LakeTable.changelogRead(s, up, 1, 2),
      "id", cfg, Seq("id")) === 1)
    assert(CdcApply.applyBatch(s, mir2, LakeTable.changelogRead(s, up, 2, 3),
      "id", cfg, Seq("id")) === 1)
    mirrors(mir2)
  }

  test("CdcApply coalesce: a batch's N snapshots fold into ONE range-note commit, latest-wins; replay no-ops; mixed 1:1 history falls back") {
    val s = spark
    import s.implicits._
    import graft.streaming.CdcApply
    val up = graft.util.Scratch.dir("graft_cdcco_up_")
    val mir = graft.util.Scratch.dir("graft_cdcco_mir_")
    val cfg = BlockWriter.Config("grp", "id", maxRecordsPerFile = 8)
    val base = (1L to 8L).map(i => (i, i % 2, i * 1.0)).toDF("id", "grp", "v")
    // snap1 append; snap2 upsert 2 + delete 5,6; snap3 re-insert 5,
    // delete 7 — latest-wins final state: 5 lives (snap3's row),
    // 6 and 7 are gone, 2 carries snap2's value
    LakeTable.commit(s, up, base, cfg, Seq("id"))
    LakeTable.merge(s, up, "id", Seq((2L, 0L, 200.0)).toDF("id", "grp", "v"),
      cfg, Seq("id"), extraDeleteKeys = Some(Seq(5L, 6L).toDF("id")))
    LakeTable.merge(s, up, "id", Seq((5L, 1L, 555.0)).toDF("id", "grp", "v"),
      cfg, Seq("id"), extraDeleteKeys = Some(Seq(7L).toDF("id")))
    val batch = LakeTable.changelogRead(s, up, 0, 3)
    val n = CdcApply.applyBatch(s, mir, batch, "id", cfg, Seq("id"),
      coalesce = true)
    assert(n === 1, s"three upstream snapshots must fold into ONE commit, got $n")
    assert(LakeTable.currentSnapshot(mir) === 1)
    assert(LakeTable.manifest(mir, 1).note === "cdc:1-3:range")
    def mirrors(m0: String): Unit = {
      val a = LakeTable.read(s, up)
      val m = LakeTable.read(s, m0).select(a.columns.map(col).toIndexedSeq: _*)
      assert(a.exceptAll(m).count() === 0L && m.exceptAll(a).count() === 0L)
    }
    mirrors(mir)
    // crash-replay of the folded batch: the range note no-ops it
    assert(CdcApply.applyBatch(s, mir, batch, "id", cfg, Seq("id"),
      coalesce = true) === 0)
    assert(LakeTable.currentSnapshot(mir) === 1)
    mirrors(mir)
    // a LATER batch keeps folding; mirror stays exact
    LakeTable.merge(s, up, "id", Seq((1L, 1L, 111.0)).toDF("id", "grp", "v"),
      cfg, Seq("id"), extraDeleteKeys = Some(Seq(8L).toDF("id")))
    LakeTable.merge(s, up, "id", Seq((8L, 0L, 888.0)).toDF("id", "grp", "v"),
      cfg, Seq("id"))
    assert(CdcApply.applyBatch(s, mir, LakeTable.changelogRead(s, up, 3, 5),
      "id", cfg, Seq("id"), coalesce = true) === 1)
    mirrors(mir)
    // skip validation accepts range coverage: a replayed PREFIX of a
    // folded range is a clean no-op, never an out-of-order error
    assert(CdcApply.applyBatch(s, mir,
      batch.filter($"_change_snap" <= 2), "id", cfg, Seq("id"),
      coalesce = true) === 0)
    // snapshots BELOW the watermark never enter a fold: a 1:1 history
    // followed by a coalesced apply folds only the un-applied tail
    val mir2 = graft.util.Scratch.dir("graft_cdcco_mir2_")
    assert(CdcApply.applyBatch(s, mir2, LakeTable.changelogRead(s, up, 0, 1),
      "id", cfg, Seq("id")) === 1) // 1:1 mark for snap 1
    assert(CdcApply.applyBatch(s, mir2, LakeTable.changelogRead(s, up, 0, 3),
      "id", cfg, Seq("id"), coalesce = true) === 1,
      "the coalesced apply folds exactly the tail above the watermark")
    assert(LakeTable.manifest(mir2, LakeTable.currentSnapshot(mir2)).note
      === "cdc:2-3:range")
    val m2 = LakeTable.read(s, mir2)
      .select(Seq("id", "grp", "v").map(col): _*)
    val upAt3 = LakeTable.read(s, up, Some(3))
      .select(Seq("id", "grp", "v").map(col): _*)
    assert(upAt3.exceptAll(m2).count() === 0L && m2.exceptAll(upAt3).count() === 0L)
    // MODE-FLIP GUARD: an individual mark ABOVE the watermark (a 1:1
    // apply that crashed before its watermark write) must not re-fold
    // — the coalesced apply falls back to the per-snapshot path and
    // completes only what's missing
    val mir3 = graft.util.Scratch.dir("graft_cdcco_mir3_")
    assert(CdcApply.applyBatch(s, mir3, LakeTable.changelogRead(s, up, 0, 1),
      "id", cfg, Seq("id")) === 1)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(mir3, "meta", "_cdc_watermark.json"))
    assert(CdcApply.applyBatch(s, mir3, LakeTable.changelogRead(s, up, 0, 3),
      "id", cfg, Seq("id"), coalesce = true) === 2,
      "a marked snapshot inside the range forces the per-snapshot path")
    val m3 = LakeTable.read(s, mir3)
      .select(Seq("id", "grp", "v").map(col): _*)
    assert(upAt3.exceptAll(m3).count() === 0L && m3.exceptAll(upAt3).count() === 0L)
    // CRASH WINDOW between the range commit and the watermark write:
    // the replay's `seen` tail carries the batch's OWN range note, and
    // the mode-flip fallback (individual marks only) must keep the
    // batch coalesced so the rangeMark guard no-ops it — NOT drop to
    // the per-snapshot path and re-apply each snapshot (transiently
    // regressing keys to earlier-snapshot values)
    val mir4 = graft.util.Scratch.dir("graft_cdcco_mir4_")
    assert(CdcApply.applyBatch(s, mir4, batch, "id", cfg, Seq("id"),
      coalesce = true) === 1)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(mir4, "meta", "_cdc_watermark.json"))
    assert(CdcApply.applyBatch(s, mir4, batch, "id", cfg, Seq("id"),
      coalesce = true) === 0,
      "a replay after losing the watermark must no-op on its range note")
    assert(LakeTable.currentSnapshot(mir4) === 1)
    val m4 = LakeTable.read(s, mir4)
      .select(Seq("id", "grp", "v").map(col): _*)
    assert(upAt3.exceptAll(m4).count() === 0L && m4.exceptAll(upAt3).count() === 0L)
    // same window, replayed with coalesce OFF (a mode flip mid-crash):
    // the 1:1 path must skip every range-covered snapshot too
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(mir4, "meta", "_cdc_watermark.json")): Unit
    assert(CdcApply.applyBatch(s, mir4, batch, "id", cfg, Seq("id")) === 0,
      "the 1:1 path must treat range coverage as applied")
    assert(LakeTable.currentSnapshot(mir4) === 1)
  }

  test("CdcApply replay ledger is O(batch): manifest reads per applied batch don't grow with mirror history") {
    val s = spark
    import s.implicits._
    import graft.streaming.CdcApply
    val up = graft.util.Scratch.dir("graft_cdcwm_up_")
    val mir = graft.util.Scratch.dir("graft_cdcwm_mir_")
    val cfg = BlockWriter.Config("grp", "id", maxRecordsPerFile = 16)
    LakeTable.commit(s, up,
      (1L to 16L).map(i => (i, i % 4, i * 1.0)).toDF("id", "grp", "v"),
      cfg, Seq("id"))
    CdcApply.applyBatch(s, mir, LakeTable.changelogRead(s, up, 0, 1),
      "id", cfg, Seq("id"))
    // grow upstream one merge per batch; measure the manifest-IO of a
    // single-snapshot batch EARLY (short mirror history) vs LATE
    // (history ~3x longer): with the applied-snapshot watermark the
    // replay ledger never re-walks mirror history, so the two deltas
    // match — before the watermark this scan was O(mirror commits)
    def oneBatch(i: Int): Long = {
      LakeTable.merge(s, up,
        "id", Seq((i * 2L % 16 + 1, (i * 2L % 16 + 1) % 4, i * 100.0))
          .toDF("id", "grp", "v"), cfg, Seq("id"))
      val h = LakeTable.currentSnapshot(up)
      val batch = LakeTable.changelogRead(s, up, h - 1, h)
      val before = LakeTable.manifestReadCount
      assert(CdcApply.applyBatch(s, mir, batch, "id", cfg, Seq("id")) === 1)
      LakeTable.manifestReadCount - before
    }
    val early = oneBatch(1)
    (2 to 8).foreach(i => { oneBatch(i): Unit })
    val late = oneBatch(9)
    // allow a tiny constant wobble (casLoop retry) — what MUST NOT
    // appear is the +8 a history-proportional ledger walk would add
    assert(late <= early + 2,
      s"replay-ledger manifest IO grew with mirror history: early=$early late=$late")
    // replay of an already-applied batch: the watermark filters every
    // snapshot out, and the skip VALIDATION clears each skipped
    // snapshot from the (prev_head, head] mark tail — O(last batch)
    // manifest reads (here: the one merge commit), never a ledger walk
    val h = LakeTable.currentSnapshot(up)
    val replay = LakeTable.changelogRead(s, up, h - 1, h)
    val before = LakeTable.manifestReadCount
    assert(CdcApply.applyBatch(s, mir, replay, "id", cfg, Seq("id")) === 0)
    assert(LakeTable.manifestReadCount - before <= 2L,
      "replayed batch must validate from the watermark's mark tail, " +
        s"not re-walk the mirror ledger (${LakeTable.manifestReadCount - before} reads)")
    // and the mirror still mirrors
    val a = LakeTable.read(s, up)
    val m = LakeTable.read(s, mir).select(a.columns.map(col).toIndexedSeq: _*)
    assert(a.exceptAll(m).count() === 0L && m.exceptAll(a).count() === 0L)
  }

  test("CdcApply rejects out-of-order delivery: a skipped snapshot with no cdc mark fails pointedly") {
    val s = spark
    import s.implicits._
    import graft.streaming.CdcApply
    val up = graft.util.Scratch.dir("graft_cdcooo_up_")
    val mir = graft.util.Scratch.dir("graft_cdcooo_mir_")
    val cfg = BlockWriter.Config("grp", "id", maxRecordsPerFile = 8)
    LakeTable.commit(s, up,
      (1L to 8L).map(i => (i, i % 2, i * 1.0)).toDF("id", "grp", "v"),
      cfg, Seq("id"))
    LakeTable.merge(s, up, "id", Seq((2L, 0L, 200.0)).toDF("id", "grp", "v"),
      cfg, Seq("id"))
    LakeTable.merge(s, up, "id", Seq((3L, 1L, 300.0)).toDF("id", "grp", "v"),
      cfg, Seq("id"))
    // consumer applies snapshots {1, 3} but never 2 (a mis-seeded
    // range), advancing the watermark past 2 without a cdc:2 mark
    CdcApply.applyBatch(s, mir, LakeTable.changelogRead(s, up, 0, 1),
      "id", cfg, Seq("id"))
    CdcApply.applyBatch(s, mir, LakeTable.changelogRead(s, up, 2, 3),
      "id", cfg, Seq("id"))
    // snapshot 2 arrives late: the old note-ledger would have applied
    // it, the bare watermark filter would silently DROP it — the
    // validated skip fails pointedly instead, naming the snapshot
    val e = intercept[IllegalArgumentException] {
      CdcApply.applyBatch(s, mir, LakeTable.changelogRead(s, up, 1, 2),
        "id", cfg, Seq("id"))
    }
    assert(e.getMessage.contains("snapshot(s) 2") &&
      e.getMessage.contains("watermark"))
    // a genuinely applied old snapshot redelivered is still a clean
    // no-op (mark found below the watermark via the cached note set)
    assert(CdcApply.applyBatch(s, mir, LakeTable.changelogRead(s, up, 0, 1),
      "id", cfg, Seq("id")) === 0)
  }

  test("CdcApply mid-stream seeding: a zero-commit delete-only snapshot replays cleanly via the watermark's empty list") {
    val s = spark
    import s.implicits._
    import graft.streaming.CdcApply
    val up = graft.util.Scratch.dir("graft_cdcmid_up_")
    val mir = graft.util.Scratch.dir("graft_cdcmid_mir_")
    val cfg = BlockWriter.Config("grp", "id", maxRecordsPerFile = 8)
    LakeTable.commit(s, up,
      (1L to 8L).map(i => (i, i % 2, i * 1.0)).toDF("id", "grp", "v"),
      cfg, Seq("id"))
    LakeTable.deleteWhere(s, up, "id", Seq(2L, 4L).toDF("id"))
    LakeTable.merge(s, up, "id", Seq((5L, 1L, 500.0)).toDF("id", "grp", "v"),
      cfg, Seq("id"))
    // consumer seeded MID-STREAM at snapshot 1: its first batch is
    // the delete-only snapshot 2 landing on an EMPTY mirror — applied
    // correctly as zero commits, no cdc mark anywhere to find
    val b2 = LakeTable.changelogRead(s, up, 1, 2)
    assert(CdcApply.applyBatch(s, mir, b2, "id", cfg, Seq("id")) === 0)
    // crash-replay of that batch must NOT brick: the watermark's
    // empty list clears the mark-less applied snapshot
    assert(CdcApply.applyBatch(s, mir, b2, "id", cfg, Seq("id")) === 0)
    // and the stream continues normally
    assert(CdcApply.applyBatch(s, mir,
      LakeTable.changelogRead(s, up, 2, 3), "id", cfg, Seq("id")) === 1)
    assert(LakeTable.read(s, mir).count() === 1L)
  }

  test("CdcApply legacy watermark (pre-empty-list format): a crash-replayed pre-upgrade batch is exempt, then validation is strict again") {
    val s = spark
    import s.implicits._
    import graft.streaming.CdcApply
    val up = graft.util.Scratch.dir("graft_cdcleg_up_")
    val mir = graft.util.Scratch.dir("graft_cdcleg_mir_")
    val cfg = BlockWriter.Config("grp", "id", maxRecordsPerFile = 8)
    LakeTable.commit(s, up,
      (1L to 8L).map(i => (i, i % 2, i * 1.0)).toDF("id", "grp", "v"),
      cfg, Seq("id"))
    LakeTable.deleteWhere(s, up, "id", Seq(2L, 4L).toDF("id"))
    LakeTable.merge(s, up, "id", Seq((5L, 1L, 500.0)).toDF("id", "grp", "v"),
      cfg, Seq("id"))
    // seed mid-stream: delete-only snapshot 2 onto an EMPTY mirror
    val b2 = LakeTable.changelogRead(s, up, 1, 2)
    assert(CdcApply.applyBatch(s, mir, b2, "id", cfg, Seq("id")) === 0)
    // simulate a PRE-UPGRADE watermark: same snap/head, but neither
    // the `empty` list nor `prev_head` exist in the legacy format —
    // the applied zero-commit snapshot left no trace anywhere
    val wmPath = java.nio.file.Paths.get(mir, "meta", "_cdc_watermark.json")
    val body = new String(java.nio.file.Files.readAllBytes(wmPath), "UTF-8")
    val snap = """"snap"\s*:\s*(\d+)""".r.findFirstMatchIn(body).get.group(1)
    val head = """"mirror_head"\s*:\s*(\d+)""".r.findFirstMatchIn(body).get.group(1)
    java.nio.file.Files.write(wmPath,
      s"""{"snap":$snap,"mirror_head":$head}""".getBytes("UTF-8"))
    // crash-replay of the pre-upgrade batch must NOT brick (no mark,
    // no empty list — the legacy exemption adopts it) …
    assert(CdcApply.applyBatch(s, mir, b2, "id", cfg, Seq("id")) === 0)
    // … and the adoption is DURABLE: the rewritten watermark is
    // new-format with snapshot 2 in the empty ledger, so a second
    // replay passes the now-strict validation from the ledger itself
    assert(new String(java.nio.file.Files.readAllBytes(wmPath), "UTF-8")
      .contains("\"empty\":[2]"))
    assert(CdcApply.applyBatch(s, mir, b2, "id", cfg, Seq("id")) === 0)
    // strict validation resumes for everything not adopted
    assert(CdcApply.applyBatch(s, mir,
      LakeTable.changelogRead(s, up, 2, 3), "id", cfg, Seq("id")) === 1)
    val e = intercept[IllegalArgumentException] {
      // snapshot 1 was never applied to this mirror (seeded at 1) —
      // replaying it below the watermark must still be rejected
      CdcApply.applyBatch(s, mir,
        LakeTable.changelogRead(s, up, 0, 1), "id", cfg, Seq("id"))
    }
    assert(e.getMessage.contains("watermark"), e.getMessage)
  }

  test("changeFeed past retention fails pointedly, naming the expired snapshots") {
    val s = spark
    import s.implicits._
    val root = graft.util.Scratch.dir("graft_cdfexp_")
    val sink = graft.util.Scratch.dir("graft_cdfexp_sink_")
    val ckpt = graft.util.Scratch.dir("graft_cdfexp_ck_")
    val cfg = BlockWriter.Config("grp", "id", maxRecordsPerFile = 8)
    val base = (1L to 30L).map(i => (i, i % 3, s"k$i")).toDF("id", "grp", "name")
    LakeTable.commit(s, root, base.filter($"id" <= 10), cfg, Seq("id"))
    drain(root, sink, ckpt) // checkpoint now at snapshot 1
    LakeTable.commit(s, root, base.filter($"id" > 10 && $"id" <= 20), cfg, Seq("id"))
    LakeTable.commit(s, root, base.filter($"id" > 20), cfg, Seq("id"))
    // retention removes manifest 1 — INSIDE the checkpointed range
    // (1, 3] the next drain will ask for (snapshot 2's attribution
    // needs its pre-image, snapshot 1)
    LakeTable.expire(root, 2) // returns reclaimed DATA files (0 here:
    // snap-1's files are still live downstream); the MANIFEST is gone
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "meta", "manifest-1.json")))
    val e = intercept[Exception] { drain(root, sink, ckpt) }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("expired by retention"),
      s"wanted a pointed retention error, got: $msgs")
    assert(msgs.contains("snapshot(s) 1 "),
      s"error must name the missing snapshot, got: $msgs")
    // the direct API fails the same way (not a NoSuchFileException)
    val e2 = intercept[IllegalStateException] {
      LakeTable.changelogRead(s, root, 1, 3)
    }
    assert(e2.getMessage.contains("snapshot(s) 1 ") &&
      e2.getMessage.contains("retention"))
    // a range fully inside retention still serves
    assert(LakeTable.changelogRead(s, root, 2, 3)
      .filter($"_change_snap" === 3).count() === 10L)
  }
}
