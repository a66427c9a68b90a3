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
}
