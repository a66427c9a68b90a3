package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lake.LakeTable
import graft.writer.BlockWriter

/** Scratch profiler for the stream_cdc_apply fixture — per-stage
  * wall-clock so fixed-cost creep is attributable to a stage instead
  * of guessed at. Not part of the driver contract; run with
  * `runMain graft.ProfileCdc <sfDir>`.
  */
object ProfileCdc {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("32")
    def tmp(p: String) =
      graft.util.Scratch.dir(p)
    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val s = spark
    val up = tmp("prof_cdca_up_")
    val mir = tmp("prof_cdca_mir_")
    val ck = tmp("prof_cdca_ck_")
    val ev = s.read.parquet(s"$dir/events.parquet").filter(col("user_id") % 2 === 0)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"), col("value"))
    val cfg = BlockWriter.Config("user_id", "ts", maxRecordsPerFile = 4096)
    def drain(tag: String): Unit = timed(s"drain $tag") {
      val q = s.readStream.format("graft-lake")
        .option("changeFeed", "true").load(up)
        .writeStream
        .foreachBatch((batch: DataFrame, _: Long) => {
          graft.streaming.CdcApply.applyBatch(s, mir, batch, "event_id",
            cfg, Seq("event_id")); ()
        })
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    timed("commit evens")(LakeTable.commit(s, up,
      ev.filter(col("event_id") % 2 === 0), cfg, Seq("event_id")))
    drain("1 (snap1)")
    timed("up merge+delClicks")(LakeTable.merge(s, up, "event_id",
      ev.filter(col("event_id") % 2 === 0 && col("event_id") % 10 === 0)
        .withColumn("value", col("value") + 1000.0),
      cfg, Seq("event_id"),
      extraDeleteKeys = Some(LakeTable.read(s, up)
        .filter(col("event_type") === "click").select(col("event_id")))))
    timed("up merge+delViews")(LakeTable.merge(s, up, "event_id",
      ev.filter(col("event_id") % 2 === 1 && col("event_id") % 10 === 1)
        .withColumn("value", col("value") + 2000.0),
      cfg, Seq("event_id"),
      extraDeleteKeys = Some(LakeTable.read(s, up)
        .filter(col("event_type") === "view").select(col("event_id")))))
    if (sys.env.get("PROF_SPLIT").isEmpty) drain("2 (snaps 2-3)")
    else {
      // split the drain into its two halves: changelog materialize
      // vs the apply loop (persist + per-snapshot filter/commit)
      val batch = timed("changelogRead plan")(
        LakeTable.changelogRead(s, up, 1, 3))
      timed("changelog count")(println("rows=" + batch.count()))
      if (sys.env.get("PROF_INLINE").isEmpty)
        timed("applyBatch")(graft.streaming.CdcApply.applyBatch(
          s, mir, batch, "event_id", cfg, Seq("event_id")))
      else {
        // replica of the LEGACY (pre-r16) applyBatch loop with
        // per-stage timers: per-snapshot exceptAll/isEmpty probes —
        // kept as the attribution baseline the O(1)-jobs rewrite was
        // measured against
        val b = timed("persist")(batch.persist())
        val snaps = timed("snaps collect")(
          b.select(col("_change_snap")).distinct()
            .collect().map(_.getInt(0)).sorted)
        snaps.foreach { sn =>
          val cur = b.filter(col("_change_snap") === sn)
          val ins = timed(s"snap$sn ins frame")(
            cur.filter(col("_change_type") === "insert")
              .drop("_change_type", "_change_snap"))
          val delOnly = cur.filter(col("_change_type") === "delete")
            .select(col("event_id"))
            .exceptAll(ins.select(col("event_id"))).distinct()
          val insEmpty = timed(s"snap$sn ins.isEmpty")(ins.isEmpty)
          val delEmpty = timed(s"snap$sn delOnly.isEmpty")(delOnly.isEmpty)
          if (!insEmpty) {
            val aligned = timed(s"snap$sn align")(
              ins.to(LakeTable.read(s, mir).schema))
            timed(s"snap$sn merge")(
              LakeTable.merge(s, mir, "event_id", aligned, cfg,
                Seq("event_id"), note = s"cdc:$sn:upsert",
                extraDeleteKeys = if (!delEmpty) Some(delOnly) else None))
          } else if (!delEmpty)
            timed(s"snap$sn deleteWhere")(
              LakeTable.deleteWhere(s, mir, "event_id", delOnly,
                note = s"cdc:$sn:delete"))
        }
        b.unpersist(); ()
      }
    }
    timed("exceptAll compare") {
      val upF = LakeTable.read(s, up)
      val mirF = LakeTable.read(s, mir).select(upF.columns.map(col).toIndexedSeq: _*)
      println("diff=" + (upF.exceptAll(mirF).count() + mirF.exceptAll(upF).count()))
    }
    spark.stop()
  }
}
