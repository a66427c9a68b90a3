package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import scala.collection.mutable

/** Generic per-query profiler for optimization work (test scope, not
  * part of the driver contract). Runs a registered query under the
  * bench's own session shape with a listener that attributes wall
  * time to Spark jobs vs driver-side gaps:
  *
  *   sbt "Test/runMain graft.tools.ProfileQuery q_sql_mv_distinct2 [sfDir]"
  *
  * Prints total wall, job count, summed job time, the driver gap
  * (total - union of job intervals), and the top jobs by duration
  * with their call sites — the first measurement §1 of the
  * optimization guide asks for before touching anything.
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q_sql_mv_distinct2").split(",").toSeq
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.local(cpus)
    // bench-equivalent warmup so JIT/session setup is not attributed
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.sources.Tables.load(spark, dir, "region").count()

    case class Job(id: Int, start: Long, var end: Long, desc: String,
        var stages: Int)
    val jobs = mutable.LinkedHashMap[Int, Job]()
    // SQL-execution callsites (execId -> "count at Foo.scala:12") so
    // jobs attribute to the ACTION that ran them, not "?"
    val execDesc = mutable.HashMap[Long, String]()
    val sqlListener = new SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            execDesc.synchronized { execDesc(s.executionId) = s.description }
          case _ =>
        }
    }
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
          .flatMap(id => execDesc.synchronized {
            execDesc.get(id.toLong) })
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        jobs(e.jobId) = Job(e.jobId, e.time, -1L, d, e.stageIds.size)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
    }
    spark.sparkContext.addSparkListener(sqlListener)

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      val wallMs = (System.nanoTime() - t0) / 1e6
      Thread.sleep(500) // let listener events drain (bus is private API)
      spark.sparkContext.removeSparkListener(listener)

      val done = jobs.values.filter(_.end > 0).toSeq
      val jobSum = done.map(j => j.end - j.start).sum
      // union of job intervals: gap = wall not covered by ANY job
      val ivs = done.map(j => (j.start, j.end)).sortBy(_._1)
      var covered = 0L; var curS = -1L; var curE = -1L
      ivs.foreach { case (s, e) =>
        if (s > curE) { if (curE > 0) covered += curE - curS; curS = s; curE = e }
        else if (e > curE) curE = e
      }
      if (curE > 0) covered += curE - curS
      println(f"[profile] $name: wall=${wallMs / 1000}%.2fs jobs=${done.size} " +
        f"jobTimeSum=${jobSum / 1000.0}%.2fs jobUnion=${covered / 1000.0}%.2fs " +
        f"driverGap=${(wallMs - covered) / 1000.0}%.2fs")
      val byDesc = done.groupBy(_.desc).map { case (d, js) =>
        (d, js.size, js.map(j => j.end - j.start).sum)
      }.toSeq.sortBy(-_._3)
      byDesc.take(25).foreach { case (d, n, ms) =>
        println(f"[profile]   ${ms / 1000.0}%7.2fs  n=$n%-4d $d")
      }
      graft.util.QueryScratch.release(spark)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
