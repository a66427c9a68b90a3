package graft.tools

/** Capture `.explain("formatted")` of registered queries' returned
  * frames (test scope; evidence for plans/r18). The fixture side of a
  * gate executes inside the query fn — what's captured is the final
  * returned plan, the part the driver's count() re-executes.
  *
  *   sbt "Test/runMain graft.tools.ExplainQuery <name>[,name...] <outDir> [sfDir] [suffix]"
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q1_pricing").split(",").toSeq
    val outDir = args.drop(1).headOption.getOrElse("/tmp/plans")
    val dir = args.drop(2).headOption.getOrElse("/root/testdata/sf0.1")
    val suffix = args.drop(3).headOption.getOrElse("after")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"[explain] wrote $outDir/${name}_$suffix.txt (${plan.length} chars)")
      graft.util.QueryScratch.release(spark)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
