package graft

import org.apache.spark.sql.functions._

/** Scratch per-statement profiler for the q_sql_mv_minmax fixture —
  * attributes the key's wall-clock to DDL/DML/refresh/read stages.
  * Not part of the driver contract; `runMain graft.ProfileMvMinmax`.
  */
object ProfileMvMinmax {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = GraftSession.local("32")
    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[profile] $name%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      s.conf.set("spark.sql.catalog.graft",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.graft.root",
        graft.util.Scratch.root.resolve("sqlcat").toString)
      val id = System.nanoTime()
      val fact = s"graft.q.mmf_$id"; val mv = s"graft.q.mmv_$id"
      s.read.parquet(s"$dir/events.parquet")
        .select(col("event_id"), col("event_type"), col("value"))
        .createOrReplaceTempView("ev_sqlmm")
      timed("create fact")(s.sql(
        s"CREATE TABLE $fact (event_id BIGINT, event_type STRING, vx100 BIGINT)"))
      def ins(pred: String) =
        s.sql(s"""INSERT INTO $fact
                 |SELECT event_id, event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                 |FROM ev_sqlmm WHERE $pred""".stripMargin)
      timed("insert 1")(ins("event_id % 3 = 0"))
      timed("create MV")(s.sql(
        s"""CREATE MATERIALIZED VIEW $mv AS
           |SELECT event_type, COUNT(*) AS n,
           |  MIN(vx100) AS min_vx100, MAX(vx100) AS max_vx100
           |FROM $fact GROUP BY event_type""".stripMargin))
      timed("insert 2")(ins("event_id % 3 = 1"))
      timed("refresh (fold)")(s.sql(
        s"CALL graft.system.refresh_mv(table => 'q.mmv_$id')").collect())
      timed("DELETE")(s.sql(s"DELETE FROM $fact WHERE event_id % 5 = 0"))
      timed("refresh (targeted)")(s.sql(
        s"CALL graft.system.refresh_mv(table => 'q.mmv_$id')").collect())
      timed("3-way read")(s.sql(
        s"""SELECT CAST(1 AS BIGINT) AS stage, event_type, n, min_vx100, max_vx100
           |FROM $mv VERSION AS OF 1
           |UNION ALL
           |SELECT CAST(2 AS BIGINT), event_type, n, min_vx100, max_vx100
           |FROM $mv VERSION AS OF 2
           |UNION ALL
           |SELECT CAST(3 AS BIGINT), event_type, n, min_vx100, max_vx100
           |FROM $mv VERSION AS OF 3
           |ORDER BY stage, event_type""".stripMargin).collect())
    }
    s.stop()
  }
}
