package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.LakeTable
import graft.writer.BlockWriter

/** SQL row-level operations on lake tables: coordinate metadata
  * columns, UPDATE, MERGE INTO, and arbitrary-predicate DELETE via
  * the DSv2 position-delta path (`SupportsRowLevelOperations` +
  * `SupportsDelta`) — every mutation is ONE atomic merge-on-read
  * commit (new data files + a positional-delete file), never a
  * data-file rewrite.
  */
class RowLevelSpec extends AnyFunSuite {

  import TestSpark.spark

  private lazy val cfg = BlockWriter.Config("user_id", "event_id", 4096)

  private def events = {
    val s = spark
    import s.implicits._
    (0 until 2000).map(i =>
      (i.toLong, (i % 7).toLong, s"t${i % 5}", i * 1.5, (i % 97).toLong))
      .toDF("event_id", "user_id", "event_type", "value", "day")
  }

  test("metadata columns: _graft_file_path/_graft_row_idx through the format read") {
    val root = graft.util.Scratch.dir("graft_rl_meta_")
    LakeTable.commit(spark, root, events, cfg, Seq("event_id", "user_id"))
    val df = spark.read.format("graft-lake").load(root)
      .select(col("event_id"), col(LakeTable.CoordPath), col(LakeTable.CoordIdx))
    assert(df.count() === 2000)
    // coordinates address distinct rows and agree with withRowCoords
    assert(df.select(col(LakeTable.CoordPath), col(LakeTable.CoordIdx))
      .distinct().count() === 2000)
    val viaScala = LakeTable.withRowCoords(spark, root)
      .select(col("event_id"), col(LakeTable.CoordPath), col(LakeTable.CoordIdx))
    assert(df.exceptAll(viaScala).isEmpty && viaScala.exceptAll(df).isEmpty)
  }

  private def catalogTable(prefix: String): (String, String) = {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.root",
      graft.util.Scratch.root.resolve("sqlcat").toString)
    events.createOrReplaceTempView(s"${prefix}_src")
    val t = s"graft.db.${prefix}_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $t AS SELECT * FROM ${prefix}_src")
    (t, s"${prefix}_src")
  }

  test("SQL UPDATE runs as one atomic position-delta commit") {
    val (t, _) = catalogTable("rl_upd")
    val filesBefore = spark.sql(s"SELECT path FROM $t.files")
      .collect().map(_.getString(0)).toSet
    val histBefore = spark.sql(s"SELECT count(*) FROM $t.history").head.getLong(0)

    spark.sql(s"UPDATE $t SET value = value * 2, event_type = 'boosted' " +
      "WHERE user_id = 3 AND day % 2 = 1")

    val expect = events
      .withColumn("value", when(col("user_id") === 3 && col("day") % 2 === 1,
        col("value") * 2).otherwise(col("value")))
      .withColumn("event_type", when(col("user_id") === 3 && col("day") % 2 === 1,
        lit("boosted")).otherwise(col("event_type")))
    val got = spark.table(t)
    assert(got.count() === 2000)
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)

    // merge-on-read shape: pre-update files untouched, ONE new commit
    val filesAfter = spark.sql(s"SELECT path FROM $t.files")
      .collect().map(_.getString(0)).toSet
    assert(filesBefore.subsetOf(filesAfter), "UPDATE must not rewrite data files")
    val histAfter = spark.sql(s"SELECT count(*) FROM $t.history").head.getLong(0)
    assert(histAfter === histBefore + 1, "UPDATE must be ONE atomic commit")
    spark.sql(s"DROP TABLE $t")
  }

  test("SQL MERGE INTO: matched update, not-matched insert, matched delete") {
    val (t, _) = catalogTable("rl_mrg")
    val s = spark
    import s.implicits._
    // source: updates for user 1, inserts beyond the key space,
    // deletes for event_type t4 of user 2
    val source = (0 until 2500).map(i =>
      (i.toLong, (i % 7).toLong, s"t${i % 5}", i * 10.0, (i % 97).toLong))
      .toDF("event_id", "user_id", "event_type", "value", "day")
    source.createOrReplaceTempView("rl_mrg_updates")

    spark.sql(s"""
      MERGE INTO $t AS tgt
      USING rl_mrg_updates AS src
      ON tgt.event_id = src.event_id
      WHEN MATCHED AND src.user_id = 2 AND src.event_type = 't4' THEN DELETE
      WHEN MATCHED AND src.user_id = 1 THEN UPDATE SET value = src.value
      WHEN NOT MATCHED THEN INSERT *
    """)

    val got = spark.table(t)
    val expect = events
      .filter(!(col("user_id") === 2 && col("event_type") === "t4"))
      .withColumn("value", when(col("user_id") === 1, col("event_id") * 10.0)
        .otherwise(col("value")))
      .unionAll(source.filter(col("event_id") >= 2000))
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
    spark.sql(s"DROP TABLE $t")
  }

  test("SQL DELETE with a non-translatable predicate takes the delta path") {
    val (t, _) = catalogTable("rl_del")
    // day % 3 is not a v1 Filter shape, so SupportsDelete refuses and
    // the row-level position-delta path must serve it
    spark.sql(s"DELETE FROM $t WHERE day % 3 = 2 AND event_type IN ('t1','t3')")
    val got = spark.table(t)
    val expect = events.filter(
      !(col("day") % 3 === 2 && col("event_type").isin("t1", "t3")))
    assert(got.count() === expect.count())
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
    spark.sql(s"DROP TABLE $t")
  }

  test("UPDATE matching no rows commits nothing") {
    val (t, _) = catalogTable("rl_noop")
    val histBefore = spark.sql(s"SELECT count(*) FROM $t.history").head.getLong(0)
    spark.sql(s"UPDATE $t SET value = 0 WHERE event_id = -1")
    val histAfter = spark.sql(s"SELECT count(*) FROM $t.history").head.getLong(0)
    assert(histAfter === histBefore, "no-match UPDATE must not add a snapshot")
    assert(spark.table(t).count() === 2000)
    spark.sql(s"DROP TABLE $t")
  }

  test("delta commit keeps snapshot isolation after UPDATE + foldDeletes") {
    val (t, _) = catalogTable("rl_fold")
    val root = spark.sql(s"SELECT path FROM $t.files").head.getString(0)
      .replaceFirst("^file:", "").replaceFirst("/data/c[^/]*/.*$", "")
    spark.sql(s"UPDATE $t SET value = -1 WHERE user_id = 5")
    val before = spark.table(t).orderBy("event_id").collect()
    // fold the delete debt back into data files; content must not move
    LakeTable.foldDeletes(spark, root, cfg, Seq("event_id", "user_id")): Unit
    val after = spark.table(t).orderBy("event_id").collect()
    assert(before.sameElements(after),
      "foldDeletes must preserve the delta-updated content")
    spark.sql(s"DROP TABLE $t")
  }

  test("ALTER TABLE ADD COLUMNS evolves metadata-only; old rows null-fill") {
    val (t, _) = catalogTable("rl_alter")
    val filesBefore = spark.sql(s"SELECT path FROM $t.files")
      .collect().map(_.getString(0)).toSet
    spark.sql(s"ALTER TABLE $t ADD COLUMNS (score DOUBLE, label STRING)")
    // metadata-only: same files, one more snapshot, old rows null
    val filesAfter = spark.sql(s"SELECT path FROM $t.files")
      .collect().map(_.getString(0)).toSet
    assert(filesAfter === filesBefore, "ADD COLUMNS must not touch data files")
    val got = spark.table(t)
    assert(got.columns.takeRight(2).toSeq === Seq("score", "label"))
    assert(got.filter(col("score").isNotNull || col("label").isNotNull).count() === 0)
    // new appends may now carry the added columns
    spark.sql(s"INSERT INTO $t VALUES (9999, 1, 'tX', 1.0, 3, 0.5, 'good')")
    assert(spark.table(t).filter(col("label") === "good").count() === 1)
    // retype still requires a rewrite and is rejected, not silently
    // mangled (rename/drop are now metadata-only — ColumnMappingSpec)
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $t ALTER COLUMN day TYPE STRING")
    }
    spark.sql(s"DROP TABLE $t")
  }

  test("storage-partitioned join: co-bucketed lake tables join with zero shuffles") {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.root",
      graft.util.Scratch.root.resolve("sqlcat").toString)
    val s = spark
    import s.implicits._
    val left = (0 until 4000).map(i => (i.toLong % 251, i.toLong, i * 1.5))
      .toDF("user_id", "event_id", "value")
    val right = (0 until 500).map(i => (i.toLong % 251, s"seg${i % 9}"))
      .toDF("user_id", "segment").distinct()
    left.createOrReplaceTempView("spj_left_src")
    right.createOrReplaceTempView("spj_right_src")
    val lt = s"graft.db.spjl_${System.nanoTime()}"
    val rt = s"graft.db.spjr_${System.nanoTime()}"
    // CTAS through the catalog: both writes bucket by the leading
    // column (user_id) with the session's shuffle parallelism
    spark.sql(s"CREATE TABLE $lt AS SELECT * FROM spj_left_src")
    spark.sql(s"CREATE TABLE $rt AS SELECT * FROM spj_right_src")

    val expected = spark.sql(
      """SELECT l.user_id, count(*) AS n, sum(l.value) AS sv
        |FROM spj_left_src l JOIN spj_right_src r ON l.user_id = r.user_id
        |GROUP BY l.user_id""".stripMargin).collect().sortBy(_.getLong(0))

    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val joined = spark.sql(
        s"""SELECT l.user_id, count(*) AS n, sum(l.value) AS sv
           |FROM $lt l JOIN $rt r ON l.user_id = r.user_id
           |GROUP BY l.user_id""".stripMargin)
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      // the join itself must be shuffle-free (the groupBy above it
      // reuses the same clustering only on single-key grouping; we
      // assert the JOIN sides specifically)
      val smj = joined.queryExecution.executedPlan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(smj.nonEmpty, "expected a sort-merge join:\n" +
        joined.queryExecution.executedPlan.toString)
      val shufflesUnderJoin = smj.head.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(shufflesUnderJoin.isEmpty,
        s"storage-partitioned join must not shuffle either side " +
          s"(found ${shuffles.size} shuffles in plan):\n" +
          joined.queryExecution.executedPlan.toString)
      val got = joined.collect().sortBy(_.getLong(0))
      assert(got.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ===
        expected.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq)
    }
    // negative control: with v2 bucketing off the same join shuffles
    // both sides — proving the zero-shuffle plan above came from the
    // reported storage partitioning, not an accident of the data
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val joined = spark.sql(
        s"SELECT count(*) FROM $lt l JOIN $rt r ON l.user_id = r.user_id")
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(shuffles.nonEmpty, "control: bucketing off must shuffle")
    }
    spark.sql(s"DROP TABLE $lt")
    spark.sql(s"DROP TABLE $rt")
  }

  test("PARTITIONED BY (bucket(n, col)) declares the layout: DDL drives SPJ, not column order") {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.root",
      graft.util.Scratch.root.resolve("sqlcat").toString)
    val s = spark
    import s.implicits._
    // bucket column is NOT the leading column on either side — only
    // the DDL can produce the co-bucketed layout here
    val left = (0 until 4000).map(i => (i.toLong, i.toLong % 97, i * 1.5))
      .toDF("event_id", "user_id", "value")
    val right = (0 until 300).map(i => (s"seg${i % 9}", i.toLong % 97))
      .toDF("segment", "user_id").distinct()
    left.createOrReplaceTempView("ddlb_left_src")
    right.createOrReplaceTempView("ddlb_right_src")
    val lt = s"graft.db.ddlbl_${System.nanoTime()}"
    val rt = s"graft.db.ddlbr_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $lt PARTITIONED BY (bucket(8, user_id)) AS SELECT * FROM ddlb_left_src")
    spark.sql(s"CREATE TABLE $rt PARTITIONED BY (bucket(8, user_id)) AS SELECT * FROM ddlb_right_src")
    // the manifest carries the declared spec and every file a bucket < 8
    val files = spark.sql(s"SELECT bucket FROM $lt.files").collect().map(_.getInt(0))
    assert(files.forall(b => b >= 0 && b < 8), s"buckets: ${files.toSeq.distinct}")
    // an INSERT without any options keeps the declared layout
    spark.sql(s"INSERT INTO $lt SELECT event_id + 100000, user_id, value FROM ddlb_left_src WHERE event_id < 50")
    val files2 = spark.sql(s"SELECT bucket FROM $lt.files").collect().map(_.getInt(0))
    assert(files2.forall(b => b >= 0 && b < 8), "insert must keep the declared bucket spec")
    val expected = spark.sql(
      s"""SELECT r.segment, count(*) AS n
         |FROM (SELECT * FROM ddlb_left_src UNION ALL
         |      SELECT event_id + 100000, user_id, value FROM ddlb_left_src WHERE event_id < 50) l
         |JOIN ddlb_right_src r ON l.user_id = r.user_id GROUP BY r.segment""".stripMargin)
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val joined = spark.sql(
        s"""SELECT r.segment, count(*) AS n
           |FROM $lt l JOIN $rt r ON l.user_id = r.user_id
           |GROUP BY r.segment""".stripMargin)
      val smj = joined.queryExecution.executedPlan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(smj.nonEmpty, "expected a sort-merge join:\n" +
        joined.queryExecution.executedPlan.toString)
      val shufflesUnderJoin = smj.head.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(shufflesUnderJoin.isEmpty,
        "DDL-bucketed tables must join shuffle-free:\n" +
          joined.queryExecution.executedPlan.toString)
      assert(joined.collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq ===
        expected.collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq)
    }
    spark.sql(s"DROP TABLE $lt"); spark.sql(s"DROP TABLE $rt")
  }

  test("bucket report also eliminates the aggregation shuffle, and survives MoR deletes") {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.root",
      graft.util.Scratch.root.resolve("sqlcat").toString)
    val s = spark
    import s.implicits._
    (0 until 4000).map(i => (i.toLong % 251, i.toLong, i * 1.5))
      .toDF("user_id", "event_id", "value")
      .createOrReplaceTempView("spjagg_src")
    val t = s"graft.db.spja_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $t AS SELECT * FROM spjagg_src")
    def shufflesOf(sql: String): Int =
      spark.sql(sql).queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.size
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.adaptive.enabled" -> "false") {
      // groupBy the bucket column: each key lives wholly in one
      // partition, so partial+final aggregate fuse with NO exchange
      assert(shufflesOf(s"SELECT user_id, sum(value) FROM $t GROUP BY user_id") === 0,
        "bucket-keyed aggregation must not shuffle")
      val expect = spark.sql(s"SELECT sum(value) FROM $t WHERE user_id <> 7")
        .head.getDouble(0)
      // an equality MoR delete only masks rows inside files — buckets
      // are untouched, so the shuffle-free plan must survive it
      spark.sql(s"DELETE FROM $t WHERE user_id = 7")
      assert(shufflesOf(s"SELECT user_id, sum(value) FROM $t GROUP BY user_id") === 0,
        "bucket-keyed aggregation must stay shuffle-free under MoR deletes")
      val got = spark.sql(s"SELECT sum(value) FROM $t").head.getDouble(0)
      assert(math.abs(got - expect) < 1e-6)
    }
    spark.sql(s"DROP TABLE $t")
  }

  test("writeStream.toTable lands one idempotent snapshot per epoch") {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.root",
      graft.util.Scratch.root.resolve("sqlcat").toString)
    val t = s"graft.db.stw_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $t (event_id BIGINT, user_id BIGINT, value DOUBLE)")
    val src = graft.util.Scratch.dir("graft_stw_src_")
    val ckpt = graft.util.Scratch.dir("graft_stw_ck_")
    events.select("event_id", "user_id", "value")
      .filter(col("event_id") < 1000).write.parquet(s"$src/b0")
    def drain(): Unit = {
      val q = spark.readStream
        .schema("event_id BIGINT, user_id BIGINT, value DOUBLE")
        .parquet(s"$src/*")
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable(t)
      q.awaitTermination()
    }
    drain()
    assert(spark.table(t).count() === 1000)
    // second batch: only the new files are committed (offset tracking
    // upstream, epoch-idempotent commit downstream)
    events.select("event_id", "user_id", "value")
      .filter(col("event_id") >= 1000).write.parquet(s"$src/b1")
    drain()
    assert(spark.table(t).count() === 2000)
    val hist = spark.sql(s"SELECT snap, note FROM $t.history ORDER BY snap").collect()
    assert(hist.forall(_.getString(1).startsWith("batch-")),
      "every streaming commit carries its epoch id")
    assert(spark.table(t).select(sum(col("value"))).head.getDouble(0) ===
      events.select(sum(col("value"))).head.getDouble(0))
    spark.sql(s"DROP TABLE $t")
  }

  test("readStream.table tails a catalog table: by-name lake-to-lake pipeline, exactly-once") {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.root",
      graft.util.Scratch.root.resolve("sqlcat").toString)
    val srcT = s"graft.db.srs_${System.nanoTime()}"
    val dstT = s"graft.db.srd_${System.nanoTime()}"
    events.createOrReplaceTempView("srs_src")
    spark.sql(s"CREATE TABLE $srcT AS SELECT event_id, user_id, value FROM srs_src WHERE event_id < 1000")
    spark.sql(s"CREATE TABLE $dstT (event_id BIGINT, user_id BIGINT, value DOUBLE)")
    val ckpt = graft.util.Scratch.dir("graft_srs_ck_")
    def drain(): Unit = {
      val q = spark.readStream.table(srcT)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable(dstT)
      q.awaitTermination()
    }
    drain()
    assert(spark.table(dstT).count() === 1000,
      "first drain delivers the CTAS snapshot")
    spark.sql(s"INSERT INTO $srcT SELECT event_id, user_id, value FROM srs_src WHERE event_id >= 1000")
    drain()
    val n = events.count()
    assert(spark.table(dstT).count() === n,
      "second drain delivers ONLY the inserted snapshot (no re-read, no loss)")
    assert(spark.table(dstT).select(col("event_id")).distinct().count() === n,
      "every row exactly once across drains")
    // no new commits → an extra drain moves nothing
    drain()
    assert(spark.table(dstT).count() === n)
    spark.sql(s"DROP TABLE $srcT"); spark.sql(s"DROP TABLE $dstT")
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("metadata columns respect merge-on-read deletes") {
    val root = graft.util.Scratch.dir("graft_rl_metadel_")
    LakeTable.commit(spark, root, events, cfg, Seq("event_id", "user_id"))
    val s = spark
    import s.implicits._
    LakeTable.deleteWhere(spark, root, "user_id", Seq(3L).toDF("user_id")): Unit
    val df = spark.read.format("graft-lake").load(root)
      .select(col("user_id"), col(LakeTable.CoordPath))
    assert(df.filter(col("user_id") === 3).count() === 0)
    assert(df.count() === events.filter(col("user_id") =!= 3).count())
  }

  test("MERGE WITH SCHEMA EVOLUTION auto-adds source-only columns") {
    val (t, src) = catalogTable("rl_mev")
    val schemaBefore = spark.table(t).schema.fieldNames.toSet
    assert(!schemaBefore.contains("origin"))
    // the evolution is metadata-only: the pre-merge data files are a
    // subset of the post-merge file set (delta write only ADDS files)
    val filesBefore = spark.sql(s"SELECT path FROM $t.files")
      .collect().map(_.getString(0)).toSet
    spark.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO $t AS tgt
      |USING (SELECT event_id + 1500 AS event_id, user_id, event_type,
      |         value, day, 'src' AS origin FROM $src
      |       WHERE event_id < 700) AS s
      |ON tgt.event_id = s.event_id
      |WHEN MATCHED THEN UPDATE SET value = s.value + 1, origin = s.origin
      |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val after = spark.table(t)
    assert(after.schema.fieldNames.contains("origin"))
    val total = events.count()
    // matched: ids [1500, 2000) updated in place; inserted: [2000, 2200)
    assert(after.count() === total + 200)
    assert(after.filter(col("origin") === "src").count() === 700)
    // rows no merge clause touched serve NULL for the evolved column
    assert(after.filter(col("origin").isNull).count() === total - 500)
    val filesAfter = spark.sql(s"SELECT path FROM $t.files")
      .collect().map(_.getString(0)).toSet
    assert(filesBefore.subsetOf(filesAfter),
      "schema-evolving MERGE must not rewrite pre-merge data files")
    // a source-only column whose ADD the catalog cannot represent
    // (non-nullable reshape) still errors rather than corrupting —
    // covered by alterTable's own validation; here we just pin the
    // happy path committed exactly two snapshots (evolve + delta)
    assert(spark.sql(s"SELECT count(*) FROM $t.history").head.getLong(0) === 3)
    spark.sql(s"DROP TABLE $t")
  }
}
