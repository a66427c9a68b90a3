package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.lake.{AvroPlane, LakeTable}

/** The Avro data plane (reference parity: the reference writes
  * partitioned SNAPPY Avro container files, main.go:47-54): container
  * format on disk, round-trip exactness, manifest-stat pruning over
  * in-stream writer-reported stats, strict schema, and the
  * append-only contract (equality deletes pass, positional deletes
  * are rejected at the read choke point).
  */
class AvroPlaneSpec extends AnyFunSuite {
  import TestSpark._

  private def events = graft.sources.Tables.load(spark, sf, "events")
    .select(col("event_id"), col("user_id"), col("ts"), col("event_type"), col("value"))

  test("appendAvro writes snappy .avro container files and round-trips exactly") {
    val root = graft.util.Scratch.dir("graft_avrospec_")
    val ev = events
    LakeTable.appendAvro(spark, root, events.repartitionByRange(4, col("event_id")),
      Seq("event_id", "event_type"))
    val m = LakeTable.manifest(root, 1)
    assert(m.files.nonEmpty)
    assert(m.files.forall(_.path.endsWith(".avro")),
      "every data file must be an Avro container file")
    m.files.foreach { f =>
      assert(AvroPlane.codecOf(f.path) === "snappy",
        s"${f.path} must use the snappy codec (the reference's contract)")
    }
    // in-stream stats were recorded and are consistent with the rows
    assert(m.files.forall(f => f.stats.contains("event_id") && f.rows > 0 && f.bytes > 0))
    // round trip: exact multiset equality via a full-row diff
    val back = LakeTable.read(spark, root)
    assert(back.count() === events.count())
    assert(back.exceptAll(ev).count() === 0)
    assert(ev.exceptAll(back).count() === 0)
    // timestamps survive the micros round trip exactly
    val tsIn = events.agg(sum(unix_micros(col("ts")))).head.getLong(0)
    val tsOut = back.agg(sum(unix_micros(col("ts")))).head.getLong(0)
    assert(tsIn === tsOut)
    graft.util.Scratch.rmNow(root)
  }

  test("manifest stats prune avro files before any decode") {
    val root = graft.util.Scratch.dir("graft_avrospec_prune_")
    // three range-clustered appends → 12 files with tight event_id stats
    (0 to 2).foreach { i =>
      LakeTable.appendAvro(spark, root,
        events.filter(pmod(col("event_id"), lit(3)) === i)
          .repartitionByRange(4, col("event_id")),
        Seq("event_id"))
    }
    val total = LakeTable.manifest(root, 3).files.size
    assert(total >= 9, s"expected a multi-file layout, got $total")
    val (rows, touched, tot) =
      LakeTable.prunedRead(spark, root, Map("event_id" -> (1000L, 1999L)))
    assert(tot === total)
    assert(touched <= total / 2,
      s"a 10%-range probe must skip at least half the files: $touched of $total")
    val expect = events.filter(col("event_id").between(1000, 1999)).count()
    assert(rows.count() === expect)
    graft.util.Scratch.rmNow(root)
  }

  test("streaming avro ingest: snappy container files, one commit per batch, exactly-once") {
    val root = graft.util.Scratch.dir("graft_avrospec_stream_")
    val staged = graft.util.Scratch.dir("graft_avrospec_stream_in_")
    val ck = graft.util.Scratch.dir("graft_avrospec_stream_ck_")
    events.repartition(3).write.mode("overwrite").parquet(staged)
    val n = graft.streaming.LakeStream.runOnceToAvroLake(spark, staged, root,
      Seq("event_id"), checkpoint = ck)
    assert(n === 3, s"3 staged files → 3 commits, got $n")
    val m = graft.lake.LakeTable.manifest(root, n)
    assert(m.files.forall(_.path.endsWith(".avro")))
    m.files.take(2).foreach(f => assert(AvroPlane.codecOf(f.path) === "snappy"))
    assert(LakeTable.read(spark, root).count() === events.count())
    // exactly-once: a re-drain against the SAME checkpoint replays
    // nothing — the snapshot count and row count are unchanged
    val n2 = graft.streaming.LakeStream.runOnceToAvroLake(spark, staged, root,
      Seq("event_id"), checkpoint = ck)
    assert(n2 === n)
    assert(LakeTable.read(spark, root).count() === events.count())
    graft.util.Scratch.rmNow(root); graft.util.Scratch.rmNow(staged)
  }

  test("avro→parquet migration: one CoW rewrite, format-stable time travel, pos deletes unlocked") {
    val root = graft.util.Scratch.dir("graft_avrospec_mig_")
    LakeTable.appendAvro(spark, root, events, Seq("event_id"))
    val cfg = graft.writer.BlockWriter.Config("user_id", "ts", maxRecordsPerFile = 4096)
    LakeTable.rewrite(spark, root, LakeTable.read(spark, root), cfg,
      Seq("event_id"), basis = Some(1), note = "migrate")
    val m2 = LakeTable.manifest(root, 2)
    assert(m2.files.forall(_.path.endsWith(".parquet")),
      "the migrated head must be all-parquet")
    // pre-migration snapshot still reads its avro files
    val m1 = LakeTable.manifest(root, 1)
    assert(m1.files.forall(_.path.endsWith(".avro")))
    assert(LakeTable.read(spark, root, Some(1)).count() === events.count())
    // content identical across the boundary
    val pre = LakeTable.read(spark, root, Some(1))
    val post = LakeTable.read(spark, root, Some(2))
    assert(pre.exceptAll(post).count() === 0 && post.exceptAll(pre).count() === 0)
    // positional deletes now work (the avro plane rejects them)
    val coords = LakeTable.withRowCoords(spark, root)
      .filter(col("event_id") % 10 === 4)
      .select(col(LakeTable.CoordPath), col(LakeTable.CoordIdx))
    LakeTable.deletePositions(spark, root, coords)
    assert(LakeTable.read(spark, root).filter(col("event_id") % 10 === 4).count() === 0)
    graft.util.Scratch.rmNow(root)
  }

  test("avro compaction: many small containers fold to N, stay avro, debt folds, travel survives") {
    val root = graft.util.Scratch.dir("graft_avrospec_cmp_")
    val ev = events
    (0 to 2).foreach { i =>
      LakeTable.appendAvro(spark, root,
        ev.filter(pmod(col("event_id"), lit(3)) === i).repartition(4),
        Seq("event_id"))
    }
    LakeTable.deleteWhere(spark, root, "event_type",
      spark.range(1).select(lit("error").as("event_type")))
    val preFiles = LakeTable.manifest(root, 3).files.size
    assert(preFiles >= 9)
    val snap = LakeTable.rewriteAvro(spark, root, Seq("event_id"), parts = 2)
    val m = LakeTable.manifest(root, snap)
    assert(m.files.size === 2 && m.files.forall(_.path.endsWith(".avro")),
      "compaction must consolidate and stay on the avro plane")
    assert(m.deletes.isEmpty, "delete debt folds into the rewrite")
    m.files.foreach(f => assert(AvroPlane.codecOf(f.path) === "snappy"))
    // the head view is the delete-applied content
    val expect = ev.filter(col("event_type") =!= "error")
    val head = LakeTable.read(spark, root)
    assert(head.count() === expect.count())
    assert(head.exceptAll(expect).count() === 0)
    // pre-compaction snapshots still read the original small files:
    // snap 3 = pre-delete (all rows), snap 4 = delete-applied
    assert(LakeTable.read(spark, root, Some(3)).count() === ev.count())
    assert(LakeTable.read(spark, root, Some(4)).count() === expect.count())
    assert(LakeTable.read(spark, root, Some(1)).count() ===
      ev.filter(pmod(col("event_id"), lit(3)) === 0).count())
    graft.util.Scratch.rmNow(root)
  }

  test("declared days(ts) layout range-clusters avro appends AND compaction: day window touches ≤ total/4 files") {
    val root = graft.util.Scratch.dir("graft_avrolay_")
    val ev = events
    // seed BEFORE the layout (hash-scattered — the honest evolution
    // contract: old files keep their old extents)
    LakeTable.appendAvro(spark, root,
      ev.filter(col("event_id") % 3 === 0).repartition(4),
      Seq("event_id", "ts", "event_type"))
    // declare days(ts) by writing the same _layout.json the catalog
    // verb produces (library-level twin of CALL set_layout)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(root, "meta", "_layout.json"),
      """{"partition_col":"ts","n_buckets":0,"transform":"days"}""")
    LakeTable.appendAvro(spark, root, ev.filter(col("event_id") % 3 === 1),
      Seq("event_id", "ts", "event_type"))
    LakeTable.appendAvro(spark, root, ev.filter(col("event_id") % 3 === 2),
      Seq("event_id", "ts", "event_type"))
    // post-layout appends must carry tight per-file ts extents: each
    // clustered file spans far less than the table's full range
    def extents(snap: Int, seqMin: Int): Seq[(Long, Long)] =
      LakeTable.manifest(root, snap).files.filter(_.seq >= seqMin)
        .map(f => (f.stats("ts").min, f.stats("ts").max))
    val fullSpan = {
      val all = extents(3, 1)
      all.map(_._2).max - all.map(_._1).min
    }
    val clustered = extents(3, 2)
    assert(clustered.size > 4, "fixture needs several clustered files")
    // 4 range partitions per append → ~quarter spans, with sampled
    // bounds wobble; the sharp ≤ total/4 pin is on the 8-way
    // compaction below
    clustered.foreach { case (lo, hi) =>
      assert(hi - lo <= fullSpan / 2,
        s"a range-clustered avro file must span a fraction of the table " +
          s"(got ${hi - lo} of $fullSpan)")
    }
    // compaction keeps the clustering — and the file-touch pin holds
    // on the compacted table: a 2-day window intersects ≤ total/4
    LakeTable.rewriteAvro(spark, root, Seq("event_id", "ts", "event_type"), 8)
    val m = LakeTable.manifest(root, LakeTable.currentSnapshot(root))
    assert(m.files.size === 8)
    val tsMin = m.files.map(_.stats("ts").min).min
    val dayUs = 86400L * 1000000L
    val (lo, hi) = (tsMin + 2 * dayUs, tsMin + 4 * dayUs)
    val touched = m.files.count(f =>
      f.stats("ts").min <= hi && f.stats("ts").max >= lo)
    assert(touched <= m.files.size / 4,
      s"2-day window must touch ≤ total/4 compacted files (got $touched of ${m.files.size})")
    // and the pruned read is still exact
    val got = LakeTable.read(spark, root)
      .filter(col("ts") >= org.apache.spark.sql.functions.timestamp_micros(lit(lo)) &&
        col("ts") < org.apache.spark.sql.functions.timestamp_micros(lit(hi)))
      .count()
    val want = ev.filter(col("ts") >= timestamp_micros(lit(lo)) &&
      col("ts") < timestamp_micros(lit(hi))).count()
    assert(got === want)
    graft.util.Scratch.rmNow(root)
  }

  test("incremental and changelog reads work over the avro plane") {
    val root = graft.util.Scratch.dir("graft_avrospec_cdc_")
    val ev = events
    LakeTable.appendAvro(spark, root, ev.filter(col("event_id") % 3 === 0), Seq("event_id"))
    LakeTable.appendAvro(spark, root, ev.filter(col("event_id") % 3 === 1), Seq("event_id"))
    LakeTable.appendAvro(spark, root, ev.filter(col("event_id") % 3 === 2), Seq("event_id"))
    // incremental append scan: exactly the rows snapshots (1, 3] added
    val inc = LakeTable.incrementalRead(spark, root, 1, 3)
    val want = ev.filter(col("event_id") % 3 =!= 0)
    assert(inc.count() === want.count())
    assert(inc.exceptAll(want).count() === 0)
    // changelog: the delete commit attributes its pre-images even
    // though the pre-image rows decode from avro containers
    LakeTable.deleteWhere(spark, root, "event_type",
      spark.range(1).select(lit("error").as("event_type")))
    val chg = LakeTable.changelogRead(spark, root, 3, 4)
    val dels = chg.filter(col("_change_type") === "delete")
    assert(dels.count() === ev.filter(col("event_type") === "error").count())
    assert(chg.filter(col("_change_type") === "insert").count() === 0)
    graft.util.Scratch.rmNow(root)
  }

  test("avro stream ingest enforces declared CHECK constraints like the parquet twin") {
    val root = graft.util.Scratch.dir("graft_avrospec_chk_")
    val staged = graft.util.Scratch.dir("graft_avrospec_chk_in_")
    // seed the table + declare the constraint, then stream a batch
    // that violates it — the drain must fail, not commit bad rows
    LakeTable.appendAvro(spark, root, events.filter(col("value") >= 0), Seq("event_id"))
    LakeTable.setCheck(root, "nonneg", "value >= 0")
    events.withColumn("value", col("value") - lit(100000.0d))
      .repartition(1).write.mode("overwrite").parquet(staged)
    val before = LakeTable.read(spark, root).count()
    val e = intercept[Exception] {
      graft.streaming.LakeStream.runOnceToAvroLake(spark, staged, root, Seq("event_id"))
    }
    assert(e.getMessage.contains("nonneg") ||
      Option(e.getCause).exists(_.getMessage.contains("nonneg")),
      s"violation must name the constraint: ${e.getMessage}")
    assert(LakeTable.read(spark, root).count() === before,
      "the violating batch must not land")
    graft.util.Scratch.rmNow(root); graft.util.Scratch.rmNow(staged)
  }

  test("early-terminating avro reads (LIMIT) complete without leaking readers") {
    val root = graft.util.Scratch.dir("graft_avrospec_lim_")
    LakeTable.appendAvro(spark, root, events.repartition(8), Seq("event_id"))
    // repeated limited reads abandon the per-file iterators mid-file;
    // the task completion listener must close them — enough rounds
    // that a leak would show up as fd exhaustion/slowdown, and the
    // results must stay correct
    (1 to 20).foreach { _ =>
      assert(LakeTable.read(spark, root).limit(3).collect().length === 3)
    }
    assert(LakeTable.read(spark, root).count() === events.count())
    graft.util.Scratch.rmNow(root)
  }

  test("failed avro append leaves only orphans; remove_orphans reclaims, live files survive") {
    val root = graft.util.Scratch.dir("graft_avrospec_orph_")
    LakeTable.appendAvro(spark, root, events, Seq("event_id"))
    val liveFiles = LakeTable.manifest(root, 1).files.map(_.path).toSet
    // a drifted append stages its files BEFORE the commit-time schema
    // check rejects it — exactly the crash-window shape remove_orphans
    // exists for
    intercept[IllegalArgumentException] {
      LakeTable.appendAvro(spark, root,
        events.withColumn("value", col("value").cast("string")), Seq("event_id"))
    }
    val removed = LakeTable.removeOrphans(root)
    assert(removed > 0, "the failed append's staged avro files must be reclaimed")
    // the live snapshot is untouched and still reads
    assert(LakeTable.manifest(root, 1).files.map(_.path).toSet === liveFiles)
    assert(LakeTable.read(spark, root).count() === events.count())
    assert(LakeTable.removeOrphans(root) === 0, "second sweep is a no-op")
    graft.util.Scratch.rmNow(root)
  }

  test("racing avro appends both land via the CAS — no lost update, contiguous snapshots") {
    val root = graft.util.Scratch.dir("graft_avrospec_race_")
    val ev = events
    LakeTable.appendAvro(spark, root, ev.filter(col("event_id") % 3 === 0),
      Seq("event_id"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val f1 = Future(LakeTable.appendAvro(spark, root,
      ev.filter(col("event_id") % 3 === 1), Seq("event_id")))
    val f2 = Future(LakeTable.appendAvro(spark, root,
      ev.filter(col("event_id") % 3 === 2), Seq("event_id")))
    val snaps = Set(Await.result(f1, 5.minutes), Await.result(f2, 5.minutes))
    assert(snaps === Set(2, 3), s"racing appends must take snapshots 2 and 3, got $snaps")
    assert(LakeTable.read(spark, root).count() === ev.count(),
      "no rows lost to the race")
    graft.util.Scratch.rmNow(root)
  }

  test("ANALYZE sketches avro files too, and mixed-format tables agree with ground truth") {
    val root = graft.util.Scratch.dir("graft_avrospec_an_")
    val ev = events
    LakeTable.appendAvro(spark, root, ev.filter(col("event_id") % 2 === 0),
      Seq("event_id"))
    val (snap1, n1) = LakeTable.analyze(spark, root)
    assert(snap1 === 1 && n1 === LakeTable.manifest(root, 1).files.size && n1 > 0)
    // incremental: a second avro append re-sketches only its files
    LakeTable.appendAvro(spark, root, ev.filter(col("event_id") % 2 === 1),
      Seq("event_id"))
    val added = LakeTable.manifest(root, 2).files.size - n1
    assert(LakeTable.analyze(spark, root)._2 === added)
    val meta = LakeTable.colStats(root).get
    val merged = LakeTable.mergedColStats(meta,
      LakeTable.manifest(root, 2).files.map(_.path)).get
    val (occ, nulls, _, rows) = merged("event_type")
    assert(rows === ev.count() && nulls === 0L)
    // 5 event types → 5 occupied buckets, identical to the parquet path
    assert(occ === ev.select(col("event_type")).distinct().count().toInt)
    graft.util.Scratch.rmNow(root)
  }

  test("strict schema: a drifted append fails; equality deletes apply; pos deletes reject") {
    val root = graft.util.Scratch.dir("graft_avrospec_strict_")
    LakeTable.appendAvro(spark, root, events, Seq("event_id"))
    // drifted producer: retyped column fails at commit time
    val drifted = events.withColumn("value", col("value").cast("string"))
    val e = intercept[IllegalArgumentException] {
      LakeTable.appendAvro(spark, root, drifted, Seq("event_id"))
    }
    assert(e.getMessage.contains("strict"))
    // unsupported type fails validation before any file is written
    intercept[IllegalArgumentException] {
      LakeTable.appendAvro(spark, root,
        events.withColumn("arr", array(lit(1))), Seq("event_id"))
    }
    // equality delete: a value-mask downstream of the decode
    LakeTable.deleteWhere(spark, root, "event_type",
      spark.range(1).select(lit("error").as("event_type")))
    val after = LakeTable.read(spark, root)
    assert(after.filter(col("event_type") === "error").count() === 0)
    assert(after.count() === events.filter(col("event_type") =!= "error").count())
    // positional-delete coordinate derivation needs parquet row
    // indexes → the read choke point rejects it with a clear message
    val e2 = intercept[IllegalArgumentException] {
      LakeTable.withRowCoords(spark, root)
    }
    assert(e2.getMessage.contains("append-only"))
    // the DSv2 front door format-dispatches: the avro snapshot reads
    // by name with the equality-delete mask applied — same answer as
    // the library read path
    val dsv2 = spark.read.format("graft-lake").load(root)
    assert(dsv2.count() === after.count())
    assert(dsv2.filter(col("event_type") === "error").count() === 0)
    // ADDITIVE nullable evolution is native to Avro (reader-schema
    // resolution): the metadata-only commit widens the schema, old
    // containers null-fill the new column BY NAME at decode, and the
    // writer schema advances at the next append
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val preEvolveCount = after.count()
    // evolve from the STORED schema (a delete-masked read's column
    // order is join-shaped, not the manifest's)
    LakeTable.evolveSchema(root, StructType(
      LakeTable.storedSchemaOf(root).get.fields :+
        StructField("extra", LongType, nullable = true)))
    val nullFilled = LakeTable.read(spark, root)
    assert(nullFilled.schema.fieldNames.contains("extra"))
    assert(nullFilled.count() === preEvolveCount &&
      nullFilled.filter(col("extra").isNotNull).count() === 0,
      "old containers must null-fill the evolved column")
    // evolved append round-trips: new containers carry the advanced
    // writer schema, old + new rows coexist under one read schema
    val evolvedBatch = events.filter(col("event_id") % 100 === 7)
      .withColumn("extra", col("event_id") * 2)
    LakeTable.appendAvro(spark, root, evolvedBatch, Seq("event_id"))
    val mixed = LakeTable.read(spark, root)
    assert(mixed.filter(col("extra").isNotNull).count() === evolvedBatch.count())
    assert(mixed.filter(col("extra") =!= col("event_id") * 2).count() === 0)
    assert(mixed.count() === preEvolveCount + evolvedBatch.count())
    // non-nullable additions stay rejected (no default machinery on
    // the avro plane), as does every NON-additive verb
    val e4 = intercept[IllegalArgumentException] {
      LakeTable.evolveSchema(root, StructType(
        LakeTable.storedSchemaOf(root).get.fields :+
          StructField("req", LongType, nullable = false)))
    }
    assert(e4.getMessage.contains("non-nullable"))
    val e5 = intercept[IllegalArgumentException] {
      LakeTable.renameColumn(root, "value", "v2")
    }
    assert(e5.getMessage.contains("resolve columns by writer-schema name"))
    // avro-invalid column names are rejected at the front door with
    // the reason, not as a SchemaParseException in an executor
    val e6 = intercept[IllegalArgumentException] {
      LakeTable.appendAvro(spark, graft.util.Scratch.dir("graft_avrospec_nm_"),
        events.withColumnRenamed("value", "bad name"), Seq("event_id"))
    }
    assert(e6.getMessage.contains("identifier"))
    graft.util.Scratch.rmNow(root)
  }
}
