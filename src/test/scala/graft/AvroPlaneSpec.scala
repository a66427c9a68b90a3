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
    val ev = events.limit(0).unionByName(events) // stable plan
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
    graft.util.Scratch.rmNow(root)
  }
}
