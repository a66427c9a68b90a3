package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.lake.LakeTable
import graft.writer.BlockWriter

/** Field-id column mapping: RENAME/DROP COLUMN as metadata-only
  * commits — pre-rename files read under the new name, dropped bytes
  * never resurrect, stats pruning and deletes survive renames, and
  * the SQL surface (ALTER TABLE / UPDATE) rides the same mechanism.
  */
class ColumnMappingSpec extends AnyFunSuite {
  import TestSpark._

  private def freshTable(): (String, Long) = {
    val root = graft.util.Scratch.dir("graft_cmspec_")
    val ev = graft.sources.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("event_type"))
    val cfg = BlockWriter.Config("user_id", "event_id")
    LakeTable.commit(spark, root, ev, cfg, Seq("event_id", "user_id"))
    (root, ev.count())
  }

  test("rename is metadata-only and pre-rename files read under the new name") {
    val (root, n) = freshTable()
    val before = LakeTable.manifest(root, LakeTable.currentSnapshot(root))
    val s = LakeTable.renameColumn(root, "user_id", "uid")
    val after = LakeTable.manifest(root, s)
    // zero data IO: the exact same file set, byte for byte
    assert(after.files.map(f => (f.path, f.bytes)) ===
      before.files.map(f => (f.path, f.bytes)))
    val df = LakeTable.read(spark, root)
    assert(df.columns.toSeq === Seq("event_id", "uid", "event_type"))
    assert(df.count() === n)
    // values came through the mapping, not null-filled
    assert(df.filter(col("uid").isNull).count() === 0)
    // the bucket spec followed the logical name
    assert(after.bucketCol === "uid" && after.nBuckets === before.nBuckets)
    graft.util.Scratch.rmNow(root)
  }

  test("append after rename: new files store the physical name; stats prune across generations") {
    val (root, n) = freshTable()
    LakeTable.renameColumn(root, "event_id", "eid")
    val more = graft.sources.Tables.load(spark, sf, "events")
      .select((col("event_id") + 1000000).as("eid"), col("user_id"),
        col("event_type"))
    val cfg = BlockWriter.Config("user_id", "eid")
    LakeTable.commit(spark, root, more, cfg, Seq("eid", "user_id"))
    val df = LakeTable.read(spark, root)
    assert(df.count() === 2 * n)
    assert(df.filter(col("eid").isNull).count() === 0)
    // new files' stats key by the PHYSICAL name of the renamed column
    val m = LakeTable.manifest(root, LakeTable.currentSnapshot(root))
    val gen2 = m.files.filter(_.seq == m.snapshotId)
    assert(gen2.nonEmpty && gen2.forall(_.stats.contains("event_id")),
      s"expected physical stat keys, got ${gen2.headOption.map(_.stats.keySet)}")
    // pruning on the renamed column touches only one generation's files
    val (pruned, touched, total) = LakeTable.prunedRead(spark, root,
      Map("eid" -> ((1000000L, Long.MaxValue))))
    assert(pruned.count() === n)
    assert(touched < total, s"rename must not defeat pruning: $touched/$total")
    graft.util.Scratch.rmNow(root)
  }

  test("equality deletes survive renames in both directions") {
    val (root, n) = freshTable()
    // delete BEFORE rename, keyed by the old name
    val d1 = LakeTable.read(spark, root).select(col("event_id"))
      .filter(col("event_id") % 10 === 0)
    val nd1 = d1.count()
    LakeTable.deleteWhere(spark, root, "event_id", d1)
    LakeTable.renameColumn(root, "event_id", "eid")
    val afterRename = LakeTable.read(spark, root)
    assert(afterRename.count() === n - nd1)
    // delete AFTER rename, keyed by the new name — same physical key
    val d2 = afterRename.select(col("eid")).filter(col("eid") % 10 === 1)
    val nd2 = d2.count()
    LakeTable.deleteWhere(spark, root, "eid", d2)
    assert(LakeTable.read(spark, root).count() === n - nd1 - nd2)
    // both delete entries carry the one physical key name
    val m = LakeTable.manifest(root, LakeTable.currentSnapshot(root))
    assert(m.deletes.map(_.keyCol).distinct === Seq("event_id"))
    graft.util.Scratch.rmNow(root)
  }

  test("drop is metadata-only; re-adding the name gets fresh storage (no resurrection)") {
    val (root, n) = freshTable()
    val filesBefore = LakeTable.manifest(root, LakeTable.currentSnapshot(root))
      .files.map(_.path)
    LakeTable.dropColumn(root, "event_type")
    assert(LakeTable.read(spark, root).columns.toSeq === Seq("event_id", "user_id"))
    // same files on disk — the bytes are just never projected again
    val m1 = LakeTable.manifest(root, LakeTable.currentSnapshot(root))
    assert(m1.files.map(_.path) === filesBefore)
    // re-add the SAME name: old values must NOT come back
    val stored = LakeTable.storedSchemaOf(root).get
    LakeTable.evolveSchema(root, graft.lake.ColumnMapping.add(stored,
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType, nullable = true)))
    val df = LakeTable.read(spark, root)
    assert(df.columns.toSeq === Seq("event_id", "user_id", "event_type"))
    assert(df.filter(col("event_type").isNotNull).count() === 0,
      "dropped column's bytes resurrected under a re-added name")
    assert(df.count() === n)
    // time travel to the pre-drop snapshot still sees the original
    val old = LakeTable.read(spark, root, Some(1))
    assert(old.filter(col("event_type").isNull).count() === 0)
    graft.util.Scratch.rmNow(root)
  }

  test("drop refuses while an outstanding equality delete is keyed on the column") {
    val (root, _) = freshTable()
    LakeTable.deleteWhere(spark, root, "event_type",
      LakeTable.read(spark, root).select(col("event_type")).limit(1))
    val e = intercept[IllegalArgumentException] {
      LakeTable.dropColumn(root, "event_type")
    }
    assert(e.getMessage.contains("outstanding equality deletes"))
    graft.util.Scratch.rmNow(root)
  }

  test("SQL surface: ALTER TABLE RENAME/DROP COLUMN, reads, pruning plan, and UPDATE after rename") {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.root",
      graft.util.Scratch.root.resolve("cmcat").toString)
    val t = s"graft.cm.t_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v BIGINT, tag STRING)")
    spark.sql(s"INSERT INTO $t SELECT id, id * 2, concat('x', id) FROM range(0, 1000)")
    spark.sql(s"ALTER TABLE $t RENAME COLUMN v TO val")
    // DSv2 read path: values through the mapping, filters pushed
    val renamed = spark.sql(s"SELECT id, val FROM $t WHERE val >= 1000")
    assert(renamed.count() === 500)
    assert(renamed.filter(col("val").isNull).count() === 0)
    // filter pushdown reaches the parquet scan under the PHYSICAL name
    val plan = renamed.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("v"),
      s"expected pushed filter on the physical column:\n${plan.take(1200)}")
    // row-level UPDATE through the delta write, post-rename
    spark.sql(s"UPDATE $t SET val = -1 WHERE id < 10")
    assert(spark.sql(s"SELECT COUNT(*) FROM $t WHERE val = -1")
      .collect()(0).getLong(0) === 10)
    assert(spark.table(t).count() === 1000)
    // drop + re-add via SQL: no resurrection through the DSv2 reader
    spark.sql(s"ALTER TABLE $t DROP COLUMN tag")
    assert(spark.table(t).columns.toSeq === Seq("id", "val"))
    spark.sql(s"ALTER TABLE $t ADD COLUMNS (tag STRING)")
    assert(spark.table(t).filter(col("tag").isNotNull).count() === 0)
    // incremental append under the evolved schema still lands
    spark.sql(s"INSERT INTO $t SELECT id, id, 'fresh' FROM range(1000, 1100)")
    assert(spark.table(t).count() === 1100)
    assert(spark.table(t).filter(col("tag") === "fresh").count() === 100)
    spark.sql(s"DROP TABLE $t")
  }

  test("widen is metadata-only; narrow files decode into the widened types") {
    import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
    val root = graft.util.Scratch.dir("graft_cmwiden_")
    val ev = graft.sources.Tables.load(spark, sf, "events")
      .select(col("event_id").cast("int").as("eid"), col("user_id"),
        col("value").cast("float").as("v"))
    val n = ev.count()
    val preSum = ev.agg(sum(col("eid").cast("bigint"))).collect()(0).getLong(0)
    val cfg = BlockWriter.Config("user_id", "eid")
    LakeTable.commit(spark, root, ev, cfg, Seq("eid", "user_id"))
    val before = LakeTable.manifest(root, LakeTable.currentSnapshot(root))
    LakeTable.widenColumn(root, "eid", LongType)
    val s2 = LakeTable.widenColumn(root, "v", DoubleType)
    val after = LakeTable.manifest(root, s2)
    // zero data IO: the exact same file set, byte for byte
    assert(after.files.map(f => (f.path, f.bytes)) ===
      before.files.map(f => (f.path, f.bytes)))
    val df = LakeTable.read(spark, root)
    assert(df.schema("eid").dataType === LongType)
    assert(df.schema("v").dataType === DoubleType)
    assert(df.count() === n)
    // int32 pages decoded into long vectors, values intact
    assert(df.agg(sum(col("eid"))).collect()(0).getLong(0) === preSum)
    // an append in the widened types lands; both generations coexist
    LakeTable.commit(spark, root,
      ev.select((col("eid").cast("bigint") + 5000000000L).as("eid"),
        col("user_id"), col("v").cast("double").as("v")),
      cfg, Seq("eid", "user_id"))
    val all2 = LakeTable.read(spark, root)
    assert(all2.count() === 2 * n)
    assert(all2.filter(col("eid") >= 5000000000L).count() === n)
    // stats pruning on the widened column: a beyond-int predicate
    // touches only the wide generation's files
    val (pruned, touched, total) = LakeTable.prunedRead(spark, root,
      Map("eid" -> (5000000000L, Long.MaxValue)))
    assert(pruned.count() === n)
    assert(touched < total, s"pruning never skipped a file ($touched/$total)")
    graft.util.Scratch.rmNow(root)
  }

  test("widen rejects narrowing/reshapes; widening the bucket column retires the bucket spec") {
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val root = graft.util.Scratch.dir("graft_cmwidenrej_")
    val ev = graft.sources.Tables.load(spark, sf, "events")
      .select(col("event_id").cast("int").as("eid"),
        col("user_id").cast("int").as("uid"), col("event_type"))
    LakeTable.commit(spark, root, ev, BlockWriter.Config("uid", "eid"),
      Seq("eid", "uid"))
    // narrowing and reshaping are not metadata-representable
    intercept[IllegalArgumentException] {
      LakeTable.widenColumn(root, "event_type", LongType)
    }
    LakeTable.widenColumn(root, "eid", LongType)
    intercept[IllegalArgumentException] {
      LakeTable.widenColumn(root, "eid", IntegerType)
    }
    // the bucket column's hash is typed (hash(5: int) != hash(5L)):
    // widening it retires the bucket spec rather than letting stale
    // labels lie to storage-partitioned joins
    assert(LakeTable.manifest(root, LakeTable.currentSnapshot(root))
      .bucketCol === "uid")
    val s3 = LakeTable.widenColumn(root, "uid", LongType)
    val m3 = LakeTable.manifest(root, s3)
    assert(m3.bucketCol === "" && m3.nBuckets === 0)
    // reads stay correct; the widened bucket column serves values
    val df = LakeTable.read(spark, root)
    assert(df.schema("uid").dataType === LongType)
    assert(df.filter(col("uid").isNull).count() === 0)
    graft.util.Scratch.rmNow(root)
  }

  test("equality deletes written before a widen still apply; widen composes with rename") {
    import org.apache.spark.sql.types.LongType
    val root = graft.util.Scratch.dir("graft_cmwideneq_")
    val ev = graft.sources.Tables.load(spark, sf, "events")
      .select(col("event_id").cast("int").as("eid"), col("user_id"),
        col("event_type"))
    val n = ev.count()
    LakeTable.commit(spark, root, ev, BlockWriter.Config("user_id", "eid"),
      Seq("eid", "user_id"))
    // MoR equality delete keyed on the (still-int) column: the delete
    // file stores int32 key values
    val delKeys = ev.filter(col("eid") % 5 === 0).select(col("eid"))
    val nDel = delKeys.count()
    LakeTable.deleteWhere(spark, root, "eid", delKeys)
    // widen AFTER the delete: the int-typed delete file must still
    // mask rows when probed against the now-bigint column
    LakeTable.widenColumn(root, "eid", LongType)
    val df = LakeTable.read(spark, root)
    assert(df.schema("eid").dataType === LongType)
    assert(df.count() === n - nDel)
    assert(df.filter(col("eid") % 5 === 0).count() === 0)
    // rename the widened column: mapping metadata and the widened
    // stamp ride together; values still served, delete still applied
    LakeTable.renameColumn(root, "eid", "event_ref")
    val df2 = LakeTable.read(spark, root)
    assert(df2.schema("event_ref").dataType === LongType)
    assert(df2.count() === n - nDel)
    assert(graft.lake.ColumnMapping.hasWidening(
      LakeTable.storedSchemaOf(root).get))
    graft.util.Scratch.rmNow(root)
  }

  test("SQL surface: ALTER COLUMN TYPE widens; filters push down over mixed-width files") {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.root",
      graft.util.Scratch.root.resolve("cmcat").toString)
    val t = s"graft.cm.w_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $t (id INT, v FLOAT, tag STRING)")
    spark.sql(s"INSERT INTO $t SELECT id, id * 0.5, concat('x', id) FROM range(0, 1000)")
    spark.sql(s"ALTER TABLE $t ALTER COLUMN id TYPE BIGINT")
    spark.sql(s"ALTER TABLE $t ALTER COLUMN v TYPE DOUBLE")
    assert(spark.table(t).schema("id").dataType === LongType)
    assert(spark.table(t).schema("v").dataType === DoubleType)
    // a narrowing ALTER is rejected
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $t ALTER COLUMN id TYPE INT")
    }
    // decimal precision growth at unchanged scale is metadata-only;
    // scale changes reshape stored values and are rejected
    val td = s"graft.cm.d_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $td (k BIGINT, amt DECIMAL(10, 2))")
    spark.sql(s"INSERT INTO $td SELECT id, CAST(id AS DECIMAL(10, 2)) / 4 FROM range(0, 100)")
    spark.sql(s"ALTER TABLE $td ALTER COLUMN amt TYPE DECIMAL(22, 2)")
    assert(spark.table(td).schema("amt").dataType ===
      org.apache.spark.sql.types.DecimalType(22, 2))
    spark.sql(s"INSERT INTO $td SELECT id, CAST(1e18 AS DECIMAL(22, 2)) + id FROM range(0, 10)")
    assert(spark.table(td).count() === 110)
    val sums = spark.table(td).agg(sum(col("amt"))).collect()(0)
    assert(!sums.isNullAt(0))
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $td ALTER COLUMN amt TYPE DECIMAL(22, 4)")
    }
    spark.sql(s"DROP TABLE $td")
    // beyond-int append through the widened schema
    spark.sql(s"INSERT INTO $t SELECT id + 3000000000, id * 1.0, 'wide' " +
      s"FROM range(0, 1000)")
    assert(spark.table(t).count() === 2000)
    // filter over BOTH generations: int32 pages and int64 pages serve
    // the same bigint predicate
    val q = spark.sql(s"SELECT id FROM $t WHERE id >= 500 AND id < 3000000500")
    assert(q.count() === 1000)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("id"),
      s"expected pushed filter on the widened column:\n${plan.take(1200)}")
    spark.sql(s"DROP TABLE $t")
  }

  test("ADD COLUMN DEFAULT is metadata-only; initial default fills in both read paths") {
    val catRoot = graft.util.Scratch.root.resolve("cmcat")
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.root", catRoot.toString)
    val name = s"dflt_${System.nanoTime()}"
    val t = s"graft.cm.$name"
    val root = TestSpark.graftCatRoot.resolve("cm").resolve(name).toString
    spark.sql(s"CREATE TABLE $t (id BIGINT, v DOUBLE)")
    spark.sql(s"INSERT INTO $t SELECT id, id * 0.5 FROM range(0, 100)")
    val filesBefore = LakeTable.manifest(root, 1).files.map(_.path)
    // evolution: defaulted column — METADATA-ONLY commit (same files)
    spark.sql(s"ALTER TABLE $t ADD COLUMN source STRING DEFAULT 'device'")
    val m2 = LakeTable.manifest(root, 2)
    assert(m2.files.map(_.path) === filesBefore,
      "defaulted ADD COLUMN must not touch data files")
    // DSv2 read path: pre-evolution rows serve the initial default
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE source = 'device'")
      .collect()(0).getLong(0) === 100)
    // format read path (LakeTable.readFiles) agrees
    assert(LakeTable.read(spark, root)
      .filter(col("source") === "device").count() === 100)
    // INSERT omitting the column fills the WRITE default physically
    spark.sql(s"INSERT INTO $t (id, v) SELECT id + 100, 1.0 FROM range(0, 10)")
    // INSERT with an explicit NULL stays NULL — defaults fill only
    // file-MISSING columns, never stored values
    spark.sql(s"INSERT INTO $t SELECT id + 200, 2.0, NULL FROM range(0, 5)")
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE source = 'device'")
      .collect()(0).getLong(0) === 110)
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE source IS NULL")
      .collect()(0).getLong(0) === 5)
    // SET DEFAULT changes the WRITE default; the INITIAL default for
    // pre-evolution files stays frozen at 'device'
    spark.sql(s"ALTER TABLE $t ALTER COLUMN source SET DEFAULT 'edge'")
    spark.sql(s"INSERT INTO $t (id, v) SELECT id + 300, 3.0 FROM range(0, 7)")
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE source = 'edge'")
      .collect()(0).getLong(0) === 7)
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE source = 'device'")
      .collect()(0).getLong(0) === 110,
      "changing the write default must not rewrite the frozen initial default")
    spark.sql(s"DROP TABLE $t")
  }

  test("rejected ALTER COLUMN TYPE leaves the declared hash layout intact") {
    val catRoot = graft.util.Scratch.root.resolve("cmcat")
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.root", catRoot.toString)
    val name = s"lyt_${System.nanoTime()}"
    val t = s"graft.cm.$name"
    spark.sql(s"CREATE TABLE $t (id INT, v DOUBLE) PARTITIONED BY (bucket(4, id))")
    spark.sql(s"INSERT INTO $t SELECT id, id * 0.5 FROM range(0, 100)")
    val layout = TestSpark.graftCatRoot.resolve("cm").resolve(name)
      .resolve("meta").resolve("_layout.json")
    assert(java.nio.file.Files.exists(layout), s"missing $layout")
    // a NARROWING alter on the declared bucket column must fail AND
    // leave the declared layout untouched — failed DDL must not
    // mutate table metadata (the pre-fix code deleted the layout
    // before validation ran)
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $t ALTER COLUMN id TYPE STRING")
    }
    assert(java.nio.file.Files.exists(layout),
      "rejected ALTER dropped the declared hash layout")
    // a VALID widen of the bucket column still retires it (typed-hash
    // bucket labels would lie under the widened type)
    spark.sql(s"ALTER TABLE $t ALTER COLUMN id TYPE BIGINT")
    assert(!java.nio.file.Files.exists(layout),
      "valid widen of the bucket column should retire the declared layout")
    assert(spark.table(t).count() === 100)
    spark.sql(s"DROP TABLE $t")
  }
}
