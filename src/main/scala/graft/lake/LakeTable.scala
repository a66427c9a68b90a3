package graft.lake

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.writer.BlockWriter

/** Minimal lake-table metadata layer over the BlockWriter layout —
  * the read-side half of the reference's write-side lake (reference
  * main.go:48-56 lays out partitioned, key-sorted, size-bounded
  * files; the manifest/snapshot metadata of its `iceberg-core`
  * dependency is what turns a file pile into a TABLE). Two core
  * capabilities, reproduced honestly with no table-format dependency:
  *
  *  - '''Snapshots / time travel''': every commit writes an immutable
  *    JSON manifest (complete file list + per-file column stats) and
  *    atomically advances a snapshot pointer. Readers resolve a
  *    manifest, never a directory listing — commits are atomic
  *    (readers see the old or the new snapshot, nothing in between)
  *    and any historical snapshot stays readable.
  *  - '''Stats-based file pruning''': per-file min/max column stats
  *    recorded at commit time let a reader skip every file whose
  *    value ranges cannot satisfy a predicate — the read-side payoff
  *    that Z-order clustering (zorder_layout) exists to maximize.
  *
  * Data files are FLAT ([[BlockWriter.writeFlat]]): partition values
  * stay as table columns and layout is tracked only through the
  * manifest — the Iceberg model, where partitioning is metadata, not
  * directory names. At cluster scale the same manifests live on the
  * object store and the pointer swap maps to a conditional-put /
  * catalog CAS; the layer's plans are unchanged.
  */
object LakeTable {

  final case class ColStats(min: Long, max: Long)
  final case class FileEntry(path: String, rows: Long, stats: Map[String, ColStats])
  final case class Manifest(snapshotId: Int, parentId: Int, files: Seq[FileEntry],
      note: String = "", schemaJson: String = "")

  // ---------------- commit ----------------

  /** Append `df` as a new snapshot: write a fresh file set under
    * `data/s<id>/`, record per-file row counts and min/max stats for
    * `statCols` (integer-valued columns), write the manifest
    * (= parent file list + the new files), and atomically advance the
    * snapshot pointer. Returns the snapshot id.
    *
    * The stats scan reads back only what this commit wrote (one pass,
    * grouped by file) — the Spark analog of a writer reporting
    * per-file stats to the table commit.
    */
  def commit(spark: SparkSession, root: String, df: DataFrame,
      cfg: BlockWriter.Config, statCols: Seq[String],
      rangeCluster: Boolean = false, note: String = ""): Int =
    writeSnapshot(spark, root, df, cfg, statCols, rangeCluster,
      replace = false, note = note)

  /** Rewrite commit (copy-on-write maintenance): the new snapshot's
    * file list is EXACTLY the files written here — the parent's files
    * are retired from the current view but remain on disk and remain
    * referenced by earlier manifests, so time travel to pre-rewrite
    * snapshots keeps working. This is the mechanism behind compaction
    * (same rows, fewer/bigger files) and copy-on-write DELETE (same
    * files minus the deleted rows).
    */
  def rewrite(spark: SparkSession, root: String, df: DataFrame,
      cfg: BlockWriter.Config, statCols: Seq[String],
      rangeCluster: Boolean = false): Int =
    writeSnapshot(spark, root, df, cfg, statCols, rangeCluster,
      replace = true, note = "")

  private def writeSnapshot(spark: SparkSession, root: String, df: DataFrame,
      cfg: BlockWriter.Config, statCols: Seq[String],
      rangeCluster: Boolean, replace: Boolean, note: String): Int = {
    val parent = currentSnapshot(root)
    val snap = parent + 1
    // Schema enforcement (the reference's schema-driven ingest, at
    // table granularity): an APPEND must match the table schema
    // exactly — a drifting producer fails at commit time instead of
    // silently writing files a fixed-schema reader would mask out.
    // Rewrites may change the schema (that is how evolution ships).
    if (!replace && parent > 0) {
      val expect = manifest(root, parent).schemaJson
      val got = df.schema.json
      require(expect.isEmpty || expect == got,
        s"append schema mismatch for $root: table has $expect, batch has $got")
    }
    val dataDir = s"$root/data/s$snap"
    BlockWriter.writeFlat(df, dataDir, cfg, rangeCluster)
    val aggCols = count(lit(1)).cast("bigint").as("rows") +:
      statCols.flatMap(c => Seq(
        min(col(c).cast("bigint")).as(s"min_$c"),
        max(col(c).cast("bigint")).as(s"max_$c")))
    val entries = spark.read.parquet(dataDir)
      .groupBy(col("_metadata.file_path").as("path"))
      .agg(aggCols.head, aggCols.tail: _*)
      .collect() // one row per written file — commit-time stats only
      .map { r =>
        FileEntry(r.getString(0), r.getLong(1),
          statCols.zipWithIndex.map { case (c, i) =>
            c -> ColStats(r.getLong(2 + 2 * i), r.getLong(3 + 2 * i))
          }.toMap)
      }.toSeq.sortBy(_.path)
    val inherited =
      if (replace || parent == 0) Nil else manifest(root, parent).files
    val meta = Paths.get(root, "meta")
    Files.createDirectories(meta)
    // Optimistic concurrency (the Iceberg commit protocol): the
    // manifest is created with CREATE_NEW, so two committers racing
    // for the same snapshot id cannot both win — the loser gets
    // FileAlreadyExistsException and must re-resolve the head and
    // retry (re-validating against the new parent). On an object
    // store this maps to conditional-put / catalog CAS.
    Files.writeString(meta.resolve(s"manifest-$snap.json"),
      manifestJson(Manifest(snap, parent, inherited ++ entries, note, df.schema.json)),
      java.nio.file.StandardOpenOption.CREATE_NEW)
    val tmp = meta.resolve(s"_current.tmp$snap")
    Files.writeString(tmp, snap.toString)
    Files.move(tmp, meta.resolve("_current"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    snap
  }

  // ---------------- read ----------------

  /** Latest committed snapshot id, 0 if the table has no commits. */
  def currentSnapshot(root: String): Int = {
    val p = Paths.get(root, "meta", "_current")
    if (Files.exists(p)) Files.readString(p).trim.toInt else 0
  }

  /** Read the table as of `asOf` (default: current snapshot) — the
    * file list comes from that snapshot's manifest, so the read is
    * immune to concurrent commits and later file additions.
    */
  def read(spark: SparkSession, root: String, asOf: Option[Int] = None): DataFrame = {
    val m = manifest(root, asOf.getOrElse(currentSnapshot(root)))
    spark.read.parquet(m.files.map(_.path): _*)
  }

  /** Stats-pruned read: keep only files whose [min,max] stat ranges
    * intersect EVERY predicate interval, then apply the row-level
    * predicates to the survivors. Returns (rows, filesTouched,
    * filesTotal) — correctness never depends on pruning (row filters
    * re-check), pruning only bounds IO.
    */
  def prunedRead(spark: SparkSession, root: String,
      preds: Map[String, (Long, Long)], asOf: Option[Int] = None): (DataFrame, Int, Int) = {
    val m = manifest(root, asOf.getOrElse(currentSnapshot(root)))
    val keep = m.files.filter(f => preds.forall { case (c, (lo, hi)) =>
      f.stats.get(c).forall(st => st.min <= hi && st.max >= lo)
    })
    // empty survivor set: read the full list (filters still yield 0
    // rows) — avoids the no-path read edge while staying correct.
    val paths = if (keep.nonEmpty) keep.map(_.path) else m.files.map(_.path)
    val base = spark.read.parquet(paths: _*)
    val filtered = preds.foldLeft(base) { case (d, (c, (lo, hi))) =>
      d.filter(col(c) >= lo && col(c) <= hi)
    }
    (filtered, keep.size, m.files.size)
  }

  // ---------------- maintenance ----------------

  /** Expire snapshots older than `keepFrom`: delete data files that
    * are referenced ONLY by expired manifests (a rewrite retires
    * files from the current view but they stay on disk until expiry —
    * this is what reclaims them), then drop the expired manifests.
    * Time travel to snapshots ≥ `keepFrom` keeps working; earlier
    * snapshots become unreadable by design. Returns the number of
    * data files deleted.
    */
  def expire(root: String, keepFrom: Int): Int = {
    val head = currentSnapshot(root)
    require(keepFrom >= 1 && keepFrom <= head, s"keepFrom $keepFrom out of [1, $head]")
    val keep = (keepFrom to head).flatMap(i => manifest(root, i).files.map(_.path)).toSet
    val expired = (1 until keepFrom).flatMap(i => manifest(root, i).files.map(_.path)).toSet
    val orphans = expired -- keep
    orphans.foreach { p =>
      Files.deleteIfExists(Paths.get(new java.net.URI(p).getPath)): Unit
    }
    (1 until keepFrom).foreach { i =>
      Files.deleteIfExists(Paths.get(root, "meta", s"manifest-$i.json")): Unit
    }
    orphans.size
  }

  // ---------------- manifest (de)serialization ----------------

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def manifestJson(m: Manifest): String = {
    val fs = m.files.map { f =>
      val st = f.stats.toSeq.sortBy(_._1).map { case (c, cs) =>
        s""""${esc(c)}":{"min":${cs.min},"max":${cs.max}}"""
      }.mkString(",")
      s"""{"path":"${esc(f.path)}","rows":${f.rows},"stats":{$st}}"""
    }.mkString(",")
    s"""{"snapshot_id":${m.snapshotId},"parent_id":${m.parentId},"note":"${esc(m.note)}","schema":"${esc(m.schemaJson)}","files":[$fs]}"""
  }

  /** Load a snapshot's manifest (Jackson tree read — jackson-databind
    * ships with Spark).
    */
  def manifest(root: String, snap: Int): Manifest = {
    require(snap > 0, s"no snapshot $snap (table has ${currentSnapshot(root)})")
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readString(Paths.get(root, "meta", s"manifest-$snap.json")))
    val files = scala.jdk.CollectionConverters.IteratorHasAsScala(
      node.get("files").elements()).asScala.map { f =>
      val statsNode = f.get("stats")
      val stats = scala.jdk.CollectionConverters.IteratorHasAsScala(
        statsNode.fieldNames()).asScala.map { c =>
        c -> ColStats(statsNode.get(c).get("min").asLong(),
          statsNode.get(c).get("max").asLong())
      }.toMap
      FileEntry(f.get("path").asText(), f.get("rows").asLong(), stats)
    }.toSeq
    Manifest(node.get("snapshot_id").asInt(), node.get("parent_id").asInt(), files,
      if (node.has("note")) node.get("note").asText() else "",
      if (node.has("schema")) node.get("schema").asText() else "")
  }
}
