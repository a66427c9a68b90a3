package graft.writer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The reference's write path, Spark-idiomatic (reference
  * main.go:48-87: BlockManager + FilesystemStorageAdapter — buffer
  * rows per PartitionColumn, order by KeyColumn, flush blocks of
  * ≤ MaxSize rows as snappy columnar files under
  * `basePath/partition=<value>/`).
  *
  * Spark realization: `repartition(partitionCol)` co-locates each
  * partition value on one task (ONE shuffle, hash-distributed across
  * executors — no driver-side block table, unlike the reference's
  * in-memory BlockManager map, so partition-value cardinality is
  * unbounded at 100 TB); `sortWithinPartitions(partition, key)` makes
  * every output file key-ordered; `maxRecordsPerFile` enforces the
  * MaxSize row bound WITHOUT any centralized accounting; dynamic
  * `partitionBy` lays out `partition=<value>/` dirs. MaxAge has no
  * batch meaning — the streaming analog lives in
  * [[graft.streaming.StreamWriter]] (trigger interval = MaxAge).
  */
object BlockWriter {

  final case class Config(
      partitionCol: String,
      keyCol: String,
      maxRecordsPerFile: Int = 4096, // reference MaxSize (main.go:78)
      compression: String = "snappy", // reference CompressionName (main.go:53)
      format: String = "parquet",
      // write fan-out; None = the session's shuffle parallelism.
      // Callers that know the input volume derive this instead of
      // paying full-cluster task/file overhead on small layouts
      // (and full parallelism remains the default at scale).
      parallelism: Option[Int] = None)

  /** Block id a row lands in: per-partition, key-ordered, ≤maxSize
    * rows per block — exactly the reference BlockManager's assignment.
    * Pure window arithmetic → whole-stage codegen, one shuffle.
    */
  def blockId(partitionCol: String, orderCols: Seq[Column], maxSize: Int): Column = {
    val w = Window.partitionBy(col(partitionCol)).orderBy(orderCols: _*)
    floor((row_number().over(w) - lit(1)) / lit(maxSize))
  }

  /** Write `df` as a partitioned, key-sorted, size-bounded file set.
    *
    * The repartition uses an EXPLICIT partition count (the session's
    * shuffle parallelism): an un-numbered `repartition(col)` is
    * eligible for AQE partition coalescing, which collapses a small
    * write into a handful of tasks and serializes file creation —
    * measured 3× slower on a file-count-heavy layout. Writing wants
    * full cluster parallelism regardless of shuffle byte size.
    */
  def write(df: DataFrame, basePath: String, cfg: Config): Unit = {
    val parallelism = cfg.parallelism
      .getOrElse(df.sparkSession.sessionState.conf.numShufflePartitions)
    df.repartition(parallelism, col(cfg.partitionCol))
      .sortWithinPartitions(col(cfg.partitionCol), col(cfg.keyCol))
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", cfg.maxRecordsPerFile.toLong)
      .option("compression", cfg.compression)
      .partitionBy(cfg.partitionCol)
      .format(cfg.format)
      .save(basePath)
  }

  /** The hash-bucket directory column hash-clustered [[writeFlat]]
    * staging writes under: `_graft_bucket=K/…`. The bucket id a file's
    * rows hash to is encoded in its PATH — ground truth for the
    * manifest's per-file bucket label (storage-partitioned joins pair
    * partitions by it, so a wrong label is silently wrong data).
    * Deriving it from the write task id instead is NOT sound: when the
    * incoming frame is already hash-partitioned on the key (e.g. the
    * output of a DISTINCT), Catalyst elides the repartition exchange
    * and AQE may coalesce the surviving upstream shuffle — task ids
    * then stop being bucket ids. `partitionBy` splits rows by the
    * computed bucket VALUE regardless of task layout, so every file is
    * bucket-pure by construction.
    */
  val BucketDir = "_graft_bucket"

  /** Reserved TRANSIENT column for a derived range-cluster key
    * (z-order): present only between the cluster shuffle and the
    * save — never written to files, never part of a table schema.
    */
  val ClusterTmp = "_graft_zcluster"

  /** `pmod(murmur3, n)` — exactly `repartition(n, col)`'s partition id
    * ([[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning]]),
    * so co-bucketed tables agree with Spark's own `bucket(n, col)`
    * storage-partitioned-join transform.
    */
  def bucketExpr(c: String, n: Int): Column = pmod(hash(col(c)), lit(n))

  /** Same clustering (partition-value co-location, key order, size
    * bound) as [[write]], but the table columns stay FLAT in the data
    * files: the only directory level is the [[BucketDir]] hash bucket
    * (dropped from file contents by `partitionBy`), which records each
    * file's bucket in its path. Manifest-tracked tables
    * ([[graft.lake.LakeTable]]) follow the Iceberg model — partition
    * structure is table METADATA; readers get explicit file paths and
    * never list directories.
    *
    * `rangeCluster = true` switches the shuffle to RANGE partitioning
    * on the key (sampled bounds) + key sort, producing GLOBALLY
    * key-ordered files whose per-file key extents are disjoint and
    * tight — the rewrite shape of OPTIMIZE/ZORDER maintenance jobs.
    * A hash repartition would scatter each key range across every
    * task, giving every file near-full-span min/max stats and
    * defeating stats pruning.
    */
  def writeFlat(df: DataFrame, basePath: String, cfg: Config,
      rangeCluster: Boolean = false): Unit = {
    val parallelism = cfg.parallelism
      .getOrElse(df.sparkSession.sessionState.conf.numShufflePartitions)
    if (rangeCluster) {
      val clustered = df.repartitionByRange(parallelism, col(cfg.keyCol))
        .sortWithinPartitions(col(cfg.keyCol))
      // a DERIVED cluster key (z-order) is transport, not data: the
      // projection drops it after the shuffle+sort, so files carry
      // only table columns while keeping the clustered row order
      (if (cfg.keyCol == BlockWriter.ClusterTmp)
        clustered.drop(BlockWriter.ClusterTmp) else clustered)
        .write
        .mode("errorifexists")
        .option("maxRecordsPerFile", cfg.maxRecordsPerFile.toLong)
        .option("compression", cfg.compression)
        .format(cfg.format)
        .save(basePath)
    }
    else
      df.withColumn(BucketDir, bucketExpr(cfg.partitionCol, parallelism))
        .repartition(parallelism, col(cfg.partitionCol))
        // bucket dir leads the sort so the file writer sees its
        // required partition-column ordering already satisfied and
        // preserves the (partition, key) order inside every file
        .sortWithinPartitions(col(BucketDir), col(cfg.partitionCol), col(cfg.keyCol))
        .write
        .mode("errorifexists")
        .option("maxRecordsPerFile", cfg.maxRecordsPerFile.toLong)
        .option("compression", cfg.compression)
        .partitionBy(BucketDir)
        .format(cfg.format)
        .save(basePath)
  }
}
