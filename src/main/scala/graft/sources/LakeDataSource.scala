package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftshim.StreamShim
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import graft.lake.LakeTable

/** The lake's Spark DataSource registration — the standard front door
  * a reference user expects (they read the reference's tables with
  * `spark.read.format("iceberg")`; ours read with
  * `spark.read.format("graft-lake")`, see reference main.go:48-56 for
  * the table layout this serves).
  *
  * Batch: `spark.read.format("graft-lake").load(root)` resolves the
  * head manifest; `.option("snapshot", n)` time-travels, and
  * `.option("asOfTimestampMs", ts)` resolves AS OF TIMESTAMP. Filters
  * Catalyst pushes into [[LakeRelation.buildScan]] are translated to
  * manifest-stats pruning (integer/string min-max, bloom point
  * lookups) so a selective predicate plans a scan over only the
  * surviving files — the same metadata skip Iceberg does — while the
  * parquet reader below still gets the row-level pushdown.
  *
  * Streaming: `spark.readStream.format("graft-lake").load(root)`
  * tails the commit log. The offset IS the snapshot id: each
  * micro-batch reads exactly the data files appended by snapshots in
  * `(lastSeen, head]` via [[LakeTable.incrementalRead]] — no
  * directory listing, no re-read of older data — and the checkpoint
  * makes consumption exactly-once across restarts.
  */
class LakeSourceProvider extends RelationProvider
    with DataSourceRegister with StreamSourceProvider {

  override def shortName(): String = "graft-lake"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-lake: a path is required (.load(root))"))

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val root = rootOf(parameters)
    val asOf = parameters.get("snapshot").map(_.trim.toInt)
      .orElse(parameters.get("asOfTimestampMs").map(ts =>
        LakeTable.snapshotAsOfTime(root, ts.trim.toLong)))
    new LakeRelation(sqlContext, root, asOf)
  }

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(
      LakeTable.read(sqlContext.sparkSession, rootOf(parameters)).schema))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val root = rootOf(parameters)
    new LakeStreamSource(sqlContext.sparkSession, root,
      schema.getOrElse(LakeTable.read(sqlContext.sparkSession, root).schema))
  }
}

object LakeRelation {

  /** Translate Catalyst's pushed filters into the manifest-pruning
    * predicate maps of [[LakeTable.prunedRead]]:
    * integer range bounds, string range bounds, and bloom point
    * probes. Pruning only ever bounds IO — a conservative superset is
    * always safe (Spark re-applies every filter on the rows, see
    * [[LakeRelation.unhandledFilters]]) — so strict bounds relax to
    * inclusive ones and unsupported filters are simply not pruned on.
    */
  private[graft] def translateFilters(filters: Seq[Filter])
      : (Map[String, (Long, Long)], Map[String, (String, String)], Map[String, Seq[String]]) = {
    def num(v: Any): Option[Long] = v match {
      case n: Long => Some(n)
      case n: Int => Some(n.toLong)
      case n: Short => Some(n.toLong)
      case n: Byte => Some(n.toLong)
      case _ => None
    }
    def flat(f: Filter): Seq[Filter] = f match {
      case And(l, r) => flat(l) ++ flat(r)
      case other => Seq(other)
    }
    var intB = Map.empty[String, (Long, Long)]
    var strB = Map.empty[String, (String, String)]
    var points = Map.empty[String, Seq[String]]
    def boundInt(c: String, lo: Option[Long], hi: Option[Long]): Unit = {
      val (l0, h0) = intB.getOrElse(c, (Long.MinValue, Long.MaxValue))
      intB += c -> (lo.map(math.max(l0, _)).getOrElse(l0), hi.map(math.min(h0, _)).getOrElse(h0))
    }
    def boundStr(c: String, v: String): Unit = {
      // contradictory equalities on one column leave lo > hi, which
      // prunes every file AND filters every row -- exactly the
      // unsatisfiable conjunction's answer
      val (l0, h0) = strB.getOrElse(c, (v, v))
      strB += c -> (Ordering[String].max(l0, v), Ordering[String].min(h0, v))
    }
    filters.flatMap(flat).foreach {
      case EqualTo(a, v: String) =>
        boundStr(a, v)
        points += a -> (points.getOrElse(a, Nil) :+ v).distinct
      case EqualTo(a, v) => num(v).foreach(n => boundInt(a, Some(n), Some(n)))
      case GreaterThan(a, v) => num(v).foreach(n => boundInt(a, Some(n), None))
      case GreaterThanOrEqual(a, v) => num(v).foreach(n => boundInt(a, Some(n), None))
      case LessThan(a, v) => num(v).foreach(n => boundInt(a, None, Some(n)))
      case LessThanOrEqual(a, v) => num(v).foreach(n => boundInt(a, None, Some(n)))
      case In(a, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[String]) =>
        points += a -> vs.map(_.asInstanceOf[String]).toSeq.distinct
      case _ => () // unsupported shape: no pruning for it, never wrong
    }
    (intB, strB, points)
  }
}

class LakeRelation(override val sqlContext: SQLContext, root: String,
    asOf: Option[Int]) extends BaseRelation with PrunedFilteredScan {

  private def spark: SparkSession = sqlContext.sparkSession

  override val schema: StructType = LakeTable.read(spark, root, asOf).schema

  /** Every filter is re-applied by Spark above this scan: the
    * translation below is an IO bound (file skip), not an answer.
    */
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] = filters

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val (intPreds, strPreds, pointPreds) =
      LakeRelation.translateFilters(filters.toSeq)
    // only prune on columns the manifest actually tracks AND whose
    // row-filter re-application is type-sound (prunedRead also
    // filters rows; restricting to tracked columns keeps that exact)
    val tracked = LakeTable.manifest(root,
      asOf.getOrElse(LakeTable.currentSnapshot(root)))
      .files.headOption.map(_.stats.keySet).getOrElse(Set.empty)
    val (df, _, _) = LakeTable.prunedRead(spark, root,
      intPreds.filter(kv => tracked(kv._1)),
      strPreds.filter(kv => tracked(kv._1)),
      asOf,
      pointPreds.filter(kv => tracked(kv._1)))
    df.select(requiredColumns.map(col).toSeq: _*).rdd
  }
}

/** v1 streaming source over the lake commit log: offset = snapshot
  * id; batch (`from`, `to`] = the data files those commits appended.
  */
class LakeStreamSource(spark: SparkSession, root: String,
    override val schema: StructType) extends Source {

  private def snapOf(o: OffsetV1): Int = o match {
    case LongOffset(n) => n.toInt
    case s: SerializedOffset => s.json.trim.toInt
    case other => other.json.trim.toInt
  }

  override def getOffset: Option[OffsetV1] = {
    val head = LakeTable.currentSnapshot(root)
    if (head <= 0) None else Some(LongOffset(head.toLong))
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val from = start.map(snapOf).getOrElse(0)
    val to = snapOf(end)
    val cols = schema.fieldNames.map(col).toSeq
    val batch =
      if (from >= to)
        spark.createDataFrame(
          new java.util.ArrayList[Row](), schema)
      else
        LakeTable.incrementalRead(spark, root, from, to).select(cols: _*)
    StreamShim.asStreamingFrame(batch)
  }

  override def stop(): Unit = ()
}
