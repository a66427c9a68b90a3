package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{Offset => V2Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.graftshim.StreamShim
import org.apache.spark.sql.types.StructType

import graft.lake.LakeTable

/** CDF stream offset: the committed snapshot id (same offset domain
  * as the append-tailing [[GraftOffset]] — the checkpoint stores the
  * id as its JSON form, so any offset range replays deterministically).
  */
final case class GraftCdfOffset(snap: Int) extends V1Offset {
  override def json(): String = snap.toString
}

/** Shared `Trigger.AvailableNow` pinning for the lake's two streaming
  * sources (the append-tailing DSv2 micro-batch stream and this v1
  * CDF source): `prepareForTriggerAvailableNow` captures the head at
  * query start, and every later latest-offset answer is capped there,
  * so a drain terminates even while writers keep committing.
  */
private[sources] trait AvailableNowCapped
    extends org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  /** The lake-table root whose commit log is being tailed. */
  protected def streamRoot: String

  @volatile private var availableNowCap: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(LakeTable.currentSnapshot(streamRoot))

  protected def cappedHead: Int = {
    val head = LakeTable.currentSnapshot(streamRoot)
    availableNowCap.fold(head)(math.min(head, _))
  }

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()
}

/** The CHANGE-DATA-FEED streaming source (v1 `Source` path — see
  * [[LakeSourceProvider.createSource]] for why the changelog rides v1:
  * a change feed emits attributed ROWS, and the v1 contract returns
  * one DataFrame per offset range with its distributed plan intact).
  *
  * Each micro-batch is `LakeTable.changelogRead(from, to]`: every
  * row-level change committed by snapshots in the range, tagged
  * `_change_type` ('insert' | 'delete') and `_change_snap`. Cost is
  * O(changed rows) for metadata-attributed commits (appends, MoR
  * deletes, delta UPDATEs/MERGEs); replace-type maintenance commits
  * diff adjacent snapshots and emit zero rows when content-preserving.
  *
  * Restart semantics: offsets are snapshot ids serialized to the
  * checkpoint, so a restarted query re-plans exactly the uncommitted
  * range (the offsets arrive back as `SerializedOffset`, hence the
  * json-parse rather than a class match). Every manifest in the
  * replayed range must still be live — snapshot expiry and CDF
  * retention interact exactly as in Delta/Iceberg.
  */
final class GraftCdfSource(spark: SparkSession, root: String,
    override val schema: StructType)
    extends Source with AvailableNowCapped {

  override protected def streamRoot: String = root

  // checkpoint-restored offsets arrive as SerializedOffset — parse
  // the JSON form, never pattern-match the class
  private def snapOf(o: V1Offset): Int = o.json().trim.toInt

  override def latestOffset(start: V2Offset, limit: ReadLimit): V2Offset = {
    val head = cappedHead
    if (head <= 0) null else GraftCdfOffset(head)
  }

  override def getOffset: Option[V1Offset] = {
    val head = cappedHead
    if (head <= 0) None else Some(GraftCdfOffset(head))
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val from = start.map(snapOf).getOrElse(0)
    val to = snapOf(end)
    // the changelog frame is a batch plan (parquet pushdown, codegen,
    // broadcast sizing all intact); MicroBatchExecution requires the
    // returned frame tagged isStreaming — re-wrap via the shim
    StreamShim.asStreamingFrame(
      LakeTable.changelogRead(spark, root, from, to))
  }

  override def stop(): Unit = ()
}
