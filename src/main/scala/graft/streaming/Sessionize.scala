package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization, two ways:
  *
  *  1. [[sessions]] — Spark's native `session_window` (batch AND
  *     streaming): merging gap-windows is a first-class Catalyst
  *     operator, so prefer it (Spark-first) — it shuffles once on the
  *     user key and AQE-handles skew.
  *  2. [[sessionsCustomState]] — `flatMapGroupsWithState`, the
  *     custom-state escape hatch for session semantics the built-in
  *     operator can't express (e.g. per-session caps, inactivity
  *     rules varying by user). In batch it drains each key once; in
  *     streaming the same function runs incrementally with state.
  */
object Sessionize {

  /** Per-user gap sessions: (user_id, start_us, end_us, n_events,
    * sum_value). `end_us` is session_window's end = last event + gap.
    */
  def sessions(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("start_us"),
        unix_micros(col("sw.end")).as("end_us"),
        col("n_events"), col("sum_value"))

  final case class Ev(user_id: Long, ts_us: Long, value: Double)
  final case class Sess(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long, sum_value: Double)

  implicit val evEnc: Encoder[Ev] = Encoders.product[Ev]
  implicit val sessEnc: Encoder[Sess] = Encoders.product[Sess]
  implicit val longEnc: Encoder[Long] = Encoders.scalaLong
  implicit val stateEnc: Encoder[List[Ev]] = Encoders.kryo[List[Ev]]

  /** Streaming-incremental custom-state sessionizer: the open tail
    * session lives in `GroupState` across micro-batches; a session
    * emits exactly once — either when a later event overshoots the
    * gap, or when the event-time watermark passes its end
    * (EventTimeTimeout flush, the state-eviction path). Append-mode
    * output. The input stream must carry `withWatermark` upstream.
    * [[sessionsCustomState]] remains the batch drainer — batch
    * execution has no watermark to flush tail sessions with.
    */
  def sessionsStreaming(events: Dataset[Ev], gapUs: Long): Dataset[Sess] =
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Ev], Sess](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[List[Ev]]) =>
          def r2(x: Double): Double =
            BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
          def toSess(es: List[Ev]): Sess =
            Sess(uid, es.head.ts_us, es.last.ts_us + gapUs,
              es.size.toLong, r2(es.map(_.value).sum))
          val pending = if (state.exists) state.get else Nil
          if (state.hasTimedOut) {
            // watermark passed pending.last + gap: the session can no
            // longer grow — flush it and drop the state row.
            state.remove()
            if (pending.nonEmpty) Iterator.single(toSess(pending)) else Iterator.empty
          } else {
            val all = (pending ++ evs).sortBy(_.ts_us)
            val closed = scala.collection.mutable.ListBuffer[List[Ev]]()
            var cur = List.empty[Ev]
            all.foreach { e =>
              if (cur.nonEmpty && e.ts_us - cur.last.ts_us > gapUs) {
                closed += cur
                cur = Nil
              }
              cur = cur :+ e
            }
            if (cur.nonEmpty) {
              state.update(cur)
              // round the µs→ms conversion UP: a floor-truncated
              // timeout can fire ~2 ms before last+gap, flushing the
              // session early and splitting an event at exactly
              // last+gap (which the `> gapUs` test keeps in-session)
              // into a spurious new session.
              state.setTimeoutTimestamp((cur.last.ts_us + gapUs + 999L) / 1000L)
            } else state.remove()
            closed.iterator.map(toSess)
          }
      }

  /** Custom-state sessionizer over a typed Dataset. In batch mode
    * each key's iterator is complete, so all sessions emit in one
    * call; end_us matches session_window (last event + gap).
    */
  def sessionsCustomState(events: Dataset[Ev], gapUs: Long): Dataset[Sess] =
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Ev], Sess](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[List[Ev]]) =>
          def r2(x: Double): Double = // same HALF_UP as Spark's round()
            BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
          val sorted = evs.toIndexedSeq.sortBy(_.ts_us)
          val out = scala.collection.mutable.ListBuffer[Sess]()
          var start = -1L; var last = -1L; var n = 0L; var sum = 0.0
          sorted.foreach { e =>
            if (start < 0) { start = e.ts_us; last = e.ts_us; n = 1; sum = e.value }
            else if (e.ts_us - last > gapUs) {
              out += Sess(uid, start, last + gapUs, n, r2(sum))
              start = e.ts_us; last = e.ts_us; n = 1; sum = e.value
            } else { last = e.ts_us; n += 1; sum += e.value }
          }
          if (start >= 0)
            out += Sess(uid, start, last + gapUs, n, r2(sum))
          out.iterator
      }
}
