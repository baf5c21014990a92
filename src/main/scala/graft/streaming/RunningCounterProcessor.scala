package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._

object RunningCounter {
  /** One purchase event; tsMicros precomputed stream-side so every epoch/day
    * derivation inside the processor is integer division on the same value
    * the oracle sees (`epoch_us(ts)`). */
  final case class Tick(userId: Long, tsMicros: Long)

  /** One emission per (user, replay batch): the batch's row count plus the
    * running totals AFTER folding the batch into state. Field names are the
    * catalog output columns (the Dataset lifts them into the schema). */
  final case class Emit(user_id: Long, ep: Long, n_in_batch: Long,
                        cum_after: Long, days_so_far: Long)
}

/** The fourth stateful-API generation (`transformWithState`,
  * Spark 4.x / SPARK-46815) exercised with typed state variables: a
  * per-user running purchase counter (ValueState) plus a distinct-day
  * registry (MapState + ValueState count). Each micro-batch emits one row
  * per active user carrying the post-batch running totals, so the sink
  * holds the full emission history — which is what makes the operator
  * ORACLE-checkable: the history is pure integer arithmetic over the
  * replay partition (see `w_transform_state_replay`).
  *
  * State discipline at scale: the per-key state is O(distinct days), the
  * emissions are O(active keys per batch), and no timer/TTL is registered
  * (TimeMode.None) — the replay proves exactly the state-propagation
  * semantics, nothing clock-dependent. The epoch invariant (a replay batch
  * never spans 8-day epochs) is asserted, not assumed.
  */
class RunningCounterProcessor
    extends StatefulProcessor[Long, RunningCounter.Tick, RunningCounter.Emit] {
  import RunningCounter._

  @transient private var cum: ValueState[Long] = _
  @transient private var dayCount: ValueState[Long] = _
  @transient private var seenDays: MapState[Long, Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    cum = getHandle.getValueState("cum", Encoders.scalaLong, TTLConfig.NONE)
    dayCount = getHandle.getValueState("dayCount", Encoders.scalaLong, TTLConfig.NONE)
    seenDays = getHandle.getMapState("seenDays",
      Encoders.scalaLong, Encoders.scalaBoolean, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[Tick],
                               timerValues: TimerValues): Iterator[Emit] = {
    var n = 0L
    var epMin = Long.MaxValue
    var epMax = Long.MinValue
    val batchDays = scala.collection.mutable.LinkedHashSet.empty[Long]
    rows.foreach { t =>
      n += 1
      val ep = t.tsMicros / 691200000000L // 8-day epoch, matches the replay batching
      if (ep < epMin) epMin = ep
      if (ep > epMax) epMax = ep
      batchDays += t.tsMicros / 86400000000L
    }
    require(epMin == epMax,
      s"replay invariant broken: one micro-batch spans epochs $epMin..$epMax for user $key")
    var newDays = 0L
    batchDays.foreach { d =>
      if (!seenDays.containsKey(d)) { seenDays.updateValue(d, true); newDays += 1 }
    }
    val c = (if (cum.exists()) cum.get() else 0L) + n
    cum.update(c)
    val dc = (if (dayCount.exists()) dayCount.get() else 0L) + newDays
    dayCount.update(dc)
    Iterator.single(Emit(key, epMin, n, c, dc))
  }
}
