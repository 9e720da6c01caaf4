package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType
import java.sql.Timestamp

/** Typed event row for the stateful API. */
final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Emitted closed session. */
final case class Session(user_id: Long, session_start: Timestamp,
    session_end: Timestamp, n_events: Long, sum_value: Double)

/** Session state buffer — primitive arrays keep the Encoder simple. */
final case class SessBuf(tsMs: Array[Long], vals: Array[Double])

/** Event-stream operators. Each transformation is written once against an
  * unbounded-friendly shape (time windows, watermark-compatible aggregations)
  * and applied identically to a batch DataFrame or a readStream DataFrame —
  * the batch run is also the oracle-checkable form.
  */
object EventsOps {

  /** Tumbling-window counts and exact (decimal) sums per event type.
    * `exactDistinct` = false swaps count_distinct for approx_count_distinct —
    * required on the streaming path (Spark's streaming planner rejects exact
    * distinct aggregation) and the right trade at 100 TB anyway.
    */
  def tumblingStats(events: DataFrame, width: String,
      exactDistinct: Boolean = true): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        (if (exactDistinct) count_distinct(col("user_id"))
         else approx_count_distinct(col("user_id"))).as("n_users"),
        sum(col("value").cast(DecimalType(18, 2))).as("sum_value_dec"))
      .select(
        col("w.start").as("window_start"),
        col("event_type"),
        col("n_events"),
        col("n_users"),
        col("sum_value_dec").cast("double").as("sum_value"))

  /** Same aggregation with a watermark, for streaming use. */
  def tumblingStatsStreaming(events: DataFrame, width: String,
      watermark: String): DataFrame =
    tumblingStats(events.withWatermark("ts", watermark), width,
      exactDistinct = false)

  /** SLIDING-window counts/sums: each event lands in width/slide
    * overlapping windows (Spark's window() with a slide duration — a
    * Generate of the per-event window list, no extra shuffle beyond the
    * aggregation). Streaming-capable unchanged, like [[tumblingStats]].
    */
  def slidingStats(events: DataFrame, width: String, slide: String): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).as("sum_value_dec"))
      .select(
        col("w.start").as("window_start"),
        col("event_type"),
        col("n_events"),
        col("sum_value_dec").cast("double").as("sum_value"))

  /** Custom-state sessionization via flatMapGroupsWithState — the arbitrary-
    * state streaming surface (vs the declarative session_window in
    * [[sessionStats]]). Buffers per-user events in GroupState, closes and
    * emits a session once the event-time watermark has passed its end + gap
    * (so it can no longer grow), with an event-time timeout flushing idle
    * users. Input must carry a watermark on `ts`.
    */
  /** Timestamp ⇄ microseconds — the state buffer works in µs because the
    * events table carries µs precision; buffering getTime (ms) would
    * silently truncate session bounds (caught by the q54 oracle compare).
    */
  private def tsMicros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
  private def microsTs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  def statefulSessions(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMs * 1000L

    def toSessions(uid: Long, evs: List[(Long, Double)]): List[Session] = {
      val sorted = evs.sortBy(_._1)
      val groups = sorted.foldLeft(List.empty[List[(Long, Double)]]) {
        case (acc, e) => acc match {
          case cur :: rest if e._1 - cur.head._1 <= gapUs => (e :: cur) :: rest
          case _ => List(e) :: acc
        }
      }
      groups.reverse.map { g =>
        val s = g.reverse
        Session(uid, microsTs(s.head._1), microsTs(s.last._1),
          s.length.toLong,
          // exact 2-dp sum in cents, matching the decimal-sum convention
          s.map(e => math.round(e._2 * 100)).sum / 100.0)
      }
    }

    def fn(uid: Long, it: Iterator[Event],
        state: GroupState[SessBuf]): Iterator[Session] = {
      val buffered: List[(Long, Double)] = state.getOption
        .map(b => b.tsMs.zip(b.vals).toList).getOrElse(Nil)
      val all = buffered ++ it.map(e => (tsMicros(e.ts), e.value)).toList
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      if (all.isEmpty) { state.remove(); return Iterator.empty }
      val sessions = toSessions(uid, all)
      // a session is closed once the watermark passed end + gap
      val (closed, open) = sessions.partition(s =>
        tsMicros(s.session_end) + gapUs < wmUs)
      if (open.isEmpty) state.remove()
      else {
        // keep EVERY event of a still-open session (an old open session's
        // early events must survive until it closes), drop only events that
        // belong to just-closed sessions
        val minOpenStart = open.map(s => tsMicros(s.session_start)).min
        val keep = all.filter(_._1 >= minOpenStart)
        state.update(SessBuf(keep.map(_._1).toArray, keep.map(_._2).toArray))
        // earliest close time among open sessions — each timeout closes the
        // oldest session(s) and re-arms for the next (timeout API is ms;
        // round the µs close time UP so the timeout never fires early)
        val minCloseUs = open.map(s => tsMicros(s.session_end)).min + gapUs
        state.setTimeoutTimestamp(Math.floorDiv(minCloseUs, 1000L) + 2)
      }
      closed.iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Watermarked stream-stream interval join: each left event pairs with
    * right events of the same key whose timestamp falls in
    * [left.ts - before, left.ts + after]. The time bound plus both
    * watermarks lets Spark expire join state — mandatory for unbounded
    * inputs. Works identically on batch frames (the bound becomes a plain
    * range predicate).
    */
  /** `joinType` extends the inner form to the outer variants Spark's
    * symmetric join state supports ("leftOuter"/"rightOuter"/
    * "fullOuter"): a null-matched row is emitted only once the watermark
    * proves no future match can arrive — on a finite source the caller
    * must push the watermark past every left row's match window
    * (far-future sentinel rows, q65) or the unmatched rows stay in
    * state forever.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      before: String, after: String, watermark: String,
      joinType: String = "inner"): DataFrame = {
    val l = (if (left.isStreaming) left.withWatermark("ts", watermark) else left)
      .select(col(key), col("ts").as("l_ts"),
        col("event_id").as("l_event_id"), col("value").as("l_value"))
    val r = (if (right.isStreaming) right.withWatermark("ts", watermark) else right)
      .select(col(key).as("r_key"), col("ts").as("r_ts"),
        col("event_id").as("r_event_id"), col("value").as("r_value"))
    val joined = l.join(r,
      col(key) === col("r_key") &&
        col("r_ts") >= col("l_ts") - expr(s"INTERVAL $before") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $after"),
      joinType)
    // full outer: a right-unmatched row carries its key only in r_key —
    // surface it under the left name so the caller sees ONE key column
    if (joinType.toLowerCase.replace("_", "") == "fullouter")
      joined.withColumn(key, coalesce(col(key), col("r_key"))).drop("r_key")
    else joined.drop("r_key")
  }

  /** Streaming-safe exact dedup on an id column: with a watermark, state for
    * ids older than the delay is dropped automatically (bounded state at
    * unbounded input — the streaming counterpart of Dedup.exactGroups).
    * Works identically on batch frames (plain dropDuplicates).
    */
  def dedupEvents(events: DataFrame, idCols: Seq[String],
      watermark: Option[String] = None): DataFrame = {
    val base = watermark.fold(events)(events.withWatermark("ts", _))
    if (base.isStreaming && watermark.isDefined)
      base.dropDuplicatesWithinWatermark(idCols)
    else base.dropDuplicates(idCols)
  }

  /** Session windows per user (gap-based). Streaming-capable via
    * session_window; in batch it is the oracle for the streaming path.
    */
  def sessionStats(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).as("sum_value_dec"))
      .select(
        col("w.start").as("session_start"),
        col("w.end").as("session_end"),
        col("user_id"), col("n_events"),
        col("sum_value_dec").cast("double").as("sum_value"))
}
