package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming extension over the `events` stream schema
  * (event_id, user_id, ts, event_type, value, props).
  *
  * The reference is batch-only (SURVEY.md §2.1 "not present"); this
  * module is the engine's streaming surface: the same transforms
  * declared once and runnable on either a static DataFrame or a
  * `readStream` source — Catalyst plans the incremental version with
  * watermark-based state eviction. Stateful per-key logic uses
  * `flatMapGroupsWithState`, the Spark-native analogue of a custom
  * stateful operator.
  */
object Streaming {

  /** event-time tumbling-window aggregate with a watermark — the
    * streaming form of rel.RelQueries q21_time_bucket. On a static
    * frame the watermark is a no-op and results equal the batch
    * query (asserted in StreamingSpec). */
  def windowedTypeCounts(events: DataFrame,
      window_ : String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")).cast("double") / 100.0)
          .as("sum_value"))
      .select(col("win.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** streaming exact dedup — the incremental form of d01: keep the
    * first occurrence of each content digest, with state bounded by
    * the watermark horizon (dropDuplicatesWithinWatermark keys state
    * on the digest only and evicts entries older than the watermark —
    * the 100 TB-stream shape: state size tracks the horizon's distinct
    * digests, never the full history). */
  def dedupStream(docs: DataFrame, textCol: String = "text",
      tsCol: String = "ts", watermark: String = "1 hour"): DataFrame = {
    val digested = docs.withColumn("digest", md5(col(textCol)))
    val deduped =
      if (docs.isStreaming)
        digested.withWatermark(tsCol, watermark)
          .dropDuplicatesWithinWatermark("digest")
      else
        // batch parity: dropDuplicatesWithinWatermark is
        // streaming-only (UnsupportedOperationChecker rejects it on a
        // static frame); the batch equivalent of "first occurrence per
        // digest" is a plain digest dedup
        digested.dropDuplicates("digest")
    deduped.drop("digest") // internal helper column, not caller schema
  }

  /** stream-stream attribution join: each purchase joined to the same
    * user's clicks within the preceding `horizon` — the streaming form
    * of the batch as-of join (rel q26), bounded so state can be
    * evicted. Both sides carry event-time watermarks and the join
    * condition is time-bounded, which is exactly what lets Spark drop
    * buffered rows once the watermark passes the horizon: state size
    * tracks the horizon, never the full history. (A streaming "latest
    * click only" would need a second stateful pass; the reference
    * attribution window emits every in-horizon click with its lag.) */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame,
      horizon: String = "1 hour", watermark: String = "2 hours"): DataFrame = {
    val c = clicks.select(col("user_id").as("c_user"),
        col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val p = purchases.select(col("user_id").as("p_user"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    p.join(c, expr(
      s"""p_user = c_user AND
         |click_ts <= purchase_ts AND
         |click_ts >= purchase_ts - INTERVAL $horizon""".stripMargin))
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("purchase_ts"), col("click_id"), col("click_ts"))
  }

  // ---- stateful: per-user running statistics ----------------------------

  case class EventRow(event_id: Long, user_id: Long, ts: Timestamp,
      event_type: String, value: Double)

  /** boundary conversion from the raw (nullable) events schema:
    * EventRow's primitive fields would NPE on NULL user_id/value
    * during deserialization, so nulls are filtered here — the same
    * exclusion q26's as-of join applies. */
  def eventRows(df: DataFrame): Dataset[EventRow] = {
    import org.apache.spark.sql.functions.col
    implicit val enc = Encoders.product[EventRow]
    df.filter(col("user_id").isNotNull && col("value").isNotNull &&
        col("ts").isNotNull)
      .select("event_id", "user_id", "ts", "event_type", "value")
      .as[EventRow]
  }
  case class UserState(n: Long, sum: Double, max: Double)
  case class UserUpdate(user_id: Long, n: Long, sum: Double, max: Double)

  /** per-user running stats via flatMapGroupsWithState: the custom
    * keyed-state pattern (mapGroupsWithState family). Emits one update
    * row per key per micro-batch. State is WATERMARK-BOUNDED: a user
    * idle past `idleHorizon` of event time is evicted (EventTime
    * timeout), so state tracks the active-user set, not every user
    * ever seen — the 100 TB-stream posture of this module. */
  def runningUserStats(events: Dataset[EventRow],
      idleHorizon: String = "24 hours"): Dataset[UserUpdate] = {
    implicit val stateEnc = Encoders.product[UserState]
    implicit val outEnc = Encoders.product[UserUpdate]
    implicit val keyEnc = Encoders.scalaLong
    implicit val rowEnc = Encoders.product[EventRow]
    val horizonMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String
        .fromString(idleHorizon)) match {
      case iv => iv.days.toLong * 86400000L + iv.microseconds / 1000L
    }
    events.toDF()
      .withWatermark("ts", idleHorizon)
      .as[EventRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserState, UserUpdate](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[EventRow], state: GroupState[UserState]) =>
          if (state.hasTimedOut) {
            state.remove() // idle past the horizon: evict
            Iterator.empty
          } else {
            var s = state.getOption.getOrElse(UserState(0L, 0.0, Double.MinValue))
            var touched = false
            var maxTs = Long.MinValue
            rows.foreach { r =>
              s = UserState(s.n + 1, s.sum + r.value, math.max(s.max, r.value))
              touched = true
              if (r.ts.getTime > maxTs) maxTs = r.ts.getTime
            }
            if (touched) {
              state.update(s)
              state.setTimeoutTimestamp(maxTs + horizonMs)
              Iterator.single(UserUpdate(user, s.n, s.sum, s.max))
            } else Iterator.empty
          }
      }
  }

  /** event-time sessionization: a user's events group into sessions
    * closed after `gapMs` of event-time silence, enforced by the
    * watermark (EventTimeTimeout) — the canonical
    * flatMapGroupsWithState pattern. The caller must put a watermark
    * on `ts` before grouping (done here). */
  case class SessionState(start: Long, end: Long, n: Long)
  case class SessionOut(user_id: Long, start: Long, end: Long, n: Long, closed: Boolean)

  def sessionize(events: Dataset[EventRow], gapMs: Long,
      watermark: String = "10 seconds"): Dataset[SessionOut] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val keyEnc = Encoders.scalaLong
    implicit val rowEnc = Encoders.product[EventRow]
    events
      .withWatermark("ts", watermark)
      .as[EventRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[EventRow], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user, s.start, s.end, s.n, closed = true))
          } else {
            val times = rows.map(_.ts.getTime).toArray.sorted
            if (times.isEmpty) Iterator.empty
            else {
              // fold the (state ++ sorted batch) into gap-delimited
              // sessions: a new event farther than gapMs past the
              // current session end STARTS A NEW SESSION and closes
              // the old one — the timeout only covers silence with no
              // later data, it cannot split within the data path
              var sessions = scala.collection.mutable.ArrayBuffer.empty[SessionState]
              state.getOption.foreach(sessions += _)
              times.foreach { t =>
                if (sessions.nonEmpty && t <= sessions.last.end + gapMs) {
                  val cur = sessions.last
                  sessions(sessions.length - 1) = SessionState(
                    math.min(cur.start, t), math.max(cur.end, t), cur.n + 1)
                } else sessions += SessionState(t, t, 1L)
              }
              val closed = sessions.init.map(cs =>
                SessionOut(user, cs.start, cs.end, cs.n, closed = true))
              val open = sessions.last
              state.update(open)
              // close when the watermark passes the session end + gap
              state.setTimeoutTimestamp(open.end + gapMs)
              (closed :+ SessionOut(user, open.start, open.end, open.n,
                closed = false)).iterator
            }
          }
      }
  }
}
