package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Structured Streaming twins of the G-row batch operators
  * (graft.ops.StreamBatchOps). Each transform takes any events-shaped
  * DataFrame — batch or streaming — so StreamParitySpec can run the SAME
  * code over a MemoryStream and over the batch table and assert equal
  * results (stream-batch parity, SURVEY.md §5.4).
  *
  * State/scale notes: every stateful op carries a watermark so state is
  * bounded (old windows/sessions/dedup keys are evicted once the
  * watermark passes); at 100 TB-equivalent event rates the state store
  * is keyed by (window|session|dedup-key) per shuffle partition, the
  * standard Structured Streaming layout.
  */
object Streams {

  /** canonical event-time column for an events-shaped frame. */
  private def withTime(df: DataFrame): DataFrame =
    df.withColumn("ts_t", timestamp_micros(col("ts_us")))

  /** 1-hour tumbling counts per event type (g_tumbling_1h twin). */
  def tumbling1h(events: DataFrame): DataFrame =
    withTime(events)
      .withWatermark("ts_t", "1 hour")
      .groupBy(window(col("ts_t"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("w.start")).as("win_us"), col("event_type"), col("n"))

  /** sliding 1h/15m counts (g_sliding_1h_15m twin). */
  def sliding1h15m(events: DataFrame): DataFrame =
    withTime(events)
      .withWatermark("ts_t", "1 hour")
      .groupBy(window(col("ts_t"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("w.start")).as("win_us"), col("n"))

  /** session_window with 30-min gap (g_session_30m twin — the batch side
    * derives sessions via lag+cumsum; the two must agree on counts,
    * bounds, and membership). */
  def session30m(events: DataFrame): DataFrame =
    withTime(events)
      .withWatermark("ts_t", "2 hours")
      .groupBy(session_window(col("ts_t"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("sess_start_us"),
        max(col("ts_us")).as("sess_end_us"))
      .select(col("user_id"), col("n_events"), col("sess_start_us"), col("sess_end_us"))

  /** 1-hour OHLC bars per event type (g_ohlc twin). The batch side
    * derives open/close via asc/desc row_number windows; streaming
    * windows can't sort inside a group, so the twin uses min_by/max_by
    * over the (ts_us, event_id) ordering struct — same tie-break, same
    * bars. Watermarked tumbling window: state is one bar per
    * (type, hour), emitted complete when the watermark passes. */
  def ohlc1h(events: DataFrame): DataFrame =
    withTime(events)
      .withWatermark("ts_t", "1 hour")
      .groupBy(window(col("ts_t"), "1 hour").as("w"), col("event_type"))
      .agg(min_by(col("value"), struct(col("ts_us"), col("event_id"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts_us"), col("event_id"))).as("close"),
        count(lit(1)).as("n_ticks"))
      .select(col("event_type"), unix_micros(col("w.start")).as("hour_us"),
        col("open"), col("high"), col("low"), col("close"), col("n_ticks"))

  /** streaming dedup on (user_id, event_type) within the watermark
    * (g_stream_dedup twin; batch twin keeps the earliest by ts). */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    withTime(events)
      .withWatermark("ts_t", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts_us"))

  /** Streaming ingest filter (h_incremental_dedup's exact tier as a
    * live pipeline): documents stream in, anything whose normalized
    * content digest already exists in the static history index is
    * dropped (left_anti stream-static join — broadcast at dim scale,
    * shuffled hash lookup at 100 TB), then the stream dedups against
    * itself on the digest (state-store keyed by digest; production
    * bounds it with dropDuplicatesWithinWatermark once docs carry an
    * ingest time). Identical code runs on a batch frame — the parity
    * test's oracle.
    */
  def ingestFilter(docs: DataFrame, historyDigests: DataFrame): DataFrame =
    docs.withColumn("eh", sha2(trim(lower(col("text"))), 256))
      .join(historyDigests, Seq("eh"), "left_anti")
      .dropDuplicates("eh")
      .select(col("doc_id"), col("lang"), col("eh"))

  /** stream-static enrichment against the nation dim
    * (g_stream_static_join twin). */
  def staticEnrich(events: DataFrame, nation: DataFrame): DataFrame =
    withTime(events)
      .withColumn("n_key", (col("user_id") % 25).cast("int"))
      .join(broadcast(nation), col("n_key") === col("n_nationkey"))
      .select(col("event_id"), col("user_id"), col("n_name"), col("value"))

  /** Stream-stream inner join: each purchase joined to clicks of the
    * same user within the preceding hour. Both sides carry watermarks so
    * the join state is bounded — rows older than (watermark − bound) are
    * evicted; this is THE pattern for correlating two live streams at
    * scale without unbounded state. Works identically on batch frames
    * (the parity test's oracle).
    */
  def purchaseClickJoin(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = withTime(purchases)
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts_us").as("p_us"), col("ts_t").as("p_t"))
      .withWatermark("p_t", "30 minutes")
    val c = withTime(clicks)
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts_us").as("c_us"), col("ts_t").as("c_t"))
      .withWatermark("c_t", "30 minutes")
    p.join(c, expr(
      """p_user = c_user AND
        |c_t BETWEEN p_t - INTERVAL 1 HOUR AND p_t""".stripMargin))
      .select(col("p_id"), col("c_id"), col("p_us"), col("c_us"))
  }

  /** Stream-stream LEFT OUTER time-bounded join: like
    * [[purchaseClickJoin]], but purchases with no click in the
    * preceding hour still emit (null click columns) — and in streaming
    * they emit only once the watermark has passed the end of their join
    * window, proving the row can never match. This is the semantics
    * corner outer stream joins exist for: the null-matched row is a
    * STATEMENT about completed time, not about data seen so far. Same
    * code runs on batch frames as the parity oracle.
    */
  def purchaseClickLeftOuter(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = withTime(purchases)
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts_us").as("p_us"), col("ts_t").as("p_t"))
      .withWatermark("p_t", "30 minutes")
    val c = withTime(clicks)
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts_us").as("c_us"), col("ts_t").as("c_t"))
      .withWatermark("c_t", "30 minutes")
    p.join(c, expr(
      """p_user = c_user AND
        |c_t BETWEEN p_t - INTERVAL 1 HOUR AND p_t""".stripMargin),
      "left_outer")
      .select(col("p_id"), col("c_id"), col("p_us"), col("c_us"))
  }

  /** Stream-stream RIGHT OUTER time-bounded join: the click-preserving
    * mirror of [[purchaseClickLeftOuter]] — every CLICK emits, matched
    * to same-user purchases in the hour after it or null-padded once
    * the watermark has passed the end of its candidate-purchase window
    * [c_t, c_t + 1h]. Kept as a genuine `right_outer` join (purchases
    * still the left input) so the engine's right-outer state-eviction
    * path is what runs, not a relabeled left join. Same code runs on
    * batch frames as the parity oracle.
    */
  def purchaseClickRightOuter(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = withTime(purchases)
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts_us").as("p_us"), col("ts_t").as("p_t"))
      .withWatermark("p_t", "30 minutes")
    val c = withTime(clicks)
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts_us").as("c_us"), col("ts_t").as("c_t"))
      .withWatermark("c_t", "30 minutes")
    p.join(c, expr(
      """p_user = c_user AND
        |c_t BETWEEN p_t - INTERVAL 1 HOUR AND p_t""".stripMargin),
      "right_outer")
      .select(col("p_id"), col("c_id"), col("p_us"), col("c_us"))
  }

  /** Stream-stream FULL OUTER time-bounded join: the symmetric closure
    * of [[purchaseClickLeftOuter]] — unmatched PURCHASES and unmatched
    * CLICKS both emit null-padded rows, each only once the watermark
    * has passed the end of its own join window (a click's window is
    * [c_t, c_t + 1h] of candidate purchases; a purchase's is
    * [p_t − 1h, p_t] of candidate clicks). State on both sides is
    * evicted on the same watermark, so the join stays bounded at any
    * stream rate. Same code runs on batch frames as the parity oracle.
    */
  def purchaseClickFullOuter(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = withTime(purchases)
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts_us").as("p_us"), col("ts_t").as("p_t"))
      .withWatermark("p_t", "30 minutes")
    val c = withTime(clicks)
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts_us").as("c_us"), col("ts_t").as("c_t"))
      .withWatermark("c_t", "30 minutes")
    p.join(c, expr(
      """p_user = c_user AND
        |c_t BETWEEN p_t - INTERVAL 1 HOUR AND p_t""".stripMargin),
      "full_outer")
      .select(col("p_id"), col("c_id"), col("p_us"), col("c_us"))
  }

  /** Stream-stream LEFT SEMI time-bounded join: clicks that convert —
    * each click emits AT MOST ONCE, as soon as one same-user purchase
    * arrives inside its following hour; clicks with no such purchase
    * never emit. Semi is the cheapest stream-join mode: the state holds
    * no match payload (a click retires on first match or on watermark
    * passing its window end), and output volume is bounded by the click
    * stream regardless of purchase fanout. Same code runs on batch
    * frames as the parity oracle (g_click_purchase_semi's shape).
    */
  def clickPurchaseSemi(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = withTime(clicks)
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts_us").as("c_us"), col("ts_t").as("c_t"))
      .withWatermark("c_t", "30 minutes")
    val p = withTime(purchases)
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts_us").as("p_us"), col("ts_t").as("p_t"))
      .withWatermark("p_t", "30 minutes")
    c.join(p, expr(
      """c_user = p_user AND
        |p_t BETWEEN c_t AND c_t + INTERVAL 1 HOUR""".stripMargin),
      "left_semi")
      .select(col("c_id"), col("c_user"), col("c_us"))
  }

  // ---- arbitrary stateful processing -------------------------------

  case class Ev(event_id: Long, ts_us: Long, user_id: Long, event_type: String, value: Double)
  case class UserCount(user_id: Long, n: Long)

  /** flatMapGroupsWithState: running per-user event counter, emitting an
    * update per micro-batch input (OutputMode.Update). The final emitted
    * count per user must equal the batch groupBy count — asserted in
    * StatefulSpec. */
  def runningUserCounts(events: Dataset[Ev]): Dataset[UserCount] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, UserCount](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[Ev], state: GroupState[Long]) =>
          val prev = state.getOption.getOrElse(0L)
          val next = prev + rows.size
          state.update(next)
          Iterator(UserCount(user, next))
      }
  }

  case class UserActivity(user_id: Long, n: Long, min_value: Double,
      max_value: Double, last_ts_us: Long)

  /** Spark 4's `transformWithState` — the successor API to
    * flatMapGroupsWithState: typed per-key state VARIABLES
    * (ValueState/ListState/MapState, optional TTL, timers) managed by
    * the state-store layer instead of one opaque blob per key. This
    * processor keeps a per-user running activity summary in a single
    * ValueState and emits the updated row per input batch — the TWS
    * twin of [[runningUserCounts]], tracking only order-independent
    * quantities (count, min/max value, max event time) so the final
    * per-user row is batch-split-invariant (asserted in StatefulSpec).
    * transformWithState REQUIRES the RocksDB state-store provider —
    * the bounded-memory production configuration — which the spec
    * pins explicitly.
    */
  class UserActivityProcessor extends StatefulProcessor[Long, Ev, UserActivity] {
    @transient private var state: ValueState[UserActivity] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserActivity]("activity",
        org.apache.spark.sql.Encoders.product[UserActivity], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[UserActivity] = {
      val prev = if (state.exists()) state.get()
        else UserActivity(key, 0L, Double.PositiveInfinity,
          Double.NegativeInfinity, Long.MinValue)
      val next = rows.foldLeft(prev) { (a, e) =>
        UserActivity(key, a.n + 1, math.min(a.min_value, e.value),
          math.max(a.max_value, e.value), math.max(a.last_ts_us, e.ts_us))
      }
      state.update(next)
      Iterator.single(next)
    }
  }

  def userActivityTws(events: Dataset[Ev]): Dataset[UserActivity] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new UserActivityProcessor,
        TimeMode.None(), OutputMode.Update(),
        implicitly[org.apache.spark.sql.Encoder[UserActivity]])
  }

  case class SessState(start_us: Long, last_us: Long, n: Long)
  case class SessionOut(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  /** transformWithState with EVENT-TIME TIMERS — the capability that
    * separates TWS from flatMapGroupsWithState's single timeout:
    * explicit per-key timers managed against the watermark. 30-minute
    * gap sessionization: intra-batch gaps close sessions immediately;
    * the open session registers a timer at (last event + gap), and
    * when the WATERMARK passes it, handleExpiredTimer emits the closed
    * session and clears state — the session closes because event time
    * PROVED no extension can arrive, not because a batch happened to
    * end. Events within a batch are sorted per key (micro-batch-
    * bounded buffer); cross-batch late data is handled by the
    * watermark, same contract as session_window. */
  class SessionTimerProcessor extends StatefulProcessor[Long, Ev, SessionOut] {
    private val gapUs = 30L * 60 * 1000000
    @transient private var sess: ValueState[SessState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState[SessState]("sess",
        org.apache.spark.sql.Encoders.product[SessState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[SessionOut] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
      var cur = if (sess.exists()) Some(sess.get()) else None
      sorted.foreach { e =>
        cur match {
          case Some(c) if e.ts_us - c.last_us <= gapUs =>
            cur = Some(SessState(c.start_us, e.ts_us, c.n + 1))
          case Some(c) =>
            out += SessionOut(key, c.start_us, c.last_us, c.n)
            cur = Some(SessState(e.ts_us, e.ts_us, 1))
          case None =>
            cur = Some(SessState(e.ts_us, e.ts_us, 1))
        }
      }
      cur.foreach { c =>
        sess.update(c)
        // one live timer per key: re-arm at the open session's close time
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        getHandle.registerTimer((c.last_us + gapUs) / 1000)
      }
      out.iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[SessionOut] = {
      if (sess.exists()) {
        val c = sess.get()
        sess.clear()
        Iterator.single(SessionOut(key, c.start_us, c.last_us, c.n))
      } else Iterator.empty
    }
  }

  def sessionizeTws(events: Dataset[Ev]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
      .withWatermark("ts_t", "0 seconds")
      .as[Ev]
      .groupByKey(_.user_id)
      .transformWithState(new SessionTimerProcessor,
        TimeMode.EventTime(), OutputMode.Append(),
        implicitly[org.apache.spark.sql.Encoder[SessionOut]])
  }

  case class EwmaOut(user_id: Long, event_id: Long, ts_us: Long, ewma: Double)

  /** Stateful streaming EWMA (g_ewma twin): per user, the
    * exponentially-weighted moving average over the last 10 event
    * values, emitted per event. State = the (ts, id, value) history,
    * capped at 10 entries per user. Rows are event-time sorted within
    * each micro-batch; cross-batch late events would additionally need
    * a watermark-bounded reorder buffer (out of scope — the parity test
    * feeds time-ordered batches). The arithmetic — rational 7^k/10^k
    * weights, most-recent-first fixed fold, HALF_UP rounding at 1e-6 —
    * replicates the batch query bit-for-bit (asserted in StatefulSpec).
    */
  def ewmaPerUser(events: Dataset[Ev]): Dataset[EwmaOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[(Long, Long, Double)], EwmaOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[Ev], state: GroupState[List[(Long, Long, Double)]]) =>
          var hist = state.getOption.getOrElse(Nil) // most recent first
          val out = rows.toSeq.sortBy(e => (e.ts_us, e.event_id)).map { e =>
            hist = ((e.ts_us, e.event_id, e.value) :: hist).take(10)
            var num = 0.0
            var den = 0.0
            var k = 0
            hist.foreach { case (_, _, v) =>
              val w = math.pow(7, k) / math.pow(10, k)
              num += v * w
              den += w
              k += 1
            }
            val ewma = java.math.BigDecimal.valueOf(num / den)
              .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
            EwmaOut(user, e.event_id, e.ts_us, ewma)
          }
          state.update(hist)
          out.iterator
      }
  }

  case class Attr(user_id: Long, purch_id: Long, click_id: Long, lag_us: Long)

  /** Streaming last-touch attribution (g_attribution_last_touch twin):
    * one unioned click+purchase stream keyed by user; state is the
    * user's recent-click set, bounded to the 1-hour attribution window
    * behind the latest event time seen (the same state bound the
    * stream-stream join form gets from its watermark). Each purchase
    * emits at most one row — credited to the most recent in-window
    * click, ties to the higher click id (the batch query's exact total
    * order). Within a micro-batch rows process in event-time order with
    * clicks before purchases at equal timestamps, because the batch
    * join's window is c_ts <= p_ts INCLUSIVE; cross-batch late events
    * would additionally need a watermark-bounded reorder buffer (out of
    * scope — the parity test feeds time-ordered batches, the
    * ewmaPerUser contract).
    */
  def lastTouchAttribution(events: Dataset[Ev]): Dataset[Attr] = {
    import events.sparkSession.implicits._
    val win = 3600000000L
    events.filter(e => e.event_type == "click" || e.event_type == "purchase")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[(Long, Long)], Attr](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[Ev], state: GroupState[List[(Long, Long)]]) =>
          var clicks = state.getOption.getOrElse(Nil) // (ts_us, click_id)
          var maxTs = clicks.foldLeft(0L)((m, c) => math.max(m, c._1))
          val out = scala.collection.mutable.ListBuffer[Attr]()
          rows.toSeq
            .sortBy(e => (e.ts_us, if (e.event_type == "purchase") 1 else 0, e.event_id))
            .foreach { e =>
              if (e.event_type == "click") {
                clicks = (e.ts_us, e.event_id) :: clicks
              } else {
                val cand = clicks.filter(c => c._1 >= e.ts_us - win && c._1 <= e.ts_us)
                if (cand.nonEmpty) {
                  val best = cand.max // (ts, id) lexicographic = latest, then higher id
                  out += Attr(user, e.event_id, best._2, e.ts_us - best._1)
                }
              }
              maxTs = math.max(maxTs, e.ts_us)
            }
          clicks = clicks.filter(_._1 >= maxTs - win)
          state.update(clicks)
          out.iterator
      }
  }

  /** Typed multimodal "decode" over an opaque binary column: the
    * mapPartitions shape a real image/audio decoder plugs into (batch
    * per partition, library handle initialized once per partition — the
    * decoder itself is a deterministic stub here; the container has no
    * media libs). */
  case class Doc(doc_id: Long, lang: String, text: String)

  case class Media(doc_id: Long, media: Array[Byte])
  case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int, checksum: Long)

  def decodeMedia(media: Dataset[Media]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init of the (stubbed) decoder handle happens here
      it.map { m =>
        val n = m.media.length
        var ck = 0L
        var i = 0
        while (i < n) { ck = (ck * 131 + (m.media(i) & 0xff)) % 4294967296L; i += 1 }
        MediaMeta(m.doc_id, n, 32 + n % 608, 32 + (n * 7) % 608, ck)
      }
    }
  }
}
