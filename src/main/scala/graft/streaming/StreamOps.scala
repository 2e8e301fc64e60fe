package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming operators over the events stream (SURVEY.md §2.6
  * streaming rows): tumbling/sliding/session windows with watermarks,
  * late-data drop, stateful dedup. Batch equivalents (used by the oracle
  * harness) live in graft.ops.EventOps; these are the readStream forms.
  *
  * The events source carries nanosecond timestamps; the streaming schema
  * reads them as long nanos and converts to a TimestampType event-time
  * column before watermarking (Spark state/watermark needs TimestampType).
  */
object StreamOps {

  /** Streaming read of an events directory with a proper event-time col.
    *
    * A stream needs a declared schema before the first micro-batch, but
    * the harness has shipped events.ts as both TIMESTAMP(NANOS) (read as
    * long under the legacy conf) and TIMESTAMP(MICROS) — so the schema is
    * sniffed once from the static file footer (a metadata-only read) and
    * `ts` is normalized to int64 nanos exactly as Tables.events does for
    * the batch path. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val fileSchema = spark.read
      .option("pathGlobFilter", "events.parquet").parquet(dir).schema
    spark.readStream
      .schema(fileSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", graft.Tables.tsAsNanos(fileSchema("ts").dataType))
      .withColumn("ts_utc", timestamp_micros(expr("ts DIV 1000")))
  }

  /** File-source stream over the documents table — the ingest-directory
    * shape for arriving text batches (schema sniffed from the static
    * footer, as [[readEvents]] does for events). */
  def readDocuments(spark: SparkSession, dir: String): DataFrame = {
    val fileSchema = spark.read
      .option("pathGlobFilter", "documents.parquet").parquet(dir).schema
    spark.readStream
      .schema(fileSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
  }

  /** Tumbling 5-minute window counts with a 10-minute watermark (late
    * rows beyond the watermark are dropped from state). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts_utc", "10 minutes")
      .groupBy(window(col("ts_utc"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("v"))

  /** Sliding window (10 min window, 5 min slide). */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts_utc", "10 minutes")
      .groupBy(window(col("ts_utc"), "10 minutes", "5 minutes"),
        col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("user_id"), col("n"))

  /** Session windows per user with a 30-minute inactivity gap — the
    * streaming form of EventOps.q27Sessionize. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts_utc", "30 minutes")
      .groupBy(session_window(col("ts_utc"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events"))

  /** Session windows with the session start exposed (for the oracle
    * harness, which needs a session identity to compare against batch
    * sessionization). */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts_utc", "30 minutes")
      .groupBy(session_window(col("ts_utc"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("session_start"),
        col("n_events"))

  /** Stream-static enrichment: the event stream joined to a STATIC
    * dimension (customer → market segment) before windowed aggregation —
    * the canonical "enrich the firehose against the warehouse" shape.
    * The dimension is broadcast, so the join adds NO stream shuffle and
    * no state: each micro-batch map-side-probes the dim snapshot. At
    * 100 TB/day the dim refresh is a re-broadcast per restart (or a
    * ForeachBatch re-read); state stays bounded by the window watermark
    * exactly as in the un-enriched tumbling aggregate. */
  def staticEnrichedCounts(events: DataFrame, dim: DataFrame): DataFrame =
    events
      .join(broadcast(dim.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
      .withWatermark("ts_utc", "10 minutes")
      .groupBy(window(col("ts_utc"), "5 minutes"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      .select(col("window.start").as("window_start"), col("c_mktsegment"),
        col("n"), col("v"))

  /** Stateful dedup on (user_id, event_type) bounded by the watermark —
    * the streaming form of EventOps.q28EventDedup. */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts_utc", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Stateful dedup keyed on (user_id, event_type, 10-minute bucket),
    * emitting exactly the key columns. Key-only output keeps the result
    * deterministic under parallelism (whichever duplicate wins carries
    * identical output fields), which is what makes this oracle-checkable;
    * the state store still runs the real dropDuplicatesWithinWatermark
    * operator with watermark-bounded key expiry. */
  def dedupKeysWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts_utc", "1 hour")
      .withColumn("bucket_start",
        expr("(unix_timestamp(ts_utc) div 600) * 600"))
      .dropDuplicatesWithinWatermark("user_id", "event_type", "bucket_start")
      .select(col("user_id"), col("event_type"), col("bucket_start"))

  /** Per-user funnel event (input row of conversionFunnel). */
  case class FunnelEvent(user_id: Long, ts_us: Long, event_id: Long,
      event_type: String, value: Double)

  /** Input/state/output rows of the timer-based abandon detector. */
  case class AbandonEvent(user_id: Long, ts_us: Long, event_type: String)
  case class AbandonState(signupUs: Long, converted: Boolean, timerMs: Long)
  case class AbandonOut(user_id: Long, signup_us: Long, deadline_ms: Long)

  /** Purchase window after signup for the abandon detector (30 min). */
  val AbandonWindowMs: Long = 1800000L

  /** EVENT-TIME TIMERS through `transformWithState` — the state-API
    * surface the funnel operators don't touch: a user who signs up
    * registers a timer at signup + 30 min; a purchase INSIDE that
    * window marks the key converted; when the event-time watermark
    * passes an unconverted key's deadline, `handleExpiredTimer` fires
    * and emits the abandonment — the absence-of-an-event detection
    * that no join or aggregation can express (nothing arrives to
    * trigger output; only the timer does). State per key is three
    * scalars + one registered timer, both in the RocksDB store, so
    * abandoned-cart detection over 10⁹ users carries O(1) state each.
    * A re-signup earlier than the known one re-registers the timer
    * (deleteTimer + registerTimer — both API paths exercised). */
  class AbandonProcessor extends org.apache.spark.sql.streaming
      .StatefulProcessor[Long, AbandonEvent, AbandonOut] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
      TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var st: ValueState[AbandonState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[AbandonState]("abandon",
        org.apache.spark.sql.Encoders.product[AbandonState], TTLConfig.NONE)
    override def handleInputRows(uid: Long, it: Iterator[AbandonEvent],
        timers: TimerValues): Iterator[AbandonOut] = {
      var cur = if (st.exists()) st.get()
        else AbandonState(Long.MaxValue, converted = false, -1L)
      val evs = it.toVector
      // resolve the batch's earliest signup BEFORE scanning purchases,
      // so same-batch ordering cannot miss a conversion
      val minSignup = evs.iterator.filter(_.event_type == "signup")
        .map(_.ts_us).foldLeft(cur.signupUs)(math.min)
      if (minSignup < cur.signupUs) {
        if (cur.timerMs >= 0L) getHandle.deleteTimer(cur.timerMs)
        val deadline = minSignup / 1000L + AbandonWindowMs
        getHandle.registerTimer(deadline)
        cur = cur.copy(signupUs = minSignup, timerMs = deadline)
      }
      if (!cur.converted && cur.signupUs != Long.MaxValue) {
        val lim = cur.signupUs + AbandonWindowMs * 1000L
        if (evs.exists(e => e.event_type == "purchase" &&
            e.ts_us >= cur.signupUs && e.ts_us <= lim))
          cur = cur.copy(converted = true)
      }
      st.update(cur)
      Iterator.empty
    }
    override def handleExpiredTimer(uid: Long, timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[AbandonOut] = {
      val cur = st.get()
      if (cur != null && !cur.converted && cur.signupUs != Long.MaxValue &&
          info.getExpiryTimeInMs() == cur.timerMs)
        Iterator.single(AbandonOut(uid, cur.signupUs, cur.timerMs))
      else Iterator.empty
    }
  }

  /** Abandoned-funnel stream: signups with no purchase within 30 min,
    * emitted BY TIMER when the watermark passes the deadline. Deadlines
    * the final watermark never reaches stay pending (exactly the
    * streaming semantics — the oracle applies the same finalization
    * predicate, wm = max event-time ms − 10 min). */
  def abandonTimeouts(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events
      .withWatermark("ts_utc", "10 minutes")
      .select(col("user_id"), expr("ts DIV 1000").as("ts_us"),
        col("event_type"), col("ts_utc"))
      .as[AbandonEvent]
      .groupByKey(_.user_id)
      .transformWithState(new AbandonProcessor(), TimeMode.EventTime(),
        OutputMode.Append())
      .toDF()
  }

  /** Input/state/output rows of the processing-time idle-key flusher. */
  case class IdleEvent(user_id: Long, value: Double)
  case class IdleState(n: Long, cents: Long, timerMs: Long)
  case class IdleOut(user_id: Long, n_events: Long, cents: Long)

  /** PROCESSING-TIME TIMERS through `transformWithState` — the timer
    * mode q132's event-time timers leave untouched, and the only
    * correct tool for the idle-key flush: a key whose source goes
    * silent sees NO event to advance any watermark past it, but its
    * wall-clock timer fires regardless — the session-flush/cache-evict
    * primitive of a continuous deployment. Every input batch folds the
    * key's events into three scalars and re-arms a wall-clock timer
    * one tick past the batch's processing time (deleteTimer +
    * registerTimer); when a later batch's processing time passes the
    * deadline with no new events having re-armed it, the timer fires,
    * the accumulated totals flush, and the state CLEARS — idle keys
    * cost nothing after their flush, which is what lets 10⁹-key
    * deployments run this with bounded state. Totals accumulate as
    * floor(value·100) cents in int64 (the q67 discipline) so the
    * flushed output is exact and order-independent — wall-clock time
    * decides only WHEN a flush happens, never WHAT it contains (the
    * oracle-determinism line for a processing-time operator). */
  class IdleFlushProcessor extends org.apache.spark.sql.streaming
      .StatefulProcessor[Long, IdleEvent, IdleOut] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
      TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var st: ValueState[IdleState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[IdleState]("idle",
        org.apache.spark.sql.Encoders.product[IdleState], TTLConfig.NONE)
    override def handleInputRows(uid: Long, it: Iterator[IdleEvent],
        timers: TimerValues): Iterator[IdleOut] = {
      val cur = if (st.exists()) st.get() else IdleState(0L, 0L, -1L)
      var n = cur.n
      var cents = cur.cents
      it.foreach { e =>
        n += 1
        cents += math.floor(e.value * 100).toLong
      }
      if (cur.timerMs >= 0L) getHandle.deleteTimer(cur.timerMs)
      val deadline = timers.getCurrentProcessingTimeInMs() + 1L
      getHandle.registerTimer(deadline)
      st.update(IdleState(n, cents, deadline))
      Iterator.empty
    }
    override def handleExpiredTimer(uid: Long, timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[IdleOut] = {
      val cur = st.get()
      st.clear()
      if (cur != null && cur.n > 0L)
        Iterator.single(IdleOut(uid, cur.n, cur.cents))
      else Iterator.empty
    }
  }

  /** Idle-key flush stream over (user_id, value) rows. */
  def idleFlush(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events.as[IdleEvent]
      .groupByKey(_.user_id)
      .transformWithState(new IdleFlushProcessor(),
        TimeMode.ProcessingTime(), OutputMode.Append())
      .toDF()
  }

  /** Initial-state rows / state / output of the bootstrap processor. */
  case class BootInit(user_id: Long, n: Long, cents: Long)
  case class BootState(n: Long, cents: Long)
  case class BootOut(user_id: Long, n_events: Long, cents: Long)

  /** STATE BOOTSTRAP through `StatefulProcessorWithInitialState` — the
    * state-migration surface none of q67/q132/q150/q152/q159 touch:
    * a new streaming deployment rarely starts from zero; it inherits
    * per-key state computed in BATCH over the historical corpus (the
    * lambda-architecture cutover, or a reprocessing migration between
    * incompatible state schemas). `handleInitialState` seeds each
    * key's ValueState from the batch row BEFORE any stream input for
    * that key arrives; stream batches then fold on top, and every
    * key touched by the stream emits its RUNNING total (history +
    * stream) — so the drained output equals the batch aggregate over
    * the union, which is exactly the cutover-correctness claim this
    * operator exists to make testable. */
  class BootstrapProcessor extends org.apache.spark.sql.streaming
      .StatefulProcessorWithInitialState[Long, IdleEvent, BootOut,
        BootInit] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode,
      TimerValues, TTLConfig, ValueState}
    @transient private var st: ValueState[BootState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[BootState]("boot",
        org.apache.spark.sql.Encoders.product[BootState], TTLConfig.NONE)
    override def handleInitialState(uid: Long, s: BootInit,
        timers: TimerValues): Unit =
      st.update(BootState(s.n, s.cents))
    override def handleInputRows(uid: Long, it: Iterator[IdleEvent],
        timers: TimerValues): Iterator[BootOut] = {
      val cur = if (st.exists()) st.get() else BootState(0L, 0L)
      var n = cur.n
      var cents = cur.cents
      it.foreach { e =>
        n += 1
        cents += math.floor(e.value * 100).toLong
      }
      st.update(BootState(n, cents))
      Iterator.single(BootOut(uid, n, cents))
    }
  }

  /** Bootstrap stream: fold (user_id, value) rows on top of
    * batch-computed initial totals; emits running totals per touched
    * key. */
  def bootstrapTotals(spark: SparkSession, stream: DataFrame,
      initial: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    stream.as[IdleEvent]
      .groupByKey(_.user_id)
      .transformWithState(new BootstrapProcessor(), TimeMode.None(),
        OutputMode.Append(), initial.as[BootInit].groupByKey(_.user_id))
      .toDF()
  }

  /** Funnel state carried across micro-batches: first signup time plus
    * running purchase count / cents total after it. */
  case class FunnelState(signupUs: Long, nPurch: Long, cents: Long)

  /** Funnel output row. */
  case class FunnelOut(user_id: Long, signup_us: Long, n_purch: Long,
      cents: Long)

  /** The one funnel state fold, shared by BOTH state-API operators
    * ([[conversionFunnel]] and [[FunnelProcessor]]) so their bit-for-bit
    * parity — which the q67 oracle and the tws-vs-fmgws spec pin — can't
    * drift through an edit to one copy. Within a batch the signup
    * minimum resolves BEFORE purchases are counted; money accumulates as
    * floor(value·100) cents in int64 (exact and order-independent). */
  private def foldFunnel(evs: Vector[FunnelEvent],
      cur: FunnelState): FunnelState = {
    val minSig = evs.iterator.filter(_.event_type == "signup")
      .map(_.ts_us).minOption.getOrElse(Long.MaxValue)
    val signupUs = math.min(cur.signupUs, minSig)
    val purch = if (signupUs == Long.MaxValue) Vector.empty
      else evs.filter(e =>
        e.event_type == "purchase" && e.ts_us >= signupUs)
    FunnelState(signupUs, cur.nPurch + purch.size,
      cur.cents + purch.iterator
        .map(e => math.floor(e.value * 100).toLong).sum)
  }

  /** Custom stateful operator via `flatMapGroupsWithState` — the state
    * tier below Spark's built-in windows: a per-user signup→purchase
    * conversion funnel. State per key is THREE scalars (first signup µs,
    * purchase count, cents total) regardless of traffic, so 10⁹ users fit
    * comfortably in a state store; no built-in operator expresses "fold
    * events through a small state machine" like this.
    *
    * Within a batch the group's events are buffered and the signup
    * minimum resolved BEFORE counting purchases, so same-batch ordering
    * (including same-µs ties) cannot miss a conversion; across batches
    * state merges monotonically (signup time only decreases). Purchases
    * that arrive in a batch EARLIER than their user's signup are counted
    * only if that signup is already known — the standard ordered-arrival
    * assumption for funnel state machines (the drain-once harness run is
    * a single batch, where the buffer makes the result exactly the batch
    * semantics the oracle computes). Money totals accumulate as
    * `floor(value·100)` cents in int64 — exact and order-independent
    * where a float sum is neither. */
  def conversionFunnel(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    events
      .select(col("user_id"), expr("ts DIV 1000").as("ts_us"),
        col("event_id"), col("event_type"), col("value"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[FunnelEvent],
         state: org.apache.spark.sql.streaming.GroupState[FunnelState]) =>
          val st2 = foldFunnel(it.toVector, state.getOption.getOrElse(
            FunnelState(Long.MaxValue, 0L, 0L)))
          state.update(st2)
          if (st2.signupUs == Long.MaxValue) Iterator.empty
          else Iterator.single(
            FunnelOut(uid, st2.signupUs, st2.nPurch, st2.cents))
      }
      .toDF()
  }

  /** The conversion funnel as a Spark 4 `StatefulProcessor` — the
    * `transformWithState` arbitrary-state API that succeeds
    * flatMapGroupsWithState: named typed state primitives (one
    * ValueState here) with per-state TTL and timers, each state variable
    * its own RocksDB column family (the operator REQUIRES the RocksDB
    * provider). Fold semantics are identical to [[conversionFunnel]];
    * [[funnelTws]] + the parity spec pin that. */
  class FunnelProcessor extends org.apache.spark.sql.streaming
      .StatefulProcessor[Long, FunnelEvent, FunnelOut] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode,
      TimerValues, TTLConfig, ValueState}
    @transient private var st: ValueState[FunnelState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[FunnelState]("funnel",
        org.apache.spark.sql.Encoders.product[FunnelState], TTLConfig.NONE)
    override def handleInputRows(uid: Long, it: Iterator[FunnelEvent],
        timers: TimerValues): Iterator[FunnelOut] = {
      val cur = if (st.exists()) st.get()
        else FunnelState(Long.MaxValue, 0L, 0L)
      val st2 = foldFunnel(it.toVector, cur)
      st.update(st2)
      if (st2.signupUs == Long.MaxValue) Iterator.empty
      else Iterator.single(
        FunnelOut(uid, st2.signupUs, st2.nPurch, st2.cents))
    }
  }

  case class TypeCountOut(user_id: Long, n_types: Long, n_events: Long,
      top_type: String, top_cnt: Long)

  /** Per-user per-event-type counters on `transformWithState`
    * MAPSTATE — the third state primitive (q67 pins ValueState, q132
    * timers; MapState gives keyed sub-state inside each grouping key,
    * its entries living as individual RocksDB key-values so ONE type's
    * counter updates without rewriting the user's whole state — the
    * per-entity-counter shape session stores actually use). Emission is
    * the per-user rollup (distinct types, total, argmax type with
    * count-desc/type-asc tie-break), which over a drain-once run equals
    * the batch aggregate — q150's oracle. */
  class TypeCountProcessor extends org.apache.spark.sql.streaming
      .StatefulProcessor[Long, FunnelEvent, TypeCountOut] {
    import org.apache.spark.sql.streaming.{MapState, OutputMode, TimeMode,
      TTLConfig}
    @transient private var m: MapState[String, Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      m = getHandle.getMapState[String, Long]("counts",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(uid: Long, it: Iterator[FunnelEvent],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[TypeCountOut] = {
      it.foreach { e =>
        val cur = if (m.containsKey(e.event_type)) m.getValue(e.event_type)
          else 0L
        m.updateValue(e.event_type, cur + 1L)
      }
      val entries = m.iterator().toVector
      if (entries.isEmpty) Iterator.empty
      else {
        val (topType, topCnt) =
          entries.minBy { case (t, n) => (-n, t) }
        Iterator.single(TypeCountOut(uid, entries.length.toLong,
          entries.map(_._2).sum, topType, topCnt))
      }
    }
  }

  /** Per-user type counters via MapState; RocksDB provider required. */
  def typeCountsTws(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events
      .select(col("user_id"), expr("ts DIV 1000").as("ts_us"),
        col("event_id"), col("event_type"), col("value"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .transformWithState(new TypeCountProcessor(), TimeMode.None(),
        OutputMode.Append())
      .toDF()
  }

  case class RecentOut(user_id: Long, n_seen: Long, recent_ids: String)

  /** Per-user LAST-3-EVENTS via `transformWithState` LISTSTATE — the
    * fourth and final arbitrary-state primitive (ValueState q67,
    * timers q132, MapState q150): an appendable per-key list whose
    * entries land as consecutive RocksDB values, the
    * recent-activity-feed shape (append is O(1); the trim rewrites
    * only the kept tail). Events append in (ts, event_id) order and
    * the state trims to the 3 most recent; emission is the rollup +
    * the kept ids as a deterministic comma string. */
  class RecentListProcessor extends org.apache.spark.sql.streaming
      .StatefulProcessor[Long, FunnelEvent, RecentOut] {
    import org.apache.spark.sql.streaming.{ListState, OutputMode, TimeMode,
      TTLConfig}
    @transient private var seen: org.apache.spark.sql.streaming
      .ValueState[Long] = _
    @transient private var recent: ListState[(Long, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      seen = getHandle.getValueState[Long]("seen",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
      recent = getHandle.getListState[(Long, Long)]("recent",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong), TTLConfig.NONE)
    }
    override def handleInputRows(uid: Long, it: Iterator[FunnelEvent],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[RecentOut] = {
      val incoming = it.map(e => (e.ts_us, e.event_id)).toVector
      incoming.foreach(recent.appendValue)
      val n = (if (seen.exists()) seen.get() else 0L) + incoming.length
      seen.update(n)
      // trim to the 3 most recent by (ts, id) — rewrite the kept tail
      val kept = recent.get().toVector.sortBy { case (ts, id) => (ts, id) }
        .takeRight(3)
      recent.put(kept.toArray)
      Iterator.single(RecentOut(uid, n,
        kept.map(_._2).mkString(",")))
    }
  }

  /** Per-user recent-events feed via ListState; RocksDB required. */
  def recentListTws(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events
      .select(col("user_id"), expr("ts DIV 1000").as("ts_us"),
        col("event_id"), col("event_type"), col("value"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .transformWithState(new RecentListProcessor(), TimeMode.None(),
        OutputMode.Append())
      .toDF()
  }

  /** [[conversionFunnel]] re-expressed on `transformWithState`. Run it
    * with `stateStoreProvider = Some(RocksDBProvider)` — the operator
    * rejects the HDFS-backed store. */
  def funnelTws(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events
      .select(col("user_id"), expr("ts DIV 1000").as("ts_us"),
        col("event_id"), col("event_type"), col("value"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor(), TimeMode.None(),
        OutputMode.Append())
      .toDF()
  }

  /** Stream-stream interval join (purchase attribution): each purchase
    * matched to the same user's clicks in the preceding 10 minutes. Both
    * sides are watermarked and the join condition bounds event time on
    * BOTH ends, so the state store can evict rows once the watermark
    * passes — the canonical scalable stream-stream join shape (state is
    * O(10 minutes of traffic per side), never unbounded). Inner joins
    * emit on match arrival, so a drain-once run over a static file equals
    * the batch interval join — which is exactly what the oracle checks. */
  def clickPurchaseJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts_utc").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purch_id"), col("user_id").as("p_user"),
        col("ts_utc").as("p_ts"), col("value"))
      .withWatermark("p_ts", "10 minutes")
    clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("c_user").as("user_id"), col("click_id"), col("purch_id"),
        (unix_timestamp(col("p_ts")) - unix_timestamp(col("c_ts")))
          .as("delay_s"),
        col("value").as("amount"))
  }

  /** LEFT-OUTER stream-stream interval join: like [[clickPurchaseJoin]]
    * but every click emits — matched rows on match arrival, unmatched
    * clicks with NULL purchase columns once the watermark passes the end
    * of their 10-minute match window (only then can the engine PROVE no
    * match is coming; the null row is produced by the state-eviction
    * no-data micro-batch). Clicks still inside their window when the
    * stream drains never finalize — the oracle mirrors that predicate
    * exactly. Same bounded-state shape as the inner join: both sides
    * watermarked, event time bounded on both ends. */
  def clickPurchaseLeftJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts_utc").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purch_id"), col("user_id").as("p_user"),
        col("ts_utc").as("p_ts"), col("value"))
      .withWatermark("p_ts", "10 minutes")
    clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 10 MINUTES"),
      "left_outer")
      .select(col("c_user").as("user_id"), col("click_id"),
        unix_timestamp(col("c_ts")).as("click_s"),
        col("purch_id"),
        (unix_timestamp(col("p_ts")) - unix_timestamp(col("c_ts")))
          .as("delay_s"),
        col("value").as("amount"))
  }

  /** FQCN of Spark's RocksDB state-store provider — the off-heap,
    * disk-spilling state backend. The default HDFS-backed provider keeps
    * every key in executor heap, which caps total streaming state at
    * aggregate heap size; RocksDB moves state off-heap with SST spill,
    * the right backend once keyed state approaches memory (the 100 TB
    * deployment posture: state volume scales with key cardinality, not
    * input size, but at billions of keys heap is still the wrong home).
    * Enable per-query via [[runToMemory]]'s `stateStoreProvider`, or
    * session-wide by setting the same conf at session build. */
  val RocksDBProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Idempotent per-batch writer for streaming plane/row ingest — the
    * exactly-once `foreachBatch` recipe: every micro-batch lands in its
    * OWN `batch=<id>` directory with overwrite semantics, so a replayed
    * batch (post-crash recovery re-delivers the last uncommitted batch
    * with the SAME id) overwrites its previous partial output instead of
    * double-appending. The layout is the bronze/staging form of the
    * parquet plane store: plane-row-schema parquet a later compaction
    * folds into a `.graft` store; readers see a consistent multi-batch
    * table via partition discovery. */
  def idempotentBatchWriter(uri: String): (DataFrame, Long) => Unit =
    (df, batchId) =>
      df.write.mode("overwrite").parquet(s"$uri/batch=$batchId")

  /** Streaming ingest into the batch-partitioned staging layout. The
    * checkpoint location carries the batch-id ledger that makes replay
    * ids stable across restarts — the other half of the exactly-once
    * contract. */
  def ingestPlanes(stream: DataFrame, uri: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(idempotentBatchWriter(uri))
      .start()

  /** Run any of the above to completion against a static directory via the
    * memory sink (test/bench harness; a real deployment passes a kafka or
    * file sink instead). Returns the collected result table.
    *
    * Stateful streaming creates one state store per shuffle partition per
    * trigger; for the harness's small static inputs 32 stores are pure
    * overhead, so the stream runs with 2 (a real deployment sizes this to
    * state volume). The setting is restored afterwards.
    *
    * `stateStoreProvider`: optional provider FQCN (e.g.
    * [[RocksDBProvider]]); None keeps the session default. Restored
    * after the run. */
  def runToMemory(spark: SparkSession, stream: DataFrame, name: String,
      outputMode: String = "append",
      stateStoreProvider: Option[String] = None): DataFrame =
    drainToMemory(spark, stream, name, outputMode, stateStoreProvider)(
      _.processAllAvailable())

  /** Drain a [[org.apache.spark.sql.execution.streaming.runtime.MemoryStream]]-driven
    * PROCESSING-TIME-TIMER stream: feed `data`, then poll the memory
    * sink until `expectedRows` have flushed, and stop. A
    * TimeMode.ProcessingTime query NEVER quiesces — its
    * shouldRunAnotherBatch is unconditionally true, so the engine
    * keeps scheduling wall-clock batches (which is precisely what
    * fires idle timers with no data arriving) and
    * `processAllAvailable` would wait forever. Output-count
    * convergence is the honest drain definition for this mode: the
    * expected row count derives from the INPUT (one flush per key),
    * never from the oracle. A 50 ms trigger paces the empty
    * timer-firing batches (the default 0 ms trigger spins thousands of
    * checkpoint-writing batches per minute).
    *
    * CONTRACT: all of `data` is fed in ONE addData call, i.e. one
    * input batch. Count-based convergence is only a correct drain
    * under that shape — if a key's events were split across input
    * batches, its idle timer could fire BETWEEN them and the key would
    * flush twice, so `expectedRows` rows could arrive with duplicated
    * keys and missing ones. The single-batch feed makes each key's
    * state complete before any timer can fire, and the count bound
    * then equals one flush per distinct key. `deadlineMs` bounds the
    * wall-clock wait (timer flushes are wall-clock-paced; slow CI can
    * need more than the default). */
  def runTimerStream[A](spark: SparkSession, data: Seq[A],
      expectedRows: Long, mk: DataFrame => DataFrame, name: String,
      stateStoreProvider: Option[String] = None,
      deadlineMs: Long = 120000L)
      (implicit enc: org.apache.spark.sql.Encoder[A]): DataFrame = {
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[A](enc, spark.sqlContext)
    drainToMemory(spark, mk(ms.toDS().toDF()), name, "append",
      stateStoreProvider,
      trigger = Some(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("50 milliseconds"))) { q =>
      ms.addData(data) // the whole input as ONE batch — see CONTRACT
      val deadline = System.nanoTime() + deadlineMs * 1000 * 1000
      while (spark.table(name).count() < expectedRows &&
          System.nanoTime() < deadline) {
        Thread.sleep(50L)
        q.exception.foreach(throw _) // surface a dead stream, not a timeout
      }
      if (spark.table(name).count() < expectedRows)
        throw new IllegalStateException(
          s"timer stream $name flushed ${spark.table(name).count()} of " +
            s"$expectedRows expected rows within ${deadlineMs}ms")
      // enforce the one-flush-per-key invariant the count bound assumes:
      // duplicated keys reaching expectedRows would otherwise pass
      val out = spark.table(name)
      val keyed = out.groupBy(out.columns.head).count()
        .filter(col("count") > 1).count()
      if (keyed > 0)
        throw new IllegalStateException(
          s"timer stream $name flushed $keyed key(s) more than once — " +
            "the single-addData-batch contract was violated")
    }
  }

  private def drainToMemory(spark: SparkSession, stream: DataFrame,
      name: String, outputMode: String,
      stateStoreProvider: Option[String],
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None)(
      drive: org.apache.spark.sql.streaming.StreamingQuery => Unit)
      : DataFrame = {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    stateStoreProvider.foreach(spark.conf.set(providerKey, _))
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    // state-store + offset-log checkpoints are pure fsync overhead for a
    // drain-once harness run; tmpfs (when present) removes the disk I/O
    val ckpt =
      if (new java.io.File("/dev/shm").isDirectory)
        Some(s"/dev/shm/graft-ckpt-$name")
      else None
    try {
      val writer = stream.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(outputMode)
      trigger.foreach(writer.trigger)
      ckpt.foreach(writer.option("checkpointLocation", _))
      val q = writer.start()
      try {
        drive(q)
        Option(q.lastProgress).foreach(lastProgresses.put(name, _))
      } finally q.stop() // never leak a running stream on mid-batch failure
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      if (stateStoreProvider.isDefined) prevProvider match {
        case Some(p) => spark.conf.set(providerKey, p)
        case None    => spark.conf.unset(providerKey)
      }
      ckpt.foreach(p => scala.util.Try(
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p))))
    }
    spark.table(name)
  }

  /** Last progress of each runToMemory drain, by query name — lets specs
    * assert the state-operator topology (e.g. that a stream-static join
    * registered no state) after the query has stopped. */
  private val lastProgresses = scala.collection.concurrent.TrieMap
    .empty[String, org.apache.spark.sql.streaming.StreamingQueryProgress]

  def lastProgressOf(name: String)
      : Option[org.apache.spark.sql.streaming.StreamingQueryProgress] =
    lastProgresses.get(name)
}
