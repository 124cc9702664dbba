package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/**
 * Structured Streaming surface (SURVEY.md §2.10: the reference is pure
 * batch; this is the engine's parity-plus capability for the same event
 * tables arriving as a stream).
 *
 * Design: the batch q25 plan (`groupBy(window(ts), type)`) runs UNCHANGED
 * here — one definition, two execution modes; that is the point of building
 * on Spark instead of porting the reference's eager loops. Watermarks bound
 * the aggregation state so a 100 TB/day stream does not accumulate unbounded
 * per-window state; `mapGroupsWithState` covers the per-user running
 * aggregates the reference computes with cumsum loops.
 */
object EventStream {

  /** Idempotent `foreachBatch` sink: exactly-once file output on top of
    * Structured Streaming's at-least-once batch redelivery. Each
    * micro-batch lands under `dir/batch=<id>`; a redelivered id (failure
    * between sink commit and checkpoint commit — the standard replay
    * window) finds its directory already finalized (`_SUCCESS` present)
    * and skips, so downstream readers of `dir` never see duplicates. A
    * partial directory from a crash MID-write has no `_SUCCESS` and is
    * safely overwritten. This is the documented recipe for exactly-once
    * semantics with foreachBatch (batch-id-keyed dedup of side effects);
    * use as `.writeStream.foreachBatch(idempotentBatchWriter(dir) _)`. */
  def idempotentBatchWriter(dir: String)(batch: DataFrame,
                                         batchId: Long): Unit = {
    // Resolve through the Hadoop FileSystem API so the finalized probe
    // works on ANY supported scheme (hdfs://, s3a://, file:), not just
    // local paths — java.io.File would silently never match on a URI and
    // every replayed batch would rewrite.
    val out = new org.apache.hadoop.fs.Path(s"$dir/batch=$batchId")
    val fs = out.getFileSystem(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(out, "_SUCCESS")))
      batch.write.mode("overwrite").parquet(out.toString)
  }

  /** Tumbling event-time window aggregate with late-data watermark — the
    * incremental form of q25_hourly_window. `events` can be a readStream
    * DataFrame (file/kafka source) with columns ts/event_type/value. */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming exact dedup — the incremental form of d01: drop every
    * document whose content fingerprint was already seen, with the
    * watermark bounding how long a fingerprint stays in state (at 100 TB/
    * day, unbounded dedup state is the failure mode; the watermark is the
    * documented retention/recall trade). `docs` needs event-time `ts` and
    * the columns `fpCols` that define identity (e.g. the md5/fingerprint
    * of the text). */
  def dedupStream(docs: DataFrame, tsCol: String, fpCols: Seq[String],
                  watermark: String = "24 hours",
                  tieCol: Option[String] = None): DataFrame =
    if (docs.isStreaming)
      docs.withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark(fpCols)
    else {
      // Batch twin. Spark REJECTS dropDuplicatesWithinWatermark on batch
      // Datasets outright (UnsupportedOperationChecker.checkForBatch), so
      // unlike the other twins this one cannot literally reuse the
      // streaming operator. Equivalence argument instead: when the
      // dataset's whole event-time span fits inside the watermark horizon,
      // streaming keeps exactly the FIRST-ARRIVED row per fingerprint; the
      // canonical batch replay defines arrival order as event time (ties
      // broken by `tieCol` so the survivor is deterministic — streaming
      // "first arrived" is partition-order-dependent, which a hash check
      // cannot tolerate). EventStreamSpec feeds the same rows through the
      // real streaming operator in ts-ordered micro-batches and asserts
      // the two paths keep the same rows.
      val order = col(tsCol) +: tieCol.map(col).toSeq
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(fpCols.map(col): _*).orderBy(order.map(_.asc): _*)
      docs.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }

  /** Gap-based session windows over the stream — the incremental form of
    * q29_sessionize, via the native `session_window` (state merges
    * adjacent windows closer than `gap`; the watermark closes sessions and
    * evicts their state). */
  def sessionStats(events: DataFrame, gap: String = "30 minutes",
                   watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))

  /** Windowed HyperLogLog registers over the stream — distinct `valueCol`
    * values per event-time window with CONSTANT per-window state (m
    * registers, never the value set; a streaming dropDuplicates+count
    * would hold every distinct value in the state store). `valueCol` is
    * the COUNTED value (e.g. user_id for distinct-users-per-hour), not a
    * grouping dimension — per-(window, event_type) cardinalities need an
    * extra grouping column threaded into the underlying
    * `Sketches.hllRegisters` group, not this signature. The batch
    * `Sketches.hllRegisters` composes unchanged with a watermarked window
    * group — one definition, two execution modes, like hourlyCounts/q25.
    * The output is the REGISTER table (streams allow one aggregation, and
    * registers are the mergeable form anyway — see Sketches scaladoc);
    * estimate downstream with `Sketches.hllFromRegisters`, after
    * max-merging windows/shards as needed. */
  def hllWindowedRegisters(events: DataFrame, valueCol: Column,
                           p: Int = 6, windowLen: String = "1 hour",
                           watermark: String = "2 hours"): DataFrame =
    graft.ops.Sketches.hllRegisters(
      events.withWatermark("ts", watermark),
      window(col("ts"), windowLen), valueCol, p)

  /** Windowed quantile sketch over the stream — per event-time window
    * percentiles (the "p90 latency per hour" dashboard) with CONSTANT
    * per-window state: count + k min-structs, never the value list (a
    * windowed exact percentile would buffer every row of every open
    * window in the state store; Spark's percentile_approx is not
    * replayable in an external oracle). The batch
    * `Sketches.slotQuantileSnapshot` composes unchanged with a
    * watermarked window group — the s05/hllRegisters move: one
    * definition, two execution modes — because the whole operator is
    * one keyed aggregate plus a projection. State evicts at the
    * watermark; each window's emitted row is the correct sketch of
    * every row that window has seen. */
  def windowedQuantiles(events: DataFrame, keyCol: Column,
                        valueCol: Column, fracs: Seq[(String, Double)],
                        k: Int = 64, windowLen: String = "1 hour",
                        watermark: String = "2 hours"): DataFrame =
    graft.ops.Sketches.slotQuantileSnapshot(
      events.withWatermark("ts", watermark),
      window(col("ts"), windowLen), keyCol, valueCol, fracs, k)

  /** Stream-stream interval join: each purchase pairs with the same
    * user's clicks from the preceding `horizon` — streaming attribution
    * ("which click led to this purchase"). BOTH sides carry watermarks
    * and the join condition bounds click_ts to a FINITE interval around
    * purchase_ts, which is what lets Spark evict buffered rows: without
    * the range bound the state store would hold every click forever.
    * Inner join (the default) → results emit as soon as both sides
    * arrive; the watermark delays only state eviction, not output.
    * `joinType = "leftOuter"` is the funnel-drop-off form: clicks that
    * never matched a purchase emit with NULL purchase columns — but only
    * once the watermark proves no in-horizon purchase can still arrive,
    * which is why outer results trail the watermark where inner results
    * don't. */
  def clickAttribution(clicks: DataFrame, purchases: DataFrame,
                       horizon: String = "1 hour",
                       watermark: String = "2 hours",
                       joinType: String = "inner"): DataFrame = {
    val c = clicks.select(col("user_id"),
        col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val p = purchases.select(col("user_id").as("p_user"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
      .withWatermark("purchase_ts", watermark)
    c.join(p, col("user_id") === col("p_user") &&
      col("click_ts") <= col("purchase_ts") &&
      col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $horizon"),
      joinType)
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"), col("purchase_value"))
  }

  /** Stream-static enrichment join: each streaming event picks up
    * dimension attributes from a STATIC batch table (user → customer
    * profile here). This is the one join shape with NO state store at
    * all — the static side is re-planned per micro-batch and broadcast,
    * the stream side never buffers — so it costs a map-side hash probe
    * per event regardless of stream age, where a stream-stream join
    * (clickAttribution) pays watermark-bounded state. Left join keeps
    * events whose key has no dimension row (nulls), the usual
    * enrichment semantics: losing events because a profile is missing
    * is a silent-data-loss bug at 100 TB/day. */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
                    eventKey: Column, dimKey: Column): DataFrame =
    events.join(broadcast(dim), eventKey === dimKey, "left")

  /** Windowed value histogram over the stream — the drift-monitoring
    * form of `ops.Histogram`: per (hour, event_type, bin) counts against
    * FIXED bounds (streams can't do a two-pass min/max; production
    * monitors pin the bounds from a reference period, which also makes
    * windows comparable over time). Downstream, each window's counts feed
    * the same cumulative-interpolation quantile arithmetic as the batch
    * sketch — counts merge by addition, so late data folds in exactly.
    * State per window = `bins` counters per event_type, evicted by the
    * watermark. */
  def histogramCounts(events: DataFrame, lo: Double, hi: Double, bins: Int,
                      watermark: String = "2 hours"): DataFrame = {
    require(hi > lo && bins > 0, "histogramCounts: need hi > lo, bins > 0")
    val v = col("value").cast("double")
    val bin = least(lit(bins - 1), greatest(lit(0),
      floor((v - lo) / ((hi - lo) / bins)).cast("int")))
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"),
        bin.as("bin"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("bin"), col("cnt"))
  }

  /** Windowed HEAVY HITTERS: per event-time window, the keys whose count
    * reaches `threshold` — the alerting/trending query every stream
    * deployment runs. Pure windowed aggregation + post-aggregation filter
    * (append-mode legal: results emit once the watermark closes the
    * window); state per window is one counter per DISTINCT key seen, and
    * the watermark evicts closed windows — for unbounded key domains
    * compose with [[cmsCounts]] (bounded counters, approximate) and use
    * this exact form where the key domain is operationally small
    * (event types, status codes, tenants). Identical plan in batch: the
    * s09 twin hash-checks it. */
  def heavyHitters(events: DataFrame, keyCol: org.apache.spark.sql.Column,
                   threshold: Long, watermark: String = "2 hours")
  : DataFrame = {
    require(threshold >= 1, "heavyHitters: threshold must be >= 1")
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), keyCol.as("key"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
      .select(col("w.start").as("hour_start"), col("key"), col("cnt"))
  }

  /** Windowed annotation majority vote — the streaming twin of
    * `Prep.majorityVote` (d65): per (event-time window, item) vote
    * tallies accumulate incrementally as ONE stateful conditional
    * aggregation over the closed vote vocabulary (state = |V|+1 counters
    * per open window×item, evicted by the watermark); the consensus
    * label and its count are `Prep.packedArgmax` PROJECTIONS on the
    * aggregate row, so the argmax adds no second stateful operator and
    * the plan stays append-mode legal. `minVotes` suppresses
    * low-support consensus (a 1-vote "majority" is noise), as a
    * post-aggregation filter — the same append-legal shape as
    * [[heavyHitters]]' threshold. Late votes fold into their window's
    * tallies and can flip the majority — the incremental semantics the
    * spec pins. Identical plan in batch: the s10 twin hash-checks it. */
  def windowedVote(events: DataFrame, keyCol: org.apache.spark.sql.Column,
                   voteCol: org.apache.spark.sql.Column,
                   vocab: Seq[String], minVotes: Long,
                   win: String = "1 hour", watermark: String = "2 hours")
  : DataFrame = {
    require(minVotes >= 1, "windowedVote: minVotes must be >= 1")
    val counted = events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), win).as("w"), keyCol.as("item"))
      .agg(count(lit(1)).as("total"),
        vocab.zipWithIndex.map { case (v, i) =>
          count(when(voteCol === v, 1)).as(s"c$i")
        }: _*)
    val (maj, top) = graft.ops.Prep.packedArgmax(vocab, i => col(s"c$i"))
    counted.filter(col("total") >= minVotes)
      .select(col("w.start").as("win_start"), col("item"),
        maj.as("majority"), col("total"), top.as("top"))
  }

  /** Windowed Count-Min counters over the stream — the incremental form of
    * `ops.Sketches.countMin`, same md5 hash family, so each window's
    * depth×width counter table merges into a standing sketch (or across
    * late-arriving data) by PLAIN ADDITION, and heavy-hitter queries use
    * the same min-over-rows arithmetic. State per window is depth×width
    * counters regardless of stream volume, evicted by the watermark. */
  def cmsCounts(events: DataFrame, keyCol: org.apache.spark.sql.Column,
                depth: Int, width: Int, salt: String = "cms",
                watermark: String = "2 hours"): DataFrame = {
    val rows = explode(array((0 until depth).map(lit): _*)).as("j")
    events.withWatermark("ts", watermark)
      .select(col("ts"), keyCol.cast("string").as("val"))
      .select(col("ts"), col("val"), rows)
      .withColumn("b", pmod(
        graft.ops.Dedup.md5Hash(col("val"), concat(lit(salt), col("j"))),
        lit(width.toLong)))
      .groupBy(window(col("ts"), "1 hour").as("w"), col("j"), col("b"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("hour_start"), col("j"), col("b"),
        col("cnt"))
  }

  case class Event(user_id: Long, value: Double)
  case class UserState(n: Long, total: Double)
  case class UserSnapshot(user_id: Long, n: Long, total: Double, mean: Double)

  case class RollEvent(user_id: Long, event_id: Long, us: Long, cents: Long)
  case class RollFeature(user_id: Long, event_id: Long, n_prev: Long,
                         prev_cents: Long)

  /** Point-in-time rolling feature via `transformWithState` — the state
    * API v2 (Spark 4's arbitrary-state replacement for
    * mapGroupsWithState: typed state variables, per-variable TTL, timers;
    * this is the one the platform evolves). For every event, emit the
    * count and sum of the user's PREVIOUS up-to-`n` event values —
    * strictly excluding the current one, which is what makes the feature
    * point-in-time correct: a training row built from it can never leak
    * its own outcome, and serving-time state (the same last-n list)
    * produces the identical value. That train/serve equivalence is the
    * whole point of computing features in the streaming engine.
    *
    * State is a `ListState[Long]` holding at most `n` cents values per
    * user — bounded by construction, no watermark needed (TimeMode.None).
    * Outputs are exact integers (count + sum); downstream derives the
    * mean once, rather than hashing an accumulation-order-dependent
    * double. Within-batch rows are sorted on (us, event_id) before the
    * fold (the s12 note: iterator order is partition order); across
    * micro-batches, arrival order must respect event time for the
    * feature to be exact — true when the producer is ordered (the
    * common log-shipping case), and the batch twin (same code path —
    * TWS runs in batch with all rows in one call) IS the exact replay
    * the oracle checks. */
  def rollingFeature(events: Dataset[RollEvent], n: Int)
  : Dataset[RollFeature] = {
    import events.sparkSession.implicits._
    // Batch transformWithState loads an ephemeral state store per task,
    // whose provider phones the driver-side StateStoreCoordinator RPC
    // endpoint — registered here for batch runs (see StateShim).
    org.apache.spark.sql.graftshim.StateShim
      .ensureStateStoreCoordinator(events.sparkSession)
    events.groupByKey(_.user_id)
      .transformWithState(new RollingFeatureProcessor(n),
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Append())
  }

  class RollingFeatureProcessor(n: Int)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, RollEvent, RollFeature] {
    @transient private var window: org.apache.spark.sql.streaming
      .ListState[Long] = _

    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode)
    : Unit =
      window = getHandle.getListState[Long]("window",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[RollEvent],
                                 timerValues: org.apache.spark.sql.streaming
                                   .TimerValues): Iterator[RollFeature] = {
      val sorted = rows.toArray.sortBy(e => (e.us, e.event_id))
      val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
      if (window.exists()) buf ++= window.get()
      val out = sorted.map { e =>
        val r = RollFeature(user, e.event_id, buf.length.toLong, buf.sum)
        buf += e.cents
        if (buf.length > n) buf.remove(0)
        r
      }
      window.put(buf.toArray)
      out.iterator
    }
  }

  case class SftEvent(user_id: Long, us: Long, event_id: Long,
                      event_type: String)
  case class SftOut(convo_id: Long, example_id: Long, context: String,
                    target: String, n_ctx: Long, example_fp: String)

  /** ONLINE SFT example emission — the streaming twin of d89
    * (`Prep.sftExamples`): as each turn of a conversation lands, emit
    * the training example it completes (context = the last ≤ `k`
    * previous turns held in typed ListState, target = the turn, n_ctx
    * the loss-mask boundary, example_fp the content-addressed md5) and
    * append the turn to the state. First turns emit nothing. The batch
    * twin is the SAME processor over full histories (TWS batch runs all
    * of a user's rows through one handleInputRows call), which equals
    * the d89 window form exactly — so train-time (batch) and
    * online-generation (stream) examples are identical by construction,
    * the same train/serve contract s13 pins for features. State is at
    * most `k` strings per user; same in-order-arrival caveat as s13. */
  def sftStream(events: Dataset[SftEvent], k: Int): Dataset[SftOut] = {
    import events.sparkSession.implicits._
    org.apache.spark.sql.graftshim.StateShim
      .ensureStateStoreCoordinator(events.sparkSession)
    events.groupByKey(_.user_id)
      .transformWithState(new SftProcessor(k),
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Append())
  }

  class SftProcessor(k: Int)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, SftEvent, SftOut] {
    @transient private var turns: org.apache.spark.sql.streaming
      .ListState[String] = _

    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode)
    : Unit =
      turns = getHandle.getListState[String]("turns",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    private def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString

    override def handleInputRows(user: Long, rows: Iterator[SftEvent],
                                 timerValues: org.apache.spark.sql.streaming
                                   .TimerValues): Iterator[SftOut] = {
      val sorted = rows.toArray.sortBy(e => (e.us, e.event_id))
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      if (turns.exists()) buf ++= turns.get()
      val out = sorted.flatMap { e =>
        val res = if (buf.nonEmpty) {
          val ctx = buf.mkString(" ")
          Some(SftOut(user, e.event_id, ctx, e.event_type,
            buf.length.toLong, md5hex(ctx + " => " + e.event_type)))
        } else None
        buf += e.event_type
        if (buf.length > k) buf.remove(0)
        res
      }
      turns.put(buf.toArray)
      out.iterator
    }
  }

  case class SessEvent(user_id: Long, us: Long, cents: Long,
                       ts: java.sql.Timestamp)
  case class SessState(start: Long, last: Long, n: Long, cents: Long)
  case class Session(user_id: Long, start_us: Long, end_us: Long,
                     n_events: Long, sum_cents: Long)

  /** Custom-state sessionizer via `flatMapGroupsWithState` + event-time
    * timeout — the hand-rolled form of [[sessionStats]], for when session
    * OUTPUT must be richer than an aggregate row (first/last event
    * payloads, abandonment flags, per-session funnels) or the close
    * condition isn't a pure time gap. Same merge convention as q29 and
    * the native operator: an event within `gapUs` of the session's last
    * event (inclusive) extends it; strictly past the gap closes it and
    * starts a new one — three independent execution paths (SQL window,
    * native session_window, custom state) pinned to one semantics.
    *
    * Streaming: state is ONE open-session struct per user; closed
    * sessions emit as soon as a later event proves the gap, and the
    * event-time timeout (watermark past last + gap) flushes sessions no
    * further event will ever extend — without it an idle user's final
    * session would sit in state forever, the unbounded-state failure
    * mode. Batch twin (`emitOpen = true`): the function sees each user's
    * whole history at once — timeouts never fire in batch — so it also
    * emits the trailing open session, which is exactly the streaming
    * output once the watermark passes. Within-group rows are SORTED on
    * event time before folding (the iterator arrives in partition order;
    * per-user buffering is bounded by user activity, the q12/Repair
    * trade); tied timestamps always co-session, and min/max/sum/count
    * are tie-order-free, so output is deterministic. */
  def sessionTracker(events: Dataset[SessEvent], gapUs: Long,
                     emitOpen: Boolean = false,
                     watermark: String = "0 seconds"): Dataset[Session] = {
    import events.sparkSession.implicits._
    def close(u: Long, s: SessState) = Session(u, s.start, s.last, s.n, s.cents)
    // Event-time timeout REQUIRES a watermark on the input attribute —
    // `ts` is carried as a field of SessEvent precisely so the watermark
    // survives into the typed plan (a dropped column takes its watermark
    // with it). No-op in batch (EliminateEventTimeWatermark).
    events.withWatermark("ts", watermark)
      .as[SessEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[SessEvent], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val out = close(user, state.get)
            state.remove()
            Iterator.single(out)
          } else {
            val sorted = rows.toArray.sortBy(_.us)
            var closed = List.empty[Session]
            var open = state.getOption
            sorted.foreach { e =>
              open match {
                case Some(s) if e.us - s.last <= gapUs =>
                  open = Some(SessState(s.start, e.us, s.n + 1,
                    s.cents + e.cents))
                case other =>
                  other.foreach(s => closed ::= close(user, s))
                  open = Some(SessState(e.us, e.us, 1L, e.cents))
              }
            }
            open.foreach { s =>
              if (emitOpen) closed ::= close(user, s)
              else {
                state.update(s)
                // CEIL-ms of last+gap keeps the eviction boundary
                // consistent with the inclusive merge rule (per-term
                // floor division could flush ~1ms before an exactly-
                // at-gap event arrives), and Spark requires the event-
                // time timeout to be STRICTLY past the current
                // watermark — a late out-of-order event whose session
                // boundary already trails the watermark would otherwise
                // throw and kill the query. Clamping to watermark+1
                // makes such a session time out on the next trigger,
                // which is exactly when the watermark proves no earlier
                // event can extend it.
                val boundaryMs = (s.last + gapUs + 999L) / 1000L
                // batch execution strips the watermark and
                // getCurrentWatermarkMs THROWS (verified on 4.1.2) —
                // and in batch the timeout is a no-op anyway, so fall
                // back to the raw boundary rather than killing a
                // batch caller that keeps the emitOpen=false default
                val wmFloor = scala.util.Try(
                  state.getCurrentWatermarkMs() + 1L).getOrElse(Long.MinValue)
                state.setTimeoutTimestamp(math.max(wmFloor, boundaryMs))
              }
            }
            closed.reverseIterator
          }
      }
  }

  /** Per-user running (count, sum, mean) over an unbounded stream — custom
    * state via mapGroupsWithState. State is one tiny struct per user key,
    * partitioned by the same user key the batch pipeline shuffles on. */
  def runningUserStats(events: Dataset[Event]): Dataset[UserSnapshot] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserSnapshot](
        GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[Event], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0))
          val (n, total) = rows.foldLeft((prev.n, prev.total)) {
            case ((c, t), e) => (c + 1, t + e.value)
          }
          state.update(UserState(n, total))
          UserSnapshot(user, n, total, if (n > 0) total / n else 0.0)
      }
  }
}
