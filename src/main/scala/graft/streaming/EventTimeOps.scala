package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming operators (SURVEY.md §2.10 #86 — absent in the
  * reference, which is a bounded single-pass pipeline; added as the
  * Structured-Streaming-native layer a continuously-fed corpus needs).
  *
  * Two shapes:
  *  - watermarked tumbling-window aggregation — the declarative form:
  *    late events beyond the watermark are dropped, window state is
  *    evicted once the watermark passes, so state is bounded at any
  *    corpus rate;
  *  - stateful gap sessionization via `flatMapGroupsWithState` — the
  *    custom-state form (the streaming sibling of the batch
  *    `q_sessionize` window query): sessions close either when a new
  *    event arrives past the gap or when the event-time timeout fires,
  *    so idle keys cannot accumulate state forever.
  */
object EventTimeOps {

  /** One event of the streaming feed (events.parquet shape, with ts as
    * a real timestamp — the batch table's nanos-long is cast at the
    * ingest edge). */
  final case class Ev(user_id: Long, ts: java.sql.Timestamp)

  /** One closed session. */
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp, n_events: Long)

  /** Internal session accumulator — public because encoder-generated
    * code constructs it reflectively. */
  final case class SessState(start: Long, last: Long, n: Long)

  /** Watermarked tumbling-window counts per user. Append-mode safe:
    * a window emits once its end passes the watermark. */
  def windowedCounts(events: DataFrame, windowDur: String = "1 hour",
                     watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), window(col("ts"), windowDur))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("window.start").as("window_start"),
        col("n_events"))

  /** One document of a streaming corpus feed. */
  final case class Doc(doc_id: Long, content_hash: String)

  /** Streaming exact dedup: first-seen-wins across micro-batches, keyed
    * by content hash — the continuous sibling of the batch
    * [[graft.dedup.Dedup.exact]]. State per distinct hash is one long
    * (the keeper id); `mapGroupsWithState` emits only never-before-seen
    * documents downstream. State grows with the number of DISTINCT
    * documents — the honest cost of exact streaming dedup; bound it
    * upstream by routing only a rolling corpus window through the
    * stream, or accept the one-long-per-distinct-doc footprint (8 GB
    * per billion distinct docs — fine on any real cluster). */
  def streamingExactDedup(docs: Dataset[Doc]): Dataset[Doc] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.content_hash)
      .flatMapGroupsWithState[Long, Doc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (hash: String, ds: Iterator[Doc], state: GroupState[Long]) =>
          if (state.exists) Iterator.empty
          else {
            // min id within the batch is the keeper — deterministic
            // regardless of arrival order inside the micro-batch
            val keeper = ds.minBy(_.doc_id)
            state.update(keeper.doc_id)
            Iterator.single(keeper)
          }
      }
  }

  /** Declarative streaming sessionization via the built-in
    * `session_window`: Spark merges a session with the next event when
    * `next <= session end` — INCLUSIVE, so an exactly-at-gap event
    * extends the session (asserted in the spec; same `>` new-session
    * rule as the lag-cumsum q_sessionize) — and emits a session once
    * the watermark passes its end. The declarative twin of
    * [[sessionize]] below: state eviction and late-event handling come
    * from the watermark, no custom state code. */
  def sessionWindowCounts(events: DataFrame, gap: String = "30 minutes",
                          watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Gap-based streaming sessionization: per user, a session closes
    * after `gapMinutes` of event-time silence. Closed sessions are
    * emitted either by a later event arriving past the gap or by the
    * event-time timeout (watermark passing last+gap) — the latter is
    * what bounds state for keys that simply stop talking. */
  def sessionize(events: Dataset[Ev], gapMinutes: Int = 30,
                 watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    def close(key: Long, st: SessState): Session =
      Session(key, new java.sql.Timestamp(st.start),
        new java.sql.Timestamp(st.last), st.n)

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, evs: Iterator[Ev], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(close(key, st))
          } else {
            // Re-sessionize the open state PLUS the batch as one
            // sorted interval merge: iterator order is arrival order,
            // and out-of-order (within-watermark) events may precede
            // the open session — including stragglers that must merge
            // with EACH OTHER into their own earlier sessions, lower
            // the open session's start, or extend its end. Sorting by
            // interval start and folding with the gap rule handles
            // every case uniformly. All intervals but the last close;
            // the last stays open as the new state.
            val intervals =
              (state.getOption.map(st => SessState(st.start, st.last, st.n)).toList ++
                evs.map(e => SessState(e.ts.getTime, e.ts.getTime, 1)))
                .sortBy(_.start)
            var closed = List.empty[Session]
            var cur: Option[SessState] = None
            intervals.foreach { iv =>
              cur = cur match {
                case None => Some(iv)
                case Some(c) if iv.start - c.last <= gapMs =>
                  Some(SessState(c.start, math.max(c.last, iv.last), c.n + iv.n))
                case Some(c) =>
                  closed ::= close(key, c)
                  Some(iv)
              }
            }
            cur.foreach { st =>
              state.update(st)
              state.setTimeoutTimestamp(st.last + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
