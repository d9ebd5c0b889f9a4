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
            // Within a micro-batch, order by event time (iterator order
            // is arrival order, not time order).
            val sorted = evs.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur = cur match {
                // Straggler from a prior batch, older than the open
                // session by more than the gap: it can never merge —
                // it is its own (already closed) singleton session.
                case Some(st) if t < st.start - gapMs =>
                  closed ::= Session(key, new java.sql.Timestamp(t),
                    new java.sql.Timestamp(t), 1)
                  Some(st)
                case Some(st) if t - st.last > gapMs =>
                  closed ::= close(key, st)
                  Some(SessState(t, t, 1))
                // Merge extends BOTH ends: an out-of-order
                // (within-watermark) event that precedes the session
                // start lowers session_start, not just session_end.
                case Some(st) =>
                  Some(SessState(math.min(st.start, t),
                    math.max(st.last, t), st.n + 1))
                case None =>
                  Some(SessState(t, t, 1))
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
