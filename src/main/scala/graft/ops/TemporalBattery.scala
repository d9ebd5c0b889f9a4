package graft.ops

import org.apache.spark.sql.functions._

import graft.temporal.TemporalJoins

/** Time-series join operators over the `events` table, each restated in
  * closed-form DuckDB SQL (correlated subqueries — the oracle states the
  * *semantics*; the Spark side is the scale-shaped plan). All time
  * arithmetic is integer µs via the schema-adaptive `Td.tsUs` (exact on
  * either `ts` encoding — see its scaladoc), so both engines agree
  * bit-exactly.
  */
object TemporalBattery {

  /** Backward as-of join: each click picks up the user's latest
    * purchase at-or-before it, within a 2-hour tolerance. Ties at the
    * same instant break toward the greatest purchase event_id — stated
    * identically in the oracle's ORDER BY … DESC LIMIT 1. Clicks with
    * no qualifying purchase keep null columns (the left-outer
    * semantics). */
  val asofJoin = Q(
    "q_asof_join",
    Some {
      val matchWhere =
        "p.event_type = 'purchase' AND p.user_id = e.user_id " +
          "AND epoch_us(p.ts) <= epoch_us(e.ts) " +
          "AND epoch_us(e.ts) - epoch_us(p.ts) <= 7200000000"
      val order = "ORDER BY epoch_us(p.ts) DESC, p.event_id DESC LIMIT 1"
      "SELECT e.event_id, e.user_id, " +
        s"(SELECT epoch_us(e.ts) - epoch_us(p.ts) FROM events p WHERE $matchWhere $order) AS lag_us, " +
        s"(SELECT p.value FROM events p WHERE $matchWhere $order) AS purchase_value " +
        "FROM events e WHERE e.event_type = 'click' ORDER BY 1"
    },
    (s, dir) => {
      val ev = Td(s, dir, "events")
      val us = Td.tsUs(ev)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), us.as("t_us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), us.as("pt_us"),
          col("event_id").as("p_tie"), col("value").as("purchase_value"))
      TemporalJoins.asOfJoin(clicks, purchases, key = "user_id",
        leftTime = "t_us", rightTime = "pt_us", tieCol = "p_tie",
        valueCols = Seq("purchase_value"),
        toleranceUs = Some(7200000000L))
        .select(col("event_id"), col("user_id"),
          (col("t_us") - col("asof_t")).as("lag_us"), col("purchase_value"))
        .orderBy(col("event_id"))
    }
  )

  /** Keyless point-in-interval range join: every error event opens a
    * 10-minute incident window; each click counts the windows containing
    * it (zero-count clicks kept — the left side of the range join).
    * The Spark side buckets time at the window length, so the quadratic
    * theta-join the oracle states never materializes. */
  val rangeJoin = Q(
    "q_range_join",
    Some(
      "SELECT e.event_id, " +
        "(SELECT count(*) FROM events i WHERE i.event_type = 'error' " +
        "AND epoch_us(e.ts) >= epoch_us(i.ts) " +
        "AND epoch_us(e.ts) <= epoch_us(i.ts) + 600000000) AS n_incidents " +
        "FROM events e WHERE e.event_type = 'click' ORDER BY 1"),
    (s, dir) => {
      val ev = Td(s, dir, "events")
      val us = Td.tsUs(ev)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), us.as("t_us"))
      val incidents = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("incident_id"), us.as("start_us"),
          (us + 600000000L).as("end_us"))
      val pairs = TemporalJoins.rangeJoin(clicks, incidents,
        pointTime = "t_us", startCol = "start_us", endCol = "end_us",
        bucketUs = 600000000L)
      val counts = pairs.groupBy(col("event_id"))
        .agg(count(lit(1)).as("n_incidents"))
      clicks.join(counts, Seq("event_id"), "left")
        .select(col("event_id"),
          coalesce(col("n_incidents"), lit(0L)).as("n_incidents"))
        .orderBy(col("event_id"))
    }
  )

  val all: Seq[Q] = Seq(asofJoin, rangeJoin)
}
