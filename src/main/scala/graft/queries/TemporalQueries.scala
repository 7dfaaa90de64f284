package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.TemporalJoins

/** Temporal-join battery over `events` (q68–q69): backward as-of join
  * and banded time-range join, oracled against DuckDB's native ASOF
  * JOIN and a plain range-predicate join respectively. Timestamps go
  * through unix_millis/epoch_ms on both engines (the ns-precision
  * parquet gotcha).
  */
object TemporalQueries {

  val defs: Seq[QueryDef] = Seq(

    // ---- q68: backward as-of join ----
    // Each click picks up the user's most recent purchase value at or
    // before the click, if it happened within the last 24 hours.
    // Purchases are pre-aggregated to one row per (user, ms) so "the
    // latest" is total (TemporalJoins.asofBackward requirement). The
    // oracle is DuckDB's native ASOF LEFT JOIN with the tolerance
    // applied as a post-case — equivalent because the latest match
    // being out of tolerance implies every match is.
    QueryDef(
      "q68_asof_join",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"),
            expr("ts DIV 1000000").as("ms"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), expr("ts DIV 1000000").as("ms"),
            col("value"))
          .groupBy(col("user_id"), col("ms"))
          .agg(max(col("value")).as("purchase_value"))
        TemporalJoins.asofBackward(
            clicks, purchases, Seq("user_id"), "ms",
            toleranceMs = Some(86400000L))
          .orderBy(col("event_id"))
      },
      Some("""
        WITH l AS (
          SELECT event_id, user_id, epoch_ms(ts) AS ms
          FROM events WHERE event_type = 'click'),
        r AS (
          SELECT user_id, epoch_ms(ts) AS ms, max(value) AS purchase_value
          FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        SELECT l.event_id, l.user_id, l.ms,
               CASE WHEN l.ms - r.ms <= 86400000 THEN r.purchase_value END
                 AS purchase_value
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND l.ms >= r.ms
        ORDER BY l.event_id""")),

    // ---- q72: forward as-of join ----
    // Mirror of q68: each click picks up the user's NEXT purchase at
    // or after the click, if it happens within the following 24 hours
    // — the attribution direction ("did the click convert?"). Oracle
    // is DuckDB's native ASOF with the inequality flipped.
    QueryDef(
      "q72_asof_forward",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"),
            expr("ts DIV 1000000").as("ms"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), expr("ts DIV 1000000").as("ms"),
            col("value"))
          .groupBy(col("user_id"), col("ms"))
          .agg(max(col("value")).as("purchase_value"))
        TemporalJoins.asofForward(
            clicks, purchases, Seq("user_id"), "ms",
            toleranceMs = Some(86400000L))
          .orderBy(col("event_id"))
      },
      Some("""
        WITH l AS (
          SELECT event_id, user_id, epoch_ms(ts) AS ms
          FROM events WHERE event_type = 'click'),
        r AS (
          SELECT user_id, epoch_ms(ts) AS ms, max(value) AS purchase_value
          FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        SELECT l.event_id, l.user_id, l.ms,
               CASE WHEN r.ms - l.ms <= 86400000 THEN r.purchase_value END
                 AS purchase_value
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND l.ms <= r.ms
        ORDER BY l.event_id""")),

    // ---- q69: banded time-range join ----
    // All (click, purchase) pairs by the same user within one hour of
    // each other. The oracle spells the naive range predicate; the
    // Spark side bands time into 1-hour buckets so the plan is a hash
    // equi-join on (user, bucket) — no nested loop, and hot users'
    // pairs spread across time buckets.
    QueryDef(
      "q69_range_join",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"),
            expr("ts DIV 1000000").as("click_ms"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            expr("ts DIV 1000000").as("purchase_ms"))
        TemporalJoins.bandedTimeJoin(
            clicks, purchases, Seq("user_id"),
            "click_ms", "purchase_ms", windowMs = 3600000L)
          .select(col("click_id"), col("purchase_id"), col("user_id"),
            (col("purchase_ms") - col("click_ms")).as("delta_ms"))
          .orderBy(col("click_id"), col("purchase_id"))
      },
      Some("""
        WITH l AS (
          SELECT event_id AS click_id, user_id, epoch_ms(ts) AS click_ms
          FROM events WHERE event_type = 'click'),
        r AS (
          SELECT event_id AS purchase_id, user_id, epoch_ms(ts) AS purchase_ms
          FROM events WHERE event_type = 'purchase')
        SELECT l.click_id, r.purchase_id, l.user_id,
               r.purchase_ms - l.click_ms AS delta_ms
        FROM l JOIN r ON l.user_id = r.user_id
          AND abs(l.click_ms - r.purchase_ms) <= 3600000
        ORDER BY l.click_id, r.purchase_id""")),

    // ---- q153: per-user daily gap-fill with forward fill ----
    // The feature-store resample primitive: each user's sparse
    // purchase activity becomes a DENSE daily series over their own
    // [first, last] day span, missing days carrying the last observed
    // value forward. Daily value = max(value) that day (total,
    // order-free); the grid explode is per-user-bounded and the fill
    // is one keyed window — everything partitions by user, nothing
    // global. The oracle builds the same grid via a LATERAL range and
    // replays the fill with a windowed last_value IGNORE NULLS.
    QueryDef(
      "q153_gap_fill",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.load(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .select(col("user_id"),
            expr("(ts DIV 1000000) DIV 86400000").as("day"),
            col("value"))
          .groupBy(col("user_id"), col("day"))
          .agg(max(col("value")).as("v"))
        val grid = daily.groupBy(col("user_id"))
          .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
          .select(col("user_id"),
            explode(sequence(col("d0"), col("d1"))).as("day"))
        grid.join(daily, Seq("user_id", "day"), "left")
          .select(col("user_id"), col("day"),
            last(col("v"), ignoreNulls = true).over(
              Window.partitionBy(col("user_id")).orderBy(col("day"))
                .rowsBetween(Window.unboundedPreceding, 0))
              .as("value_filled"),
            col("v").isNotNull.as("observed"))
          .orderBy(col("user_id"), col("day"))
      },
      Some("""
        WITH daily AS (
          SELECT user_id, epoch_ms(ts) // 86400000 AS day,
                 max(value) AS v
          FROM events WHERE event_type = 'purchase'
          GROUP BY 1, 2),
        span AS (
          SELECT user_id, min(day) AS d0, max(day) AS d1
          FROM daily GROUP BY 1),
        grid AS (
          SELECT user_id, t.day
          FROM span, LATERAL unnest(range(d0, d1 + 1)) AS t(day))
        SELECT g.user_id, g.day,
               last_value(d.v IGNORE NULLS) OVER (
                 PARTITION BY g.user_id ORDER BY g.day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS value_filled,
               d.v IS NOT NULL AS observed
        FROM grid g LEFT JOIN daily d
          ON g.user_id = d.user_id AND g.day = d.day
        ORDER BY g.user_id, g.day"""))
  )
}
