package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.windows.XQueryWindows

/** XQuery-window battery: the reference's `window` clause run through
  * the custom single-pass operator, cross-checked against equivalent
  * frame/row_number formulations in DuckDB. Oracle-exact because both
  * sides order by (tms, event_id) — a total order per user.
  */
object WindowQueries {

  private def eventsMs(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), expr("ts DIV 1000000").as("tms"),
        col("value"))

  val defs: Seq[QueryDef] = Seq(

    // ---- q30: tumbling count-3 windows per user ----
    // start: always (but tumbling → only when none open); end: 3 items.
    QueryDef(
      "q30_xwindow_tumbling",
      (s, dir) => {
        val w = XQueryWindows.windows(
          eventsMs(s, dir),
          keyCols = Seq("user_id"), orderCols = Seq("tms", "event_id"),
          start = _ => true,
          end = (st, e) => e.index - st.index == 2,
          tumbling = true)
        w.select(col("user_id"), col("s_idx"), explode(col("window")).as("item"))
          .groupBy(col("user_id"), (col("s_idx") / 3).cast("long").as("wid"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("item.value").cast(DecimalType(18, 4))).cast("double")
              .as("sum_value"))
          .orderBy(col("user_id"), col("wid"))
      },
      Some("""
        SELECT user_id, wid, COUNT(*) AS n_items,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        FROM (
          SELECT user_id, value,
                 CAST(FLOOR((ROW_NUMBER() OVER (PARTITION BY user_id
                        ORDER BY epoch_ms(ts), event_id) - 1) / 3) AS BIGINT) AS wid
          FROM events)
        GROUP BY user_id, wid
        ORDER BY user_id, wid""")),

    // ---- q31: sliding count-3 windows per user (tails emitted) ----
    // Every item opens a window; closes after 3 items; unclosed tail
    // windows are emitted at group end (no `only`).
    QueryDef(
      "q31_xwindow_sliding",
      (s, dir) => {
        val w = XQueryWindows.windows(
          eventsMs(s, dir),
          keyCols = Seq("user_id"), orderCols = Seq("tms", "event_id"),
          start = _ => true,
          end = (st, e) => e.index - st.index == 2,
          tumbling = false)
        w.select(col("user_id"), col("s_idx"),
          size(col("window")).cast("long").as("n_items"),
          expr("CAST(aggregate(window, CAST(0 AS DECIMAL(18,4)), " +
            "(acc, x) -> CAST(acc + CAST(x.value AS DECIMAL(18,4)) AS DECIMAL(18,4))) " +
            "AS DOUBLE)").as("sum_value"))
          .orderBy(col("user_id"), col("s_idx"))
      },
      Some("""
        SELECT user_id,
               ROW_NUMBER() OVER w - 1 AS s_idx,
               CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
                      ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS BIGINT) AS n_items,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
                      PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
                      ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS DECIMAL(18,4)) AS DOUBLE)
                 AS sum_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
        ORDER BY user_id, s_idx""")),

    // ---- q36: VALUE-based start/end predicates + prev binding +
    // `only end` (reference tutorial q12/q13 shapes,
    // tutorial_tests.py:116-138) ----
    // start: value rose vs the PREVIOUS item (s_prev binding);
    // end: first item ≥ ~28h after the START item (s_/e_ bindings);
    // sliding; `only end` drops windows still open at stream end.
    // Oracle: gaps-and-islands SQL (min closing idx per start).
    QueryDef(
      "q36_xwindow_value",
      (s, dir) => {
        val spanMs = 100000000L
        val w = XQueryWindows.windows(
          eventsMs(s, dir),
          keyCols = Seq("user_id"), orderCols = Seq("tms", "event_id"),
          start = it => it.prev.exists(p =>
            it.row.getAs[Double]("value") > p.getAs[Double]("value")),
          end = (st, e) =>
            e.row.getAs[Long]("tms") >= st.row.getAs[Long]("tms") + spanMs,
          tumbling = false, onlyEnd = true)
        w.select(col("user_id"), col("s_idx"), col("e_idx"),
          element_at(col("window"), 1).getField("tms").as("s_tms"),
          size(col("window")).cast("long").as("n_items"),
          expr("CAST(aggregate(window, CAST(0 AS DECIMAL(18,4)), " +
            "(acc, x) -> CAST(acc + CAST(x.value AS DECIMAL(18,4)) AS DECIMAL(18,4))) " +
            "AS DOUBLE)").as("sum_value"))
          .orderBy(col("user_id"), col("s_idx"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, epoch_ms(ts) AS tms, value,
                 ROW_NUMBER() OVER w - 1 AS idx,
                 LAG(value) OVER w AS pv
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)),
        s AS (
          SELECT user_id, idx AS s_idx, tms AS s_tms
          FROM e WHERE pv IS NOT NULL AND value > pv),
        ends AS (
          SELECT s.user_id, s.s_idx, s.s_tms, MIN(x.idx) AS e_idx
          FROM s JOIN e x ON x.user_id = s.user_id AND x.idx >= s.s_idx
                          AND x.tms >= s.s_tms + 100000000
          GROUP BY s.user_id, s.s_idx, s.s_tms)
        SELECT en.user_id, en.s_idx, en.e_idx, en.s_tms,
               en.e_idx - en.s_idx + 1 AS n_items,
               CAST(SUM(CAST(x.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        FROM ends en JOIN e x ON x.user_id = en.user_id
                              AND x.idx BETWEEN en.s_idx AND en.e_idx
        GROUP BY en.user_id, en.s_idx, en.e_idx, en.s_tms
        ORDER BY en.user_id, en.s_idx"""))
  )
}
