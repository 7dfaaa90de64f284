package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Event-stream battery over the `events` table: semi-structured path
  * extraction (the reference's `./` child step over JSON props),
  * try-except expressions, and gaps-and-islands sessionization (the
  * batch dual of Structured Streaming's session_window()).
  *
  * `events.ts` is ns-precision in parquet; Spark truncates to µs while
  * DuckDB keeps ns, so timestamps are always surfaced as epoch millis
  * (`unix_millis` / `epoch_ms`) — integer-exact in both engines.
  */
object EventsQueries {

  val defs: Seq[QueryDef] = Seq(

    // ---- q21: child path step over JSON (SURVEY §2.2 `e ./ f`) ----
    // The reference walks dynamic dicts per tuple (Executor.py:47-63);
    // here the JSON path evaluates inside the scan projection.
    QueryDef(
      "q21_json_path",
      (s, dir) => {
        Tables.load(s, dir, "events")
          .select(col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .filter(col("k") > 50)
          .orderBy(col("event_id"))
      },
      Some("""
        SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
        ORDER BY event_id""")),

    // ---- q22: try-except expression (SURVEY §2.2 `try e1 except e2`) ----
    // `try int(x) except 0` → COALESCE(TRY_CAST(...), fallback); one
    // branch that always succeeds, one that always fails.
    QueryDef(
      "q22_try_except",
      (s, dir) => {
        Tables.load(s, dir, "part")
          .select(col("p_partkey"),
            coalesce(expr("try_cast(substring(p_brand, 7) AS BIGINT)"), lit(0L))
              .as("brand_num"),
            coalesce(expr("try_cast(p_type AS BIGINT)"), lit(-1L)).as("type_num"))
          .orderBy(col("p_partkey"))
      },
      Some("""
        SELECT p_partkey,
               COALESCE(TRY_CAST(SUBSTR(p_brand, 7) AS BIGINT), 0) AS brand_num,
               COALESCE(TRY_CAST(p_type AS BIGINT), -1) AS type_num
        FROM part ORDER BY p_partkey""")),

    // ---- q23: sessionization (gaps-and-islands, 30-min gap) ----
    // Batch dual of streaming session windows; at 100 TB this is one
    // shuffle on user_id then two linear window passes — no
    // per-session materialization.
    QueryDef(
      "q23_sessionize",
      (s, dir) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("tms"), col("event_id"))
        val e = Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            expr("ts DIV 1000000").as("tms"), col("value"))
        val flagged = e.withColumn("prev_tms", lag(col("tms"), 1).over(byUser))
          .withColumn("is_new",
            when(col("prev_tms").isNull || col("tms") - col("prev_tms") > 1800000L, 1L)
              .otherwise(0L))
        flagged
          .withColumn("session_id",
            sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
            min(col("tms")).as("start_ms"), max(col("tms")).as("end_ms"),
            sum(col("value").cast(DecimalType(18, 4))).cast("double").as("session_value"))
          .orderBy(col("user_id"), col("session_id"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, epoch_ms(ts) AS tms, value FROM events),
        flagged AS (
          SELECT user_id, event_id, tms, value,
                 CASE WHEN LAG(tms) OVER w IS NULL
                        OR tms - LAG(tms) OVER w > 1800000 THEN 1 ELSE 0 END AS is_new
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id)),
        sess AS (
          SELECT user_id, tms, value,
                 CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY tms, event_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
          FROM flagged)
        SELECT user_id, session_id, COUNT(*) AS n_events,
               MIN(tms) AS start_ms, MAX(tms) AS end_ms,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS session_value
        FROM sess
        GROUP BY user_id, session_id
        ORDER BY user_id, session_id""")),

    // ---- q24: time-bucketed aggregation (tumbling event-time window,
    // the batch shape of Structured Streaming's window()) ----
    QueryDef(
      "q24_time_buckets",
      (s, dir) => {
        Tables.load(s, dir, "events")
          .groupBy((expr("ts DIV 1000000") - pmod(expr("ts DIV 1000000"), lit(3600000L)))
            .as("hour_bucket_ms"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(18, 4))).cast("double").as("total_value"))
          .orderBy(col("hour_bucket_ms"), col("event_type"))
      },
      Some("""
        SELECT epoch_ms(ts) - (epoch_ms(ts) % 3600000) AS hour_bucket_ms,
               event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY hour_bucket_ms, event_type
        ORDER BY hour_bucket_ms, event_type""")),

    // ---- q40: session_window — the STREAMING sessionizer's code path
    // (graft.streaming.Streams.sessionize) run in batch mode, verified
    // against gaps-and-islands SQL. Spark's session windows are
    // end-exclusive, so a new session starts at gap >= 30 min (q23's
    // hand-rolled sessionizer uses strict >; both are oracle-matched
    // to their own semantics).
    QueryDef(
      "q40_session_window",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .select(col("user_id"),
            timestamp_millis(expr("ts DIV 1000000")).as("ts"), col("value"))
        graft.streaming.Streams.sessionize(ev, "30 minutes")
          .select(col("user_id"),
            unix_millis(col("session_start")).as("start_ms"),
            unix_millis(col("session_end")).as("end_ms"),
            col("n_events"), col("session_value"))
          .orderBy(col("user_id"), col("start_ms"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, epoch_ms(ts) AS tms, value, event_id FROM events),
        flagged AS (
          SELECT user_id, tms, value,
                 CASE WHEN LAG(tms) OVER w IS NULL
                        OR tms - LAG(tms) OVER w >= 1800000 THEN 1 ELSE 0 END AS is_new
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id)),
        sess AS (
          SELECT user_id, tms, value,
                 SUM(is_new) OVER (PARTITION BY user_id ORDER BY tms
                                   ROWS UNBOUNDED PRECEDING) AS sid
          FROM flagged)
        SELECT user_id, MIN(tms) AS start_ms, MAX(tms) + 1800000 AS end_ms,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS session_value
        FROM sess GROUP BY user_id, sid
        ORDER BY user_id, start_ms""")),

    // ---- q53: retention cohorts (product-analytics staple) ----
    // cohort = first active day per user; per cohort, how many users
    // are active again at day offsets 1 / 7 / 14. Day-level
    // truncation of the ns timestamps agrees across engines.
    QueryDef(
      "q53_retention",
      (s, dir) => {
        // One pass, TWO exchanges, no join (r11 verdict #4 — the old
        // days-distinct + cohort self-join re-scanned events twice and
        // the 4-way countDistinct Expand multiplied the joined rows
        // ×5): collect each user's distinct day SET (bounded by the
        // calendar — the per-group state a 100 TB events table can
        // afford), derive cohort = min(set) and the offset flags
        // scan-locally, then one plain per-cohort reduce. Same result:
        // day sets are distinct per user, so "countDistinct(user) with
        // an off=k row" ≡ "count of users whose set contains
        // cohort+k".
        Tables.load(s, dir, "events")
          .select(col("user_id"),
            to_date(timestamp_millis(expr("ts DIV 1000000"))).as("day"))
          .groupBy(col("user_id"))
          .agg(collect_set(col("day")).as("ds"))
          .select(array_min(col("ds")).as("cohort"), col("ds"))
          .groupBy(col("cohort"))
          .agg(count(lit(1)).as("n_users"),
            sum(when(array_contains(col("ds"),
              date_add(col("cohort"), 1)), 1L).otherwise(0L)).as("d1"),
            sum(when(array_contains(col("ds"),
              date_add(col("cohort"), 7)), 1L).otherwise(0L)).as("d7"),
            sum(when(array_contains(col("ds"),
              date_add(col("cohort"), 14)), 1L).otherwise(0L)).as("d14"))
          .orderBy(col("cohort"))
      },
      Some("""
        WITH days AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        cohorts AS (
          SELECT user_id, MIN(day) AS cohort FROM days GROUP BY user_id),
        j AS (
          SELECT d.user_id, c.cohort, d.day - c.cohort AS off
          FROM days d JOIN cohorts c ON d.user_id = c.user_id)
        SELECT cohort, COUNT(DISTINCT user_id) AS n_users,
               COUNT(DISTINCT CASE WHEN off = 1 THEN user_id END) AS d1,
               COUNT(DISTINCT CASE WHEN off = 7 THEN user_id END) AS d7,
               COUNT(DISTINCT CASE WHEN off = 14 THEN user_id END) AS d14
        FROM j GROUP BY cohort ORDER BY cohort""")),

    // ---- q54: ordered funnel signup → click → purchase ----
    // first-occurrence ordering per user, compared at millisecond
    // granularity on BOTH engines (the ns/µs truncation gotcha).
    QueryDef(
      "q54_funnel",
      (s, dir) => {
        Tables.load(s, dir, "events")
          .groupBy(col("user_id"))
          .agg(
            min(when(col("event_type") === "signup",
              expr("ts DIV 1000000"))).as("s"),
            min(when(col("event_type") === "click",
              expr("ts DIV 1000000"))).as("c"),
            min(when(col("event_type") === "purchase",
              expr("ts DIV 1000000"))).as("p"))
          .agg(count(col("s")).as("n_signup"),
            count(when(col("c") > col("s"), 1)).as("n_sig_click"),
            count(when(col("c") > col("s") && col("p") > col("c"), 1))
              .as("n_funnel"))
      },
      Some("""
        WITH m AS (
          SELECT user_id,
                 MIN(CASE WHEN event_type = 'signup' THEN epoch_ms(ts) END) AS s,
                 MIN(CASE WHEN event_type = 'click' THEN epoch_ms(ts) END) AS c,
                 MIN(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END) AS p
          FROM events GROUP BY user_id)
        SELECT COUNT(s) AS n_signup,
               COUNT(CASE WHEN c > s THEN 1 END) AS n_sig_click,
               COUNT(CASE WHEN c > s AND p > c THEN 1 END) AS n_funnel
        FROM m"""))
  ) ++ Seq(

    // ---- q126: PageRank centrality over the user↔item click graph ----
    // Iterative graph computation in exact integer fixed point
    // (operators/GraphRank.scala): the symmetrized bipartite graph
    // from events (user —touched→ item via props.k), five integer
    // PageRank steps, every step `150000 + (850·Σ r div deg) div
    // 1000` — the oracle unrolls the same five steps as chained CTEs,
    // so every node's final rank hash-gates with zero float drift.
    QueryDef(
      "q126_pagerank",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .select(col("user_id"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .filter(col("k").isNotNull)
        val fwd = ev.select(
          concat(lit("u"), col("user_id")).as("src"),
          concat(lit("i"), col("k")).as("dst")).distinct()
        val edges = fwd.unionByName(
          fwd.select(col("dst").as("src"), col("src").as("dst")))
        graft.operators.GraphRank.pageRank(edges, iters = 5)
          .select(col("node"), col("rank_m"),
            (col("rank_m").cast("double") / lit(1000000.0)).as("rank"))
          .orderBy(col("node"))
      },
      Some("""
        WITH raw AS (
          SELECT DISTINCT 'u' || CAST(user_id AS VARCHAR) AS src,
                 'i' || json_extract_string(props, '$.k') AS dst
          FROM events
          WHERE json_extract_string(props, '$.k') IS NOT NULL),
        ed AS (SELECT src, dst FROM raw
               UNION ALL SELECT dst, src FROM raw),
        deg AS (SELECT src, count(*) AS deg FROM ed GROUP BY 1),
        p0 AS (SELECT DISTINCT src AS node, CAST(1000000 AS BIGINT) AS r
               FROM ed),
        p1 AS (SELECT e.dst AS node,
                      CAST(150000 + (850 * sum(p.r // d.deg)) // 1000
                        AS BIGINT) AS r
               FROM p0 p JOIN ed e ON e.src = p.node
               JOIN deg d ON d.src = p.node GROUP BY 1),
        p2 AS (SELECT e.dst AS node,
                      CAST(150000 + (850 * sum(p.r // d.deg)) // 1000
                        AS BIGINT) AS r
               FROM p1 p JOIN ed e ON e.src = p.node
               JOIN deg d ON d.src = p.node GROUP BY 1),
        p3 AS (SELECT e.dst AS node,
                      CAST(150000 + (850 * sum(p.r // d.deg)) // 1000
                        AS BIGINT) AS r
               FROM p2 p JOIN ed e ON e.src = p.node
               JOIN deg d ON d.src = p.node GROUP BY 1),
        p4 AS (SELECT e.dst AS node,
                      CAST(150000 + (850 * sum(p.r // d.deg)) // 1000
                        AS BIGINT) AS r
               FROM p3 p JOIN ed e ON e.src = p.node
               JOIN deg d ON d.src = p.node GROUP BY 1),
        p5 AS (SELECT e.dst AS node,
                      CAST(150000 + (850 * sum(p.r // d.deg)) // 1000
                        AS BIGINT) AS r
               FROM p4 p JOIN ed e ON e.src = p.node
               JOIN deg d ON d.src = p.node GROUP BY 1)
        SELECT node, r AS rank_m, CAST(r AS DOUBLE) / 1000000.0 AS rank
        FROM p5 ORDER BY node""")),

    // ---- q147: ordered journey assembly ----
    // The SFT-style record assembly primitive: flat event rows →
    // one ordered per-user interaction transcript. Spark builds the
    // order with sort_array over (ts, event_id, type) structs — a
    // deterministic total order that matches the oracle's
    // string_agg(... ORDER BY ts, event_id) exactly; the string is
    // compared, not the list, so array-rendering differences between
    // engines can't alias the gate. Per-user state is bounded by that
    // user's OWN activity; a 100 TB corpus with pathological power
    // users bounds it further by assembling per (user, session)
    // instead — swap the grouping key for q23's sessionize output,
    // same plan shape.
    QueryDef(
      "q147_journey_assembly",
      (s, dir) => {
        Tables.load(s, dir, "events")
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            concat_ws(">", transform(
              sort_array(collect_list(struct(col("ts"), col("event_id"),
                col("event_type")))),
              x => x("event_type"))).as("journey"))
          .orderBy(col("user_id"))
      },
      Some("""
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
               string_agg(event_type, '>' ORDER BY ts, event_id)
                 AS journey
        FROM events GROUP BY user_id ORDER BY user_id""")),

    // ---- q148: label propagation over the click graph ----
    // Semi-supervised labeling (Zhu–Ghahramani in exact-count form):
    // seed labels on every 4th user (their modal event type, count
    // desc / type asc), 3 synchronous majority rounds over the q126
    // bipartite graph with seeds clamped. Pure counts + total-order
    // tie-breaks — the oracle unrolls the rounds and the final
    // labeling hash-gates exactly.
    QueryDef(
      "q148_label_prop",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .select(col("user_id"),
            get_json_object(col("props"), "$.k").cast("long").as("k"),
            col("event_type"))
        val fwd = ev.filter(col("k").isNotNull).select(
          concat(lit("u"), col("user_id")).as("src"),
          concat(lit("i"), col("k")).as("dst")).distinct()
        val edges = fwd.unionByName(
          fwd.select(col("dst").as("src"), col("src").as("dst")))
        val seeds = ev.filter(col("user_id") % 4 === 0)
          .groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("user_id"))
              .orderBy(col("cnt").desc, col("event_type"))))
          .filter(col("rn") === 1)
          .select(concat(lit("u"), col("user_id")).as("node"),
            col("event_type").as("label"))
        graft.operators.GraphRank.labelPropagate(edges, seeds, iters = 3)
          .orderBy(col("node"))
      },
      Some("""
        WITH raw AS (
          SELECT DISTINCT 'u' || CAST(user_id AS VARCHAR) AS src,
                 'i' || json_extract_string(props, '$.k') AS dst
          FROM events
          WHERE json_extract_string(props, '$.k') IS NOT NULL),
        ed AS (SELECT src, dst FROM raw
               UNION ALL SELECT dst, src FROM raw),
        seeds AS (
          SELECT 'u' || CAST(user_id AS VARCHAR) AS node, label
          FROM (
            SELECT user_id, event_type AS label,
                   row_number() OVER (PARTITION BY user_id
                     ORDER BY count(*) DESC, event_type) AS rn
            FROM events WHERE user_id % 4 = 0
            GROUP BY user_id, event_type)
          WHERE rn = 1),
        l0 AS (SELECT node, label FROM seeds),
        w1 AS (
          SELECT dst AS node, label FROM (
            SELECT e.dst, l.label,
                   row_number() OVER (PARTITION BY e.dst
                     ORDER BY count(*) DESC, l.label) AS rn
            FROM l0 l JOIN ed e ON e.src = l.node
            GROUP BY e.dst, l.label)
          WHERE rn = 1),
        l1 AS (SELECT node, label FROM seeds
               UNION ALL
               SELECT w.node, w.label FROM w1 w
               LEFT JOIN seeds s ON s.node = w.node WHERE s.node IS NULL),
        w2 AS (
          SELECT dst AS node, label FROM (
            SELECT e.dst, l.label,
                   row_number() OVER (PARTITION BY e.dst
                     ORDER BY count(*) DESC, l.label) AS rn
            FROM l1 l JOIN ed e ON e.src = l.node
            GROUP BY e.dst, l.label)
          WHERE rn = 1),
        l2 AS (SELECT node, label FROM seeds
               UNION ALL
               SELECT w.node, w.label FROM w2 w
               LEFT JOIN seeds s ON s.node = w.node WHERE s.node IS NULL),
        w3 AS (
          SELECT dst AS node, label FROM (
            SELECT e.dst, l.label,
                   row_number() OVER (PARTITION BY e.dst
                     ORDER BY count(*) DESC, l.label) AS rn
            FROM l2 l JOIN ed e ON e.src = l.node
            GROUP BY e.dst, l.label)
          WHERE rn = 1),
        l3 AS (SELECT node, label FROM seeds
               UNION ALL
               SELECT w.node, w.label FROM w3 w
               LEFT JOIN seeds s ON s.node = w.node WHERE s.node IS NULL)
        SELECT node, label FROM l3 ORDER BY node""")),

    // ---- q184: event-type Markov transition matrix ----
    // First-order behavioral model over each user's event stream:
    // P(next | current) from adjacent pairs in (ts, event_id) order —
    // the sequence-level profile behind "did the interaction pattern
    // change" monitoring and synthetic-journey generation. One
    // per-user window (lead), one (src, dst) count exchange; the
    // row-normalizing total rides a types-bounded window; p is the
    // one pinned double division, rounded 6.
    QueryDef(
      "q184_event_transitions",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val wu = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val pairs = Tables.load(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type").as("src"))
          .withColumn("dst", lead(col("src"), 1).over(wu))
          .filter(col("dst").isNotNull)
          .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("cnt"))
        pairs
          .withColumn("tot", sum(col("cnt")).over(
            Window.partitionBy(col("src"))))
          .select(col("src"), col("dst"), col("cnt"),
            round(col("cnt").cast("double") / col("tot").cast("double"),
              6).as("p"))
          .orderBy(col("src"), col("dst"))
      },
      Some("""
        WITH seq AS (
          SELECT user_id, event_type AS src,
                 lead(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS dst
          FROM events),
        c AS (
          SELECT src, dst, count(*) AS cnt FROM seq
          WHERE dst IS NOT NULL GROUP BY src, dst)
        SELECT src, dst, cnt,
               round(cnt::DOUBLE /
                 (sum(cnt) OVER (PARTITION BY src))::DOUBLE, 6) AS p
        FROM c ORDER BY src, dst""")),

    // ---- q185: rolling PSI drift over tumbling event-time windows ----
    // q155's PSI monitor deployed the way production runs it: the
    // `value` distribution of each 1-day tumbling window scored
    // against the PREVIOUS window over a FIXED global-decile bin
    // frame (fixed edges make consecutive PSIs comparable; per-window
    // re-binning would hide drift inside the bins). Per-(window, bin)
    // counts are one keyed exchange; the previous-window counts ride
    // a lag over the bins-bounded per-bin frame; Laplace-smoothed
    // shares and the 4-rounded ln follow q155 exactly.
    QueryDef(
      "q185_rolling_psi",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .select((expr("ts DIV 1000000") -
            pmod(expr("ts DIV 1000000"), lit(86400000L))).as("win"),
            col("value"))
        val edgeCols = (1 to 9).map(i =>
          round(expr(s"percentile(value, 0.${i})"), 6).as(s"e$i"))
        val edges = ev.agg(edgeCols.head, edgeCols.tail: _*)
        val bin = (1 to 9).map(i =>
          when(col("value") >= col(s"e$i"), 1).otherwise(0))
          .reduce(_ + _) + 1
        val counts = ev.crossJoin(broadcast(edges))
          .groupBy(col("win"), bin.as("bin"))
          .agg(count(lit(1)).as("c"))
        // the spine/shares/lag/DECIMAL-term tail is shared with the
        // streaming face (windowedBinCountsStream emits this exact
        // count-table shape) — one arithmetic, two execution modes
        graft.operators.Drift.rollingPsi(counts)
          .orderBy(col("win_ms"))
      },
      Some("""
        WITH ev AS (
          SELECT epoch_ms(ts) - (epoch_ms(ts) % 86400000) AS win, value
          FROM events),
        edges AS (
          SELECT round(quantile_cont(value, 0.1), 6) AS e1,
                 round(quantile_cont(value, 0.2), 6) AS e2,
                 round(quantile_cont(value, 0.3), 6) AS e3,
                 round(quantile_cont(value, 0.4), 6) AS e4,
                 round(quantile_cont(value, 0.5), 6) AS e5,
                 round(quantile_cont(value, 0.6), 6) AS e6,
                 round(quantile_cont(value, 0.7), 6) AS e7,
                 round(quantile_cont(value, 0.8), 6) AS e8,
                 round(quantile_cont(value, 0.9), 6) AS e9
          FROM ev),
        binned AS (
          SELECT win,
                 (CASE WHEN value >= e1 THEN 1 ELSE 0 END +
                  CASE WHEN value >= e2 THEN 1 ELSE 0 END +
                  CASE WHEN value >= e3 THEN 1 ELSE 0 END +
                  CASE WHEN value >= e4 THEN 1 ELSE 0 END +
                  CASE WHEN value >= e5 THEN 1 ELSE 0 END +
                  CASE WHEN value >= e6 THEN 1 ELSE 0 END +
                  CASE WHEN value >= e7 THEN 1 ELSE 0 END +
                  CASE WHEN value >= e8 THEN 1 ELSE 0 END +
                  CASE WHEN value >= e9 THEN 1 ELSE 0 END) + 1 AS bin
          FROM ev CROSS JOIN edges),
        counts AS (
          SELECT win, bin, count(*) AS c FROM binned GROUP BY win, bin),
        tot AS (SELECT win, sum(c) AS t FROM counts GROUP BY win),
        spine AS (
          SELECT w.win, CAST(b.b AS INT) AS bin
          FROM (SELECT DISTINCT win FROM counts) w
          CROSS JOIN range(1, 11) b(b)),
        shares AS (
          SELECT s.win, s.bin,
                 round((coalesce(c.c, 0) + 1)::DOUBLE /
                       (t.t + 10)::DOUBLE, 6) AS p
          FROM spine s
          LEFT JOIN counts c ON c.win = s.win AND c.bin = s.bin
          JOIN tot t ON t.win = s.win),
        lagged AS (
          SELECT win, bin, p,
                 lag(p) OVER (PARTITION BY bin ORDER BY win) AS p_prev
          FROM shares),
        terms AS (
          SELECT win, bin,
                 CAST(round((p - p_prev) * round(ln(p / p_prev), 4), 6)
                   AS DECIMAL(18,6)) AS term
          FROM lagged WHERE p_prev IS NOT NULL)
        SELECT win AS win_ms, count(*) AS n_bins,
               CAST(sum(term) AS DOUBLE) AS psi
        FROM terms GROUP BY win ORDER BY win_ms"""))
  )
}
