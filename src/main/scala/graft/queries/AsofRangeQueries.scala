package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AsofJoin, RangeJoin}

/** Temporal join operators BEYOND the reference's surface — its DataFusion-6
  * fork has no sort-merge/range/as-of join of any kind (SURVEY.md §2.4
  * "Limits"), yet both shapes are staples of event/feature pipelines at
  * 100 TB. Implemented Spark-first as composed operators
  * (`graft.operators.{AsofJoin, RangeJoin}`) — single-shuffle union+window
  * and bin-bucketed equi-join respectively, never per-key cross products —
  * and oracle-checked against DuckDB's native `ASOF JOIN` and a plain
  * inequality join.
  *
  * Timestamps flow through `unix_micros`/`epoch_us` and the oracle casts
  * its ns-precision parquet reads down to µs first, so both engines compare
  * at Spark's TIMESTAMP precision (same convention as e02).
  */
object AsofRangeQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- a01: as-of (backward temporal) join --------------------------
    // For every click, the latest view by the same user at-or-before it —
    // the canonical "last observation carried forward" join. The right
    // side is pre-aggregated to one row per (user, ts): equal-time
    // duplicates make "latest" ill-defined in any as-of engine, and the
    // aggregate is what makes both engines deterministic.
    "a01_asof_join" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("view_value"))
        .select(col("user_id"), col("ts"),
          unix_micros(col("ts")).as("view_us"), col("view_value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"),
          unix_micros(col("ts")).as("click_us"))
      AsofJoin.backward(clicks, views, key = "user_id",
          leftTime = "ts", rightTime = "ts",
          payload = Seq("view_us", "view_value"))
        .select(col("event_id"), col("user_id"), col("click_us"),
          col("view_us"), col("view_value"))
        .orderBy(col("event_id"))
    },

    // ---- a04: as-of join with tolerance -------------------------------
    // a01 with pandas-merge_asof/kdb-wj staleness semantics: a match
    // older than 10 minutes yields null payloads instead (a staler view
    // is never a better answer). Oracle = DuckDB ASOF LEFT JOIN with the
    // same freshness CASE applied to the matched row.
    "a04_asof_tolerance" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("view_value"))
        .select(col("user_id"), col("ts"),
          unix_micros(col("ts")).as("view_us"), col("view_value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"),
          unix_micros(col("ts")).as("click_us"))
      AsofJoin.backwardWithin(clicks, views, key = "user_id",
          leftTime = "ts", rightTime = "ts",
          payload = Seq("view_us", "view_value"),
          toleranceUs = 10L * 60 * 1000 * 1000)
        .select(col("event_id"), col("user_id"), col("click_us"),
          col("view_us"), col("view_value"))
        .orderBy(col("event_id"))
    },

    // ---- a03: as-of join, skew-proof two-level shape ------------------
    // Same query as a01 through AsofJoin.backwardBinned with hourly time
    // bins: the detailed window partitions by (user, hour) instead of
    // (user), so one hot user's history never serializes into one task.
    // Oracled against the SAME DuckDB ASOF JOIN as a01 — the gate proves
    // the two-level rewrite exact, not approximately equal.
    "a03_asof_join_binned" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("view_value"))
        .select(col("user_id"), col("ts"),
          unix_micros(col("ts")).as("view_us"), col("view_value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"),
          unix_micros(col("ts")).as("click_us"))
      AsofJoin.backwardBinned(clicks, views, key = "user_id",
          leftTime = "ts", rightTime = "ts",
          payload = Seq("view_us", "view_value"),
          bin = c => floor(unix_micros(c) / lit(3600000000L)))
        .select(col("event_id"), col("user_id"), col("click_us"),
          col("view_us"), col("view_value"))
        .orderBy(col("event_id"))
    },

    // ---- a02: interval × point range join -----------------------------
    // Clicks landing inside the 15-minute window after each error event —
    // a pure range join (no equi key), which the bin-bucketed RangeJoin
    // turns into an equi-join on 15-minute bins; the reference (and naive
    // Spark SQL) would plan the same predicate as a cartesian filter.
    "a02_range_join" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("ts").as("err_ts"),
          (col("ts") + expr("INTERVAL 15 MINUTES")).as("err_end"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("ts").as("click_ts"),
          col("value").as("click_value"))
      RangeJoin.pointInInterval(errors, "err_ts", "err_end",
          clicks, "click_ts", binSeconds = 900L)
        .groupBy(col("err_id"))
        .agg(count(lit(1)).cast("long").as("n_clicks"),
          expr("CAST(ROUND(sum(CAST(click_value AS DECIMAL(18,6))), 4) AS DOUBLE)")
            .as("total_value"))
        .orderBy(col("err_id"))
    }
  )

  val oracles: Map[String, String] = Map(
    "a01_asof_join" ->
      """SELECT c.event_id, c.user_id, epoch_us(c.ts) AS click_us,
        |  epoch_us(v.ts) AS view_us, v.view_value
        |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |      FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (
        |  SELECT user_id, ts, max(value) AS view_value
        |  FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |        FROM events WHERE event_type = 'view')
        |  GROUP BY user_id, ts) v
        |  ON c.user_id = v.user_id AND c.ts >= v.ts
        |ORDER BY c.event_id""".stripMargin,

    "a04_asof_tolerance" ->
      """SELECT c.event_id, c.user_id, epoch_us(c.ts) AS click_us,
        |  CASE WHEN epoch_us(c.ts) - epoch_us(v.ts) <= 600000000
        |       THEN epoch_us(v.ts) END AS view_us,
        |  CASE WHEN epoch_us(c.ts) - epoch_us(v.ts) <= 600000000
        |       THEN v.view_value END AS view_value
        |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |      FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (
        |  SELECT user_id, ts, max(value) AS view_value
        |  FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |        FROM events WHERE event_type = 'view')
        |  GROUP BY user_id, ts) v
        |  ON c.user_id = v.user_id AND c.ts >= v.ts
        |ORDER BY c.event_id""".stripMargin,

    "a03_asof_join_binned" ->
      """SELECT c.event_id, c.user_id, epoch_us(c.ts) AS click_us,
        |  epoch_us(v.ts) AS view_us, v.view_value
        |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |      FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (
        |  SELECT user_id, ts, max(value) AS view_value
        |  FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |        FROM events WHERE event_type = 'view')
        |  GROUP BY user_id, ts) v
        |  ON c.user_id = v.user_id AND c.ts >= v.ts
        |ORDER BY c.event_id""".stripMargin,

    "a02_range_join" ->
      """SELECT e.event_id AS err_id, count(*) AS n_clicks,
        |  CAST(ROUND(sum(CAST(c.value AS DECIMAL(18,6))), 4) AS DOUBLE) AS total_value
        |FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts
        |      FROM events WHERE event_type = 'error') e
        |JOIN (SELECT CAST(ts AS TIMESTAMP) AS ts, value
        |      FROM events WHERE event_type = 'click') c
        |  ON c.ts >= e.ts AND c.ts < e.ts + INTERVAL 15 MINUTE
        |GROUP BY e.event_id
        |ORDER BY e.event_id""".stripMargin
  )
}
