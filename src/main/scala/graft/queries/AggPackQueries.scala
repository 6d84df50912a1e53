package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.functions.ChAggregates

/** ClickHouse parametric-aggregate surface #2 over `events` — topK,
  * quantileExactInclusive/medianExact, argMin/argMax, and the `-If`
  * combinators ([[graft.functions.ChAggregates]]).
  *
  * Oracle discipline follows the b01-b04 pack: every DuckDB oracle is an
  * independent relational formulation (row_number windows, FILTER
  * clauses, quantile_cont) of the semantics the Spark side computes
  * through the registered CH-named aggregates — never the same code run
  * twice.
  *
  * b05's correctness entry deliberately runs topK in its EXACT regime
  * (event_type's domain ≪ the 16-counter capacity, so no partial summary
  * ever fills and SpaceSaving degenerates to exact counting — this is the
  * regime where an exact relational oracle exists at any scale factor);
  * the approximate regime's guarantees are property-tested in
  * AggPackSpec instead, where an oracle hash cannot reach.
  */
object AggPackQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- b05: topK(3)(event_type) per day — SpaceSaving --------------
    // Bounded-state heavy hitters: per (day) group the summary holds at
    // most 16 (value, count, error) triples however many events the day
    // has. posexplode emits (rank, value, count) rows, rank 0-based by
    // (count DESC, value ASC).
    "b05_topk" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      ChAggregates.register(s)
      s.sql(
        """WITH t AS (
          |  SELECT CAST(date_trunc('DAY', ts) AS DATE) AS day,
          |    top_k_3(event_type) AS tk
          |  FROM events GROUP BY 1
          |)
          |SELECT day, CAST(r AS INT) AS rank, p._1 AS etype,
          |  CAST(p._2 AS BIGINT) AS cnt
          |FROM t LATERAL VIEW posexplode(tk) AS r, p
          |ORDER BY day, rank""".stripMargin)
    },

    // ---- b11: topKWeighted(3)(event_type, w) per day -----------------
    // SpaceSaving with weighted increments (same bounded state, same
    // floor rule); integer centi-value weights keep both engines exact.
    // Domain (5 types) << capacity (16) -> the exact regime, where the
    // summary equals the true weighted ranking.
    "b11_topk_weighted" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      ChAggregates.register(s)
      s.sql(
        """WITH t AS (
          |  SELECT CAST(date_trunc('DAY', ts) AS DATE) AS day,
          |    top_k_weighted_3(event_type,
          |      CAST(round(value * 100) AS BIGINT)) AS tk
          |  FROM events GROUP BY 1
          |)
          |SELECT day, CAST(r AS INT) AS rank, p._1 AS etype,
          |  CAST(p._2 AS BIGINT) AS wsum
          |FROM t LATERAL VIEW posexplode(tk) AS r, p
          |ORDER BY day, rank""".stripMargin)
    },

    // ---- b12: avgWeighted / sumCount ---------------------------------
    // avgWeighted = Σxw/Σw in one aggregation pass; sumCount returns the
    // (sum, count) tuple, unpacked here through the CH tupleElement
    // function. Decimal sum keeps the tuple's first element order-exact.
    "b12_avg_weighted" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      ChAggregates.register(s)
      graft.functions.ClickHouseFunctions.register(s)
      s.sql(
        """SELECT event_type,
          |  round(avgWeighted(value, CAST(user_id % 100 + 1 AS DOUBLE)), 4) AS aw,
          |  CAST(ROUND(tupleElement(sumCount(CAST(value AS DECIMAL(18,6))), 1), 4)
          |    AS DOUBLE) AS sc_sum,
          |  CAST(tupleElement(sumCount(CAST(value AS DECIMAL(18,6))), 2) AS BIGINT)
          |    AS sc_n
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
    },

    // ---- b06: quantileExactInclusive / medianExact -------------------
    // Catalyst Percentile (continuous interpolation at rank p*(n-1)) ==
    // CH quantileExactInclusive == DuckDB quantile_cont; round(6)
    // absorbs the final interpolation ulp.
    "b06_quantiles" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      ChAggregates.register(s)
      s.sql(
        """SELECT event_type,
          |  round(quantileExactInclusive(value, 0.25d), 6) AS q25,
          |  round(medianExact(value), 6) AS q50,
          |  round(quantileExactInclusive(value, 0.75d), 6) AS q75,
          |  round(quantileExactInclusive(value, 0.99d), 6) AS q99
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
    },

    // ---- b07: argMin / argMax with tuple tie-break -------------------
    // CH argMax(arg, tuple(val, uniq)) — the deterministic form; maps to
    // Catalyst MaxBy/MinBy over a struct ordering (event_id is unique, so
    // equal-ts ties cannot make the answer layout-dependent).
    "b07_argminmax" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      ChAggregates.register(s)
      s.sql(
        """SELECT event_type,
          |  argMax(user_id, struct(ts, event_id)) AS last_user,
          |  argMin(user_id, struct(ts, event_id)) AS first_user
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
    },

    // ---- b08: -If combinator family ----------------------------------
    // Each runs as the plain Catalyst aggregate with a FILTER clause —
    // inside whole-stage codegen'd HashAggregate, one pass, no UDF. Sums
    // go through DECIMAL (exact, order-independent) per the e01
    // convention; avgIf runs over an integer expression whose double sum
    // is exact at any partition order.
    "b08_if_combinators" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      ChAggregates.register(s)
      s.sql(
        """SELECT CAST(date_trunc('DAY', ts) AS DATE) AS day,
          |  CAST(countIf(event_type = 'purchase') AS BIGINT) AS n_purch,
          |  CAST(ROUND(sumIf(CAST(value AS DECIMAL(18,6)), event_type = 'purchase'), 4)
          |    AS DOUBLE) AS v_purch,
          |  round(avgIf(user_id % 100, event_type = 'view'), 6) AS avg_view_bucket,
          |  round(maxIf(value, event_type = 'click'), 6) AS max_click,
          |  round(minIf(value, event_type = 'click'), 6) AS min_click
          |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)
    },

    // ---- b09: approximate quantiles (quantileTDigest / quantile) -----
    // Each engine's sketch differs (Spark: GK summaries, rank error
    // ≤ n/10000; DuckDB: t-digest), so the cross-engine-stable output is
    // the f05 discipline: the EXACT quantiles plus a flag that the
    // engine's own approx answer lands inside a ±1%-rank exact bound —
    // 100× looser than either sketch's real error, identical TRUE on
    // both sides. The plural form rides the same bound.
    "b09_approx_quantiles" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      ChAggregates.register(s)
      s.sql(
        """SELECT event_type,
          |  round(quantileExactInclusive(value, 0.5d), 6) AS ex50,
          |  round(quantileExactInclusive(value, 0.9d), 6) AS ex90,
          |  CAST(quantileTDigest(value, 0.5d)
          |    BETWEEN quantileExactInclusive(value, 0.49d)
          |        AND quantileExactInclusive(value, 0.51d) AS INT) AS ok50,
          |  CAST(quantile(value, 0.9d)
          |    BETWEEN quantileExactInclusive(value, 0.89d)
          |        AND quantileExactInclusive(value, 0.91d) AS INT) AS ok90,
          |  CAST(element_at(quantilesTDigest(value, 0.5d, 0.9d), 2)
          |    BETWEEN quantileExactInclusive(value, 0.89d)
          |        AND quantileExactInclusive(value, 0.91d) AS INT) AS ok_plural
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
    },

    // ---- b10: statistical moments / bit aggregates / uniq family -----
    // varPop/stddevPop/varSamp/stddevSamp/covarPop/covarSamp/corr against
    // DuckDB's same-formula natives; skewPop/kurtPop against DuckDB's
    // explicit central-moment formulation (DuckDB's own skewness/kurtosis
    // are SAMPLE-based, different formulas — CH's are population, and
    // kurtPop is non-excess); bit aggregates are exact integers; uniq
    // (HLL++) rides the f05 error-bound discipline.
    "b10_stats_pack" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      ChAggregates.register(s)
      s.sql(
        """SELECT event_type,
          |  round(varPop(value), 4) AS var_p,
          |  round(stddevPop(value), 4) AS sd_p,
          |  round(varSamp(value), 4) AS var_s,
          |  round(stddevSamp(value), 4) AS sd_s,
          |  round(covarPop(value, CAST(user_id % 100 AS DOUBLE)), 4) AS cov_p,
          |  round(covarSamp(value, CAST(user_id % 100 AS DOUBLE)), 4) AS cov_s,
          |  round(corr(value, CAST(user_id % 100 AS DOUBLE)), 4) AS cor,
          |  round(skewPop(value), 4) AS skew_p,
          |  round(kurtPop(value), 4) AS kurt_p,
          |  CAST(groupBitAnd(user_id) AS BIGINT) AS band,
          |  CAST(groupBitOr(user_id) AS BIGINT) AS bor,
          |  CAST(groupBitXor(user_id) AS BIGINT) AS bxor,
          |  CAST(uniqExact(user_id) AS BIGINT) AS nu_exact,
          |  CAST(abs(uniq(user_id) - count(DISTINCT user_id))
          |    <= 0.05 * count(DISTINCT user_id) AS INT) AS uniq_within_5pct
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
    }
  )

  val oracles: Map[String, String] = Map(
    "b12_avg_weighted" ->
      """SELECT event_type,
        |  round(sum(value * CAST(user_id % 100 + 1 AS DOUBLE))
        |    / sum(CAST(user_id % 100 + 1 AS DOUBLE)), 4) AS aw,
        |  CAST(ROUND(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sc_sum,
        |  CAST(count(value) AS BIGINT) AS sc_n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Exact weighted top-3 by (weight DESC, value ASC) — equals the
    // SpaceSaving output in the exact regime (domain < capacity).
    "b11_topk_weighted" ->
      """WITH c AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        |    sum(CAST(round(value * 100) AS BIGINT)) AS w
        |  FROM events GROUP BY 1, 2
        |), r AS (
        |  SELECT day, event_type, w,
        |    row_number() OVER (PARTITION BY day
        |                       ORDER BY w DESC, event_type) AS rn
        |  FROM c
        |)
        |SELECT day, CAST(rn - 1 AS INT) AS rank, event_type AS etype,
        |  CAST(w AS BIGINT) AS wsum
        |FROM r WHERE rn <= 3 ORDER BY day, rank""".stripMargin,

    "b10_stats_pack" ->
      """WITH g AS (
        |  SELECT event_type, avg(value) AS mu FROM events GROUP BY 1
        |)
        |SELECT e.event_type,
        |  round(var_pop(value), 4) AS var_p,
        |  round(stddev_pop(value), 4) AS sd_p,
        |  round(var_samp(value), 4) AS var_s,
        |  round(stddev_samp(value), 4) AS sd_s,
        |  round(covar_pop(value, CAST(user_id % 100 AS DOUBLE)), 4) AS cov_p,
        |  round(covar_samp(value, CAST(user_id % 100 AS DOUBLE)), 4) AS cov_s,
        |  round(corr(value, CAST(user_id % 100 AS DOUBLE)), 4) AS cor,
        |  round((sum(pow(value - mu, 3)) / count(*))
        |    / pow(sum(pow(value - mu, 2)) / count(*), 1.5), 4) AS skew_p,
        |  round((sum(pow(value - mu, 4)) / count(*))
        |    / pow(sum(pow(value - mu, 2)) / count(*), 2.0), 4) AS kurt_p,
        |  CAST(bit_and(user_id) AS BIGINT) AS band,
        |  CAST(bit_or(user_id) AS BIGINT) AS bor,
        |  CAST(bit_xor(user_id) AS BIGINT) AS bxor,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS nu_exact,
        |  CAST(abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
        |    <= 0.05 * count(DISTINCT user_id) AS INT) AS uniq_within_5pct
        |FROM events e JOIN g USING (event_type)
        |GROUP BY e.event_type, mu ORDER BY e.event_type""".stripMargin,

    "b09_approx_quantiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 6) AS ex50,
        |  round(quantile_cont(value, 0.9), 6) AS ex90,
        |  CAST(approx_quantile(value, 0.5)
        |    BETWEEN quantile_cont(value, 0.49)
        |        AND quantile_cont(value, 0.51) AS INT) AS ok50,
        |  CAST(approx_quantile(value, 0.9)
        |    BETWEEN quantile_cont(value, 0.89)
        |        AND quantile_cont(value, 0.91) AS INT) AS ok90,
        |  CAST(approx_quantile(value, 0.9)
        |    BETWEEN quantile_cont(value, 0.89)
        |        AND quantile_cont(value, 0.91) AS INT) AS ok_plural
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Exact top-3 by (count DESC, value ASC) — equal to SpaceSaving's
    // output in the exact regime (domain < capacity).
    "b05_topk" ->
      """WITH c AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1, 2
        |), r AS (
        |  SELECT day, event_type, cnt,
        |    row_number() OVER (PARTITION BY day
        |                       ORDER BY cnt DESC, event_type) AS rn
        |  FROM c
        |)
        |SELECT day, CAST(rn - 1 AS INT) AS rank, event_type AS etype,
        |  CAST(cnt AS BIGINT) AS cnt
        |FROM r WHERE rn <= 3 ORDER BY day, rank""".stripMargin,

    "b06_quantiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.25), 6) AS q25,
        |  round(quantile_cont(value, 0.5), 6) AS q50,
        |  round(quantile_cont(value, 0.75), 6) AS q75,
        |  round(quantile_cont(value, 0.99), 6) AS q99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Independent window formulation of argMin/argMax.
    "b07_argminmax" ->
      """WITH r AS (
        |  SELECT event_type, user_id,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY ts DESC, event_id DESC) AS ra,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY ts ASC, event_id ASC) AS ri
        |  FROM events
        |)
        |SELECT event_type,
        |  max(CASE WHEN ra = 1 THEN user_id END) AS last_user,
        |  max(CASE WHEN ri = 1 THEN user_id END) AS first_user
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,

    // DuckDB's own FILTER clause — the ANSI spelling of -If.
    "b08_if_combinators" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |  CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purch,
        |  CAST(ROUND(sum(CAST(value AS DECIMAL(18,6)))
        |    FILTER (WHERE event_type = 'purchase'), 4) AS DOUBLE) AS v_purch,
        |  round(avg(user_id % 100) FILTER (WHERE event_type = 'view'), 6)
        |    AS avg_view_bucket,
        |  round(max(value) FILTER (WHERE event_type = 'click'), 6) AS max_click,
        |  round(min(value) FILTER (WHERE event_type = 'click'), 6) AS min_click
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
