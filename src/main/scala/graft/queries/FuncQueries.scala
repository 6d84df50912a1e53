package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.functions.ClickHouseFunctions

/** Coverage for the reference's scalar-function packs and the aggregate /
  * window / set-op gaps flagged in round 1 (VERDICT §2.5-2.7): the CH
  * datetime pack under the oracle gate, LIKE, date_part/date_trunc, avg,
  * sum(DISTINCT), approx_count_distinct, collect_list, NULLIF, TRY_CAST,
  * RANGE window frames, INTERSECT/EXCEPT ALL, math/string/regex/crypto
  * packs, and the first queries over `events`.
  */
object FuncQueries {
  import Q._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CH datetime pack under CORRECTNESS (not just unit tests) — reference
    // kernels crates/datafusion/src/physical_plan/clickhouse.rs:260-822.
    "f01_ch_datetime" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      ClickHouseFunctions.register(s)
      s.sql(
        """SELECT CAST(toYear(ts) AS INT) AS yr,
          |  CAST(toQuarter(ts) AS INT) AS qtr,
          |  CAST(toMonth(ts) AS INT) AS mth,
          |  CAST(toDayOfWeek(ts) AS INT) AS dow,
          |  count(*) AS n,
          |  CAST(min(toDayOfMonth(ts)) AS INT) AS min_dom,
          |  CAST(max(toHour(ts)) AS INT) AS max_hr
          |FROM events
          |GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4""".stripMargin)
    },

    // LIKE / NOT LIKE (TPC-H Q9/Q14/Q16 shapes,
    // tpch/01095_tpch_like_smoke.sql:374,504,562).
    "f02_like" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        s"""SELECT
           |  CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN 1 ELSE 0 END) AS BIGINT) AS n_promo,
           |  CAST(sum(CASE WHEN p_name LIKE '%red%' THEN 1 ELSE 0 END) AS BIGINT) AS n_red,
           |  CAST(sum(CASE WHEN p_name NOT LIKE '%o%' THEN 1 ELSE 0 END) AS BIGINT) AS n_no_o,
           |  CAST(sum(CASE WHEN p_brand LIKE 'Brand#1_' THEN 1 ELSE 0 END) AS BIGINT) AS n_brand1x
           |FROM part""".stripMargin)
    },

    // Generic datetime pack: date_part + date_trunc (reference
    // datetime_expressions.rs; the baseline group-by anchor is date_part).
    "f03_date_part_trunc" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT CAST(date_part('year', o_orderdate) AS INT) AS yr,
          |  date_trunc('quarter', o_orderdate) AS qstart,
          |  count(*) AS n
          |FROM orders
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    },

    // avg / sum(DISTINCT) / count(DISTINCT) (reference average.rs,
    // distinct_expressions.rs). avg is exact: decimal sum cast to double
    // divided by the long count — identical IEEE ops in both engines.
    "f04_agg_pack" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        s"""SELECT l_returnflag,
           |  CAST(ROUND(CAST(sum(${decSql("l_quantity")}) AS DOUBLE) / count(*), 4) AS DOUBLE) AS avg_qty,
           |  CAST(ROUND(avg(CAST(l_discount AS DOUBLE)), 4) AS DOUBLE) AS avg_disc,
           |  CAST(sum(DISTINCT CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_dist_qty,
           |  count(DISTINCT l_suppkey) AS n_supp
           |FROM lineitem
           |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    },

    // approx_count_distinct (HLL++ here, the reference ships its own HLL:
    // expressions/approx_distinct.rs). The estimators differ across
    // engines, so the oracle-stable output is the error-bound check plus
    // the exact count.
    "f05_approx_distinct" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT count(DISTINCT l_partkey) AS exact_parts,
          |  CAST(abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
          |    <= 0.05 * count(DISTINCT l_partkey) AS INT) AS approx_within_5pct
          |FROM lineitem""".stripMargin)
    },

    // array_agg / collect_list (reference array_agg.rs) — deterministic via
    // distinct + sort + join to string.
    "f06_collect_list" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT o_orderstatus,
          |  array_join(array_sort(array_distinct(collect_list(o_orderpriority))), ',') AS prios,
          |  count(*) AS n
          |FROM orders
          |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    },

    // NULLIF + TRY_CAST (reference nullif.rs, try_cast.rs).
    "f07_nullif_trycast" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      // perf note (measured, PERF.md r6): the n_uncastable branch is
      // ~10 µs/row because EVERY o_orderstatus fails the int cast and
      // Spark's TRY path throws-and-catches per failure (stack-trace
      // fill). This entry keeps the TRY_CAST coverage semantics; the
      // scale shape is f07b below (RLIKE prefilter, measured 9× at
      // sf0.1 — PERF.md r7)
      // layout-conditional spread (r19-opt): the TRY throw/catch work is
      // ~10 µs/row, so a clumped single-row-group layout serializes the
      // whole pass on one task (measured 2.2 s -> 0.7-0.9 s spread at
      // sf0.1); on a well-split production layout the hint is empty.
      // Cheap-expression aggregates do NOT get this treatment — for them
      // the exchange costs more than the parallelism saves (measured:
      // f21-shaped datediff pack 0.35 s plain vs 0.7-0.8 s spread).
      s.sql(
        s"""SELECT
          |  CAST(sum(CASE WHEN NULLIF(o_orderstatus, 'F') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
          |  CAST(sum(TRY_CAST(substr(o_orderpriority, 1, 1) AS INT)) AS BIGINT) AS prio_sum,
          |  CAST(sum(CASE WHEN TRY_CAST(o_orderstatus AS INT) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_uncastable
          |FROM (SELECT ${Tables.spreadHint(s)} o_orderstatus, o_orderpriority
          |      FROM orders)""".stripMargin)
    },

    // The scale shape PERF.md's f07 note prescribes, as executable code
    // (VERDICT r6 #5): prefilter with a cheap codegen'd regex so only
    // plausible rows reach TRY_CAST — Spark's TRY path throws-and-catches
    // per FAILING row (~10 µs each, stack-trace fill), so on a
    // mostly-dirty 100 TB column the naive form pays that on every row
    // while this one pays it ~never. The prefilter admits exactly the
    // integer forms BOTH engines' casts accept identically: optional
    // space padding and an optional +/- sign (ADVICE r7). It deliberately
    // REJECTS decimal forms like '3.5' even though each engine's cast
    // accepts them, because they disagree on the value (Spark truncates
    // toward zero -> 3, DuckDB rounds half away -> 4) — admitting them
    // would be a cross-engine wrong answer, not a perf choice. So f07b
    // equals f07 on space-padded/signed/plain integer data and diverges
    // by design on decimal-form or exotic-whitespace strings; the
    // measured 9x A/B lives in PERF.md.
    "f07b_trycast_prefiltered" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT
          |  CAST(sum(TRY_CAST(CASE WHEN substr(o_orderpriority, 1, 1) RLIKE '^ *[+-]?[0-9]+ *$'
          |    THEN trim(substr(o_orderpriority, 1, 1)) END AS INT)) AS BIGINT) AS prio_sum,
          |  CAST(sum(CASE WHEN o_orderstatus RLIKE '^ *[+-]?[0-9]+ *$'
          |      AND TRY_CAST(trim(o_orderstatus) AS INT) IS NOT NULL
          |    THEN 0 ELSE 1 END) AS BIGINT) AS n_uncastable
          |FROM orders""".stripMargin)
    },

    // RANGE window frames (reference parses but barely executes them,
    // logical_plan/window_frames.rs:130-226; Spark runs them natively).
    "f08_range_frames" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        s"""SELECT o_orderkey, o_custkey,
           |  CAST(ROUND(sum(${decSql("o_totalprice")}) OVER (
           |    PARTITION BY o_custkey ORDER BY ${decSql("o_totalprice")}
           |    RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS near_sum,
           |  CAST(ROUND(sum(${decSql("o_totalprice")}) OVER (
           |    PARTITION BY o_custkey ORDER BY ${decSql("o_totalprice")}
           |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS cum_sum
           |FROM orders WHERE o_custkey < 20""".stripMargin)
    },

    // INTERSECT ALL / EXCEPT ALL (bag semantics; reference rewrites the
    // DISTINCT forms only, sql/planner.rs:260-271).
    "f09_intersect_except_all" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT nationkey, count(*) AS n FROM (
          |  SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
          |  INTERSECT ALL
          |  SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 1000
          |) t GROUP BY nationkey
          |UNION ALL
          |SELECT -1 - nationkey AS nationkey, count(*) AS n FROM (
          |  SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
          |  EXCEPT ALL
          |  SELECT s_nationkey AS nationkey FROM supplier
          |) t GROUP BY nationkey
          |ORDER BY nationkey""".stripMargin)
    },

    // String/regex/crypto packs (reference string_expressions.rs,
    // unicode_expressions.rs, regex_expressions.rs, crypto_expressions.rs).
    "f10_string_pack" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT n_name,
          |  upper(n_name) AS up, lower(n_name) AS lo,
          |  length(n_name) AS len,
          |  substr(n_name, 2, 3) AS sub,
          |  lpad(n_name, 12, '.') AS pad_l, rpad(n_name, 12, '.') AS pad_r,
          |  reverse(n_name) AS rev,
          |  replace(n_name, 'A', '@') AS repl,
          |  concat(n_name, '-', CAST(n_nationkey AS STRING)) AS cat,
          |  trim('  x  ') AS trimmed,
          |  repeat('ab', 3) AS rep,
          |  translate(n_name, 'AEI', 'aei') AS tran,
          |  left(n_name, 3) AS l3, right(n_name, 3) AS r3,
          |  split_part(n_name, 'A', 1) AS sp1,
          |  instr(n_name, 'AN') AS pos_an,
          |  regexp_replace(n_name, '[AEIOU]', '*') AS re_repl,
          |  regexp_extract(n_name, '([A-Z]+)', 1) AS re_ext,
          |  md5(n_name) AS h_md5,
          |  sha2(n_name, 256) AS h_sha
          |FROM nation ORDER BY n_name""".stripMargin)
    },

    // Math pack (reference math_expressions.rs). Transcendentals rounded
    // (libm vs StrictMath can differ 1 ulp); sqrt/abs/sign/floor/ceil are
    // exact IEEE.
    "f11_math_pack" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT n_nationkey AS k,
          |  abs(n_nationkey - 12) AS a,
          |  CAST(ceil(n_nationkey / 4.0) AS BIGINT) AS ce,
          |  CAST(floor(n_nationkey / 4.0) AS BIGINT) AS fl,
          |  round(CAST(n_nationkey AS DOUBLE) / CAST(7 AS DOUBLE), 3) AS rd,
          |  sqrt(CAST(n_nationkey AS DOUBLE)) AS sq,
          |  CAST(sign(n_nationkey - 12) AS INT) AS sg,
          |  round(exp(n_nationkey / 10.0), 6) AS ex,
          |  round(ln(n_nationkey + 1.0), 6) AS l_n,
          |  round(log10(n_nationkey + 1.0), 6) AS l10,
          |  round(power(n_nationkey, 2.0), 1) AS pw,
          |  pmod(n_nationkey, 7) AS md
          |FROM nation ORDER BY k""".stripMargin)
    },

    // CH-named scalar surface #2 (round-10 widening of the §2.7 pack):
    // array membership/position/concat, splitByChar, empty/notEmpty,
    // toString/ifNull, the named arithmetic (plus/minus/multiply/divide/
    // intDiv/modulo) and the bit family — every one a thin builder over a
    // codegen'd Catalyst built-in, oracled against DuckDB natives.
    "f12_ch_scalar_pack2" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      ClickHouseFunctions.register(s)
      s.sql(
        """WITH a AS (
          |  SELECT n_nationkey AS k, n_name, splitByChar('A', n_name) AS parts
          |  FROM nation
          |)
          |SELECT k,
          |  has(parts, '') AS has_empty,
          |  CAST(indexOf(parts, '') AS BIGINT) AS idx_empty,
          |  arrayStringConcat(parts, '|') AS joined,
          |  empty(n_name) AS is_empty, notEmpty(n_name) AS not_empty,
          |  CAST(lengthUTF8(n_name) AS INT) AS len8,
          |  lowerUTF8(n_name) AS lo8,
          |  upperUTF8(lowerUTF8(n_name)) = n_name AS up_ok,
          |  toString(k) AS k_str,
          |  ifNull(nullif(n_name, 'FRANCE'), '-') AS not_france,
          |  CAST(plus(k, 100) AS INT) AS p100,
          |  CAST(minus(k, 5) AS INT) AS m5,
          |  CAST(multiply(k, 3) AS INT) AS x3,
          |  round(divide(k + 1, 4), 6) AS fdiv,
          |  CAST(intDiv(k + 7, 3) AS INT) AS idiv,
          |  CAST(modulo(k + 7, 3) AS INT) AS imod,
          |  CAST(bitAnd(k, 12) AS INT) AS b_and,
          |  CAST(bitOr(k, 5) AS INT) AS b_or,
          |  CAST(bitXor(k, 9) AS INT) AS b_xor,
          |  CAST(bitNot(k) AS INT) AS b_not
          |FROM a ORDER BY k""".stripMargin)
    },

    // arrayJoin — CH's row-multiplying function == the explode generator;
    // one row per array element, oracled against DuckDB unnest.
    "f13_array_join" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      ClickHouseFunctions.register(s)
      s.sql(
        """SELECT k, part FROM (
          |  SELECT n_nationkey AS k, arrayJoin(splitByChar('A', n_name)) AS part
          |  FROM nation
          |) ORDER BY k, part""".stripMargin)
    },

    // CH datetime pack #2: toStartOf* truncation, add*/subtract*
    // arithmetic, dateDiff, toUnixTimestamp — all over the events ts.
    // Timestamps compare at µs via unix_micros/epoch_us (e02 convention);
    // toUnixTimestamp floors (Spark timestamp→long == epoch_us // 1e6).
    "f14_ch_datetime2" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      ClickHouseFunctions.register(s)
      s.sql(
        """SELECT CAST(toStartOfMonth(ts) AS DATE) AS month,
          |  count(*) AS n,
          |  CAST(min(unix_micros(toStartOfDay(ts))) AS BIGINT) AS min_day_us,
          |  CAST(max(unix_micros(toStartOfHour(ts))) AS BIGINT) AS max_hr_us,
          |  CAST(min(unix_micros(toStartOfMinute(ts))) AS BIGINT) AS min_min_us,
          |  CAST(max(unix_micros(addHours(ts, 3))) AS BIGINT) AS max_add3h_us,
          |  CAST(min(unix_micros(addSeconds(ts, -90))) AS BIGINT) AS min_sub90s_us,
          |  CAST(max(unix_micros(CAST(addDays(CAST(ts AS DATE), 7) AS TIMESTAMP)))
          |    AS BIGINT) AS max_add7d_us,
          |  CAST(min(unix_micros(CAST(subtractMonths(CAST(ts AS DATE), 1) AS TIMESTAMP)))
          |    AS BIGINT) AS min_sub1m_us,
          |  CAST(max(unix_micros(CAST(toMonday(ts) AS TIMESTAMP))) AS BIGINT)
          |    AS max_monday_us,
          |  CAST(min(unix_micros(CAST(toStartOfQuarter(ts) AS TIMESTAMP))) AS BIGINT)
          |    AS min_qtr_us,
          |  CAST(min(toUnixTimestamp(ts)) AS BIGINT) AS min_unix,
          |  CAST(max(dateDiff(day, CAST(toStartOfYear(ts) AS TIMESTAMP), ts))
          |    AS BIGINT) AS max_days_into_year
          |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)
    },

    // CH array higher-order pack (f15): arrayMap/Filter/Exists/All/Count/
    // First, arraySum/Avg/Min/Max (lambda-first CH arg order), key-function
    // arraySort/arrayReverseSort (decorate-sort-undecorate), set/slice/
    // push/pop surface, arrayEnumerate, range, and the 2-array arrayMap
    // (ZipWith). Every builder is a codegen'd Catalyst higher-order
    // expression; array outputs stringify so the driver hashes scalars.
    "f15_array_hof" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      ClickHouseFunctions.register(s)
      s.sql(
        """WITH a AS (
          |  SELECT doc_id,
          |    arrayFilter(w -> notEmpty(w), splitByChar(' ', text)) AS ws
          |  FROM documents WHERE doc_id % 7 = 0
          |)
          |SELECT doc_id,
          |  arrayStringConcat(arrayMap(w -> upperUTF8(w), arraySlice(ws, 1, 5)), ' ')
          |    AS first5_up,
          |  CAST(arrayCount(w -> lengthUTF8(w) > 3, ws) AS BIGINT) AS n_long,
          |  arrayExists(w -> w = 'the', ws) AS has_the,
          |  arrayAll(w -> lengthUTF8(w) < 30, ws) AS all_short,
          |  CAST(arraySum(w -> lengthUTF8(w), ws) AS BIGINT) AS sum_len,
          |  round(arrayAvg(arrayMap(w -> lengthUTF8(w), ws)), 6) AS avg_len,
          |  CAST(arrayMin(arrayMap(w -> lengthUTF8(w), ws)) AS INT) AS min_len,
          |  CAST(arrayMax(arrayMap(w -> lengthUTF8(w), ws)) AS INT) AS max_len,
          |  ifNull(arrayFirst(w -> lengthUTF8(w) > 6, ws), '-') AS first_long,
          |  arrayStringConcat(arraySort(arrayDistinct(arrayMap(w -> lowerUTF8(w),
          |    arrayFilter(w -> lengthUTF8(w) > 6, ws)))), ',') AS longs,
          |  CAST(arrayUniq(ws) AS BIGINT) AS n_uniq,
          |  arrayStringConcat(arrayReverse(arraySlice(ws, 1, 4)), '|') AS rev4,
          |  arrayStringConcat(arraySort(w -> lengthUTF8(w), arraySlice(ws, 1, 6)), ' ')
          |    AS bylen,
          |  arrayStringConcat(arrayReverseSort(w -> lengthUTF8(w), arraySlice(ws, 1, 6)), ' ')
          |    AS bylen_desc,
          |  arrayStringConcat(arrayMap(i -> toString(i),
          |    arrayEnumerate(arraySlice(ws, 1, 3))), ',') AS enum3,
          |  arrayStringConcat(arrayMap(x -> toString(x),
          |    range(CAST(doc_id % 5 AS INT))), ',') AS rng,
          |  arrayStringConcat(arrayPushFront(arrayPushBack(
          |    arrayPopFront(arrayPopBack(arraySlice(ws, 1, 4))), 'E'), 'B'), ' ')
          |    AS shifted,
          |  arrayStringConcat(arrayFlatten(arrayMap(w -> arrayConcat(array(w),
          |    array('.')), arraySlice(ws, 1, 3))), '') AS dotted,
          |  CAST(arraySum(arrayMap((x, y) -> lengthUTF8(x) * y, arraySlice(ws, 1, 5),
          |    arrayEnumerate(arraySlice(ws, 1, 5)))) AS BIGINT) AS wsum
          |FROM a ORDER BY doc_id""".stripMargin)
    },

    // CH JSON + IPv4 packs (f16): JSONExtract{String,Int,Float,Bool}/
    // JSONHas/JSONLength over codegen'd GetJsonObject, and the IPv4
    // numeric<->dotted conversions as pure integer/string arithmetic.
    // The JSON documents are concat-built identically in both engines so
    // no serializer formatting can drift.
    "f16_json_ip" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      ClickHouseFunctions.register(s)
      s.sql(
        """WITH j AS (
          |  SELECT n_nationkey AS k,
          |    concat('{"name":"', n_name, '","region":',
          |      CAST(n_regionkey AS STRING), ',"len":',
          |      CAST(length(n_name) AS STRING), ',"tags":["a","b","c"]',
          |      CASE WHEN n_nationkey % 2 = 0 THEN ',"even":true' ELSE '' END,
          |      '}') AS doc,
          |    CAST(n_nationkey AS BIGINT) * 16909320 + 11 AS ipnum
          |  FROM nation
          |)
          |SELECT k,
          |  JSONExtractString(doc, 'name') AS name,
          |  CAST(JSONExtractInt(doc, 'region') AS BIGINT) AS region,
          |  CAST(JSONExtractInt(doc, 'len') AS BIGINT) AS len,
          |  ifNull(JSONExtractBool(doc, 'even'), false) AS even,
          |  JSONHas(doc, 'even') AS has_even,
          |  JSONHas(doc, 'name') AS has_name,
          |  CAST(JSONLength(JSONExtractString(doc, 'tags')) AS INT) AS n_tags,
          |  round(JSONExtractFloat(doc, 'region') / 2, 4) AS regf,
          |  IPv4NumToString(ipnum) AS ip,
          |  CAST(IPv4StringToNum(IPv4NumToString(ipnum)) AS BIGINT) AS ip_rt
          |FROM j ORDER BY k""".stripMargin)
    },

    // CH conditionals / tuples / array pack #3 (f17): if/multiIf,
    // tuple/tupleElement, arrayReduce over named aggregates,
    // arrayIntersect/arrayWithConstant/arrayElement/countEqual. Oracle
    // recomputes with independent DuckDB formulations (CASE, repeat,
    // negative list index, list_intersect).
    "f17_cond_tuple_pack" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      ClickHouseFunctions.register(s)
      s.sql(
        """SELECT n_nationkey AS k,
          |  if(n_nationkey % 2 = 0, 'even', 'odd') AS par,
          |  multiIf(n_nationkey < 5, 'low', n_nationkey < 15, 'mid', 'high')
          |    AS band,
          |  tupleElement(tuple(n_name, n_nationkey), 1) AS tname,
          |  CAST(tupleElement(tuple(n_name, n_nationkey), 2) AS INT) AS tk,
          |  CAST(arrayReduce('sum',
          |    sequence(1, CAST(n_nationkey % 5 AS INT) + 1)) AS BIGINT) AS rsum,
          |  CAST(arrayReduce('max',
          |    sequence(1, CAST(n_nationkey % 5 AS INT) + 1)) AS INT) AS rmax,
          |  round(arrayReduce('avg',
          |    sequence(1, CAST(n_nationkey % 5 AS INT) + 1)), 6) AS ravg,
          |  CAST(arrayReduce('uniq', splitByChar('A', n_name)) AS INT) AS runiq,
          |  arrayStringConcat(arraySort(arrayIntersect(
          |    splitByChar('A', n_name), array('', 'N', 'RGENTIN'))), ',') AS inter,
          |  arrayStringConcat(arrayWithConstant(3, substr(n_name, 1, 1)), '')
          |    AS triple,
          |  arrayElement(splitByChar('A', n_name), -1) AS last_part,
          |  CAST(countEqual(splitByChar('A', n_name), '') AS INT) AS n_empty
          |FROM nation ORDER BY k""".stripMargin)
    },

    // CH string pack #3 (f18): position family (CH haystack-first order),
    // countSubstrings (non-overlapping, via length arithmetic), trim/pad,
    // substringUTF8, concatWithSeparator, splitByString.
    "f18_string_pack3" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      ClickHouseFunctions.register(s)
      s.sql(
        """SELECT n_nationkey AS k,
          |  CAST(position(n_name, 'A') AS INT) AS pos_a,
          |  CAST(position(n_name, 'zz') AS INT) AS pos_none,
          |  CAST(positionCaseInsensitive(n_name, 'a') AS INT) AS pos_ai,
          |  CAST(countSubstrings(n_name, 'A') AS INT) AS n_a,
          |  CAST(countSubstrings(n_name, '1') AS INT) AS n_one,
          |  startsWith(n_name, 'N') AS sw,
          |  trimBoth(concat('  ', n_name, ' ')) AS tb,
          |  trimLeft(concat('  ', n_name)) AS tl,
          |  trimRight(concat(n_name, '  ')) AS tr2,
          |  leftPad(n_name, 12, '.') AS lp,
          |  rightPad(n_name, 12, '.') AS rp,
          |  leftPad(substr(n_name, 1, 3), 5) AS lp_sp,
          |  substringUTF8(n_name, 2, 3) AS sub3,
          |  substringUTF8(n_name, 3) AS sub_tail,
          |  reverseUTF8(n_name) AS rev,
          |  concatWithSeparator('-', n_name, toString(n_nationkey)) AS cws,
          |  arrayStringConcat(splitByString('_', n_name), '|') AS split_us
          |FROM nation ORDER BY k""".stripMargin)
    },

    // CH format/encode pack (f19): formatDateTime's C-style % codes
    // (translated to the Java pattern at build time; DuckDB's strftime
    // shares the % dialect so the oracle passes the SAME format string),
    // base64, hex (lowercased — Spark upper vs DuckDB lower), bit shifts.
    // CH datetime pack #3 (f20): the bucket-truncation family — the
    // N-minute grids (DuckDB oracle: time_bucket, epoch-aligned the same
    // way), Sunday/Monday week starts, toStartOfInterval over day-time
    // AND year-month intervals, and Date32/DateTime64 constructors.
    // dateDiff (boundary-crossing counts, CH/DuckDB shared semantics) +
    // the relative-ordinal family + fromUnixTimestamp/monthName/dateName/
    // timeSlot/toISOYear. Week diffs pin the Monday-start convention.
    // CH aggregate COMBINATORS (f22, VERDICT r18 task #5): -Array applies
    // the aggregate to array ELEMENTS (per-row element fold is a
    // codegen'd higher-order expression, cross-row fold the matching
    // Catalyst aggregate — one hash aggregate, no explode/shuffle),
    // -Distinct is the DISTINCT aggregate form, -OrNull returns NULL on
    // the empty set. The oracle recomputes everything FLAT from the raw
    // rows — an independent path to the same values.
    "f22_combinators" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      ClickHouseFunctions.register(s)
      // scan discipline: the -Distinct trio shares ONE aggregate (one
      // scan + Expand), the -OrNull trio one empty-filtered aggregate —
      // 3 events scans total where per-scalar subqueries would pay 14
      new graft.exec.GraftSession(s).sql(
        """WITH a AS (SELECT user_id % 40 AS u, CAST(ts AS DATE) AS d,
          |    collect_list(round(value * 100)) AS vs,
          |    collect_list(event_type) AS ets
          |  FROM events GROUP BY user_id % 40, CAST(ts AS DATE)),
          |g AS (SELECT u,
          |    CAST(sumArray(vs) AS DOUBLE) AS sa,
          |    CAST(minArray(vs) AS DOUBLE) AS mna,
          |    CAST(maxArray(vs) AS DOUBLE) AS mxa,
          |    CAST(round(avgArray(vs), 4) AS DOUBLE) AS ava,
          |    countArray(vs) AS ca,
          |    uniqArray(ets) AS ua
          |  FROM a GROUP BY u),
          |s AS (SELECT CAST(sumDistinct(event_id % 97) AS BIGINT) AS sd,
          |    countDistinct(event_type) AS cd,
          |    CAST(round(avgDistinct(event_id % 11), 4) AS DOUBLE) AS ad
          |  FROM events),
          |z AS (SELECT CAST(sumOrNull(value) AS DOUBLE) AS so,
          |    countOrNull(event_id) AS co,
          |    anyOrNull(event_type) AS ao
          |  FROM events WHERE event_id < 0)
          |SELECT g.u, g.sa, g.mna, g.mxa, g.ava, g.ca, g.ua,
          |  s.sd, s.cd, s.ad, z.so, z.co, z.ao
          |FROM g CROSS JOIN s CROSS JOIN z ORDER BY g.u""".stripMargin)
    },

    "f21_datediff_pack" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      ClickHouseFunctions.register(s)
      // through GraftSession: Spark's parser owns `datediff` and rejects
      // the CH quoted-unit form, so the dialect layer must rename it
      new graft.exec.GraftSession(s).sql(
        """SELECT CAST(toYYYYMM(o_orderdate) AS BIGINT) AS ym,
          |  count(*) AS n,
          |  CAST(sum(dateDiff('day', DATE'1995-01-01', o_orderdate))
          |    AS BIGINT) AS dd,
          |  CAST(sum(dateDiff('week', DATE'1995-01-01', o_orderdate))
          |    AS BIGINT) AS dw,
          |  CAST(sum(dateDiff('month', DATE'1995-01-01', o_orderdate))
          |    AS BIGINT) AS dm,
          |  CAST(sum(dateDiff('quarter', DATE'1995-01-01', o_orderdate))
          |    AS BIGINT) AS dq,
          |  CAST(sum(dateDiff('year', DATE'1995-01-01', o_orderdate))
          |    AS BIGINT) AS dy,
          |  CAST(sum(dateDiff('hour', TIMESTAMP'1995-01-01 00:00:00',
          |    o_orderdate)) AS BIGINT) AS dh,
          |  min(monthName(o_orderdate)) AS mn,
          |  min(dateName('weekday', o_orderdate)) AS wd,
          |  CAST(max(toISOYear(o_orderdate)) AS BIGINT) AS iy,
          |  CAST(toUnixTimestamp(fromUnixTimestamp(CAST(min(o_orderkey)
          |    AS BIGINT))) AS BIGINT) AS fu,
          |  fromUnixTimestamp(CAST(min(o_orderkey) AS BIGINT),
          |    '%Y-%m-%d %H:%M:%S') AS fus,
          |  CAST(min(timeSlot(o_orderdate)) AS STRING) AS tsl,
          |  CAST(max(toWeek(o_orderdate)) AS INT) AS w0,
          |  CAST(max(toWeek(o_orderdate, 3)) AS INT) AS w3,
          |  CAST(max(toYearWeek(o_orderdate)) AS BIGINT) AS yw0,
          |  CAST(max(toYearWeek(o_orderdate, 3)) AS BIGINT) AS yw3
          |FROM orders WHERE o_orderkey < 3000
          |GROUP BY 1 ORDER BY 1""".stripMargin)
    },

    "f20_datetime_pack3" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      ClickHouseFunctions.register(s)
      s.sql(
        """SELECT CAST(toStartOfTenMinutes(ts) AS STRING) AS b10,
          |  CAST(toStartOfInterval(ts, INTERVAL 6 HOUR) AS STRING) AS b6h,
          |  CAST(toStartOfWeek(min(ts)) AS STRING) AS wk_sun,
          |  CAST(toStartOfWeek(min(ts), 1) AS STRING) AS wk_mon,
          |  CAST(toStartOfInterval(min(toDate(ts)), INTERVAL 3 MONTH)
          |    AS STRING) AS qtr,
          |  CAST(toDate32(min(ts)) AS STRING) AS d32,
          |  CAST(unix_micros(toDateTime64(CAST(min(event_id) AS DOUBLE)
          |    / 64, 6)) AS BIGINT) AS dt64_us,
          |  count(*) AS n
          |FROM events WHERE event_id < 5000
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    },

    "f19_format_pack" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      ClickHouseFunctions.register(s)
      s.sql(
        """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS n,
          |  formatDateTime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_fmt,
          |  formatDateTime(max(ts), 'day %j of %Y') AS last_fmt,
          |  base64Encode(min(event_type)) AS b64,
          |  base64Decode(base64Encode(max(event_type))) AS b64_rt,
          |  lower(hex(min(event_type))) AS hx,
          |  CAST(bitShiftLeft(CAST(count(*) % 16 AS INT), 2) AS INT) AS shl,
          |  CAST(bitShiftRight(CAST(count(*) AS INT), 3) AS INT) AS shr
          |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)
    },

    // First event-table queries (time-series shape): daily rollup with
    // exact decimal sums.
    "e01_events_daily" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        s"""SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
           |  count(*) AS n,
           |  CAST(ROUND(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS total_value,
           |  count(DISTINCT user_id) AS n_users
           |FROM events
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    },

    // Per-user event gaps via lag over event time (exact integer micros).
    "e02_event_gaps" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """WITH g AS (
          |  SELECT user_id, event_type,
          |    unix_micros(ts) - lag(unix_micros(ts)) OVER (
          |      PARTITION BY user_id ORDER BY unix_micros(ts), event_id) AS gap_us
          |  FROM events
          |)
          |SELECT event_type,
          |  count(*) AS n,
          |  CAST(min(gap_us) AS BIGINT) AS min_gap,
          |  CAST(max(gap_us) AS BIGINT) AS max_gap,
          |  CAST(sum(gap_us) AS BIGINT) AS sum_gap
          |FROM g WHERE gap_us IS NOT NULL
          |GROUP BY event_type ORDER BY event_type""".stripMargin)
    },

    // Batch sessionization — the lag/flag/running-sum classic, the batch
    // twin of graft.streaming.EventStreams.sessionize (same 30-minute
    // inactivity gap; EventStreamsSpec pins streaming == this rule).
    // Both windows partition on user_id — distributed, never global.
    "e03_sessionization" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(sessionizationSql(spark = true))
    }
  )

  /** e03 batch sessionization, one emitter for both dialects: a session
    * break is a NULL or > 30-min gap (lag over user time), session ids
    * are the running sum of breaks, sessions aggregate to a per-size
    * census with exact integer-microsecond durations. 100 TB: one
    * shuffle on user_id serves both windows and the session aggregate;
    * the census is a second small shuffle on n_events.
    */
  private[graft] def sessionizationSql(spark: Boolean): String = {
    val us = if (spark) "unix_micros(ts)" else "epoch_us(ts)"
    s"""WITH x AS (
       |  SELECT user_id, event_id, $us AS t,
       |    CASE WHEN lag($us) OVER (
       |        PARTITION BY user_id ORDER BY $us, event_id) IS NULL
       |      OR $us - lag($us) OVER (
       |        PARTITION BY user_id ORDER BY $us, event_id) > 1800000000
       |    THEN 1 ELSE 0 END AS brk
       |  FROM events
       |), s AS (
       |  SELECT user_id, t, sum(brk) OVER (
       |    PARTITION BY user_id ORDER BY t, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       |  FROM x
       |), sess AS (
       |  SELECT user_id, sid, count(*) AS n_events,
       |    max(t) - min(t) AS dur_us
       |  FROM s GROUP BY user_id, sid
       |)
       |SELECT CAST(n_events AS BIGINT) AS n_events,
       |  CAST(count(*) AS BIGINT) AS n_sessions,
       |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       |  CAST(sum(dur_us) AS BIGINT) AS sum_dur_us,
       |  CAST(max(dur_us) AS BIGINT) AS max_dur_us
       |FROM sess GROUP BY n_events ORDER BY n_events""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // f22: the array layer is the Spark-side mechanism under test; the
    // element multiset per u equals the flat rows per u, so the oracle
    // recomputes flat. avgArray is expressed sum/count (exact
    // integer-valued doubles, one division) to stay order-independent.
    "f22_combinators" ->
      """WITH g AS (SELECT user_id % 40 AS u,
        |    CAST(sum(round(value * 100)) AS DOUBLE) AS sa,
        |    CAST(min(round(value * 100)) AS DOUBLE) AS mna,
        |    CAST(max(round(value * 100)) AS DOUBLE) AS mxa,
        |    CAST(round(sum(round(value * 100)) / count(*), 4) AS DOUBLE)
        |      AS ava,
        |    CAST(count(*) AS BIGINT) AS ca,
        |    CAST(count(DISTINCT event_type) AS BIGINT) AS ua
        |  FROM events GROUP BY 1),
        |s AS (SELECT CAST(sum(DISTINCT event_id % 97) AS BIGINT) AS sd,
        |    CAST(count(DISTINCT event_type) AS BIGINT) AS cd,
        |    CAST(round(avg(DISTINCT event_id % 11), 4) AS DOUBLE) AS ad
        |  FROM events),
        |z AS (SELECT CAST(sum(value) AS DOUBLE) AS so,
        |    CAST(NULLIF(count(event_id), 0) AS BIGINT) AS co,
        |    min(event_type) AS ao
        |  FROM events WHERE event_id < 0)
        |SELECT g.u, g.sa, g.mna, g.mxa, g.ava, g.ca, g.ua,
        |  s.sd, s.cd, s.ad, z.so, z.co, z.ao
        |FROM g CROSS JOIN s CROSS JOIN z ORDER BY g.u""".stripMargin,

    "f21_datediff_pack" ->
      """SELECT CAST(extract(year FROM o_orderdate) * 100 +
        |    extract(month FROM o_orderdate) AS BIGINT) AS ym,
        |  count(*) AS n,
        |  CAST(sum(date_diff('day', DATE '1995-01-01',
        |    CAST(o_orderdate AS DATE))) AS BIGINT) AS dd,
        |  CAST(sum(date_diff('week', DATE '1995-01-01',
        |    CAST(o_orderdate AS DATE))) AS BIGINT) AS dw,
        |  CAST(sum(date_diff('month', DATE '1995-01-01',
        |    CAST(o_orderdate AS DATE))) AS BIGINT) AS dm,
        |  CAST(sum(date_diff('quarter', DATE '1995-01-01',
        |    CAST(o_orderdate AS DATE))) AS BIGINT) AS dq,
        |  CAST(sum(date_diff('year', DATE '1995-01-01',
        |    CAST(o_orderdate AS DATE))) AS BIGINT) AS dy,
        |  CAST(sum(date_diff('hour', TIMESTAMP '1995-01-01 00:00:00',
        |    CAST(o_orderdate AS TIMESTAMP))) AS BIGINT) AS dh,
        |  min(monthname(CAST(o_orderdate AS DATE))) AS mn,
        |  min(dayname(CAST(o_orderdate AS DATE))) AS wd,
        |  CAST(max(isoyear(CAST(o_orderdate AS DATE))) AS BIGINT) AS iy,
        |  CAST(min(o_orderkey) AS BIGINT) AS fu,
        |  strftime(epoch_ms(CAST(min(o_orderkey) AS BIGINT) * 1000),
        |    '%Y-%m-%d %H:%M:%S') AS fus,
        |  CAST(min(CAST(o_orderdate AS TIMESTAMP)) AS VARCHAR) AS tsl,
        |  CAST(max(CAST(strftime(CAST(o_orderdate AS DATE), '%U') AS INT))
        |    AS INT) AS w0,
        |  CAST(max(week(CAST(o_orderdate AS DATE))) AS INT) AS w3,
        |  CAST(max(
        |    year(CAST(o_orderdate AS DATE)
        |         - to_days(CAST(dayofweek(CAST(o_orderdate AS DATE)) AS INTEGER))) * 100 +
        |    CAST(strftime(CAST(o_orderdate AS DATE)
        |         - to_days(CAST(dayofweek(CAST(o_orderdate AS DATE)) AS INTEGER)), '%U')
        |      AS INT)) AS BIGINT) AS yw0,
        |  CAST(max(isoyear(CAST(o_orderdate AS DATE)) * 100 +
        |    week(CAST(o_orderdate AS DATE))) AS BIGINT) AS yw3
        |FROM orders WHERE o_orderkey < 3000
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "f20_datetime_pack3" ->
      """SELECT
        |  CAST(time_bucket(INTERVAL 10 MINUTE, CAST(ts AS TIMESTAMP))
        |    AS STRING) AS b10,
        |  CAST(time_bucket(INTERVAL 6 HOUR, CAST(ts AS TIMESTAMP))
        |    AS STRING) AS b6h,
        |  CAST(CAST(date_trunc('week', CAST(min(ts) AS TIMESTAMP)
        |    + INTERVAL 1 DAY) AS DATE) - 1 AS STRING) AS wk_sun,
        |  CAST(CAST(date_trunc('week', CAST(min(ts) AS TIMESTAMP))
        |    AS DATE) AS STRING) AS wk_mon,
        |  CAST(CAST(date_trunc('quarter', CAST(min(ts) AS TIMESTAMP))
        |    AS DATE) AS STRING) AS qtr,
        |  CAST(CAST(min(ts) AS DATE) AS STRING) AS d32,
        |  CAST(CAST(min(event_id) AS DOUBLE) / 64 * 1000000 AS BIGINT)
        |    AS dt64_us,
        |  count(*) AS n
        |FROM events WHERE event_id < 5000
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "f19_format_pack" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS n,
        |  strftime(min(CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS first_fmt,
        |  strftime(max(CAST(ts AS TIMESTAMP)), 'day %j of %Y') AS last_fmt,
        |  to_base64(CAST(min(event_type) AS BLOB)) AS b64,
        |  decode(from_base64(to_base64(CAST(max(event_type) AS BLOB)))) AS b64_rt,
        |  lower(hex(min(event_type))) AS hx,
        |  CAST((count(*) % 16) << 2 AS INT) AS shl,
        |  CAST(count(*) >> 3 AS INT) AS shr
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "f18_string_pack3" ->
      """SELECT n_nationkey AS k,
        |  CAST(strpos(n_name, 'A') AS INT) AS pos_a,
        |  CAST(strpos(n_name, 'zz') AS INT) AS pos_none,
        |  CAST(strpos(lower(n_name), 'a') AS INT) AS pos_ai,
        |  CAST((length(n_name) - length(replace(n_name, 'A', ''))) // 1 AS INT)
        |    AS n_a,
        |  CAST((length(n_name) - length(replace(n_name, '1', ''))) // 1 AS INT)
        |    AS n_one,
        |  starts_with(n_name, 'N') AS sw,
        |  trim(concat('  ', n_name, ' ')) AS tb,
        |  ltrim(concat('  ', n_name)) AS tl,
        |  rtrim(concat(n_name, '  ')) AS tr2,
        |  lpad(n_name, 12, '.') AS lp,
        |  rpad(n_name, 12, '.') AS rp,
        |  lpad(substr(n_name, 1, 3), 5, ' ') AS lp_sp,
        |  substr(n_name, 2, 3) AS sub3,
        |  substr(n_name, 3) AS sub_tail,
        |  reverse(n_name) AS rev,
        |  concat_ws('-', n_name, CAST(n_nationkey AS VARCHAR)) AS cws,
        |  array_to_string(str_split(n_name, '_'), '|') AS split_us
        |FROM nation ORDER BY k""".stripMargin,

    "f17_cond_tuple_pack" ->
      """SELECT n_nationkey AS k,
        |  CASE WHEN n_nationkey % 2 = 0 THEN 'even' ELSE 'odd' END AS par,
        |  CASE WHEN n_nationkey < 5 THEN 'low'
        |       WHEN n_nationkey < 15 THEN 'mid' ELSE 'high' END AS band,
        |  n_name AS tname,
        |  CAST(n_nationkey AS INT) AS tk,
        |  CAST(list_aggregate(generate_series(1, n_nationkey % 5 + 1), 'sum')
        |    AS BIGINT) AS rsum,
        |  CAST(n_nationkey % 5 + 1 AS INT) AS rmax,
        |  round(CAST(list_aggregate(generate_series(1, n_nationkey % 5 + 1), 'sum')
        |    AS DOUBLE) / (n_nationkey % 5 + 1), 6) AS ravg,
        |  CAST(len(list_distinct(str_split(n_name, 'A'))) AS INT) AS runiq,
        |  coalesce(array_to_string(list_sort(list_intersect(
        |    str_split(n_name, 'A'), ['', 'N', 'RGENTIN'])), ','), '') AS inter,
        |  repeat(substr(n_name, 1, 1), 3) AS triple,
        |  str_split(n_name, 'A')[-1] AS last_part,
        |  CAST(len(list_filter(str_split(n_name, 'A'), p -> p = '')) AS INT)
        |    AS n_empty
        |FROM nation ORDER BY k""".stripMargin,

    "f16_json_ip" ->
      """WITH j AS (
        |  SELECT n_nationkey AS k,
        |    concat('{"name":"', n_name, '","region":',
        |      CAST(n_regionkey AS VARCHAR), ',"len":',
        |      CAST(length(n_name) AS VARCHAR), ',"tags":["a","b","c"]',
        |      CASE WHEN n_nationkey % 2 = 0 THEN ',"even":true' ELSE '' END,
        |      '}') AS doc,
        |    CAST(n_nationkey AS BIGINT) * 16909320 + 11 AS ipnum
        |  FROM nation
        |)
        |SELECT k,
        |  json_extract_string(doc, '$.name') AS name,
        |  CAST(json_extract_string(doc, '$.region') AS BIGINT) AS region,
        |  CAST(json_extract_string(doc, '$.len') AS BIGINT) AS len,
        |  coalesce(CAST(json_extract_string(doc, '$.even') AS BOOLEAN), false) AS even,
        |  json_extract(doc, '$.even') IS NOT NULL AS has_even,
        |  json_extract(doc, '$.name') IS NOT NULL AS has_name,
        |  CAST(json_array_length(json_extract(doc, '$.tags')) AS INT) AS n_tags,
        |  round(CAST(json_extract_string(doc, '$.region') AS DOUBLE) / 2, 4) AS regf,
        |  concat(((ipnum >> 24) % 256)::VARCHAR, '.', ((ipnum >> 16) % 256)::VARCHAR,
        |    '.', ((ipnum >> 8) % 256)::VARCHAR, '.', (ipnum % 256)::VARCHAR) AS ip,
        |  CAST(ipnum AS BIGINT) AS ip_rt
        |FROM j ORDER BY k""".stripMargin,

    "f15_array_hof" ->
      """WITH a AS (
        |  SELECT doc_id, list_filter(str_split(text, ' '), w -> w <> '') AS ws
        |  FROM documents WHERE doc_id % 7 = 0
        |)
        |SELECT doc_id,
        |  coalesce(array_to_string(list_transform(array_slice(ws, 1, 5), w -> upper(w)), ' '), '')
        |    AS first5_up,
        |  CAST(len(list_filter(ws, w -> length(w) > 3)) AS BIGINT) AS n_long,
        |  len(list_filter(ws, w -> w = 'the')) > 0 AS has_the,
        |  len(list_filter(ws, w -> length(w) >= 30)) = 0 AS all_short,
        |  CAST(coalesce(list_aggregate(list_transform(ws, w -> length(w)), 'sum'), 0)
        |    AS BIGINT) AS sum_len,
        |  round(CAST(list_aggregate(list_transform(ws, w -> length(w)), 'sum')
        |    AS DOUBLE) / len(ws), 6) AS avg_len,
        |  CAST(list_aggregate(list_transform(ws, w -> length(w)), 'min') AS INT)
        |    AS min_len,
        |  CAST(list_aggregate(list_transform(ws, w -> length(w)), 'max') AS INT)
        |    AS max_len,
        |  coalesce(list_filter(ws, w -> length(w) > 6)[1], '-') AS first_long,
        |  coalesce(array_to_string(list_sort(list_distinct(list_transform(
        |    list_filter(ws, w -> length(w) > 6), w -> lower(w)))), ','), '') AS longs,
        |  CAST(len(list_distinct(ws)) AS BIGINT) AS n_uniq,
        |  coalesce(array_to_string(list_reverse(array_slice(ws, 1, 4)), '|'), '') AS rev4,
        |  coalesce(array_to_string(list_transform(list_sort(list_transform(
        |    array_slice(ws, 1, 6), w -> {'k': length(w), 'v': w})), p -> p.v), ' '), '')
        |    AS bylen,
        |  coalesce(array_to_string(list_transform(list_reverse_sort(list_transform(
        |    array_slice(ws, 1, 6), w -> {'k': length(w), 'v': w})), p -> p.v), ' '), '')
        |    AS bylen_desc,
        |  coalesce(array_to_string(list_transform(generate_series(1,
        |    len(array_slice(ws, 1, 3))), i -> i::VARCHAR), ','), '') AS enum3,
        |  coalesce(array_to_string(list_transform(range(CAST(doc_id % 5 AS INT)),
        |    x -> x::VARCHAR), ','), '') AS rng,
        |  coalesce(array_to_string(list_concat(list_concat(['B'],
        |    array_slice(array_slice(array_slice(ws, 1, 4), 1,
        |      greatest(len(array_slice(ws, 1, 4)) - 1, 0)), 2, 1000000)), ['E']), ' '), '')
        |    AS shifted,
        |  coalesce(array_to_string(flatten(list_transform(array_slice(ws, 1, 3),
        |    w -> [w, '.'])), ''), '') AS dotted,
        |  CAST(coalesce(list_aggregate(list_transform(generate_series(1,
        |    len(array_slice(ws, 1, 5))),
        |    i -> length(array_slice(ws, 1, 5)[i]) * i), 'sum'), 0) AS BIGINT) AS wsum
        |FROM a ORDER BY doc_id""".stripMargin,

    "f12_ch_scalar_pack2" ->
      """WITH a AS (
        |  SELECT n_nationkey AS k, n_name, str_split(n_name, 'A') AS parts
        |  FROM nation
        |)
        |SELECT k,
        |  list_contains(parts, '') AS has_empty,
        |  CAST(coalesce(list_position(parts, ''), 0) AS BIGINT) AS idx_empty,
        |  array_to_string(parts, '|') AS joined,
        |  (n_name = '') AS is_empty, (n_name <> '') AS not_empty,
        |  CAST(length(n_name) AS INT) AS len8,
        |  lower(n_name) AS lo8,
        |  (upper(lower(n_name)) = n_name) AS up_ok,
        |  CAST(k AS VARCHAR) AS k_str,
        |  coalesce(nullif(n_name, 'FRANCE'), '-') AS not_france,
        |  CAST(k + 100 AS INT) AS p100,
        |  CAST(k - 5 AS INT) AS m5,
        |  CAST(k * 3 AS INT) AS x3,
        |  round((k + 1) / 4, 6) AS fdiv,
        |  CAST((k + 7) // 3 AS INT) AS idiv,
        |  CAST((k + 7) % 3 AS INT) AS imod,
        |  CAST(k & 12 AS INT) AS b_and,
        |  CAST(k | 5 AS INT) AS b_or,
        |  CAST(xor(k, 9) AS INT) AS b_xor,
        |  CAST(~k AS INT) AS b_not
        |FROM a ORDER BY k""".stripMargin,

    "f13_array_join" ->
      """SELECT k, part FROM (
        |  SELECT n_nationkey AS k, unnest(str_split(n_name, 'A')) AS part
        |  FROM nation
        |) t ORDER BY k, part""".stripMargin,

    "f14_ch_datetime2" ->
      """SELECT CAST(date_trunc('month', ts) AS DATE) AS month,
        |  count(*) AS n,
        |  CAST(min(epoch_us(date_trunc('day', ts))) AS BIGINT) AS min_day_us,
        |  CAST(max(epoch_us(date_trunc('hour', ts))) AS BIGINT) AS max_hr_us,
        |  CAST(min(epoch_us(date_trunc('minute', ts))) AS BIGINT) AS min_min_us,
        |  CAST(max(epoch_us(ts + INTERVAL 3 HOUR)) AS BIGINT) AS max_add3h_us,
        |  CAST(min(epoch_us(ts - INTERVAL 90 SECOND)) AS BIGINT) AS min_sub90s_us,
        |  CAST(max(epoch_us(CAST(CAST(ts AS DATE) + INTERVAL 7 DAY AS TIMESTAMP)))
        |    AS BIGINT) AS max_add7d_us,
        |  CAST(min(epoch_us(CAST(CAST(ts AS DATE) - INTERVAL 1 MONTH AS TIMESTAMP)))
        |    AS BIGINT) AS min_sub1m_us,
        |  CAST(max(epoch_us(CAST(date_trunc('week', ts) AS TIMESTAMP))) AS BIGINT)
        |    AS max_monday_us,
        |  CAST(min(epoch_us(CAST(date_trunc('quarter', ts) AS TIMESTAMP))) AS BIGINT)
        |    AS min_qtr_us,
        |  CAST(min(epoch_us(ts) // 1000000) AS BIGINT) AS min_unix,
        |  CAST(max(date_diff('day', date_trunc('year', ts), ts)) AS BIGINT)
        |    AS max_days_into_year
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "f01_ch_datetime" ->
      """SELECT CAST(year(ts) AS INT) AS yr,
        |  CAST(quarter(ts) AS INT) AS qtr,
        |  CAST(month(ts) AS INT) AS mth,
        |  CAST(isodow(ts) AS INT) AS dow,
        |  count(*) AS n,
        |  CAST(min(dayofmonth(ts)) AS INT) AS min_dom,
        |  CAST(max(hour(ts)) AS INT) AS max_hr
        |FROM events
        |GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4""".stripMargin,

    "f02_like" ->
      """SELECT
        |  CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN 1 ELSE 0 END) AS BIGINT) AS n_promo,
        |  CAST(sum(CASE WHEN p_name LIKE '%red%' THEN 1 ELSE 0 END) AS BIGINT) AS n_red,
        |  CAST(sum(CASE WHEN p_name NOT LIKE '%o%' THEN 1 ELSE 0 END) AS BIGINT) AS n_no_o,
        |  CAST(sum(CASE WHEN p_brand LIKE 'Brand#1_' THEN 1 ELSE 0 END) AS BIGINT) AS n_brand1x
        |FROM part""".stripMargin,

    "f03_date_part_trunc" ->
      """SELECT CAST(date_part('year', o_orderdate) AS INT) AS yr,
        |  date_trunc('quarter', o_orderdate) AS qstart,
        |  count(*) AS n
        |FROM orders
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "f04_agg_pack" ->
      s"""SELECT l_returnflag,
         |  CAST(ROUND(CAST(sum(${decSql("l_quantity")}) AS DOUBLE) / count(*), 4) AS DOUBLE) AS avg_qty,
         |  CAST(ROUND(avg(CAST(l_discount AS DOUBLE)), 4) AS DOUBLE) AS avg_disc,
         |  CAST(sum(DISTINCT CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_dist_qty,
         |  count(DISTINCT l_suppkey) AS n_supp
         |FROM lineitem
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "f05_approx_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS exact_parts,
        |  CAST(abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
        |    <= 0.05 * count(DISTINCT l_partkey) AS INT) AS approx_within_5pct
        |FROM lineitem""".stripMargin,

    "f06_collect_list" ->
      """SELECT o_orderstatus,
        |  array_to_string(list_sort(list_distinct(list(o_orderpriority))), ',') AS prios,
        |  count(*) AS n
        |FROM orders
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "f07_nullif_trycast" ->
      """SELECT
        |  CAST(sum(CASE WHEN NULLIF(o_orderstatus, 'F') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  CAST(sum(TRY_CAST(substr(o_orderpriority, 1, 1) AS INT)) AS BIGINT) AS prio_sum,
        |  CAST(sum(CASE WHEN TRY_CAST(o_orderstatus AS INT) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_uncastable
        |FROM orders""".stripMargin,

    "f07b_trycast_prefiltered" ->
      """SELECT
        |  CAST(sum(TRY_CAST(CASE WHEN regexp_matches(substr(o_orderpriority, 1, 1), '^ *[+-]?[0-9]+ *$')
        |    THEN trim(substr(o_orderpriority, 1, 1)) END AS INT)) AS BIGINT) AS prio_sum,
        |  CAST(sum(CASE WHEN regexp_matches(o_orderstatus, '^ *[+-]?[0-9]+ *$')
        |      AND TRY_CAST(trim(o_orderstatus) AS INT) IS NOT NULL
        |    THEN 0 ELSE 1 END) AS BIGINT) AS n_uncastable
        |FROM orders""".stripMargin,

    "f08_range_frames" ->
      s"""SELECT o_orderkey, o_custkey,
         |  CAST(ROUND(sum(${decSql("o_totalprice")}) OVER (
         |    PARTITION BY o_custkey ORDER BY ${decSql("o_totalprice")}
         |    RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS near_sum,
         |  CAST(ROUND(sum(${decSql("o_totalprice")}) OVER (
         |    PARTITION BY o_custkey ORDER BY ${decSql("o_totalprice")}
         |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS cum_sum
         |FROM orders WHERE o_custkey < 20""".stripMargin,

    "f09_intersect_except_all" ->
      """SELECT nationkey, count(*) AS n FROM (
        |  SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
        |  INTERSECT ALL
        |  SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 1000
        |) t GROUP BY nationkey
        |UNION ALL
        |SELECT -1 - nationkey AS nationkey, count(*) AS n FROM (
        |  SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
        |  EXCEPT ALL
        |  SELECT s_nationkey AS nationkey FROM supplier
        |) t GROUP BY nationkey
        |ORDER BY nationkey""".stripMargin,

    "f10_string_pack" ->
      """SELECT n_name,
        |  upper(n_name) AS up, lower(n_name) AS lo,
        |  length(n_name) AS len,
        |  substr(n_name, 2, 3) AS sub,
        |  lpad(n_name, 12, '.') AS pad_l, rpad(n_name, 12, '.') AS pad_r,
        |  reverse(n_name) AS rev,
        |  replace(n_name, 'A', '@') AS repl,
        |  concat(n_name, '-', CAST(n_nationkey AS VARCHAR)) AS cat,
        |  trim('  x  ') AS trimmed,
        |  repeat('ab', 3) AS rep,
        |  translate(n_name, 'AEI', 'aei') AS tran,
        |  left(n_name, 3) AS l3, right(n_name, 3) AS r3,
        |  split_part(n_name, 'A', 1) AS sp1,
        |  strpos(n_name, 'AN') AS pos_an,
        |  regexp_replace(n_name, '[AEIOU]', '*', 'g') AS re_repl,
        |  regexp_extract(n_name, '([A-Z]+)', 1) AS re_ext,
        |  md5(n_name) AS h_md5,
        |  sha256(n_name) AS h_sha
        |FROM nation ORDER BY n_name""".stripMargin,

    "f11_math_pack" ->
      """SELECT n_nationkey AS k,
        |  abs(n_nationkey - 12) AS a,
        |  CAST(ceil(n_nationkey / 4.0) AS BIGINT) AS ce,
        |  CAST(floor(n_nationkey / 4.0) AS BIGINT) AS fl,
        |  round(CAST(n_nationkey AS DOUBLE) / CAST(7 AS DOUBLE), 3) AS rd,
        |  sqrt(CAST(n_nationkey AS DOUBLE)) AS sq,
        |  CAST(sign(n_nationkey - 12) AS INT) AS sg,
        |  round(exp(n_nationkey / 10.0), 6) AS ex,
        |  round(ln(n_nationkey + 1.0), 6) AS l_n,
        |  round(log10(n_nationkey + 1.0), 6) AS l10,
        |  round(power(n_nationkey, 2.0), 1) AS pw,
        |  n_nationkey % 7 AS md
        |FROM nation ORDER BY k""".stripMargin,

    "e01_events_daily" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        |  count(*) AS n,
        |  CAST(ROUND(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS total_value,
        |  count(DISTINCT user_id) AS n_users
        |FROM events
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "e02_event_gaps" ->
      """WITH g AS (
        |  SELECT user_id, event_type,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |      PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
        |  FROM events
        |)
        |SELECT event_type,
        |  count(*) AS n,
        |  CAST(min(gap_us) AS BIGINT) AS min_gap,
        |  CAST(max(gap_us) AS BIGINT) AS max_gap,
        |  CAST(sum(gap_us) AS BIGINT) AS sum_gap
        |FROM g WHERE gap_us IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "e03_sessionization" -> sessionizationSql(spark = false)
  )
}
