package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.exec.GraftSession

/** CORRECTNESS entries that exercise the engine's own command front-end
  * (SURVEY.md §2.1): the data flows CREATE TABLE → INSERT → SELECT through
  * [[GraftSession]] (managed partitioned parquet), and the DuckDB oracle
  * recomputes the same result from first principles (a VALUES relation, or
  * the original source table for INSERT…SELECT).
  */
object DdlQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // DDL + INSERT VALUES + typed literals + partitioned write + group-by
    // readback (reference t1 slice, sql_test_scripts/basic_checks.sql:1-7,
    // widened with the partition path write.rs:26-67).
    "d01_ddl_insert_values" -> { (s, dir) =>
      val g = new GraftSession(s)
      g.sql("DROP TABLE IF EXISTS graft_d01")
      g.sql("CREATE TABLE graft_d01(a UInt64, b String, d Date) " +
        "ENGINE=BaseStorage PARTITION BY toYear(d)")
      g.sql("INSERT INTO graft_d01 VALUES " +
        "(1, 'x', '2021-01-05'), (2, 'y', '2021-03-05'), " +
        "(3, 'z', '2022-07-01'), (4, 'x', '2022-11-11')")
      g.sql("SELECT CAST(year(d) AS INT) AS yr, CAST(sum(a) AS BIGINT) AS total, " +
        "count(*) AS n FROM graft_d01 GROUP BY 1 ORDER BY 1")
    },

    // INSERT INTO … SELECT from an existing source into an engine table
    // (mgmt.rs:772-800), then aggregate the engine table; oracle recomputes
    // from the source directly.
    "d02_insert_select" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("DROP TABLE IF EXISTS graft_d02")
      g.sql("CREATE TABLE graft_d02(ok Int64, qty Float64, flag String)")
      g.sql("INSERT INTO graft_d02 SELECT l_orderkey, l_quantity, l_returnflag " +
        "FROM lineitem WHERE l_orderkey < 500")
      g.sql("SELECT flag, CAST(sum(CAST(qty AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty, " +
        "count(*) AS n FROM graft_d02 GROUP BY flag ORDER BY flag")
    },

    // UInt64 full-range round-trip: Spark has no unsigned 64-bit type, so
    // UInt64 maps to Decimal(20,0) (SURVEY §1.2) — prove the max value
    // 2^64-1 survives insert, aggregation and readback exactly (string
    // outputs: decimal-to-double casts would round above 2^53).
    "d04_uint64_range" -> { (s, dir) =>
      val g = new GraftSession(s)
      g.sql("DROP TABLE IF EXISTS graft_d04")
      g.sql("CREATE TABLE graft_d04(id Int32, u UInt64)")
      g.sql("INSERT INTO graft_d04 VALUES (1, 18446744073709551615), " +
        "(2, 0), (3, 9223372036854775808), (4, 42)")
      g.sql("SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(CAST(sum(u) AS DECIMAL(38,0)) AS STRING) AS total, " +
        "CAST(max(u) AS STRING) AS max_u, " +
        "CAST(min(u) AS STRING) AS min_u FROM graft_d04")
    },

    // OPTIMIZE TABLE as real small-file compaction (the reference's is a
    // flush stub, mgmt.rs:923-941): three INSERT...SELECT statements leave
    // three file sets per partition; OPTIMIZE rewrites each partition dir
    // to its target file count, and the readback proves data identity —
    // the oracle recomputes the same aggregate from the source table.
    "o01_optimize_compaction" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("DROP TABLE IF EXISTS graft_o01")
      g.sql("CREATE TABLE graft_o01(ok Int64, qty Float64, d Date) " +
        "ENGINE=BaseStorage PARTITION BY toYear(d)")
      (0 until 3).foreach(i =>
        g.sql("INSERT INTO graft_o01 SELECT l_orderkey, l_quantity, l_shipdate " +
          s"FROM lineitem WHERE l_orderkey % 3 = $i"))
      g.sql("OPTIMIZE TABLE graft_o01")
      g.sql("SELECT CAST(year(d) AS INT) AS yr, count(*) AS n, " +
        "CAST(sum(ok) AS BIGINT) AS sum_ok, " +
        "CAST(sum(CAST(qty AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty " +
        "FROM graft_o01 GROUP BY 1 ORDER BY 1")
    },

    // INSERT … FORMAT CSV ingestion (mgmt.rs:724-730) — inline payload.
    "d03_insert_csv" -> { (s, dir) =>
      val g = new GraftSession(s)
      g.sql("DROP TABLE IF EXISTS graft_d03")
      g.sql("CREATE TABLE graft_d03(k Int32, v Decimal(9, 2))")
      g.sql("INSERT INTO graft_d03 FORMAT CSV\n1,1.50\n2,2.25\n1,0.25\n3,9.00")
      g.sql("SELECT k, CAST(sum(v) AS DOUBLE) AS total FROM graft_d03 " +
        "GROUP BY k ORDER BY k")
    },

    // ClickHouse LIMIT BY through the engine front-end: top-2 events per
    // event_type in (value DESC, event_id) order, then the statement's own
    // ORDER BY + outer LIMIT — GraftSession.rewriteLimitBy turns the CH
    // clause into a row_number window (one shuffle on the BY keys); the
    // oracle is DuckDB's independent window formulation.
    "d05_limit_by" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("SELECT event_id, user_id, event_type, CAST(value AS DOUBLE) AS v " +
        "FROM events ORDER BY v DESC, event_id LIMIT 2 BY event_type LIMIT 7")
    },

    // ClickHouse WITH TOTALS through the engine front-end: per-type rows
    // plus the grand-total row from ONE aggregation pass
    // (GraftSession.rewriteWithTotals → GROUPING SETS ((k), ())); the
    // oracle is DuckDB's own GROUPING SETS. NULLS FIRST pins the totals
    // row's sort position identically in both engines.
    "d06_with_totals" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("SELECT event_type, count(*) AS n, " +
        "CAST(ROUND(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS total " +
        "FROM events GROUP BY event_type WITH TOTALS " +
        "ORDER BY event_type NULLS FIRST")
    },

    // ClickHouse / SQL-standard `LIMIT n WITH TIES` through the engine
    // front-end: the first n rows of the ORDER BY plus every row tied
    // with the n-th (GraftSession.rewriteLimitTies → rank() ≤ n, which
    // WindowGroupLimit caps map-side); oracle is DuckDB's independent
    // rank formulation. floor() makes integer ties both engines agree on
    // (double→int CAST truncates in Spark but rounds in DuckDB).
    "d07_limit_with_ties" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("SELECT event_id, user_id, CAST(floor(value / 20) AS INT) AS v " +
        "FROM events ORDER BY v DESC LIMIT 5 WITH TIES")
    },

    // ClickHouse `SELECT … INTO OUTFILE 'path'` through the engine
    // front-end: export the aggregate to a single CSV file (the clause's
    // own single-file semantics), then read the WRITTEN BYTES back — the
    // oracle recomputes the same aggregate from the source table, so the
    // hash match proves the export round-trip.
    "d08_into_outfile" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      val path = java.nio.file.Files.createTempDirectory("graft_d08")
        .resolve("out.csv").toString
      g.sql("SELECT event_type, count(*) AS n, " +
        "CAST(sum(user_id) AS BIGINT) AS su FROM events " +
        s"GROUP BY event_type ORDER BY event_type INTO OUTFILE '$path'")
      s.read.schema("event_type STRING, n BIGINT, su BIGINT").csv(path)
    },

    // CREATE TABLE ... AS SELECT (d10): the schema derives from the
    // SELECT, the data lands through the normal partitioned
    // INSERT...SELECT machinery, and the readback aggregates the engine
    // table; the oracle recomputes from the source directly.
    "d10_ctas" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("DROP TABLE IF EXISTS graft_d10")
      g.sql("CREATE TABLE graft_d10 ENGINE=BaseStorage PARTITION BY toYear(d) " +
        "AS SELECT l_orderkey AS ok, l_quantity AS qty, l_shipdate AS d " +
        "FROM lineitem WHERE l_orderkey < 800")
      g.sql("SELECT CAST(year(d) AS INT) AS yr, count(*) AS n, " +
        "CAST(sum(CAST(qty AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty " +
        "FROM graft_d10 GROUP BY 1 ORDER BY 1")
    },

    // MATERIALIZED VIEW (d11): a map-only view over an engine table,
    // fed by two separate INSERT...SELECT blocks — the per-block
    // propagation must equal one recompute over all inserted data for a
    // map-only SELECT (the oracle recomputes from the source directly).
    "d11_materialized_view" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("DROP TABLE IF EXISTS graft_d11_mv; DROP TABLE IF EXISTS graft_d11_src")
      g.sql("CREATE TABLE graft_d11_src(ok Int64, qty Float64, flag String)")
      g.sql("CREATE MATERIALIZED VIEW graft_d11_mv AS " +
        "SELECT flag, CAST(qty * 2 AS DOUBLE) AS dq FROM graft_d11_src " +
        "WHERE qty > 10")
      g.sql("INSERT INTO graft_d11_src SELECT l_orderkey, l_quantity, " +
        "l_returnflag FROM lineitem WHERE l_orderkey < 300")
      g.sql("INSERT INTO graft_d11_src SELECT l_orderkey, l_quantity, " +
        "l_returnflag FROM lineitem WHERE l_orderkey >= 300 AND l_orderkey < 600")
      g.sql("SELECT flag, count(*) AS n, " +
        "CAST(ROUND(sum(CAST(dq AS DECIMAL(14,2))), 2) AS DOUBLE) AS total " +
        "FROM graft_d11_mv GROUP BY flag ORDER BY flag")
    },

    // ClickHouse PREWHERE (d12): folds into WHERE with AND — on Spark the
    // "filter before reading the rest" physical half is parquet pushdown
    // + pruning, which the plan already shows; oracle uses a plain AND.
    "d12_prewhere" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("SELECT event_type, count(*) AS n, " +
        "CAST(sum(user_id) AS BIGINT) AS su " +
        "FROM events PREWHERE value > 50 WHERE user_id % 2 = 0 " +
        "GROUP BY event_type ORDER BY event_type")
    },

    // ClickHouse `SELECT DISTINCT ON (keys)` (d13): rewrites to the
    // LIMIT 1 BY form — first row per key group under the statement's
    // ORDER BY (which must reference selected columns, the LIMIT BY
    // restriction); oracle is an independent row_number formulation.
    "d13_distinct_on" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("SELECT DISTINCT ON (event_type) event_type, event_id, " +
        "CAST(value AS DOUBLE) AS v FROM events ORDER BY v DESC, event_id")
    },

    // ClickHouse table-set membership `x [GLOBAL] [NOT] IN t` (d14):
    // rewrites to the ANSI subquery form; GLOBAL drops (Spark picks
    // broadcast vs shuffle for the semi-join itself). Oracle uses the
    // literal set.
    "d14_in_table" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("DROP TABLE IF EXISTS graft_d14_set")
      g.sql("CREATE TABLE graft_d14_set(t String)")
      g.sql("INSERT INTO graft_d14_set VALUES ('view'), ('purchase')")
      g.sql("SELECT event_type, count(*) AS n FROM events " +
        "WHERE event_type GLOBAL IN graft_d14_set " +
        "GROUP BY event_type ORDER BY event_type")
    },

    // ClickHouse `[LEFT] ARRAY JOIN` (d15): per-element row expansion
    // with POSITIONAL zip across items (CH zips, never Cartesian) —
    // rewritten to Spark's LATERAL VIEW explode(arrays_zip) generator
    // (see GraftSession.rewriteArrayJoin). Two zipped arrays (words +
    // their 1-based positions) under AS aliases, WHERE filtering AFTER
    // expansion (CH clause order). Oracle: DuckDB's multi-unnest, which
    // zips by the same positional rule.
    "d15_array_join" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("SELECT doc_id, w AS word, CAST(ci AS BIGINT) AS pos FROM (" +
        "SELECT doc_id, split(text, ' ') AS ws, " +
        "sequence(1, size(split(text, ' '))) AS idx " +
        "FROM documents WHERE doc_id % 97 = 0) t " +
        "ARRAY JOIN ws AS w, idx AS ci " +
        "WHERE ci <= 5 ORDER BY doc_id, pos")
    },

    // ClickHouse `FROM t SAMPLE f` (d16): deterministic fraction of the
    // table by a sign/overflow-safe Knuth multiplicative hash of the PK
    // head (CH's SAMPLE BY contract — the sampling expr must be part of
    // the PK; repeatable, and smaller fractions nest inside larger
    // ones). The rewrite is a single scan-stage predicate — the oracle
    // recomputes the identical hash cut in DuckDB.
    "d16_sample" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("DROP TABLE IF EXISTS d16_ev")
      g.sql("CREATE TABLE d16_ev(event_id Int64 PRIMARY KEY, value Float64)")
      g.sql("INSERT INTO d16_ev SELECT event_id, value FROM events")
      // value sums go through DECIMAL: a double sum's float error at
      // millions of rows (scale probes) exceeds the 2dp rounding, and
      // decimal addition is order-independent so both engines agree
      g.sql("SELECT count(*) AS n, CAST(sum(event_id) AS BIGINT) AS s, " +
        "CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sv " +
        "FROM d16_ev SAMPLE 0.25")
    },

    // `SAMPLE f OFFSET o` (d16b): the shifted hash window — CH's
    // contract for partitioning a table across parallel readers. The
    // query takes the [0.5, 0.75) quarter; the oracle recomputes the
    // same window bounds (floor(o*2^32) ≤ h < floor((o+f)*2^32)) with
    // the identical hash expression in DuckDB.
    "d16b_sample_offset" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("DROP TABLE IF EXISTS d16b_ev")
      g.sql("CREATE TABLE d16b_ev(event_id Int64 PRIMARY KEY, value Float64)")
      g.sql("INSERT INTO d16b_ev SELECT event_id, value FROM events")
      g.sql("SELECT count(*) AS n, CAST(sum(event_id) AS BIGINT) AS s, " +
        "CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sv " +
        "FROM d16b_ev SAMPLE 0.25 OFFSET 0.5")
    },

    // d16c: the sampling hash at BIG SIGNED keys (|k| up to ~7e13,
    // well past the ~2^33 point where the r14 hash's bare Knuth
    // multiply wrapped Int64 in Spark and errored in DuckDB). Keys are
    // synthesized on both sides from event_id by the same affine map,
    // FOLDED to a bounded domain first so the synthesis itself (and
    // min/max, unlike a key sum) can never overflow at ANY probe scale;
    // a green row here is cross-engine bit-equality of the cut over
    // the signed-key regime the 100 TB key domain actually exercises.
    "d16c_sample_bigkeys" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("DROP TABLE IF EXISTS d16c_ev")
      g.sql("CREATE TABLE d16c_ev(k Int64 PRIMARY KEY, value Float64)")
      g.sql("INSERT INTO d16c_ev SELECT (event_id % 30000) * 4611686018 " +
        "- 69175290000000 AS k, value FROM events")
      g.sql("SELECT count(*) AS n, CAST(min(k) AS BIGINT) AS kmin, " +
        "CAST(max(k) AS BIGINT) AS kmax, " +
        "CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sv " +
        "FROM d16c_ev SAMPLE 0.5 OFFSET 0.25")
    },

    // ClickHouse ReplacingMergeTree + `FROM t FINAL` (d17): the merged
    // view — one row per sorting key, max version winning. Keys are
    // event_id folded to 3000 buckets (thousands of duplicates per key
    // at any SF), versions are the unique event_id so the winner is
    // deterministic in both engines. The rewrite is one max_by hash
    // aggregate (map-side combine, ONE shuffle on the key — a MergeTree
    // merge's plan shape, on demand); the oracle states the identical
    // argmax as a rank-1 window in DuckDB.
    "d17_replacing_final" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("DROP TABLE IF EXISTS d17_ev")
      g.sql("CREATE TABLE d17_ev(k Int64 PRIMARY KEY, ver Int64, " +
        "value Float64) ENGINE=ReplacingMergeTree(ver)")
      g.sql("INSERT INTO d17_ev SELECT event_id % 3000 AS k, " +
        "event_id AS ver, value FROM events")
      g.sql("SELECT count(*) AS n, CAST(sum(ver) AS BIGINT) AS sver, " +
        "CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sv " +
        "FROM d17_ev FINAL")
    },

    // SummingMergeTree + FINAL (d18): per-sorting-key summation of the
    // numeric non-key columns — CH's pre-aggregating engine. Output is
    // PER-KEY rows (3000 of them) so each double sum spans only that
    // key's values and 2dp rounding is safe at any probe scale; the
    // oracle is the plain GROUP BY the engine's merged view must equal.
    "d18_summing_final" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("DROP TABLE IF EXISTS d18_ev")
      g.sql("CREATE TABLE d18_ev(k Int64 PRIMARY KEY, n Int64, " +
        "value Float64) ENGINE=SummingMergeTree")
      g.sql("INSERT INTO d18_ev SELECT event_id % 3000 AS k, " +
        "CAST(1 AS BIGINT) AS n, value FROM events")
      g.sql("SELECT k, n, CAST(round(value, 2) AS DOUBLE) AS v " +
        "FROM d18_ev FINAL ORDER BY k")
    },

    // CollapsingMergeTree + FINAL (d19): +1/-1 rows annihilate per key.
    // The three inserts build all three outcomes at gate scale: keys
    // <200 end cancel-majority (a -1 row survives), 200..499 balance to
    // NOTHING, >=500 stay state-majority. The survivor is the full-row
    // max among the winning sign, so the oracle's max(value) FILTER
    // mirrors it exactly.
    "d19_collapsing_final" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("DROP TABLE IF EXISTS d19_ev")
      g.sql("CREATE TABLE d19_ev(k Int64 PRIMARY KEY, sign Int8, " +
        "value Float64) ENGINE=CollapsingMergeTree(sign)")
      g.sql("INSERT INTO d19_ev SELECT event_id % 3000 AS k, " +
        "CAST(1 AS TINYINT) AS sign, value FROM events")
      g.sql("INSERT INTO d19_ev SELECT event_id % 3000 AS k, " +
        "CAST(-1 AS TINYINT) AS sign, value FROM events " +
        "WHERE event_id % 3000 < 500")
      g.sql("INSERT INTO d19_ev SELECT event_id % 3000 AS k, " +
        "CAST(-1 AS TINYINT) AS sign, value FROM events " +
        "WHERE event_id % 3000 < 200")
      g.sql("SELECT k, CAST(sign AS INT) AS sign, " +
        "CAST(round(value, 2) AS DOUBLE) AS v FROM d19_ev FINAL ORDER BY k")
    },

    // VersionedCollapsingMergeTree + FINAL (d20): cancellation is scoped
    // to (key, version) and leftover MULTIPLICITY survives — |sum(sign)|
    // copies per group, which the oracle reproduces by unnesting a range.
    // The %7 cancel rule is coprime to the %1000/%3 keys so every group
    // mixes signs.
    "d20_vcollapsing_final" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("DROP TABLE IF EXISTS d20_ev")
      g.sql("CREATE TABLE d20_ev(k Int64 PRIMARY KEY, sign Int8, " +
        "ver Int64) ENGINE=VersionedCollapsingMergeTree(sign, ver)")
      g.sql("INSERT INTO d20_ev SELECT event_id % 1000 AS k, " +
        "CAST(CASE WHEN event_id % 7 = 0 THEN -1 ELSE 1 END AS TINYINT) " +
        "AS sign, event_id % 3 AS ver FROM events")
      g.sql("SELECT k, CAST(sign AS INT) AS sign, ver " +
        "FROM d20_ev FINAL ORDER BY k, ver")
    },

    // `OPTIMIZE TABLE t FINAL` (o02): the merge itself — after it, the
    // PLAIN table scan returns the deduplicated rows (same selection as
    // d17's on-demand view, now physical). Crash-safe via the same
    // intent/replay protocol as compaction, with the planned dedup count
    // as the commit witness.
    "o02_optimize_final" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("DROP TABLE IF EXISTS o02_ev")
      g.sql("CREATE TABLE o02_ev(k Int64 PRIMARY KEY, ver Int64, " +
        "value Float64) ENGINE=ReplacingMergeTree(ver)")
      g.sql("INSERT INTO o02_ev SELECT event_id % 3000 AS k, " +
        "event_id AS ver, value FROM events")
      g.sql("OPTIMIZE TABLE o02_ev FINAL")
      g.sql("SELECT count(*) AS n, CAST(sum(ver) AS BIGINT) AS sver, " +
        "CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sv " +
        "FROM o02_ev")
    },

    // Mutations (o03): ALTER TABLE ... DELETE WHERE then UPDATE ... WHERE
    // over an events-backed table — the DELETE removes the k%10=3 band,
    // the UPDATE doubles and uppercases the k%10=4 band (RHS against the
    // pre-mutation row). Only matching files are rewritten; the summary
    // GROUP BY proves the mutated state. Sums go through DECIMAL so
    // double-addition order can't break the 2dp rounding.
    "o03_mutation" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("DROP TABLE IF EXISTS o03_ev")
      g.sql("CREATE TABLE o03_ev(k Int64 PRIMARY KEY, et String, " +
        "value Float64)")
      g.sql("INSERT INTO o03_ev SELECT event_id AS k, event_type AS et, " +
        "value FROM events")
      g.sql("ALTER TABLE o03_ev DELETE WHERE k % 10 = 3")
      g.sql("ALTER TABLE o03_ev UPDATE value = value * 2, et = upper(et) " +
        "WHERE k % 10 = 4")
      g.sql("SELECT et, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sv " +
        "FROM o03_ev GROUP BY et ORDER BY et")
    },

    // Partition DDL (o04): DROP kills the 1996 partition (one directory
    // delete — metadata-scale at any table size), DETACH+ATTACH
    // round-trips 1997 through `_graft_detached/` with bit-identical
    // data. The readback groups by year so the oracle — lineitem minus
    // 1996 — checks both the drop took and the detach/attach lost
    // nothing.
    "o04_partition_ddl" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("DROP TABLE IF EXISTS o04_li")
      g.sql("CREATE TABLE o04_li(ok Int64, qty Float64, d Date) " +
        "ENGINE=BaseStorage PARTITION BY toYear(d)")
      g.sql("INSERT INTO o04_li SELECT l_orderkey, l_quantity, l_shipdate " +
        "FROM lineitem")
      g.sql("ALTER TABLE o04_li DROP PARTITION '1996'")
      g.sql("ALTER TABLE o04_li DETACH PARTITION '1997'")
      g.sql("ALTER TABLE o04_li ATTACH PARTITION '1997'")
      g.sql("SELECT CAST(toYear(d) AS INT) AS yr, count(*) AS n, " +
        "CAST(sum(ok) AS BIGINT) AS sum_ok FROM o04_li " +
        "GROUP BY 1 ORDER BY 1")
    },

    // Column DDL (o05): DROP COLUMN (metadata-now), RENAME COLUMN and
    // MODIFY COLUMN (staged data rewrites — parquet resolves by name) in
    // sequence over a lineitem copy; the readback aggregates through the
    // renamed, re-typed column. l_quantity is integral so the Float64 →
    // Int32 conversion is exact in both engines (double→int truncation
    // vs rounding divergence cannot bite).
    "o05_column_ddl" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("DROP TABLE IF EXISTS o05_li")
      g.sql("CREATE TABLE o05_li(ok Int64, junk String, qty Float64, " +
        "flag String)")
      g.sql("INSERT INTO o05_li SELECT l_orderkey, l_linestatus, " +
        "l_quantity, l_returnflag FROM lineitem")
      g.sql("ALTER TABLE o05_li DROP COLUMN junk")
      g.sql("ALTER TABLE o05_li RENAME COLUMN qty TO quantity")
      g.sql("ALTER TABLE o05_li MODIFY COLUMN quantity Int32")
      g.sql("SELECT flag, count(*) AS n, " +
        "CAST(sum(quantity) AS BIGINT) AS sq FROM o05_li " +
        "GROUP BY flag ORDER BY flag")
    },

    // Rich CH types (d25): Enum8 (stored as names), Map and named Tuple
    // columns flow INSERT SELECT → partitioned parquet → readback;
    // the aggregate flattens map/struct access to scalars so the
    // cross-engine hash compares values, not container encodings. The
    // oracle computes the same scalars relationally.
    "d25_rich_types" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("DROP TABLE IF EXISTS d25_ev")
      g.sql("CREATE TABLE d25_ev(k Int64, st Enum8('low' = 1, 'high' = 2), " +
        "tags Map(String, Int64), pos Tuple(x Int64, y String))")
      g.sql("INSERT INTO d25_ev SELECT event_id AS k, " +
        "CASE WHEN value > 50 THEN 'high' ELSE 'low' END AS st, " +
        "map('v10', CAST(floor(value / 10) AS BIGINT) * 10) AS tags, " +
        "named_struct('x', event_id % 7, 'y', event_type) AS pos FROM events")
      g.sql("SELECT st, count(*) AS n, " +
        "CAST(sum(tags['v10']) AS BIGINT) AS sv, " +
        "CAST(sum(pos.x) AS BIGINT) AS sx, min(pos.y) AS my " +
        "FROM d25_ev GROUP BY st ORDER BY st")
    },

    // DateTime64 + Date32 (d25b, VERDICT r15 #7): sub-second timestamps
    // through DDL/INSERT/readback. Numeric DateTime64 literals are TICKS
    // at the declared precision (CH's literal form: 3 -> ms); string
    // literals keep their fractional text; Date32 handles pre-1970.
    // Values INSERTed via VALUES (epoch-tick ints + strings) and via
    // INSERT...SELECT (events.ts carries µs precision), aggregated back
    // out through unix_micros so every sub-second digit is gated.
    "d25b_datetime64" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("DROP TABLE IF EXISTS d25b_t")
      g.sql("CREATE TABLE d25b_t(k Int64, t3 DateTime64(3), " +
        "t6 DateTime64(6, 'UTC'), d Date32)")
      g.sql("INSERT INTO d25b_t VALUES " +
        "(1, 1704067200123, '2024-01-01 00:00:00.123456', '1965-03-02'), " +
        "(2, '2024-06-30 23:59:59.999', 1719791999999999, '2024-06-30'), " +
        "(3, 0, 0, '1970-01-01')")
      g.sql("DROP TABLE IF EXISTS d25b_ev")
      g.sql("CREATE TABLE d25b_ev(id Int64, t DateTime64(6))")
      g.sql("INSERT INTO d25b_ev SELECT event_id, ts FROM events " +
        "WHERE event_id < 500")
      g.sql("""SELECT
        |  (SELECT CAST(sum(unix_micros(t3) + unix_micros(t6)) AS BIGINT)
        |   FROM d25b_t) AS lit_us,
        |  (SELECT CAST(sum(datediff(d, DATE '1970-01-01')) AS BIGINT)
        |   FROM d25b_t) AS d32_days,
        |  (SELECT CAST(sum(unix_micros(t)) AS BIGINT) FROM d25b_ev)
        |    AS ev_us,
        |  (SELECT count(*) FROM d25b_ev) AS n""".stripMargin)
    },

    // ANY JOIN strictness (d24): CH's at-most-one-right-row-per-key
    // join, over orders deduplicated to each customer's full-row-min
    // order. The engine's pick is the deterministic struct(*) min
    // (pinned divergence from CH's arbitrary pick), which the oracle
    // reproduces as a rank-1 window ordered by the same column list.
    "d24_any_join" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("DROP TABLE IF EXISTS d24_r")
      g.sql("CREATE TABLE d24_r AS SELECT o_custkey AS k, " +
        "CAST(round(CAST(o_totalprice AS DECIMAL(14,2)), 2) AS DOUBLE) " +
        "AS price FROM orders")
      g.sql("SELECT c_mktsegment AS seg, count() AS n, " +
        "CAST(round(sum(CAST(price AS DECIMAL(18,2))), 2) AS DOUBLE) AS sp " +
        "FROM (SELECT c_custkey AS k, c_mktsegment FROM customer) c " +
        "ANY LEFT JOIN d24_r USING k GROUP BY seg ORDER BY seg")
    },

    // ASOF JOIN from SQL (d26/d26b): the CH dialect door onto
    // operators.AsofJoin (VERDICT r15 #2) — `LEFT ASOF JOIN` keeps
    // unmatched probe rows, plain `ASOF JOIN` is inner. The engine plan
    // is a01's single key-shuffle union+window (no per-key cross
    // product); the oracle is DuckDB's native ASOF JOIN.
    "d26_asof_join_sql" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("DROP TABLE IF EXISTS d26_c")
      g.sql("DROP TABLE IF EXISTS d26_v")
      g.sql("CREATE TABLE d26_c AS SELECT event_id, user_id, ts " +
        "FROM events WHERE event_type = 'click'")
      g.sql("CREATE TABLE d26_v AS SELECT user_id, ts AS vts, " +
        "max(value) AS vv FROM events WHERE event_type = 'view' " +
        "GROUP BY user_id, ts")
      g.sql("""SELECT c.event_id, c.user_id, unix_micros(c.ts) AS click_us,
        |  unix_micros(v.vts) AS view_us, v.vv AS view_value
        |FROM d26_c c LEFT ASOF JOIN d26_v v
        |ON c.user_id = v.user_id AND c.ts >= v.vts
        |ORDER BY c.event_id""".stripMargin)
    },

    "d26b_asof_inner_sql" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("DROP TABLE IF EXISTS d26b_c")
      g.sql("DROP TABLE IF EXISTS d26b_v")
      g.sql("CREATE TABLE d26b_c AS SELECT event_id, user_id, ts " +
        "FROM events WHERE event_type = 'click'")
      g.sql("CREATE TABLE d26b_v AS SELECT user_id, ts AS vts, " +
        "max(value) AS vv FROM events WHERE event_type = 'view' " +
        "GROUP BY user_id, ts")
      g.sql("""SELECT count() AS n, CAST(sum(c.user_id) AS BIGINT) AS su,
        |  CAST(round(sum(CAST(v.vv AS DECIMAL(18,4))), 3) AS DOUBLE) AS sv
        |FROM d26b_c c ASOF JOIN d26b_v v
        |ON c.user_id = v.user_id AND c.ts >= v.vts""".stripMargin)
    },

    // Forward ASOF from SQL (d26c): `l.t <= r.t` matches the EARLIEST
    // right row at-or-after each left row — the same single-shuffle
    // union+window plan over reversed time order.
    "d26c_asof_forward_sql" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("DROP TABLE IF EXISTS d26c_c")
      g.sql("DROP TABLE IF EXISTS d26c_v")
      g.sql("CREATE TABLE d26c_c AS SELECT event_id, user_id, ts " +
        "FROM events WHERE event_type = 'click'")
      g.sql("CREATE TABLE d26c_v AS SELECT user_id, ts AS vts, " +
        "max(value) AS vv FROM events WHERE event_type = 'view' " +
        "GROUP BY user_id, ts")
      g.sql("""SELECT c.event_id, unix_micros(v.vts) AS next_view_us,
        |  v.vv AS view_value
        |FROM d26c_c c LEFT ASOF JOIN d26c_v v
        |ON c.user_id = v.user_id AND c.ts <= v.vts
        |ORDER BY c.event_id""".stripMargin)
    },

    // Dictionaries (d23): CREATE DICTIONARY over a warehouse dim copy of
    // nation, then dictGet/dictHas inside a customer aggregation — the
    // lookup is a broadcast hash behind a per-dictionary function, so
    // the plan stays ONE customer scan + hash aggregate, zero extra
    // shuffles (CH's in-memory-hash-per-node model). A shifted key
    // (+100) exercises the miss path → declared DEFAULT. The oracle is
    // the equivalent LEFT JOIN, independently formulated in DuckDB.
    "d23_dictionary" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("DROP DICTIONARY IF EXISTS d23_dict")
      g.sql("DROP TABLE IF EXISTS d23_dim")
      g.sql("CREATE TABLE d23_dim AS SELECT n_nationkey AS k, " +
        "n_name AS nname, n_regionkey AS rkey FROM nation")
      g.sql("CREATE DICTIONARY d23_dict(k Int64, " +
        "nname String DEFAULT 'unknown', rkey Int64) PRIMARY KEY k " +
        "SOURCE(CLICKHOUSE(TABLE 'd23_dim')) LAYOUT(HASHED()) " +
        "LIFETIME(MIN 0 MAX 300)")
      g.sql("SELECT dictGet('d23_dict', 'nname', c_nationkey) AS nat, " +
        "dictGet('d23_dict', 'nname', c_nationkey + 100) AS missed, " +
        "count(*) AS n, " +
        "CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal, " +
        "CAST(sum(CASE WHEN dictHas('d23_dict', c_nationkey) THEN 1 " +
        "ELSE 0 END) AS BIGINT) AS hits " +
        "FROM customer GROUP BY 1, 2 ORDER BY 1")
    },

    // Oversized dictionary -> JOIN arm (d23b, VERDICT r15 #6): the
    // source (an orders-derived table) exceeds the deliberately-lowered
    // broadcast guard, so dictGet/dictHas degrade to a correlated
    // equi-join against the source (CH `direct` layout) instead of
    // erroring — the broadcast arm (d23) is untouched. The oracle is the
    // equivalent LEFT JOIN.
    "d23b_dictionary_join" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("DROP DICTIONARY IF EXISTS d23b_dict")
      g.sql("DROP TABLE IF EXISTS d23b_dim")
      g.sql("CREATE TABLE d23b_dim AS SELECT o_orderkey AS k, " +
        "o_custkey AS cust, CAST(round(CAST(o_totalprice AS " +
        "DECIMAL(14,2)), 2) AS DOUBLE) AS price FROM orders")
      val prev = s.conf.getOption("graft.dict.maxRows")
      s.conf.set("graft.dict.maxRows", "50")
      try g.sql("CREATE DICTIONARY d23b_dict(k Int64, cust Int64, " +
        "price Float64) PRIMARY KEY k " +
        "SOURCE(CLICKHOUSE(TABLE 'd23b_dim')) LAYOUT(DIRECT())")
      finally prev match {
        case Some(v) => s.conf.set("graft.dict.maxRows", v)
        case None => s.conf.unset("graft.dict.maxRows")
      }
      g.sql("SELECT l_returnflag AS flag, count() AS n, " +
        "CAST(sum(CASE WHEN dictHas('d23b_dict', l_orderkey) THEN 1 " +
        "ELSE 0 END) AS BIGINT) AS hits, " +
        "CAST(round(sum(CAST(dictGet('d23b_dict', 'price', l_orderkey) " +
        "AS DECIMAL(18,2))), 2) AS DOUBLE) AS sp " +
        "FROM lineitem WHERE l_orderkey < 2000 GROUP BY 1 ORDER BY 1")
    },

    // AggregatingMergeTree + FINAL (d22): SimpleAggregateFunction
    // columns merge with their declared function per sorting key — CH's
    // pre-aggregation engine where the value IS the state. Summary
    // row: per-key sums/extremes re-aggregated (2dp via DECIMAL) so the
    // check is scale-invariant; the oracle is the plain GROUP BY the
    // merged view must equal.
    "d22_aggregating_final" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("DROP TABLE IF EXISTS d22_ev")
      g.sql("CREATE TABLE d22_ev(k Int64 PRIMARY KEY, " +
        "n SimpleAggregateFunction(sum, Int64), " +
        "vmax SimpleAggregateFunction(max, Float64), " +
        "vmin SimpleAggregateFunction(min, Float64)) " +
        "ENGINE=AggregatingMergeTree")
      g.sql("INSERT INTO d22_ev SELECT event_id % 3000 AS k, " +
        "CAST(1 AS BIGINT) AS n, value, value FROM events")
      g.sql("SELECT count(*) AS cnt, CAST(sum(n) AS BIGINT) AS rows_merged, " +
        "CAST(round(sum(CAST(vmax AS DECIMAL(18,6))), 2) AS DOUBLE) AS smax, " +
        "CAST(round(sum(CAST(vmin AS DECIMAL(18,6))), 2) AS DOUBLE) AS smin " +
        "FROM d22_ev FINAL")
    },

    // Table TTL (o06): merge-time row expiry. The per-row deadline is a
    // CASE over the sampling band — the k%10<3 band's deadline is its
    // (past) event date, everyone else's is a century out — so OPTIMIZE
    // must expire exactly that band and keep the rest. Expiry runs as a
    // mutation: only files holding an expired row are rewritten.
    "o06_ttl" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("DROP TABLE IF EXISTS o06_ev")
      g.sql("CREATE TABLE o06_ev(k Int64, et String, d Date, " +
        "value Float64) TTL CASE WHEN k % 10 < 3 THEN d " +
        "ELSE d + INTERVAL 100 YEAR END")
      g.sql("INSERT INTO o06_ev SELECT event_id, event_type, " +
        "CAST(ts AS DATE), value FROM events")
      g.sql("OPTIMIZE TABLE o06_ev")
      g.sql("SELECT et, count(*) AS n, " +
        "CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sv " +
        "FROM o06_ev GROUP BY et ORDER BY et")
    },

    // Plain CREATE VIEW (d21): CH's non-materialized view — the QUERY is
    // stored and substituted at read time, so the aggregate view over
    // the filtering view computes against live lineitem. Nested views
    // exercise the dependency-ordered refresh; CH-dialect toYear inside
    // the body proves views run through the full rewrite pipeline. The
    // oracle inlines the composed query.
    "d21_create_view" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      // the view chain roots at a WAREHOUSE table (not the session-scoped
      // lineitem temp view) so restart replay restores cleanly: tables
      // first, then the nested views over them
      g.sql("DROP TABLE IF EXISTS d21_src")
      g.sql("CREATE TABLE d21_src AS SELECT l_returnflag, l_quantity, " +
        "l_shipdate FROM lineitem")
      g.sql("CREATE OR REPLACE VIEW d21_base AS SELECT l_returnflag AS " +
        "flag, l_quantity AS qty, l_shipdate AS d FROM d21_src " +
        "WHERE l_quantity <= 10")
      g.sql("CREATE OR REPLACE VIEW d21_top AS SELECT flag, " +
        "CAST(toYear(d) AS INT) AS yr, count(*) AS n, " +
        "CAST(sum(CAST(qty AS DECIMAL(12,2))) AS DOUBLE) AS sq " +
        "FROM d21_base GROUP BY flag, CAST(toYear(d) AS INT)")
      g.sql("SELECT flag, yr, n, sq FROM d21_top ORDER BY flag, yr")
    },

    // ClickHouse `ORDER BY k WITH FILL FROM a TO b STEP s` (d09): the
    // value-bucket histogram has guaranteed gaps below bucket 2; the
    // rewrite left-joins the result onto the generated grid (TO is
    // exclusive, CH's contract; filled rows carry ANSI NULLs — same
    // documented divergence as d06's totals keys). Oracle: DuckDB
    // generate_series + LEFT JOIN, independently formulated.
    "d09_with_fill" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("SELECT CAST(floor(value / 25) AS BIGINT) AS k, " +
        "count(*) AS n FROM events WHERE value > 60 GROUP BY k " +
        "ORDER BY k WITH FILL FROM 0 TO 10 STEP 1")
    },

    // WITH FILL INTERPOLATE (d09b): filled rows carry the last real
    // row's value forward; real rows keep their own. Oracle = the same
    // grid join with DuckDB's last_value IGNORE NULLS window scoped to
    // filled rows.
    "d09b_fill_interpolate" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("SELECT CAST(floor(value / 25) AS BIGINT) AS k, " +
        "count(*) AS n, CAST(max(user_id) AS BIGINT) AS mu " +
        "FROM events WHERE value > 60 GROUP BY k " +
        "ORDER BY k WITH FILL FROM 0 TO 10 STEP 1 INTERPOLATE (mu)")
    },

    // Monotone civil-predicate unwrap (d27): toYear/toYYYYMM filters gain
    // an implied raw-column range (CivilPredicateUnwrap), so the scan
    // row-group-skips and __ptk-prunes like ClickHouse's monotonic index
    // analysis. Values must be IDENTICAL to the un-unwrapped semantics —
    // DuckDB evaluates the same civil predicates natively.
    "d27_civil_unwrap" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("""SELECT CAST(toYYYYMM(l_shipdate) AS BIGINT) AS ym,
        |  count(*) AS n, CAST(sum(l_orderkey) AS BIGINT) AS sk
        |FROM lineitem
        |WHERE toYear(l_shipdate) = 1996
        |  AND toYYYYMM(l_shipdate) <= 199606
        |  AND toDate(l_shipdate) >= toDate('1996-02-15')
        |GROUP BY ym ORDER BY ym""".stripMargin)
    },

    // Projections (d28): ADD PROJECTION builds a hidden pre-aggregated
    // table maintained by the MV insert-fanout; ProjectionRoute rewrites
    // the matching aggregate onto it (re-aggregating per-block partials —
    // CH's AggregatingMergeTree merge). Two insert waves exercise the
    // fanout; the filter rides on the projection key. The oracle
    // recomputes everything from the raw events rows in DuckDB.
    "d28_projection" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("DROP TABLE IF EXISTS d28_t")
      g.sql("CREATE TABLE d28_t AS SELECT event_id AS k, event_type AS cat, " +
        "user_id AS u, CAST(value AS DECIMAL(12,4)) AS v FROM events " +
        "WHERE event_id % 2 = 0")
      g.sql("ALTER TABLE d28_t ADD PROJECTION by_cat (SELECT cat, " +
        "count() AS c, sum(u) AS su, sum(v) AS sv, min(u) AS mu, " +
        "max(u) AS xu GROUP BY cat)")
      g.sql("INSERT INTO d28_t SELECT event_id, event_type, user_id, " +
        "CAST(value AS DECIMAL(12,4)) FROM events WHERE event_id % 2 = 1")
      val df = g.sql("SELECT cat, count() AS n, CAST(sum(u) AS BIGINT) " +
        "AS su, CAST(round(sum(v), 3) AS DOUBLE) AS sv, " +
        "CAST(min(u) AS BIGINT) AS mu, CAST(max(u) AS BIGINT) AS xu " +
        "FROM d28_t WHERE cat <> 'purchase' GROUP BY cat ORDER BY cat")
      require(df.queryExecution.optimizedPlan.toString.contains("__proj_"),
        "d28: the aggregate did not route to the projection")
      df
    },

    // OPTIMIZE ... DEDUPLICATE BY cols (o07): duplicates judged on the
    // BY-columns only, one representative per group (full-row max — the
    // same deterministic stand-in as the no-version ReplacingMergeTree
    // merge, where CH keeps an arbitrary row). The oracle restates the
    // representative as max(value) per (k, et), which the field-order
    // struct max makes exact here.
    "o07_dedup_by" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("DROP TABLE IF EXISTS o07_ev")
      g.sql("CREATE TABLE o07_ev(k Int64, et String, value Float64)")
      g.sql("INSERT INTO o07_ev SELECT event_id % 200 AS k, " +
        "event_type AS et, value FROM events")
      g.sql("OPTIMIZE TABLE o07_ev DEDUPLICATE BY k, et")
      g.sql("SELECT et, count(*) AS n, " +
        "CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sv " +
        "FROM o07_ev GROUP BY et ORDER BY et")
    },

    // ALTER ADD/DROP CONSTRAINT (o08, r19): CH's constraint lifecycle —
    // a constraint added mid-stream guards FUTURE inserts only, a
    // violating block is rejected whole (observable in the `rej` flag),
    // and DROP stops enforcement so the held-back rows land. The final
    // table holds exactly the full events projection, which the oracle
    // recomputes flat.
    "o08_alter_constraint" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("DROP TABLE IF EXISTS o08_ev")
      g.sql("CREATE TABLE o08_ev(k Int64, et String, v Float64)")
      g.sql("INSERT INTO o08_ev SELECT event_id % 100, event_type, value " +
        "FROM events WHERE event_id % 2 = 0")
      g.sql("ALTER TABLE o08_ev ADD CONSTRAINT capped CHECK v <= 100")
      // a violating block is rejected WHOLE — CH's INSERT-time CHECK
      val rejected =
        try { g.sql("INSERT INTO o08_ev SELECT 0, 'x', 500.0"); 0 }
        catch { case _: Exception => 1 }
      // the guarded wave pre-filters to pass the constraint
      g.sql("INSERT INTO o08_ev SELECT event_id % 100, event_type, value " +
        "FROM events WHERE event_id % 2 = 1 AND value <= 100")
      g.sql("ALTER TABLE o08_ev DROP CONSTRAINT capped")
      // constraint dropped: the held-back high-value rows land
      g.sql("INSERT INTO o08_ev SELECT event_id % 100, event_type, value " +
        "FROM events WHERE event_id % 2 = 1 AND value > 100")
      g.sql("SELECT et, count(*) AS n, " +
        "CAST(round(sum(CAST(v AS DECIMAL(18,6))), 2) AS DOUBLE) AS sv, " +
        s"CAST($rejected AS INT) AS rej " +
        "FROM o08_ev GROUP BY et ORDER BY et")
    },

    // AggregateFunction(f, T) + -State/-Merge (d29): the full CH
    // pre-aggregation pattern — a target table declares aggregate-STATE
    // columns in an AggregatingMergeTree, a `CREATE MATERIALIZED VIEW …
    // TO target` writes fState(…) per-block partials into it on every
    // insert, OPTIMIZE FINAL merges states per key (state -> state), and
    // fMerge reads the final values. Decimal inputs keep exact decimal
    // partial sums, so merged sums/averages are row-order independent
    // and the DuckDB oracle (recomputing from the raw rows) must
    // hash-match. 100 TB: states are bounded per key (sum/count/min/max/
    // avg constant-size; uniqExact the distinct set — the exact-distinct
    // cost no engine escapes), merges are one hash aggregate.
    "d29_agg_state_merge" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("DROP TABLE IF EXISTS d29_mv; DROP TABLE IF EXISTS d29_agg; " +
        "DROP TABLE IF EXISTS d29_raw")
      g.sql("CREATE TABLE d29_raw(k Int64, v Float64, et String)")
      g.sql("CREATE TABLE d29_agg(k Int64 PRIMARY KEY, " +
        "s AggregateFunction(sum, Decimal(18,6)), " +
        "c AggregateFunction(count), " +
        "mx AggregateFunction(max, Float64), " +
        "a AggregateFunction(avg, Decimal(18,6)), " +
        "u AggregateFunction(uniqExact, String)) " +
        "ENGINE=AggregatingMergeTree")
      g.sql("CREATE MATERIALIZED VIEW d29_mv TO d29_agg AS " +
        "SELECT k, sumState(CAST(v AS DECIMAL(18,6))) AS s, " +
        "countState() AS c, maxState(v) AS mx, " +
        "avgState(CAST(v AS DECIMAL(18,6))) AS a, " +
        "uniqExactState(et) AS u FROM d29_raw GROUP BY k")
      // two insert waves -> two partial-state rows per key in the target
      g.sql("INSERT INTO d29_raw SELECT event_id % 500 AS k, value, " +
        "event_type FROM events WHERE event_id % 2 = 0")
      g.sql("INSERT INTO d29_raw SELECT event_id % 500 AS k, value, " +
        "event_type FROM events WHERE event_id % 2 = 1")
      // physical state merge: one state row per key survives
      g.sql("OPTIMIZE TABLE d29_agg FINAL")
      g.sql("SELECT k, CAST(round(sumMerge(s), 2) AS DOUBLE) AS sv, " +
        "countMerge(c) AS n, " +
        "CAST(round(CAST(maxMerge(mx) AS DECIMAL(18,6)), 2) AS DOUBLE) AS mv, " +
        "CAST(round(CAST(avgMerge(a) AS DECIMAL(18,6)), 4) AS DOUBLE) AS av, " +
        "uniqExactMerge(u) AS ud " +
        "FROM d29_agg GROUP BY k ORDER BY k")
    },

    // Nested(...) columns (d30): CH's named family of parallel arrays.
    // Storage flattens to `tag.name Array(String)` / `tag.val
    // Array(Float64)` (flatten_nested=1, the CH default) with per-row
    // equal-length enforcement; `ARRAY JOIN tag` zips the family back to
    // rows, and plain `tag.name` references resolve to the flattened
    // column. The readback re-expands every collected event exactly once,
    // so the oracle is the flat projection of the source — an
    // independent path to the same rows.
    "d30_nested_array_join" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("DROP TABLE IF EXISTS d30_n")
      g.sql("CREATE TABLE d30_n(id Int64, " +
        "tag Nested(name String, val Float64)) ENGINE=MergeTree ORDER BY id")
      g.sql("INSERT INTO d30_n SELECT event_id % 97 AS id, " +
        "transform(sort_array(collect_list(named_struct(" +
        "'k', event_id, 't', event_type, 'v', value))), x -> x.t), " +
        "transform(sort_array(collect_list(named_struct(" +
        "'k', event_id, 't', event_type, 'v', value))), x -> x.v) " +
        "FROM events GROUP BY event_id % 97")
      g.sql("SELECT id, tag.name AS name, " +
        "CAST(round(tag.val, 3) AS DOUBLE) AS v " +
        "FROM d30_n ARRAY JOIN tag ORDER BY id, name, v")
    },

    // Mergeable quantile states (d31): AggregateFunction(quantileTDigest,
    // Float64) — the bounded centroid digest (functions/TDigest.scala).
    // Two insert waves leave two partial-state rows per key; OPTIMIZE
    // FINAL folds them state->state; quantileTDigestMerge reads the
    // quantile out. The b09 oracle discipline: sketches differ across
    // engines, so each engine gates its own approx answer inside the
    // SAME ±1%-rank exact bounds (identical TRUE both sides) and the
    // cross-engine-stable outputs are the exact quantiles themselves.
    "d31_quantile_state_merge" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("DROP TABLE IF EXISTS d31_mv; DROP TABLE IF EXISTS d31_agg; " +
        "DROP TABLE IF EXISTS d31_raw")
      g.sql("CREATE TABLE d31_raw(k Int64, v Float64)")
      g.sql("CREATE TABLE d31_agg(k Int64 PRIMARY KEY, " +
        "q AggregateFunction(quantileTDigest, Float64)) " +
        "ENGINE=AggregatingMergeTree")
      g.sql("CREATE MATERIALIZED VIEW d31_mv TO d31_agg AS " +
        "SELECT k, quantileTDigestState(v) AS q FROM d31_raw GROUP BY k")
      g.sql("INSERT INTO d31_raw SELECT event_id % 7 AS k, value " +
        "FROM events WHERE event_id % 2 = 0")
      g.sql("INSERT INTO d31_raw SELECT event_id % 7 AS k, value " +
        "FROM events WHERE event_id % 2 = 1")
      g.sql("OPTIMIZE TABLE d31_agg FINAL")
      // The six exact rank bounds come from ONE quantilesExactInclusive
      // array state (Catalyst Percentile with a percentage array), not
      // six independent quantileExactInclusive aggregates — identical
      // values (same Percentile interpolation, same per-group sort),
      // ~6x less aggregation state/work (guide §1.2 per-task work;
      // measured: the six-state form carried ~1.8 s of task time at
      // sf0.1). Equivalence oracle-gated (hash unchanged).
      g.sql("SELECT a.k, " +
        "CAST(round(e.ex50, 6) AS DOUBLE) AS ex50, " +
        "CAST(round(e.ex90, 6) AS DOUBLE) AS ex90, " +
        "CAST(quantileTDigestMerge(0.5)(a.q) " +
        "  BETWEEN e.lo50 AND e.hi50 AS INT) AS ok50, " +
        "CAST(quantileTDigestMerge(0.9)(a.q) " +
        "  BETWEEN e.lo90 AND e.hi90 AS INT) AS ok90 " +
        "FROM d31_agg a JOIN (SELECT k, " +
        "  qs[0] AS ex50, qs[1] AS ex90, qs[2] AS lo50, " +
        "  qs[3] AS hi50, qs[4] AS lo90, qs[5] AS hi90 FROM (" +
        "    SELECT k, quantilesExactInclusive(v, " +
        "      0.5d, 0.9d, 0.49d, 0.51d, 0.89d, 0.91d) AS qs " +
        "    FROM d31_raw GROUP BY k)) e ON a.k = e.k " +
        "GROUP BY a.k, e.ex50, e.ex90, e.lo50, e.hi50, e.lo90, e.hi90 " +
        "ORDER BY a.k")
    },

    // Broadened mergeable states (d32): argMax/argMin (struct(o, a)
    // lexicographic states), avgWeighted (exact dual-sum state), the
    // -If-composed sumIf/countIf (the filtered fold IS the state), and
    // parametric topK(k) (the full SpaceSaving summary as the state,
    // exact here since |event_type| = 5 ≪ capacity 16). Same d29
    // discipline: MV TO writes per-block partial states across two
    // insert waves, OPTIMIZE FINAL re-merges state -> state, the
    // -Merge readers recover values the DuckDB oracle recomputes from
    // the raw rows. 100 TB: every state is hard-bounded (structs,
    // scalars, a capacity-bounded summary); all merges are one hash
    // aggregate.
    "d32_arg_topk_state_merge" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("DROP TABLE IF EXISTS d32_mv; DROP TABLE IF EXISTS d32_agg; " +
        "DROP TABLE IF EXISTS d32_raw")
      g.sql("CREATE TABLE d32_raw(k Int64, v Float64, et String, w Int64)")
      g.sql("CREATE TABLE d32_agg(k Int64 PRIMARY KEY, " +
        "am AggregateFunction(argMax, String, Float64), " +
        "an AggregateFunction(argMin, String, Float64), " +
        "aw AggregateFunction(avgWeighted, Decimal(18,6), Int64), " +
        "si AggregateFunction(sumIf, Int64, UInt8), " +
        "ci AggregateFunction(countIf, UInt8), " +
        "tk AggregateFunction(topK(3), String)) " +
        "ENGINE=AggregatingMergeTree")
      g.sql("CREATE MATERIALIZED VIEW d32_mv TO d32_agg AS " +
        "SELECT k, argMaxState(et, v) AS am, argMinState(et, v) AS an, " +
        "avgWeightedState(CAST(v AS DECIMAL(18,6)), w) AS aw, " +
        "sumIfState(w, v > 50) AS si, countIfState(v > 50) AS ci, " +
        "topKState(3)(et) AS tk FROM d32_raw GROUP BY k")
      g.sql("INSERT INTO d32_raw SELECT event_id % 200 AS k, value, " +
        "event_type, event_id % 13 + 1 FROM events WHERE event_id % 2 = 0")
      g.sql("INSERT INTO d32_raw SELECT event_id % 200 AS k, value, " +
        "event_type, event_id % 13 + 1 FROM events WHERE event_id % 2 = 1")
      g.sql("OPTIMIZE TABLE d32_agg FINAL")
      g.sql("SELECT k, argMaxMerge(am) AS amx, argMinMerge(an) AS amn, " +
        "CAST(round(CAST(avgWeightedMerge(aw) AS DECIMAL(18,6)), 4) " +
        "  AS DOUBLE) AS awv, " +
        "CAST(coalesce(sumIfMerge(si), 0) AS BIGINT) AS siv, " +
        "countIfMerge(ci) AS civ, " +
        "concat_ws(',', topKMerge(3)(tk)) AS tkv " +
        "FROM d32_agg GROUP BY k ORDER BY k")
    },

    // Float16 accept-and-widen (d33): the reference PARSES Float16 but
    // cannot execute it (no Arrow array for f16 in its fork —
    // crates/engine/src/datafusions.rs:237-240); here it widens to Spark
    // FloatType with the CH name preserved in graft.ch.types (the same
    // discipline as the UInt widenings), making this a strict-superset
    // line: declare, insert, and read back. Values chosen exactly
    // representable in binary16 so the readback is bit-stable.
    "d33_float16" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val g = new GraftSession(s)
      g.sql("DROP TABLE IF EXISTS d33_h")
      g.sql("CREATE TABLE d33_h(k Int64, h Float16, hn Nullable(Float16))")
      g.sql("INSERT INTO d33_h VALUES (1, 0.5, 0.25), (2, -1.25, NULL), " +
        "(3, 100.0, 2048.0), (4, -0.0625, 7.5)")
      g.sql("SELECT k, CAST(h AS DOUBLE) AS hv, CAST(hn AS DOUBLE) AS hnv " +
        "FROM d33_h ORDER BY k")
    }
  )

  val oracles: Map[String, String] = Map(
    "d01_ddl_insert_values" ->
      """SELECT CAST(year(d) AS INT) AS yr, CAST(sum(a) AS BIGINT) AS total,
        |  count(*) AS n
        |FROM (VALUES (1, 'x', DATE '2021-01-05'), (2, 'y', DATE '2021-03-05'),
        |             (3, 'z', DATE '2022-07-01'), (4, 'x', DATE '2022-11-11'))
        |  AS t(a, b, d)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "d02_insert_select" ->
      """SELECT l_returnflag AS flag,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem WHERE l_orderkey < 500
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "d04_uint64_range" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(CAST(sum(u) AS DECIMAL(38,0)) AS VARCHAR) AS total,
        |  CAST(max(u) AS VARCHAR) AS max_u,
        |  CAST(min(u) AS VARCHAR) AS min_u
        |FROM (VALUES (1, CAST('18446744073709551615' AS DECIMAL(20,0))),
        |             (2, CAST('0' AS DECIMAL(20,0))),
        |             (3, CAST('9223372036854775808' AS DECIMAL(20,0))),
        |             (4, CAST('42' AS DECIMAL(20,0)))) AS t(id, u)""".stripMargin,

    "o01_optimize_compaction" ->
      """SELECT CAST(year(l_shipdate) AS INT) AS yr, count(*) AS n,
        |  CAST(sum(l_orderkey) AS BIGINT) AS sum_ok,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "d03_insert_csv" ->
      """SELECT k, CAST(sum(v) AS DOUBLE) AS total
        |FROM (VALUES (1, CAST(1.50 AS DECIMAL(9,2))), (2, CAST(2.25 AS DECIMAL(9,2))),
        |             (1, CAST(0.25 AS DECIMAL(9,2))), (3, CAST(9.00 AS DECIMAL(9,2))))
        |  AS t(k, v)
        |GROUP BY k ORDER BY k""".stripMargin,

    "d05_limit_by" ->
      """WITH r AS (
        |  SELECT event_id, user_id, event_type, CAST(value AS DOUBLE) AS v,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY CAST(value AS DOUBLE) DESC, event_id) AS rn
        |  FROM events
        |)
        |SELECT event_id, user_id, event_type, v
        |FROM r WHERE rn <= 2 ORDER BY v DESC, event_id LIMIT 7""".stripMargin,

    "d06_with_totals" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(ROUND(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS total
        |FROM events GROUP BY GROUPING SETS ((event_type), ())
        |ORDER BY event_type NULLS FIRST""".stripMargin,

    "d08_into_outfile" ->
      """SELECT event_type, count(*) AS n, CAST(sum(user_id) AS BIGINT) AS su
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "d10_ctas" ->
      """SELECT CAST(year(l_shipdate) AS INT) AS yr, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem WHERE l_orderkey < 800
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "d11_materialized_view" ->
      """SELECT l_returnflag AS flag, count(*) AS n,
        |  CAST(ROUND(sum(CAST(CAST(l_quantity AS DOUBLE) * 2 AS DECIMAL(14,2))), 2)
        |    AS DOUBLE) AS total
        |FROM lineitem
        |WHERE l_orderkey < 600 AND CAST(l_quantity AS DOUBLE) > 10
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "d12_prewhere" ->
      """SELECT event_type, count(*) AS n, CAST(sum(user_id) AS BIGINT) AS su
        |FROM events WHERE value > 50 AND user_id % 2 = 0
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "d13_distinct_on" ->
      """WITH r AS (
        |  SELECT event_type, event_id, CAST(value AS DOUBLE) AS v,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY CAST(value AS DOUBLE) DESC, event_id) AS rn
        |  FROM events
        |)
        |SELECT event_type, event_id, v FROM r WHERE rn = 1
        |ORDER BY v DESC, event_id""".stripMargin,

    "d14_in_table" ->
      """SELECT event_type, count(*) AS n FROM events
        |WHERE event_type IN ('view', 'purchase')
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "d15_array_join" ->
      """SELECT doc_id, word, pos FROM (
        |  SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS word,
        |    unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
        |  FROM documents WHERE doc_id % 97 = 0
        |) t WHERE pos <= 5 ORDER BY doc_id, pos""".stripMargin,

    "d16_sample" ->
      """SELECT count(*) AS n, CAST(sum(event_id) AS BIGINT) AS s,
        |  CAST(ROUND(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sv
        |FROM events
        |WHERE (((((event_id % 2147483648) + 2147483648) % 2147483648)
        |  * 2654435761) % 4294967296) < 1073741824""".stripMargin,

    "d16b_sample_offset" ->
      """SELECT count(*) AS n, CAST(sum(event_id) AS BIGINT) AS s,
        |  CAST(ROUND(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sv
        |FROM events
        |WHERE (((((event_id % 2147483648) + 2147483648) % 2147483648)
        |  * 2654435761) % 4294967296) >= 2147483648
        |  AND (((((event_id % 2147483648) + 2147483648) % 2147483648)
        |  * 2654435761) % 4294967296) < 3221225472""".stripMargin,

    "d16c_sample_bigkeys" ->
      """SELECT count(*) AS n, CAST(min(k) AS BIGINT) AS kmin,
        |  CAST(max(k) AS BIGINT) AS kmax,
        |  CAST(ROUND(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sv
        |FROM (SELECT (event_id % 30000) * 4611686018
        |        - 69175290000000 AS k, value
        |      FROM events) t
        |WHERE (((((k % 2147483648) + 2147483648) % 2147483648)
        |  * 2654435761) % 4294967296) >= 1073741824
        |  AND (((((k % 2147483648) + 2147483648) % 2147483648)
        |  * 2654435761) % 4294967296) < 3221225472""".stripMargin,

    "d17_replacing_final" ->
      """WITH src AS (
        |  SELECT event_id % 3000 AS k, event_id AS ver, value FROM events
        |), w AS (
        |  SELECT k, ver, value,
        |    row_number() OVER (PARTITION BY k ORDER BY ver DESC) AS rn
        |  FROM src
        |)
        |SELECT count(*) AS n, CAST(sum(ver) AS BIGINT) AS sver,
        |  CAST(ROUND(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sv
        |FROM w WHERE rn = 1""".stripMargin,

    "d18_summing_final" ->
      """SELECT event_id % 3000 AS k, CAST(count(*) AS BIGINT) AS n,
        |  CAST(ROUND(sum(value), 2) AS DOUBLE) AS v
        |FROM events GROUP BY 1 ORDER BY k""".stripMargin,

    "d19_collapsing_final" ->
      """WITH src AS (
        |  SELECT event_id % 3000 AS k, 1 AS sign, value FROM events
        |  UNION ALL SELECT event_id % 3000, -1, value FROM events
        |    WHERE event_id % 3000 < 500
        |  UNION ALL SELECT event_id % 3000, -1, value FROM events
        |    WHERE event_id % 3000 < 200
        |), agg AS (
        |  SELECT k, CAST(sum(sign) AS BIGINT) AS s,
        |         max(value) FILTER (WHERE sign = 1) AS vp,
        |         max(value) FILTER (WHERE sign = -1) AS vn
        |  FROM src GROUP BY k)
        |SELECT k, CAST(CASE WHEN s >= 1 THEN 1 ELSE -1 END AS INT) AS sign,
        |       CAST(ROUND(CASE WHEN s >= 1 THEN vp ELSE vn END, 2) AS DOUBLE) AS v
        |FROM agg WHERE s <> 0 ORDER BY k""".stripMargin,

    "d20_vcollapsing_final" ->
      """WITH src AS (
        |  SELECT event_id % 1000 AS k,
        |         CASE WHEN event_id % 7 = 0 THEN -1 ELSE 1 END AS sign,
        |         event_id % 3 AS ver FROM events),
        |agg AS (SELECT k, ver, CAST(sum(sign) AS BIGINT) AS s
        |        FROM src GROUP BY k, ver)
        |SELECT k, CAST(CASE WHEN s >= 1 THEN 1 ELSE -1 END AS INT) AS sign, ver
        |FROM (SELECT k, ver, s, unnest(range(1, abs(s) + 1)) AS i
        |      FROM agg WHERE s <> 0)
        |ORDER BY k, ver""".stripMargin,

    "o04_partition_ddl" ->
      """SELECT CAST(year(l_shipdate) AS INT) AS yr, count(*) AS n,
        |  CAST(sum(l_orderkey) AS BIGINT) AS sum_ok
        |FROM lineitem WHERE year(l_shipdate) <> 1996
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "o05_column_ddl" ->
      """SELECT l_returnflag AS flag, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS INTEGER)) AS BIGINT) AS sq
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "d25_rich_types" ->
      """WITH src AS (
        |  SELECT event_id AS k,
        |    CASE WHEN value > 50 THEN 'high' ELSE 'low' END AS st,
        |    CAST(floor(value / 10) AS BIGINT) * 10 AS v10,
        |    event_id % 7 AS x, event_type AS y
        |  FROM events)
        |SELECT st, count(*) AS n, CAST(sum(v10) AS BIGINT) AS sv,
        |  CAST(sum(x) AS BIGINT) AS sx, min(y) AS my
        |FROM src GROUP BY 1 ORDER BY 1""".stripMargin,

    "d24_any_join" ->
      """WITH r AS (
        |  SELECT o_custkey AS k,
        |    CAST(ROUND(CAST(o_totalprice AS DECIMAL(14,2)), 2) AS DOUBLE)
        |      AS price
        |  FROM orders),
        |d AS (
        |  SELECT k, price FROM (
        |    SELECT k, price,
        |      row_number() OVER (PARTITION BY k ORDER BY k, price) AS rn
        |    FROM r) WHERE rn = 1)
        |SELECT c_mktsegment AS seg, count(*) AS n,
        |  CAST(ROUND(sum(CAST(price AS DECIMAL(18,2))), 2) AS DOUBLE) AS sp
        |FROM customer LEFT JOIN d ON d.k = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "d23_dictionary" ->
      """SELECT coalesce(n.n_name, 'unknown') AS nat,
        |  'unknown' AS missed, count(*) AS n,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal,
        |  CAST(sum(CASE WHEN n.n_nationkey IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS hits
        |FROM customer c LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    "d25b_datetime64" ->
      """WITH lit(t3, t6, d) AS (VALUES
        |  (TIMESTAMP '2024-01-01 00:00:00.123',
        |   TIMESTAMP '2024-01-01 00:00:00.123456', DATE '1965-03-02'),
        |  (TIMESTAMP '2024-06-30 23:59:59.999',
        |   TIMESTAMP '2024-06-30 23:59:59.999999', DATE '2024-06-30'),
        |  (TIMESTAMP '1970-01-01 00:00:00',
        |   TIMESTAMP '1970-01-01 00:00:00', DATE '1970-01-01'))
        |SELECT
        |  (SELECT CAST(sum(epoch_us(t3) + epoch_us(t6)) AS BIGINT)
        |   FROM lit) AS lit_us,
        |  (SELECT CAST(sum(datediff('day', DATE '1970-01-01', d))
        |   AS BIGINT) FROM lit) AS d32_days,
        |  (SELECT CAST(sum(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT)
        |   FROM events WHERE event_id < 500) AS ev_us,
        |  (SELECT count(*) FROM events WHERE event_id < 500) AS n""".stripMargin,

    "d26c_asof_forward_sql" ->
      """SELECT c.event_id, epoch_us(v.vts) AS next_view_us,
        |  v.vv AS view_value
        |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |      FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS vts, max(value) AS vv
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2) v
        |  ON c.user_id = v.user_id AND c.ts <= v.vts
        |ORDER BY c.event_id""".stripMargin,

    "d23b_dictionary_join" ->
      """SELECT l.l_returnflag AS flag, count(*) AS n,
        |  CAST(sum(CASE WHEN o.o_orderkey IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS hits,
        |  CAST(round(sum(CAST(coalesce(
        |    round(CAST(o.o_totalprice AS DECIMAL(14,2)), 2), 0)
        |    AS DECIMAL(18,2))), 2) AS DOUBLE) AS sp
        |FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
        |WHERE l.l_orderkey < 2000 GROUP BY 1 ORDER BY 1""".stripMargin,

    "d22_aggregating_final" ->
      """WITH agg AS (
        |  SELECT event_id % 3000 AS k, count(*) AS n,
        |         max(value) AS vmax, min(value) AS vmin
        |  FROM events GROUP BY 1)
        |SELECT count(*) AS cnt, CAST(sum(n) AS BIGINT) AS rows_merged,
        |  CAST(ROUND(sum(CAST(vmax AS DECIMAL(18,6))), 2) AS DOUBLE) AS smax,
        |  CAST(ROUND(sum(CAST(vmin AS DECIMAL(18,6))), 2) AS DOUBLE) AS smin
        |FROM agg""".stripMargin,

    "o06_ttl" ->
      """SELECT event_type AS et, count(*) AS n,
        |  CAST(ROUND(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sv
        |FROM events WHERE event_id % 10 >= 3
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "d21_create_view" ->
      """SELECT l_returnflag AS flag, CAST(year(l_shipdate) AS INT) AS yr,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sq
        |FROM lineitem WHERE l_quantity <= 10
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "o03_mutation" ->
      """WITH src AS (
        |  SELECT event_id AS k, event_type AS et, value FROM events),
        |kept AS (
        |  SELECT k, CASE WHEN k % 10 = 4 THEN upper(et) ELSE et END AS et,
        |         CASE WHEN k % 10 = 4 THEN value * 2 ELSE value END AS value
        |  FROM src WHERE NOT (k % 10 = 3))
        |SELECT et, CAST(count(*) AS BIGINT) AS n,
        |  CAST(ROUND(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sv
        |FROM kept GROUP BY et ORDER BY et""".stripMargin,

    "o02_optimize_final" ->
      """WITH src AS (
        |  SELECT event_id % 3000 AS k, event_id AS ver, value FROM events
        |), w AS (
        |  SELECT k, ver, value,
        |    row_number() OVER (PARTITION BY k ORDER BY ver DESC) AS rn
        |  FROM src
        |)
        |SELECT count(*) AS n, CAST(sum(ver) AS BIGINT) AS sver,
        |  CAST(ROUND(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sv
        |FROM w WHERE rn = 1""".stripMargin,

    "d26_asof_join_sql" ->
      """SELECT c.event_id, c.user_id, epoch_us(c.ts) AS click_us,
        |  epoch_us(v.vts) AS view_us, v.vv AS view_value
        |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |      FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS vts, max(value) AS vv
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2) v
        |  ON c.user_id = v.user_id AND c.ts >= v.vts
        |ORDER BY c.event_id""".stripMargin,

    "d26b_asof_inner_sql" ->
      """SELECT count(*) AS n, CAST(sum(c.user_id) AS BIGINT) AS su,
        |  CAST(round(sum(CAST(v.vv AS DECIMAL(18,4))), 3) AS DOUBLE) AS sv
        |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |      FROM events WHERE event_type = 'click') c
        |ASOF JOIN (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS vts, max(value) AS vv
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2) v
        |  ON c.user_id = v.user_id AND c.ts >= v.vts""".stripMargin,

    "d09_with_fill" ->
      """WITH src AS (
        |  SELECT CAST(floor(value / 25) AS BIGINT) AS k, count(*) AS n
        |  FROM events WHERE value > 60 GROUP BY k
        |), grid AS (SELECT unnest(range(0, 10)) AS k)
        |SELECT grid.k AS k, src.n AS n
        |FROM grid LEFT JOIN src ON grid.k = src.k
        |ORDER BY k""".stripMargin,

    "d09b_fill_interpolate" ->
      """WITH src AS (
        |  SELECT CAST(floor(value / 25) AS BIGINT) AS k, count(*) AS n,
        |    CAST(max(user_id) AS BIGINT) AS mu
        |  FROM events WHERE value > 60 GROUP BY 1
        |), grid AS (SELECT unnest(range(0, 10)) AS k)
        |SELECT grid.k AS k, src.n AS n,
        |  CASE WHEN src.k IS NULL THEN last_value(src.mu IGNORE NULLS)
        |    OVER (ORDER BY grid.k ROWS BETWEEN UNBOUNDED PRECEDING AND
        |      CURRENT ROW) ELSE src.mu END AS mu
        |FROM grid LEFT JOIN src ON grid.k = src.k
        |ORDER BY k""".stripMargin,

    "d07_limit_with_ties" ->
      """WITH r AS (
        |  SELECT event_id, user_id, CAST(floor(value / 20) AS INT) AS v,
        |    rank() OVER (ORDER BY CAST(floor(value / 20) AS INT) DESC) AS rk
        |  FROM events
        |)
        |SELECT event_id, user_id, v FROM r WHERE rk <= 5
        |ORDER BY v DESC""".stripMargin,

    "d27_civil_unwrap" ->
      """SELECT CAST(extract(year FROM l_shipdate) * 100 +
        |    extract(month FROM l_shipdate) AS BIGINT) AS ym,
        |  count(*) AS n, CAST(sum(l_orderkey) AS BIGINT) AS sk
        |FROM lineitem
        |WHERE extract(year FROM l_shipdate) = 1996
        |  AND extract(year FROM l_shipdate) * 100 +
        |    extract(month FROM l_shipdate) <= 199606
        |  AND CAST(l_shipdate AS DATE) >= DATE '1996-02-15'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // d28 recomputed from the RAW events rows: a hash match proves the
    // projection's per-block partials re-aggregate to the exact answer.
    "d28_projection" ->
      """SELECT event_type AS cat, count(*) AS n,
        |  CAST(sum(user_id) AS BIGINT) AS su,
        |  CAST(round(sum(CAST(value AS DECIMAL(12,4))), 3) AS DOUBLE) AS sv,
        |  CAST(min(user_id) AS BIGINT) AS mu,
        |  CAST(max(user_id) AS BIGINT) AS xu
        |FROM events WHERE event_type <> 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // o08: after add -> reject -> pre-filtered wave -> drop -> remainder,
    // the table is exactly the full events projection; rej pins that the
    // violating block really was refused
    "o08_alter_constraint" ->
      """SELECT event_type AS et, count(*) AS n,
        |  CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sv,
        |  CAST(1 AS INT) AS rej
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "o07_dedup_by" ->
      """WITH src AS (
        |  SELECT event_id % 200 AS k, event_type AS et, value FROM events
        |), d AS (
        |  SELECT k, et, max(value) AS value FROM src GROUP BY k, et
        |)
        |SELECT et, count(*) AS n,
        |  CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sv
        |FROM d GROUP BY et ORDER BY et""".stripMargin,

    // d29 recomputed from the RAW events rows: a hash match proves the
    // -State partials written by the MV, the OPTIMIZE FINAL state merge,
    // and the -Merge readers compose to the exact direct aggregate.
    "d29_agg_state_merge" ->
      """SELECT event_id % 500 AS k,
        |  CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sv,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(round(CAST(max(value) AS DECIMAL(18,6)), 2) AS DOUBLE) AS mv,
        |  CAST(round(CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
        |    / count(*) AS DECIMAL(18,6)), 4) AS DOUBLE) AS av,
        |  CAST(count(DISTINCT event_type) AS BIGINT) AS ud
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // d30 collects events into Nested parallel arrays and ARRAY JOINs
    // them back out — every source row re-expands exactly once, so the
    // oracle is the flat projection computed without any nesting.
    "d30_nested_array_join" ->
      """SELECT CAST(event_id % 97 AS BIGINT) AS id, event_type AS name,
        |  CAST(round(value, 3) AS DOUBLE) AS v
        |FROM events ORDER BY id, name, v""".stripMargin,

    // d32 recomputes every merged value from the raw rows: argMax/argMin
    // via deterministic (v, et) windows, avgWeighted as exact decimal
    // sums divided once, sumIf/countIf as FILTER aggregates, topK(3) as
    // the exact per-key count ranking (the summary is exact here —
    // 5 distinct event_types, capacity 16)
    "d32_arg_topk_state_merge" ->
      """WITH r AS (SELECT event_id % 200 AS k, value AS v,
        |    event_type AS et, event_id % 13 + 1 AS w FROM events),
        |mx AS (SELECT k, et AS amx FROM (SELECT k, et, row_number()
        |  OVER (PARTITION BY k ORDER BY v DESC, et DESC) AS rn FROM r)
        |  WHERE rn = 1),
        |mn AS (SELECT k, et AS amn FROM (SELECT k, et, row_number()
        |  OVER (PARTITION BY k ORDER BY v ASC, et ASC) AS rn FROM r)
        |  WHERE rn = 1),
        |ag AS (SELECT k,
        |  CAST(round(CAST(CAST(sum(CAST(v AS DECIMAL(18,6)) * w) AS DOUBLE)
        |    / CAST(sum(w) AS DOUBLE) AS DECIMAL(18,6)), 4) AS DOUBLE) AS awv,
        |  CAST(coalesce(sum(w) FILTER (WHERE v > 50), 0) AS BIGINT) AS siv,
        |  CAST(count(*) FILTER (WHERE v > 50) AS BIGINT) AS civ
        |  FROM r GROUP BY k),
        |tc AS (SELECT k, et, count(*) AS c FROM r GROUP BY k, et),
        |tk AS (SELECT k, string_agg(et, ',' ORDER BY c DESC, et) AS tkv
        |  FROM (SELECT k, et, c, row_number() OVER (PARTITION BY k
        |    ORDER BY c DESC, et) AS rn FROM tc) WHERE rn <= 3 GROUP BY k)
        |SELECT CAST(ag.k AS BIGINT) AS k, mx.amx, mn.amn, ag.awv, ag.siv,
        |  ag.civ, tk.tkv
        |FROM ag JOIN mx ON ag.k = mx.k JOIN mn ON ag.k = mn.k
        |  JOIN tk ON ag.k = tk.k
        |ORDER BY k""".stripMargin,

    // d33: every literal is exactly representable in binary16/32, so the
    // widened-float readback equals the plain double values
    "d33_float16" ->
      """SELECT CAST(k AS BIGINT) AS k, CAST(hv AS DOUBLE) AS hv,
        |  CAST(hnv AS DOUBLE) AS hnv
        |FROM (VALUES (1, 0.5, 0.25), (2, -1.25, NULL),
        |             (3, 100.0, 2048.0), (4, -0.0625, 7.5)) AS t(k, hv, hnv)
        |ORDER BY k""".stripMargin,

    // d31: exact quantiles are cross-engine-stable; the ok flags gate
    // each engine's own sketch inside the same ±1%-rank exact bounds
    "d31_quantile_state_merge" ->
      """SELECT CAST(event_id % 7 AS BIGINT) AS k,
        |  CAST(round(quantile_cont(value, 0.5), 6) AS DOUBLE) AS ex50,
        |  CAST(round(quantile_cont(value, 0.9), 6) AS DOUBLE) AS ex90,
        |  CAST(approx_quantile(value, 0.5)
        |    BETWEEN quantile_cont(value, 0.49)
        |        AND quantile_cont(value, 0.51) AS INT) AS ok50,
        |  CAST(approx_quantile(value, 0.9)
        |    BETWEEN quantile_cont(value, 0.89)
        |        AND quantile_cont(value, 0.91) AS INT) AS ok90
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
