package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsofJoin, RangeJoin}

/** Semantics of the temporal join operators (graft.operators.{AsofJoin,
  * RangeJoin}) on hand-built edge cases, plus an equivalence check of each
  * scalable shape against the naive quadratic definition on the sf0.001
  * events fixture. Full-scale oracle parity is the a01/a02 DuckDB gate.
  */
class AsofRangeJoinSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** The quadratic reference definition: all (left, right) pairs with
    * rt <= t per key, keep the max-rt row per left id. Shared by both
    * naive-equivalence tests so the spec can't silently fork.
    */
  private def naiveAsof(left: org.apache.spark.sql.DataFrame,
                        right: org.apache.spark.sql.DataFrame,
                        key: String, leftTime: String, rightTime: String,
                        leftId: String,
                        payload: String): org.apache.spark.sql.DataFrame =
    left.join(
        right.withColumnRenamed(key, "__rk")
          .withColumnRenamed(rightTime, "__rt"),
        col(key) === col("__rk") && col("__rt") <= col(leftTime), "left")
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(leftId)).orderBy(col("__rt").desc_nulls_last)))
      .filter(col("__rn") === 1)
      .select(col(leftId), col(payload))

  test("asof: latest at-or-before match per key, inclusive at equal time") {
    val left = Seq(
      (1, ts("2024-01-01 10:00:00"), "l1"),
      (1, ts("2024-01-01 12:00:00"), "l2"),
      (2, ts("2024-01-01 10:30:00"), "l3"))
      .toDF("k", "t", "name")
    val right = Seq(
      (1, ts("2024-01-01 09:00:00"), 9.0),
      (1, ts("2024-01-01 10:00:00"), 10.0), // equal time: must match l1
      (1, ts("2024-01-01 11:00:00"), 11.0),
      (2, ts("2024-01-01 11:00:00"), 99.0)) // after l3: no match
      .toDF("k", "rt", "v")
    val out = AsofJoin.backward(left, right, "k", "t", "rt", Seq("v"))
      .orderBy("name")
      .select("name", "v").as[(String, Option[Double])].collect()
    assert(out === Seq(("l1", Some(10.0)), ("l2", Some(11.0)), ("l3", None)))
  }

  test("asof within-tolerance: stale matches null out, fresh ones equal " +
    "backward, equal-time matches always survive") {
    val left = Seq(
      (1, ts("2024-01-01 10:00:00"), "l1"),  // match at 10:00 (age 0)
      (1, ts("2024-01-01 12:00:00"), "l2"),  // latest 11:00 — 60 min stale
      (1, ts("2024-01-01 11:05:00"), "l4"),  // latest 11:00 — 5 min, fresh
      (2, ts("2024-01-01 10:30:00"), "l3"))  // no at-or-before match
      .toDF("k", "t", "name")
    val right = Seq(
      (1, ts("2024-01-01 09:00:00"), 9.0),
      (1, ts("2024-01-01 10:00:00"), 10.0),
      (1, ts("2024-01-01 11:00:00"), 11.0),
      (2, ts("2024-01-01 11:00:00"), 99.0))
      .toDF("k", "rt", "v")
    val out = AsofJoin.backwardWithin(left, right, "k", "t", "rt", Seq("v"),
        toleranceUs = 10L * 60 * 1000 * 1000)
      .orderBy("name")
      .select("name", "v").as[(String, Option[Double])].collect()
    assert(out === Seq(("l1", Some(10.0)), ("l2", None), ("l3", None),
      ("l4", Some(11.0))))
    // and on real events: within == backward wherever backward's match is
    // fresh, null wherever it is stale — never a DIFFERENT (older) match
    val ev = graft.Tables.events(spark, SparkTestSession.sf)
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("view_value"))
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("vus"),
        col("view_value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val tol = 10L * 60 * 1000 * 1000
    val base = AsofJoin.backward(clicks, views, "user_id", "ts", "ts",
        Seq("vus", "view_value"))
      .select(col("event_id"), unix_micros(col("ts")).as("cus"),
        col("vus"), col("view_value"))
      .collect().map(r => (r.getLong(0),
        (if (r.isNullAt(2) || r.getLong(1) - r.getLong(2) > tol) None
         else Some((r.getLong(2), r.getDouble(3)))))).toMap
    val within = AsofJoin.backwardWithin(clicks, views, "user_id", "ts", "ts",
        Seq("vus", "view_value"), toleranceUs = tol)
      .select(col("event_id"), col("vus"), col("view_value"))
      .collect().map(r => (r.getLong(0),
        (if (r.isNullAt(1)) None
         else Some((r.getLong(1), r.getDouble(2)))))).toMap
    assert(within == base)
  }

  test("asof: equals the per-row naive definition on real events") {
    val ev = Tables(spark, SparkTestSession.sf, "events")
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("v"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val fast = AsofJoin.backward(clicks, views, "user_id", "ts", "ts", Seq("v"))
      .select(col("event_id"), col("v"))
    val naive = naiveAsof(clicks, views, "user_id", "ts", "ts", "event_id", "v")
    assert(fast.count() === clicks.count())
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("asof: null payload fields stay atomic — no cross-row backfill") {
    // Right rows: (t=1, p1=5, p2=null) then (t=2, p1=null, p2=7). The
    // as-of match for a left row at t=3 is the t=2 ROW — (null, 7). A
    // per-column carry-forward would invent (5, 7), a row that never
    // existed; the payload struct must win or lose atomically.
    val left = Seq((1, 3L, 10L)).toDF("k", "t", "lid")
    val right = Seq((1, 1L, Some(5.0), Option.empty[Double]),
        (1, 2L, Option.empty[Double], Some(7.0)))
      .toDF("k", "rt", "p1", "p2")
    val out = AsofJoin.backward(left, right, "k", "t", "rt", Seq("p1", "p2"))
      .select("p1", "p2").as[(Option[Double], Option[Double])].collect()
    assert(out === Seq((None, Some(7.0))))
  }

  test("range: bin straddling and [start, end) bounds are exact") {
    // bin = 60s; interval straddles two bins; end is exclusive
    val intervals = Seq((1, ts("2024-01-01 10:00:30"), ts("2024-01-01 10:01:30")))
      .toDF("iid", "s", "e")
    val points = Seq(
      (10, ts("2024-01-01 10:00:29")), // before start
      (11, ts("2024-01-01 10:00:30")), // == start: in
      (12, ts("2024-01-01 10:00:59")), // bin 1: in
      (13, ts("2024-01-01 10:01:29")), // bin 2: in
      (14, ts("2024-01-01 10:01:30"))) // == end: out (exclusive)
      .toDF("pid", "t")
    val got = RangeJoin.pointInInterval(intervals, "s", "e", points, "t", 60L)
      .select("pid").as[Int].collect().sorted
    assert(got === Seq(11, 12, 13))
  }

  test("range: equals the naive inequality join on real events, no dup pairs") {
    val ev = Tables(spark, SparkTestSession.sf, "events")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("ts").as("err_ts"),
        (col("ts") + expr("INTERVAL 15 MINUTES")).as("err_end"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("click_ts"))
    val fast = RangeJoin.pointInInterval(errors, "err_ts", "err_end",
        clicks, "click_ts", 900L)
      .select(col("err_id"), col("click_id"))
    val naive = errors.join(clicks,
        col("click_ts") >= col("err_ts") && col("click_ts") < col("err_end"))
      .select(col("err_id"), col("click_id"))
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
    // each true pair meets in exactly one bin — no dedup hidden anywhere
    assert(fast.count() === fast.distinct().count())
  }

  test("asof: random datasets match the naive definition (seeded property)") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { _ =>
      // small key/time domains force collisions: equal times across sides,
      // keys with only-left or only-right rows
      val left = (0 until (150 + rnd.nextInt(100)))
        .map(i => (rnd.nextInt(8), rnd.nextInt(500).toLong, i.toLong))
        .toDF("k", "t", "lid")
      val right = (0 until 120)
        .map(_ => (rnd.nextInt(10), rnd.nextInt(500).toLong, rnd.nextDouble()))
        .toDF("k", "rt", "v")
        .groupBy("k", "rt").agg(max(col("v")).as("v")) // unique per (k, rt)
      val fast = AsofJoin.backward(left, right, "k", "t", "rt", Seq("v"))
        .select(col("lid"), col("v"))
      val naive = naiveAsof(left, right, "k", "t", "rt", "lid", "v")
      assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
    }
  }

  test("asof binned: equals backward on a pathologically skewed key") {
    // ONE key holds ~all rows (the VERDICT r6 #2 failure mode: a single
    // user/symbol with the whole history). backward() puts that key's
    // entire merged history into one window sort task; backwardBinned must
    // (a) return the identical result and (b) subdivide the window
    // partitioning so no task sees the whole key.
    val rnd = new scala.util.Random(11)
    val left = (0 until 4000).map { i =>
      val k = if (i % 100 == 0) 1 + rnd.nextInt(3) else 0 // 99% on key 0
      (k, rnd.nextInt(100000).toLong, i.toLong)
    }.toDF("k", "t", "lid")
    val right = (0 until 3000).map { _ =>
      val k = if (rnd.nextInt(100) == 0) 1 + rnd.nextInt(3) else 0
      (k, rnd.nextInt(100000).toLong, rnd.nextDouble())
    }.toDF("k", "rt", "v")
      .groupBy("k", "rt").agg(max(col("v")).as("v"))
    val bin = (c: org.apache.spark.sql.Column) => floor(c / lit(1000L))
    val flat = AsofJoin.backward(left, right, "k", "t", "rt", Seq("v"))
      .select(col("lid"), col("v"))
    val binned = AsofJoin.backwardBinned(left, right, "k", "t", "rt", Seq("v"), bin)
      .select(col("lid"), col("v"))
    assert(binned.exceptAll(flat).isEmpty && flat.exceptAll(binned).isEmpty)
    // the skew guarantee: the detail window's partition key (k, bin) has
    // ~two orders of magnitude more groups than k alone — the hot key's
    // history is spread over ~100 sortable partitions, not one
    val keyGroups = left.select("k").distinct().count()
    val binGroups = left.select(col("k"), bin(col("t"))).distinct().count()
    assert(binGroups > keyGroups * 20,
      s"binning did not subdivide the hot key: $keyGroups keys -> $binGroups (k,bin) groups")
  }

  test("asof binned: carry-in crosses empty and right-free bins") {
    // Left rows land in bins with NO right rows: bin 0 has the only right
    // row; left rows sit in bins 5 and 9. Their match must carry in from
    // bin 0 across empty bins. A left row BEFORE any right row stays null.
    val left = Seq((1, 5500L, 1L), (1, 9900L, 2L), (1, 100L, 3L))
      .toDF("k", "t", "lid")
    val right = Seq((1, 200L, 42.0)).toDF("k", "rt", "v")
    val out = AsofJoin.backwardBinned(left, right, "k", "t", "rt", Seq("v"),
        c => floor(c / lit(1000L)))
      .orderBy("lid").select("lid", "v")
      .as[(Long, Option[Double])].collect()
    assert(out === Seq((1L, Some(42.0)), (2L, Some(42.0)), (3L, None)))
  }

  test("asof: payload names containing a dot resolve as literal fields") {
    // ADVICE r6: a dot-path col() would read `price.usd` as a nested path;
    // getField must treat it as one literal struct-field name.
    val left = Seq((1, 10L, 1L)).toDF("k", "t", "lid")
    val right = Seq((1, 5L, 3.5)).toDF("k", "rt", "price.usd")
    val out = AsofJoin.backward(left, right, "k", "t", "rt", Seq("price.usd"))
      .select(col("lid"), col("`price.usd`"))
      .as[(Long, Option[Double])].collect()
    assert(out === Seq((1L, Some(3.5))))
    val outB = AsofJoin.backwardBinned(left, right, "k", "t", "rt",
        Seq("price.usd"), c => floor(c / lit(100L)))
      .select(col("lid"), col("`price.usd`"))
      .as[(Long, Option[Double])].collect()
    assert(outB === Seq((1L, Some(3.5))))
  }

  test("asof binned: random datasets match backward (seeded property)") {
    val rnd = new scala.util.Random(99)
    (1 to 3).foreach { _ =>
      val left = (0 until 200)
        .map(i => (rnd.nextInt(6), rnd.nextInt(800).toLong, i.toLong))
        .toDF("k", "t", "lid")
      val right = (0 until 150)
        .map(_ => (rnd.nextInt(8), rnd.nextInt(800).toLong, rnd.nextDouble()))
        .toDF("k", "rt", "v")
        .groupBy("k", "rt").agg(max(col("v")).as("v"))
      Seq(1L, 50L, 10000L).foreach { w => // 10000 > domain: one bin == flat
        val flat = AsofJoin.backward(left, right, "k", "t", "rt", Seq("v"))
          .select(col("lid"), col("v"))
        val binned = AsofJoin.backwardBinned(left, right, "k", "t", "rt",
            Seq("v"), c => floor(c / lit(w)))
          .select(col("lid"), col("v"))
        assert(binned.exceptAll(flat).isEmpty && flat.exceptAll(binned).isEmpty,
          s"binWidth=$w")
      }
    }
  }

  test("range: random intervals match the naive join across bin widths") {
    val rnd = new scala.util.Random(7)
    Seq(7L, 60L, 900L).foreach { bin =>
      // spans from inverted (end < start: must match nothing, not descend
      // through wrong bins) through 0 (degenerate) to many-bin straddles
      val intervals = (0 until 60).map { i =>
        val s0 = rnd.nextInt(50000)
        (i.toLong, s0.toLong,
          (s0 + (rnd.nextInt(5) - 1) * rnd.nextInt(1500)).toLong)
      }.toDF("iid", "su", "eu")
        .select(col("iid"), timestamp_seconds(col("su")).as("s"),
          timestamp_seconds(col("eu")).as("e"))
      val points = (0 until 250)
        .map(i => (i.toLong, rnd.nextInt(55000).toLong))
        .toDF("pid", "pu")
        .select(col("pid"), timestamp_seconds(col("pu")).as("t"))
      val fast = RangeJoin.pointInInterval(intervals, "s", "e", points, "t", bin)
        .select(col("iid"), col("pid"))
      val naive = intervals.join(points,
          col("t") >= col("s") && col("t") < col("e"))
        .select(col("iid"), col("pid"))
      assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty,
        s"bin=$bin")
    }
  }
}
