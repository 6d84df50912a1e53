package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}

import graft.functions.BehaviorFunctions

/** The behavioral aggregates' procedural scans vs brute-force reference
  * definitions, plus the merge/partial path (the aggregates must be
  * order- and split-insensitive — Catalyst merges partials in arbitrary
  * order at scale). Raw scalacheck — the scalatestplus bridge is not in
  * the offline cache (the BqlTypeSpec precedent).
  */
class BehaviorFunctionsSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private def check(prop: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- reference definitions (brute force, small n) --------------------

  /** windowFunnel by exhaustive chain search: depth k reachable iff some
    * (e1 ≤ … ≤ ek) chain with steps 1..k fits in the window.
    */
  private def funnelBrute(win: Long, n: Int, evs: Seq[(Long, Int)]): Int = {
    val byStep = (1 to n).map(k => evs.filter(_._2 == k).map(_._1).sorted)
    def reach(k: Int): Boolean = {
      def go(level: Int, minTs: Long, start: Long): Boolean =
        if (level > k) true
        else byStep(level - 1).exists { ts =>
          ts >= minTs && (level == 1 || ts - start <= win) &&
            go(level + 1, ts, if (level == 1) ts else start)
        }
      go(1, Long.MinValue, 0L)
    }
    (n to 1 by -1).find(reach).getOrElse(0)
  }

  /** Greedy leftmost A…B chain count, straight from the definition. */
  private def seqCountBrute(evs: Seq[(Long, Int)]): Int = {
    var open = false; var n = 0
    evs.filter(e => e._2 == 1 || e._2 == 2).sorted.foreach { case (_, t) =>
      if (t == 1) open = true else if (open) { n += 1; open = false }
    }
    n
  }

  private def runAgg(agg: org.apache.spark.sql.expressions.Aggregator[
      (Long, Int), Seq[(Long, Int)], Int],
      evs: Seq[(Long, Int)], splitAt: Int): Int = {
    val (l, r) = evs.splitAt(splitAt)
    val b1 = l.foldLeft(agg.zero)(agg.reduce)
    val b2 = r.foldLeft(agg.zero)(agg.reduce)
    agg.finish(agg.merge(b2, b1)) // merged in REVERSE order on purpose
  }

  private val evGen: Gen[List[(Long, Int)]] = Gen.listOf(for {
    ts <- Gen.chooseNum(0L, 50L)
    step <- Gen.chooseNum(0, 4)
  } yield (ts, step))

  test("windowFunnel equals exhaustive chain search on random event sets") {
    check(Prop.forAll(evGen, Gen.chooseNum(0L, 30L)) { (evs, win) =>
      val agg = new BehaviorFunctions.WindowFunnel(win, 3)
      runAgg(agg, evs, evs.length / 2) == funnelBrute(win, 3, evs)
    })
  }

  test("windowFunnel hand cases: windows, ties, order") {
    def f(win: Long, evs: (Long, Int)*): Int =
      runAgg(new BehaviorFunctions.WindowFunnel(win, 3), evs, 1)
    assert(f(10, (0L, 1), (5L, 2), (9L, 3)) === 3)
    assert(f(10, (0L, 1), (5L, 2), (11L, 3)) === 2) // 3rd outside window
    // later restart rescues the chain: start at 6 keeps 14 in-window
    assert(f(10, (0L, 1), (6L, 1), (7L, 2), (14L, 3)) === 3)
    assert(f(10, (5L, 3), (6L, 2), (7L, 1)) === 1)  // wrong order
    assert(f(10, (5L, 1), (5L, 2), (5L, 3)) === 3)  // same-instant chain
    assert(f(10, (5L, 2), (6L, 3)) === 0)            // no step 1
    assert(f(0, (5L, 1), (5L, 2)) === 2)             // zero window, tie
    assert(f(0, (5L, 1), (6L, 2)) === 1)
  }

  test("sequenceCount equals the greedy definition on random event sets") {
    check(Prop.forAll(evGen) { evs =>
      runAgg(new BehaviorFunctions.SequenceCount12, evs, evs.length / 3) ==
        seqCountBrute(evs)
    })
  }

  test("sequenceCount hand cases: AABB=1, ABAB=2, BA=0, non-overlap") {
    def f(evs: (Long, Int)*): Int =
      runAgg(new BehaviorFunctions.SequenceCount12, evs, 1)
    assert(f((1L, 1), (2L, 1), (3L, 2), (4L, 2)) === 1)
    assert(f((1L, 1), (2L, 2), (3L, 1), (4L, 2)) === 2)
    assert(f((1L, 2), (2L, 1)) === 0)
    assert(f((1L, 2), (2L, 1), (3L, 2), (4L, 1)) === 1)
  }

  test("uniqUpTo: exact below cap, saturates at n+1, merge-insensitive") {
    val agg = new BehaviorFunctions.UniqUpTo(3)
    def run(xs: Seq[Long], split: Int): Int = {
      val (l, r) = xs.splitAt(split)
      agg.finish(agg.merge(
        r.foldLeft(agg.zero)(agg.reduce), l.foldLeft(agg.zero)(agg.reduce)))
    }
    assert(run(Seq(1L, 1L, 2L), 1) === 2)
    assert(run(Seq(1L, 2L, 3L), 2) === 3)
    assert(run(Seq(1L, 2L, 3L, 4L), 2) === 4)       // n+1 cap value
    assert(run((1L to 100L), 50) === 4)              // saturated
    check(Prop.forAll(Gen.listOf(Gen.chooseNum(0L, 20L)),
        Gen.chooseNum(0, 10)) { (xs, s) =>
      run(xs, math.min(s, xs.length)) ==
        math.min(xs.distinct.length, 4)
    })
  }

  test("SQL-registered aggregates agree with local scans over events rows") {
    BehaviorFunctions.register(spark)
    import spark.implicits._
    val rows = Seq(
      // user 1: full funnel inside 24h + one signup→purchase chain
      (1L, 1000L, "view"), (1L, 2000L, "click"), (1L, 3000L, "purchase"),
      (1L, 1500L, "signup"),
      // user 2: click and purchase both precede the view — depth stays 1
      (2L, 1000L, "click"), (2L, 2000L, "view"), (2L, 500L, "purchase"),
      // user 3: view only
      (3L, 42L, "view")
    ).toDF("user_id", "us", "event_type")
    rows.createOrReplaceTempView("bf_ev")
    val got = spark.sql(
      """SELECT user_id,
        |  window_funnel_24h_3(us, CASE event_type WHEN 'view' THEN 1
        |    WHEN 'click' THEN 2 WHEN 'purchase' THEN 3 ELSE 0 END) AS lvl,
        |  sequence_count_12(us, CASE event_type WHEN 'signup' THEN 1
        |    WHEN 'purchase' THEN 2 ELSE 0 END) AS chains,
        |  uniq_upto_10(us) AS u
        |FROM bf_ev GROUP BY user_id ORDER BY user_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(got === Array((1L, 3, 1, 4), (2L, 1, 0, 3), (3L, 1, 0, 1)))
  }
}
