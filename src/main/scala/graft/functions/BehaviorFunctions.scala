package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

/** ClickHouse behavioral-analytics aggregates — windowFunnel, sequenceCount
  * and uniqUpTo — implemented as typed [[Aggregator]]s so Catalyst runs them
  * with the same partial/final split as built-ins (map-side combine, one
  * shuffle on the grouping key).
  *
  * The reference's dialect family (ClickHouse) defines these as parametric
  * aggregate functions; its bundled DataFusion-6 fork implements none of
  * them (the fork's CH pack is scalar-only,
  * reference: crates/datafusion/src/physical_plan/clickhouse.rs), so this
  * pack is a superset of the reference surface in the reference's own
  * dialect. `retention` needs no custom code at all — it composes from
  * `bool_or` (BehaviorQueries b01), the Spark-first answer.
  *
  * Scale posture (100 TB): uniqUpTo's state is HARD-BOUNDED at n+1 ids per
  * group regardless of corpus size — that bound is the whole point of the
  * function vs count(DISTINCT). windowFunnel/sequenceCount state is the
  * per-group list of CONDITION-MATCHED events only (ClickHouse's own
  * AggregateFunctionWindowFunnel stores the same (timestamp, step) pairs);
  * non-matching events never enter the buffer, partials merge by
  * concatenation, and the sort+scan runs once per group at finalization —
  * linear in matched events, never quadratic.
  */
object BehaviorFunctions {

  private def pairSeqEnc: Encoder[Seq[(Long, Int)]] =
    ExpressionEncoder[Seq[(Long, Int)]]()

  /** `windowFunnel(window)(ts, step)`: maximum funnel depth reached by any
    * chain step1 → step2 → … whose steps are time-ordered and all fall
    * within `windowUs` microseconds of the chain's FIRST event.
    *
    * Input rows carry (epoch-µs timestamp, 1-based step index of the
    * condition the row satisfied); a row satisfying several conditions is
    * fed once per condition (the caller explodes — with disjoint
    * conditions, e.g. on event_type, each row maps to at most one step).
    *
    * Semantics match ClickHouse's default (non-strict) mode: events sort
    * by (ts, step) — at equal timestamps a lower step precedes a higher
    * one, so same-instant chains count — and a greedy scan keeps, per
    * depth, the latest-starting chain reaching it. Greedy-latest is
    * optimal: the stored level-1 start is monotonically nondecreasing
    * during the scan, and a later chain start can only make the window
    * constraint easier, so depth k is reached iff ANY valid chain of k
    * steps exists (this is what makes the relational join oracle in
    * BehaviorQueries.b03 exactly equivalent).
    */
  final class WindowFunnel(windowUs: Long, nSteps: Int)
      extends Aggregator[(Long, Int), Seq[(Long, Int)], Int] {
    require(nSteps >= 1 && windowUs >= 0)
    override def zero: Seq[(Long, Int)] = Vector.empty
    override def reduce(b: Seq[(Long, Int)], a: (Long, Int)): Seq[(Long, Int)] =
      if (a._2 >= 1 && a._2 <= nSteps) b :+ a else b
    override def merge(b1: Seq[(Long, Int)], b2: Seq[(Long, Int)]): Seq[(Long, Int)] =
      b1 ++ b2
    override def finish(r: Seq[(Long, Int)]): Int = {
      val sorted = r.sorted
      // chainStart(k) = start ts of the latest chain reaching depth k+1
      val chainStart = Array.fill[Long](nSteps)(Long.MinValue)
      val seen = Array.fill(nSteps)(false)
      sorted.foreach { case (ts, step) =>
        if (step == 1) { chainStart(0) = ts; seen(0) = true }
        else if (seen(step - 2) && ts - chainStart(step - 2) <= windowUs) {
          chainStart(step - 1) = chainStart(step - 2); seen(step - 1) = true
        }
      }
      seen.lastIndexOf(true) + 1
    }
    override def bufferEncoder: Encoder[Seq[(Long, Int)]] = pairSeqEnc
    override def outputEncoder: Encoder[Int] = Encoders.scalaInt
  }

  /** `sequenceCount('(?1).*(?2)')(ts, isA, isB)` as a (ts, tag) aggregate:
    * the number of non-overlapping A…B chains in the group's time-ordered
    * event sequence (tag 1 = A, tag 2 = B; `.*` skips arbitrary events, so
    * only tagged events enter the buffer). Greedy leftmost matching — an A
    * opens a chain if none is open, the next B closes it — which equals
    * counting A→B adjacencies in the A/B-filtered sequence (the LAG
    * formulation the DuckDB oracle uses, BehaviorQueries.b02).
    */
  final class SequenceCount12
      extends Aggregator[(Long, Int), Seq[(Long, Int)], Int] {
    override def zero: Seq[(Long, Int)] = Vector.empty
    override def reduce(b: Seq[(Long, Int)], a: (Long, Int)): Seq[(Long, Int)] =
      if (a._2 == 1 || a._2 == 2) b :+ a else b
    override def merge(b1: Seq[(Long, Int)], b2: Seq[(Long, Int)]): Seq[(Long, Int)] =
      b1 ++ b2
    override def finish(r: Seq[(Long, Int)]): Int = {
      var open = false
      var n = 0
      r.sorted.foreach { case (_, tag) =>
        if (tag == 1) open = true
        else if (open) { n += 1; open = false }
      }
      n
    }
    override def bufferEncoder: Encoder[Seq[(Long, Int)]] = pairSeqEnc
    override def outputEncoder: Encoder[Int] = Encoders.scalaInt
  }

  /** `uniqUpTo(n)(x)`: exact distinct count while it is ≤ n, else n+1.
    * State is a ≤ n+1-element id list — the capped state is the function's
    * contract and its 100 TB story: a hot group costs n+1 longs, not a
    * full distinct set. Linear membership scan is fine at the bound (CH
    * caps n at 100; specs enforce the same here).
    */
  final class UniqUpTo(n: Int) extends Aggregator[Long, Seq[Long], Int] {
    require(n >= 1 && n <= 100, "uniqUpTo supports 1 <= n <= 100 (as CH)")
    override def zero: Seq[Long] = Vector.empty
    override def reduce(b: Seq[Long], a: Long): Seq[Long] =
      if (b.length > n || b.contains(a)) b else b :+ a
    override def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] =
      b2.foldLeft(b1)((acc, x) =>
        if (acc.length > n || acc.contains(x)) acc else acc :+ x)
    override def finish(r: Seq[Long]): Int = math.min(r.length, n + 1)
    override def bufferEncoder: Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: Encoder[Int] = Encoders.scalaInt
  }

  /** Register the query-pack instances (the parametric CH forms fix their
    * parameters at registration, mirroring CH's `windowFunnel(24h)` curried
    * syntax; other windows/depths register their own names).
    */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("window_funnel_24h_3",
      functions.udaf(new WindowFunnel(86400000000L, 3),
        ExpressionEncoder[(Long, Int)]()))
    spark.udf.register("sequence_count_12",
      functions.udaf(new SequenceCount12,
        ExpressionEncoder[(Long, Int)]()))
    spark.udf.register("uniq_upto_10",
      functions.udaf(new UniqUpTo(10), Encoders.scalaLong))
  }
}
