package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable quantile states — `AggregateFunction(quantileTDigest, T)`
  * (VERDICT r17 task #5): a HARD-BOUNDED centroid digest in the t-digest
  * family (Dunning & Ertl 2019's merging-digest formulation with a
  * uniform scale function), chosen because Spark exposes no
  * partial-state surface for its own ApproximatePercentile and no KLL
  * sketch. The state is a SORTED array of (mean, weight) centroids,
  * never more than ~2·δ entries regardless of corpus size — the b05
  * SpaceSaving discipline: bounded state, map-side partials, mergeable
  * across partitions, at 100 TB the only shape a persisted quantile
  * column can take (an exact state is the whole value multiset).
  *
  * Determinism: compaction sorts by (mean, weight) first, so a pairwise
  * merge is COMMUTATIVE (AggStateSpec pins it); rank error is bounded by
  * the uniform cluster weight total/δ (δ=200 → 0.5% per compaction
  * level), comfortably inside the ±1%-rank oracle gate (the b09
  * discipline — sketches differ across engines, so each engine's answer
  * is gated against its own exact rank bounds).
  */
object TDigest {
  /** Compression: max centroids per compaction pass. */
  val Delta = 200
  /** Raw values buffered per group before an incremental compaction. */
  val PendingCap = 512

  type State = Seq[(Double, Double)]

  /** Deterministic merge-compaction: sort centroids by (mean, weight),
    * then greedily cluster so no cluster (other than a single centroid
    * already heavier) exceeds total/δ weight. ≤ 2δ output centroids.
    */
  def compact(cs: State, delta: Int = Delta): State = {
    val sorted = cs.filter(_._2 > 0).sortBy(identity)
    if (sorted.length <= delta) return sorted
    val total = sorted.iterator.map(_._2).sum
    val limit = total / delta
    val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    var curM = 0.0
    var curW = 0.0
    sorted.foreach { case (m, w) =>
      if (curW > 0 && curW + w > limit) {
        out += ((curM, curW)); curM = 0.0; curW = 0.0
      }
      // incremental weighted mean keeps full precision per cluster
      curM = if (curW + w == 0) 0.0 else (curM * curW + m * w) / (curW + w)
      curW += w
    }
    if (curW > 0) out += ((curM, curW))
    out.toSeq
  }

  /** Weighted quantile over a digest: the centroid-midpoint rule (each
    * centroid's mass sits at its mean; rank error ≤ half the heaviest
    * cluster). Empty digest → NaN.
    */
  def quantile(cs: State, p: Double): Double = {
    val sorted = cs.filter(_._2 > 0).sortBy(identity)
    if (sorted.isEmpty) return Double.NaN
    val total = sorted.iterator.map(_._2).sum
    val target = p * total
    var cum = 0.0
    sorted.foreach { case (m, w) =>
      cum += w
      if (cum >= target) return m
    }
    sorted.last._1
  }

  private def drain(b: (State, Seq[Double])): State =
    if (b._2.isEmpty) b._1
    else compact(b._1 ++ b._2.map(v => (v, 1.0)))

  /** `quantileTDigestState(x)` — build the bounded digest state. Buffer =
    * (compacted centroids, pending raw values); pending drains every
    * [[PendingCap]] values so per-row cost stays amortized.
    */
  final class StateAgg
      extends Aggregator[java.lang.Double, (State, Seq[Double]), State] {
    override def zero: (State, Seq[Double]) = (Nil, Nil)
    override def reduce(b: (State, Seq[Double]),
                        a: java.lang.Double): (State, Seq[Double]) =
      if (a == null) b // CH aggregates skip NULLs
      else {
        val pend = b._2 :+ a.doubleValue()
        if (pend.length >= PendingCap) (compact(b._1 ++
          pend.map(v => (v, 1.0))), Nil)
        else (b._1, pend)
      }
    override def merge(b1: (State, Seq[Double]),
                       b2: (State, Seq[Double])): (State, Seq[Double]) =
      (compact(drain(b1) ++ drain(b2)), Nil)
    override def finish(b: (State, Seq[Double])): State = drain(b)
    override def bufferEncoder: Encoder[(State, Seq[Double])] =
      ExpressionEncoder[(State, Seq[Double])]()
    override def outputEncoder: Encoder[State] =
      ExpressionEncoder[State]()
  }

  /** State → state re-merge (the AggregatingMergeTree FINAL / OPTIMIZE
    * path: rows of partial states fold back into one state).
    */
  final class StateMergeAgg extends Aggregator[State, State, State] {
    override def zero: State = Nil
    override def reduce(b: State, a: State): State =
      if (a == null) b else compact(b ++ a)
    override def merge(b1: State, b2: State): State = compact(b1 ++ b2)
    override def finish(b: State): State = compact(b)
    override def bufferEncoder: Encoder[State] = ExpressionEncoder[State]()
    override def outputEncoder: Encoder[State] = ExpressionEncoder[State]()
  }

  /** `quantileTDigestMerge(p)(state)` — fold stored states and read the
    * p-quantile out of the merged digest.
    */
  final class MergeQAgg(p: Double) extends Aggregator[State, State, Double] {
    require(p >= 0.0 && p <= 1.0, s"quantile level out of [0, 1]: $p")
    override def zero: State = Nil
    override def reduce(b: State, a: State): State =
      if (a == null) b else compact(b ++ a)
    override def merge(b1: State, b2: State): State = compact(b1 ++ b2)
    override def finish(b: State): Double = quantile(b, p)
    override def bufferEncoder: Encoder[State] = ExpressionEncoder[State]()
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** `quantilesTDigestMerge(p1, p2, …)(state)` — the plural form: one
    * state fold, every requested quantile out (CH's quantiles- family
    * contract: cheaper than N separate merges).
    */
  final class MergeQsAgg(ps: Seq[Double])
      extends Aggregator[State, State, Seq[Double]] {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"quantile levels out of [0, 1]: $ps")
    override def zero: State = Nil
    override def reduce(b: State, a: State): State =
      if (a == null) b else compact(b ++ a)
    override def merge(b1: State, b2: State): State = compact(b1 ++ b2)
    override def finish(b: State): Seq[Double] = ps.map(quantile(b, _))
    override def bufferEncoder: Encoder[State] = ExpressionEncoder[State]()
    override def outputEncoder: Encoder[Seq[Double]] =
      ExpressionEncoder[Seq[Double]]()
  }
}
