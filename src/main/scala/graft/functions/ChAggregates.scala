package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayDistinct, ArrayMax, ArrayMin, Cast, Coalesce, CreateArray, CreateNamedStruct, CreateStruct, Divide, Expression, Flatten, LambdaFunction, Literal, Multiply, Size, SortArray, UnresolvedNamedLambdaVariable}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  ApproximatePercentile, Average, BitAndAgg, BitOrAgg, BitXorAgg,
  CollectList, CollectSet, Count, CovPopulation, CovSample, First,
  HyperLogLogPlusPlus, Kurtosis, Last, Max, MaxBy, Min, MinBy, Percentile,
  Skewness, StddevPop, StddevSamp, Sum, VariancePop, VarianceSamp}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

/** ClickHouse parametric-aggregate pack #2 — topK, quantileExactInclusive /
  * medianExact, argMin/argMax, and the `-If` combinator family.
  *
  * The reference's dialect (ClickHouse) ships all of these as (parametric)
  * aggregate functions; its bundled DataFusion-6 fork implements none (the
  * fork's CH pack is scalar-only, reference:
  * crates/datafusion/src/physical_plan/clickhouse.rs), so like the
  * behavioral pack ([[BehaviorFunctions]]) this extends the reference
  * surface in the reference's own dialect — Spark-first:
  *
  *  - quantileExactInclusive / medianExact / argMin / argMax are thin
  *    builders over Catalyst's own `Percentile` / `MinBy` / `MaxBy`
  *    aggregates — no custom execution code at all.
  *  - the `-If` combinators (countIf, sumIf, avgIf, minIf, maxIf) register
  *    as Catalyst aggregates with a FILTER clause attached
  *    (`toAggregateExpression(filter = Some(cond))`), which keeps them
  *    inside whole-stage-codegen'd HashAggregate — the combinator costs a
  *    per-row predicate, not a UDF boundary. This is exactly CH's
  *    semantics: only rows where the condition holds enter the aggregate.
  *  - topK is a real SpaceSaving summary (Metwally et al. 2005 — the same
  *    family CH's own `topK` uses) as a typed [[Aggregator]]: bounded
  *    state, map-side partials, mergeable across partitions.
  */
object ChAggregates {

  /** `topK(k)` via SpaceSaving with `capacity` counters (CH sizes its
    * reserved space the same way: load-factor × k). State is HARD-BOUNDED
    * at `capacity` (value, count, error) triples per group no matter the
    * corpus size — the 100 TB story vs an exact count(*)/ORDER BY top-k,
    * which shuffles every distinct value.
    *
    * Guarantees (spec-verified): any value with true frequency >
    * N/capacity is present in the summary; reported counts overestimate
    * the true count by at most the recorded `error`. When every partial
    * summary stays below capacity (distinct values ≤ capacity), the
    * summary is EXACT and merge-order-insensitive — the regime the oracle
    * entry runs in (event_type's domain ≪ capacity), mirroring how b0x
    * correctness entries pin exact regimes while specs probe the
    * approximate ones.
    *
    * Eviction and output ordering are deterministic: the evicted minimum
    * and the final top-k both order by (count, value) so engines and
    * partition layouts cannot produce tie-dependent output in the exact
    * regime.
    */
  final class TopK(k: Int, capacity: Int)
      extends Aggregator[String, Map[String, (Long, Long)], Seq[(String, Long)]] {
    require(k >= 1 && capacity >= k, "topK needs capacity >= k >= 1")

    override def zero: Map[String, (Long, Long)] = Map.empty

    override def reduce(b: Map[String, (Long, Long)],
                        a: String): Map[String, (Long, Long)] =
      b.get(a) match {
        case Some((c, e)) => b.updated(a, (c + 1, e))
        case None if b.size < capacity => b.updated(a, (1L, 0L))
        case None =>
          // SpaceSaving: replace the deterministic minimum counter; the
          // newcomer inherits its count as an upper bound and records it
          // as error.
          val (victim, (minC, _)) = b.minBy { case (v, (c, _)) => (c, v) }
          (b - victim).updated(a, (minC + 1, minC))
      }

    override def merge(b1: Map[String, (Long, Long)],
                       b2: Map[String, (Long, Long)]): Map[String, (Long, Long)] = {
      // Parallel SpaceSaving merge (Agarwal et al. 2013): a key absent
      // from a FULL summary may have been evicted with count up to that
      // summary's minimum counter — charge it that minimum as both count
      // and error. Absent from a non-full summary means truly unseen (0).
      def floor(m: Map[String, (Long, Long)]): Long =
        if (m.size >= capacity) m.values.iterator.map(_._1).min else 0L
      val f1 = floor(b1)
      val f2 = floor(b2)
      val merged = (b1.keySet ++ b2.keySet).iterator.map { v =>
        val (c1, e1) = b1.getOrElse(v, (f1, f1))
        val (c2, e2) = b2.getOrElse(v, (f2, f2))
        v -> (c1 + c2, e1 + e2)
      }.toMap
      if (merged.size <= capacity) merged
      else merged.toSeq
        .sortBy { case (v, (c, _)) => (-c, v) }
        .take(capacity).toMap
    }

    override def finish(r: Map[String, (Long, Long)]): Seq[(String, Long)] =
      r.toSeq.sortBy { case (v, (c, _)) => (-c, v) }
        .take(k).map { case (v, (c, _)) => (v, c) }

    override def bufferEncoder: Encoder[Map[String, (Long, Long)]] =
      ExpressionEncoder[Map[String, (Long, Long)]]()
    override def outputEncoder: Encoder[Seq[(String, Long)]] =
      ExpressionEncoder[Seq[(String, Long)]]()
  }

  /** CH `topKWeighted(k)(x, w)`: SpaceSaving with weighted increments —
    * a present key adds its weight, a newcomer inherits the evicted
    * minimum as count floor + error, exactly [[TopK]] with w replacing 1
    * (Metwally et al. 2005 §3.1 generalizes verbatim). Merge and output
    * delegate to [[TopK]], so the bounded-state / floor-rule / exact-
    * regime guarantees carry over unchanged.
    */
  final class TopKWeighted(k: Int, capacity: Int)
      extends Aggregator[(String, Long), Map[String, (Long, Long)],
        Seq[(String, Long)]] {
    private val base = new TopK(k, capacity)

    override def zero: Map[String, (Long, Long)] = Map.empty

    override def reduce(b: Map[String, (Long, Long)],
                        aw: (String, Long)): Map[String, (Long, Long)] = {
      val (a, w) = aw
      b.get(a) match {
        case Some((c, e)) => b.updated(a, (c + w, e))
        case None if b.size < capacity => b.updated(a, (w, 0L))
        case None =>
          val (victim, (minC, _)) = b.minBy { case (v, (c, _)) => (c, v) }
          (b - victim).updated(a, (minC + w, minC))
      }
    }

    override def merge(b1: Map[String, (Long, Long)],
                       b2: Map[String, (Long, Long)]): Map[String, (Long, Long)] =
      base.merge(b1, b2)
    override def finish(r: Map[String, (Long, Long)]): Seq[(String, Long)] =
      base.finish(r)
    override def bufferEncoder: Encoder[Map[String, (Long, Long)]] =
      base.bufferEncoder
    override def outputEncoder: Encoder[Seq[(String, Long)]] =
      base.outputEncoder
  }

  /** The FULL SpaceSaving summary as a mergeable STATE, deterministically
    * ordered by (count desc, value) — what an
    * `AggregateFunction(topK(k), T)` column stores (d32). k bounds only
    * the READ; the state keeps all `capacity` counters so re-merges stay
    * within the Parallel SpaceSaving error contract (truncating to k
    * between merges would discard the floor information the merge rule
    * needs). In the exact regime (distinct ≤ capacity) state → state →
    * read equals the direct aggregate exactly.
    */
  final class TopKStateAgg(capacity: Int)
      extends Aggregator[String, Map[String, (Long, Long)],
        Seq[(String, Long, Long)]] {
    private val base = new TopK(1, capacity)
    override def zero: Map[String, (Long, Long)] = Map.empty
    override def reduce(b: Map[String, (Long, Long)],
                        a: String): Map[String, (Long, Long)] =
      if (a == null) b else base.reduce(b, a) // CH aggregates skip NULLs
    override def merge(b1: Map[String, (Long, Long)],
                       b2: Map[String, (Long, Long)]): Map[String, (Long, Long)] =
      base.merge(b1, b2)
    override def finish(r: Map[String, (Long, Long)]): Seq[(String, Long, Long)] =
      r.toSeq.sortBy { case (v, (c, _)) => (-c, v) }
        .map { case (v, (c, e)) => (v, c, e) }
    override def bufferEncoder: Encoder[Map[String, (Long, Long)]] =
      ExpressionEncoder[Map[String, (Long, Long)]]()
    override def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
      ExpressionEncoder[Seq[(String, Long, Long)]]()
  }

  /** Folds stored [[TopKStateAgg]] summaries back together (the Parallel
    * SpaceSaving merge) and reads the top-k VALUES out — CH's
    * `topKMerge(k)(state)`.
    */
  final class TopKMergeAgg(k: Int, capacity: Int)
      extends Aggregator[Seq[(String, Long, Long)],
        Map[String, (Long, Long)], Seq[String]] {
    private val base = new TopK(k, capacity)
    override def zero: Map[String, (Long, Long)] = Map.empty
    override def reduce(b: Map[String, (Long, Long)],
                        st: Seq[(String, Long, Long)]): Map[String, (Long, Long)] =
      if (st == null) b
      else base.merge(b, st.map { case (v, c, e) => v -> (c, e) }.toMap)
    override def merge(b1: Map[String, (Long, Long)],
                       b2: Map[String, (Long, Long)]): Map[String, (Long, Long)] =
      base.merge(b1, b2)
    override def finish(r: Map[String, (Long, Long)]): Seq[String] =
      r.toSeq.sortBy { case (v, (c, _)) => (-c, v) }.take(k).map(_._1)
    override def bufferEncoder: Encoder[Map[String, (Long, Long)]] =
      ExpressionEncoder[Map[String, (Long, Long)]]()
    override def outputEncoder: Encoder[Seq[String]] =
      ExpressionEncoder[Seq[String]]()
  }

  /** State → state re-merge for `AggregateFunction(topK(k), T)` columns —
    * the AggregatingMergeTree FINAL / OPTIMIZE merge step (the FINAL row
    * still holds a full summary, read later with `topKMerge`).
    */
  final class TopKStateMergeAgg(capacity: Int)
      extends Aggregator[Seq[(String, Long, Long)],
        Map[String, (Long, Long)], Seq[(String, Long, Long)]] {
    private val base = new TopK(1, capacity)
    override def zero: Map[String, (Long, Long)] = Map.empty
    override def reduce(b: Map[String, (Long, Long)],
                        st: Seq[(String, Long, Long)]): Map[String, (Long, Long)] =
      if (st == null) b
      else base.merge(b, st.map { case (v, c, e) => v -> (c, e) }.toMap)
    override def merge(b1: Map[String, (Long, Long)],
                       b2: Map[String, (Long, Long)]): Map[String, (Long, Long)] =
      base.merge(b1, b2)
    override def finish(r: Map[String, (Long, Long)]): Seq[(String, Long, Long)] =
      r.toSeq.sortBy { case (v, (c, _)) => (-c, v) }
        .map { case (v, (c, e)) => (v, c, e) }
    override def bufferEncoder: Encoder[Map[String, (Long, Long)]] =
      ExpressionEncoder[Map[String, (Long, Long)]]()
    override def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
      ExpressionEncoder[Seq[(String, Long, Long)]]()
  }

  /** CH sizes a topK summary's reserved counters as load-factor × k; the
    * ONE capacity formula every topK state/merge site shares — mixing
    * capacities across State/Merge/FINAL would silently change the merge
    * floors.
    */
  def topKCapacity(k: Int): Int = math.max(16, k * 5 + 1)

  private type Builder = Seq[Expression] => Expression

  private def one(name: String)(f: Expression => Expression): Builder = {
    case Seq(e) => f(e)
    case exprs => throw new IllegalArgumentException(
      s"$name expects 1 argument, got ${exprs.length}")
  }

  private def two(name: String)(f: (Expression, Expression) => Expression): Builder = {
    case Seq(a, b) => f(a, b)
    case exprs => throw new IllegalArgumentException(
      s"$name expects 2 arguments, got ${exprs.length}")
  }

  /** Per-row element sum of a numeric array as a Float64 — the
    * higher-order `aggregate(arr, 0.0, (acc, x) -> acc + x)` the parser
    * would build for the same SQL, codegen'd by Catalyst.
    */
  private def elemSum(arr: Expression): Expression = {
    val acc = UnresolvedNamedLambdaVariable(Seq("__gacc"))
    val el = UnresolvedNamedLambdaVariable(Seq("__gel"))
    org.apache.spark.sql.catalyst.analysis.UnresolvedFunction(
      Seq("aggregate"),
      Seq(arr, Literal(0.0d),
        LambdaFunction(Add(acc, el), Seq(acc, el))),
      isDistinct = false)
  }

  /** The k of a parametric aggregate — must be a positive integer
    * literal (CH's parametric position; the parser rewrite moves
    * `topKState(3)(x)` to `(x, 3)`).
    */
  private def litInt(e: Expression, name: String): Int = e match {
    case Literal(v, _) if v != null && v.toString.forall(_.isDigit) &&
        v.toString.nonEmpty => v.toString.toInt
    case other => throw new IllegalArgumentException(
      s"$name: k must be a positive integer literal, got $other")
  }

  /** name → builder over Catalyst's own aggregate expressions. All of
    * these stay declarative (hash-aggregate + whole-stage codegen for the
    * If-family; ObjectHashAggregate for Percentile) with Catalyst's normal
    * partial/final split.
    */
  val functions: Seq[(String, Builder)] = Seq(
    // CH quantileExactInclusive == Excel PERCENTILE.INC == Catalyst
    // Percentile (continuous interpolation at rank p*(n-1)).
    "quantileExactInclusive" -> two("quantileExactInclusive")(
      (x, p) => new Percentile(x, p).toAggregateExpression()),
    "medianExact" -> one("medianExact")(
      x => new Percentile(x, Literal(0.5d)).toAggregateExpression()),
    // CH's plural form: quantilesExactInclusive(x, p1, p2, …) → array —
    // ONE sort/aggregation state shared by all requested levels.
    "quantilesExactInclusive" -> { exprs =>
      require(exprs.length >= 2,
        "quantilesExactInclusive expects (col, p1[, p2, …])")
      new Percentile(exprs.head, CreateArray(exprs.tail))
        .toAggregateExpression()
    },
    // CH's approximate quantile family (quantileTDigest / the default
    // approximate quantile) → Catalyst ApproximatePercentile (GK sketch,
    // rank error ≤ n/accuracy at the default 10000). The sketches differ
    // across engines, so oracle entries compare each engine's approx
    // against its own exact rank bounds (the f05 discipline).
    "quantileTDigest" -> two("quantileTDigest")((x, p) =>
      new ApproximatePercentile(x, p).toAggregateExpression()),
    "quantile" -> two("quantile")((x, p) =>
      new ApproximatePercentile(x, p).toAggregateExpression()),
    "quantilesTDigest" -> { exprs =>
      require(exprs.length >= 2, "quantilesTDigest expects (col, p1[, p2, …])")
      new ApproximatePercentile(exprs.head, CreateArray(exprs.tail))
        .toAggregateExpression()
    },
    // CH argMax(arg, val) — with a tuple val for deterministic tie-break,
    // exactly as CH recommends argMax(arg, tuple(v, arg)).
    "argMax" -> two("argMax")((arg, ord) => MaxBy(arg, ord).toAggregateExpression()),
    "argMin" -> two("argMin")((arg, ord) => MinBy(arg, ord).toAggregateExpression()),
    // CH array/pick aggregates: groupArray == collect_list (arbitrary
    // order — wrap in sort_array for deterministic output, as CH users
    // wrap in arraySort), groupUniqArray == collect_set, any/anyLast ==
    // first/last encountered non-null (CH aggregates skip NULLs).
    "groupArray" -> one("groupArray")(e => CollectList(e).toAggregateExpression()),
    "groupUniqArray" -> one("groupUniqArray")(e => CollectSet(e).toAggregateExpression()),
    "any" -> one("any")(e => First(e, ignoreNulls = true).toAggregateExpression()),
    "anyLast" -> one("anyLast")(e => Last(e, ignoreNulls = true).toAggregateExpression()),
    // CH statistical moments / bit aggregates / uniq family — thin names
    // over Catalyst's own aggregates. skewPop == Spark's skewness
    // (population m3/m2^1.5); kurtPop is NON-excess in CH, so it is
    // Spark's (excess) kurtosis + 3. uniq is CH's approximate distinct →
    // HyperLogLog++; uniqExact → count(DISTINCT).
    "varPop" -> one("varPop")(x => VariancePop(x).toAggregateExpression()),
    "varSamp" -> one("varSamp")(x => VarianceSamp(x).toAggregateExpression()),
    "stddevPop" -> one("stddevPop")(x => StddevPop(x).toAggregateExpression()),
    "stddevSamp" -> one("stddevSamp")(x => StddevSamp(x).toAggregateExpression()),
    "covarPop" -> two("covarPop")((l, r) =>
      CovPopulation(l, r).toAggregateExpression()),
    "covarSamp" -> two("covarSamp")((l, r) =>
      CovSample(l, r).toAggregateExpression()),
    "skewPop" -> one("skewPop")(x => Skewness(x).toAggregateExpression()),
    "kurtPop" -> one("kurtPop")(x =>
      org.apache.spark.sql.catalyst.expressions.Add(
        Kurtosis(x).toAggregateExpression(), Literal(3.0d))),
    "groupBitAnd" -> one("groupBitAnd")(x => BitAndAgg(x).toAggregateExpression()),
    "groupBitOr" -> one("groupBitOr")(x => BitOrAgg(x).toAggregateExpression()),
    "groupBitXor" -> one("groupBitXor")(x => BitXorAgg(x).toAggregateExpression()),
    "uniq" -> one("uniq")(x =>
      HyperLogLogPlusPlus(x).toAggregateExpression()),
    // CH's other approximate-distinct spellings ride the same HLL++
    // estimator (CH differentiates sketch families; the error contract
    // callers rely on — small relative error, bounded memory — holds)
    "uniqCombined" -> one("uniqCombined")(x =>
      HyperLogLogPlusPlus(x).toAggregateExpression()),
    "uniqHLL12" -> one("uniqHLL12")(x =>
      HyperLogLogPlusPlus(x).toAggregateExpression()),
    "uniqExact" -> one("uniqExact")(x =>
      Count(x).toAggregateExpression(isDistinct = true)),
    // avgWeighted(x, w) = Σxw / Σw (Float64, CH's contract) — two plain
    // Sum aggregates under one expression, still a single aggregation
    // pass; sumCount(x) = (Σx, count) as a tuple.
    "avgWeighted" -> two("avgWeighted")((x, w) =>
      Divide(
        Cast(Sum(Multiply(Cast(x, DoubleType), Cast(w, DoubleType)))
          .toAggregateExpression(), DoubleType),
        Cast(Sum(Cast(w, DoubleType)).toAggregateExpression(), DoubleType))),
    "sumCount" -> one("sumCount")(x =>
      CreateStruct(Seq(Sum(x).toAggregateExpression(),
        Count(x).toAggregateExpression()))),
    // -State / -Merge combinators for AggregateFunction(f, T) columns
    // (the CH AggregatingMergeTree + MV pattern): fState(x) produces the
    // state value a column of type AggregateFunction(f, T) stores
    // (sum/min/max: the running value; count: the running count; avg:
    // struct(s, c); uniqExact: the sorted distinct-value array), fMerge
    // re-aggregates stored states to the final value. All are plain
    // Catalyst aggregates — the state representations are chosen so the
    // merge is itself one hash aggregate (map-side partials intact); the
    // one ObjectHashAggregate is uniqExact's set union, which is the
    // exact-distinct cost no engine escapes.
    "sumState" -> one("sumState")(x => Sum(x).toAggregateExpression()),
    "minState" -> one("minState")(x => Min(x).toAggregateExpression()),
    "maxState" -> one("maxState")(x => Max(x).toAggregateExpression()),
    "countState" -> { exprs =>
      if (exprs.isEmpty) Count(Literal(1)).toAggregateExpression()
      else Count(exprs.head).toAggregateExpression()
    },
    // avg's partial sum keeps the input's own sum type (a decimal input
    // stays an exact decimal), so merged averages cannot drift with row
    // or partition order; the division to Float64 happens once, in avgMerge
    "avgState" -> one("avgState")(x => CreateNamedStruct(Seq(
      Literal("s"), Sum(x).toAggregateExpression(),
      Literal("c"), Count(x).toAggregateExpression()))),
    // 100 TB NOTE: uniqExactState's state is the UNBOUNDED sorted
    // distinct-value array — CH parity (its uniqExactState is unbounded
    // too), and exactness has no smaller representation. Past ~10^6
    // distinct values per group the state row itself becomes the
    // bottleneck: switch to uniqState (bounded HLL sketch, ~2^12 bytes
    // regardless of cardinality) unless the use genuinely needs exact
    // counts — the l22-style crossover rule.
    "uniqExactState" -> one("uniqExactState")(x =>
      SortArray(CollectSet(x).toAggregateExpression(), Literal(true))),
    // uniqState: the APPROXIMATE mergeable-distinct state — a Datasketches
    // HLL sketch (BINARY, bounded at ~2^lgK bytes regardless of corpus
    // size; the 100 TB alternative to uniqExact's unbounded sets). The
    // sketch build is deterministic, so uniqMerge over partials equals
    // the direct sketch over the raw rows EXACTLY (AggStateSpec pins it).
    "uniqState" -> one("uniqState")(x =>
      new org.apache.spark.sql.catalyst.expressions.aggregate.HllSketchAgg(
        x, Literal(12), 0, 0).toAggregateExpression()),
    "sumMerge" -> one("sumMerge")(x => Sum(x).toAggregateExpression()),
    "minMerge" -> one("minMerge")(x => Min(x).toAggregateExpression()),
    "maxMerge" -> one("maxMerge")(x => Max(x).toAggregateExpression()),
    "countMerge" -> one("countMerge")(x => Coalesce(Seq(
      Sum(x).toAggregateExpression(), Literal(0L)))),
    "avgMerge" -> one("avgMerge")(x => Divide(
      Cast(Sum(UnresolvedExtractValue(x, Literal("s")))
        .toAggregateExpression(), DoubleType),
      Cast(Sum(UnresolvedExtractValue(x, Literal("c")))
        .toAggregateExpression(), DoubleType))),
    "uniqExactMerge" -> one("uniqExactMerge")(x => Cast(
      Size(ArrayDistinct(Flatten(CollectList(x).toAggregateExpression()))),
      LongType)),
    "uniqMerge" -> one("uniqMerge")(x =>
      new org.apache.spark.sql.catalyst.expressions.HllSketchEstimate(
        new org.apache.spark.sql.catalyst.expressions.aggregate.HllUnionAgg(x)
          .toAggregateExpression())),
    // quantileTDigestState / quantileTDigestMerge(p): the bounded
    // mergeable quantile state ([[TDigest]]) — typed Aggregators bridged
    // into the Catalyst tree via their ScalaAggregator expression. p must
    // be a literal (CH's parametric position; the parser rewrite moves
    // `quantileTDigestMerge(0.5)(q)` to `(q, 0.5)`).
    "quantileTDigestState" -> one("quantileTDigestState") { x =>
      org.apache.spark.sql.GraftSqlBridge.typedAggExpression(
        new TDigest.StateAgg, Encoders.DOUBLE,
        Seq(Cast(x, DoubleType)))
    },
    "quantileTDigestMerge" -> two("quantileTDigestMerge") { (state, pe) =>
      val p = pe match {
        case Literal(v, _) if v != null => v.toString.toDouble
        case other => throw new IllegalArgumentException(
          s"quantileTDigestMerge: quantile level must be a literal, got $other")
      }
      org.apache.spark.sql.GraftSqlBridge.typedAggExpression(
        new TDigest.MergeQAgg(p), ExpressionEncoder[TDigest.State](),
        Seq(state))
    },
    // plural: `quantilesTDigestMerge(p1, p2, ...)(state)` — the parser
    // rewrite delivers (state, array(p1, p2, ...)); one state fold,
    // every quantile out
    "quantilesTDigestMerge" -> two("quantilesTDigestMerge") { (state, pe) =>
      val ps = pe match {
        case CreateArray(children, _) if children.nonEmpty &&
            children.forall(_.isInstanceOf[Literal]) =>
          children.map(_.asInstanceOf[Literal].value.toString.toDouble)
        case other => throw new IllegalArgumentException(
          "quantilesTDigestMerge: quantile levels must be literals, got " +
            other)
      }
      org.apache.spark.sql.GraftSqlBridge.typedAggExpression(
        new TDigest.MergeQsAgg(ps), ExpressionEncoder[TDigest.State](),
        Seq(state))
    },
    // argMax/argMin states (d32): struct(o, a) with the ORDERING value
    // first — plain lexicographic Max/Min over the struct IS both the
    // state aggregate and every later merge (one codegen'd HashAggregate;
    // ties break on the arg deterministically, within CH's contract).
    "argMaxState" -> two("argMaxState")((arg, ord) =>
      Max(CreateNamedStruct(Seq(
        Literal("o"), ord, Literal("a"), arg))).toAggregateExpression()),
    "argMinState" -> two("argMinState")((arg, ord) =>
      Min(CreateNamedStruct(Seq(
        Literal("o"), ord, Literal("a"), arg))).toAggregateExpression()),
    "argMaxMerge" -> one("argMaxMerge")(x =>
      UnresolvedExtractValue(Max(x).toAggregateExpression(), Literal("a"))),
    "argMinMerge" -> one("argMinMerge")(x =>
      UnresolvedExtractValue(Min(x).toAggregateExpression(), Literal("a"))),
    // avgWeighted state: both running sums exact in their own sum types;
    // the division to Float64 happens ONCE, in avgWeightedMerge, so the
    // merged weighted average is row- and partition-order independent
    "avgWeightedState" -> two("avgWeightedState")((x, w) =>
      CreateNamedStruct(Seq(
        Literal("s"), Sum(Multiply(x, w)).toAggregateExpression(),
        Literal("w"), Sum(w).toAggregateExpression()))),
    "avgWeightedMerge" -> one("avgWeightedMerge")(x => Divide(
      Cast(Sum(UnresolvedExtractValue(x, Literal("s")))
        .toAggregateExpression(), DoubleType),
      Cast(Sum(UnresolvedExtractValue(x, Literal("w")))
        .toAggregateExpression(), DoubleType))),
    // -If-composed states: the filtered sum/count IS the state (same
    // representation as sum/count), so the merge is the unfiltered fold
    "sumIfState" -> two("sumIfState")((x, cond) =>
      Sum(x).toAggregateExpression(isDistinct = false, filter = Some(cond))),
    "sumIfMerge" -> one("sumIfMerge")(x => Sum(x).toAggregateExpression()),
    "countIfState" -> one("countIfState")(cond =>
      Count(Literal(1)).toAggregateExpression(isDistinct = false,
        filter = Some(cond))),
    "countIfMerge" -> one("countIfMerge")(x => Coalesce(Seq(
      Sum(x).toAggregateExpression(), Literal(0L)))),
    // topK states (d32): `topKState(k)(x)` / `topKMerge(k)(state)` — the
    // parser's parametric rewrite delivers (x, k). One shared capacity
    // formula across State/Merge/FINAL keeps the SpaceSaving floors
    // consistent (see [[topKCapacity]]).
    "topKState" -> two("topKState") { (x, ke) =>
      val k = litInt(ke, "topKState")
      org.apache.spark.sql.GraftSqlBridge.typedAggExpression(
        new TopKStateAgg(topKCapacity(k)), Encoders.STRING,
        Seq(Cast(x, StringType)))
    },
    "topKMerge" -> two("topKMerge") { (state, ke) =>
      val k = litInt(ke, "topKMerge")
      org.apache.spark.sql.GraftSqlBridge.typedAggExpression(
        new TopKMergeAgg(k, topKCapacity(k)),
        ExpressionEncoder[Seq[(String, Long, Long)]](), Seq(state))
    },
    // state -> state re-merge (AggregatingMergeTree FINAL / OPTIMIZE)
    "topKStateMerge" -> two("topKStateMerge") { (state, ke) =>
      val k = litInt(ke, "topKStateMerge")
      org.apache.spark.sql.GraftSqlBridge.typedAggExpression(
        new TopKStateMergeAgg(topKCapacity(k)),
        ExpressionEncoder[Seq[(String, Long, Long)]](), Seq(state))
    },
    // -Array combinators (f22): the aggregate applied to the ELEMENTS of
    // an array column across all rows — CH's sumArray/minArray/… . Each
    // stays one hash aggregate: the per-row element fold is a codegen'd
    // higher-order expression (aggregate/array_min/array_max/size), the
    // cross-row fold the matching Catalyst aggregate. sumArray/avgArray
    // accumulate Float64 (CH keeps integer sums integral — pinned
    // divergence, same family as avgWeighted's Float64 contract).
    "sumArray" -> one("sumArray")(x =>
      Sum(elemSum(x)).toAggregateExpression()),
    "minArray" -> one("minArray")(x =>
      Min(ArrayMin(x)).toAggregateExpression()),
    "maxArray" -> one("maxArray")(x =>
      Max(ArrayMax(x)).toAggregateExpression()),
    "avgArray" -> one("avgArray")(x => Divide(
      Cast(Sum(elemSum(x)).toAggregateExpression(), DoubleType),
      Cast(Sum(Size(x)).toAggregateExpression(), DoubleType))),
    "countArray" -> one("countArray")(x => Coalesce(Seq(
      Cast(Sum(Size(x)).toAggregateExpression(), LongType), Literal(0L)))),
    // uniqArray: exact distinct over all elements (the uniqExactMerge
    // set-union shape; unbounded state is the exact-distinct cost)
    "uniqArray" -> one("uniqArray")(x => Cast(
      Size(ArrayDistinct(Flatten(CollectList(x).toAggregateExpression()))),
      LongType)),
    // -Distinct combinators: the aggregate over the distinct value set
    "sumDistinct" -> one("sumDistinct")(x =>
      Sum(x).toAggregateExpression(isDistinct = true)),
    "avgDistinct" -> one("avgDistinct")(x =>
      Average(x).toAggregateExpression(isDistinct = true)),
    "countDistinct" -> one("countDistinct")(x =>
      Count(x).toAggregateExpression(isDistinct = true)),
    // -OrNull combinators: NULL on the empty set instead of the default.
    // Spark's aggregates already return NULL over zero rows (CH's sum
    // returns 0, count 0), so most -OrNull forms ARE the plain Spark
    // aggregate; count needs the explicit 0 -> NULL.
    "sumOrNull" -> one("sumOrNull")(x => Sum(x).toAggregateExpression()),
    "avgOrNull" -> one("avgOrNull")(x => Average(x).toAggregateExpression()),
    "minOrNull" -> one("minOrNull")(x => Min(x).toAggregateExpression()),
    "maxOrNull" -> one("maxOrNull")(x => Max(x).toAggregateExpression()),
    "anyOrNull" -> one("anyOrNull")(x =>
      First(x, ignoreNulls = true).toAggregateExpression()),
    "countOrNull" -> { exprs =>
      val c =
        if (exprs.isEmpty) Count(Literal(1)).toAggregateExpression()
        else Count(exprs.head).toAggregateExpression()
      org.apache.spark.sql.catalyst.analysis.UnresolvedFunction(
        Seq("nullif"), Seq(c, Literal(0L)), isDistinct = false)
    },
    // -If combinators: the aggregate with a Catalyst FILTER clause.
    "countIf" -> one("countIf")(cond =>
      Count(Literal(1)).toAggregateExpression(isDistinct = false, filter = Some(cond))),
    "sumIf" -> two("sumIf")((x, cond) =>
      Sum(x).toAggregateExpression(isDistinct = false, filter = Some(cond))),
    "avgIf" -> two("avgIf")((x, cond) =>
      Average(x).toAggregateExpression(isDistinct = false, filter = Some(cond))),
    "minIf" -> two("minIf")((x, cond) =>
      Min(x).toAggregateExpression(isDistinct = false, filter = Some(cond))),
    "maxIf" -> two("maxIf")((x, cond) =>
      Max(x).toAggregateExpression(isDistinct = false, filter = Some(cond)))
  )

  /** Register the builder pack plus the query-pack topK instance (k=3,
    * capacity 16 — CH's own default load factor region; other (k, cap)
    * pairs register their own names, mirroring CH's parametric syntax).
    */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
    spark.udf.register("top_k_3",
      org.apache.spark.sql.functions.udaf(new TopK(3, 16), Encoders.STRING))
    spark.udf.register("top_k_weighted_3",
      org.apache.spark.sql.functions.udaf(new TopKWeighted(3, 16),
        ExpressionEncoder[(String, Long)]()))
    // state -> state re-merge for AggregateFunction(quantileTDigest, T)
    // columns (the AggregatingMergeTree FINAL / OPTIMIZE merge SQL)
    spark.udf.register("tdigest_state_merge_agg",
      org.apache.spark.sql.functions.udaf(new TDigest.StateMergeAgg,
        ExpressionEncoder[TDigest.State]()))
  }
}
