package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL surface over Spark's own runtime-filter bloom machinery
  * (`BloomFilterAggregate` / `BloomFilterMightContain`, the codegen'd
  * expressions behind `spark.sql.optimizer.runtime.bloomFilter.*`) — the
  * scale path for membership prefilters when the member set is too large
  * to broadcast raw but its bloom fits in a few MB.
  *
  *  - `bloom_build(xxhash64(x) [, est_items, num_bits])`: aggregate; the
  *    partial per-partition blooms OR-merge, so the build is one normal
  *    aggregation, no driver loop. Defaults: 1M items / 16M bits (2 MB
  *    blob; 16 bits/item at the optimal hash count is ~0.05% per-probe
  *    fpp at capacity — 8 bits/item would be ~2.1%, which an any-gram
  *    gate amplifies ruinously, see below; both defaults sit within
  *    Spark's runtime-filter caps, so the same sizing discipline
  *    applies).
  *
  * Sizing rule for ANY-match gates (l22, the streaming gate): a document
  * is dropped if ANY of its G grams false-positives, so the per-DOC
  * false-drop rate is ~1-(1-fpp)^G ≈ G·fpp. A 100-gram doc against a
  * 2.1% bloom is ~88% false-drop; against 0.05% it is ~4.5%. When the
  * gate has no exact-confirm join to recover clean docs (streaming),
  * size num_bits to corpus-gram count × typical doc-gram count, not to
  * the corpus alone.
  *  - `bloom_probe(bloom, xxhash64(x))`: membership test; the bloom side
  *    must be a constant or a scalar subquery (the expression's own
  *    rule), which is exactly the declarative shape — build once in a
  *    subquery, probe map-side everywhere with no join.
  *
  * The reference has no bloom surface; this exists for the
  * decontamination/dedup pipelines (l22), where probes prefilter the
  * corpus before a small exact-confirm join removes false positives.
  */
object BloomFunctions {
  /** Column form of `bloom_probe` for DataFrame/streaming pipelines,
    * where a serialized bloom rides as a binary literal (`lit(blob)`) —
    * streaming plans cannot host the scalar subquery the SQL form uses.
    * Resolved through the session registry (so `register` must have run),
    * which is the public bridge from Column-land to a catalyst builder.
    */
  def bloomProbe(bloom: org.apache.spark.sql.Column,
                 hash: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("bloom_probe", bloom, hash)

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_build",
      { case Seq(h) =>
          new BloomFilterAggregate(h, Literal(1000000L), Literal(16777216L))
        case Seq(h, n, b) => new BloomFilterAggregate(h, n, b)
        case e => throw new IllegalArgumentException(
          s"bloom_build expects 1 or 3 arguments, got ${e.length}") },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_probe",
      { case Seq(bloom, h) => BloomFilterMightContain(bloom, h)
        case e => throw new IllegalArgumentException(
          s"bloom_probe expects 2 arguments, got ${e.length}") },
      "built-in")
  }
}
