package graft.functions

import org.apache.spark.sql.SparkSession

/** One-call registration of every graft function pack.
  *
  * The reference registers its whole function surface at server boot
  * (crates/runtime/src/mgmt.rs boot path) — a persisted object whose
  * definition references a function never races its registration. Graft
  * must match that contract: [[graft.exec.GraftSession]] replays persisted
  * CREATE scripts at construction (`restoreCatalog`), and a materialized
  * view whose SELECT uses `vec_dot` / `ngram_*` / `bloom_*` must resolve
  * at replay time, not only after the first query entry that happens to
  * register the pack ad hoc. Every pack's `register` is idempotent
  * (createOrReplaceTempFunction / udf.register overwrite), so calling
  * this once per session boot — and again from individual query entries —
  * is safe.
  */
object GraftFunctions {
  def registerAll(spark: SparkSession): Unit = {
    ClickHouseFunctions.register(spark)
    ChAggregates.register(spark)
    GraftUdafs.register(spark)
    BehaviorFunctions.register(spark)
    VectorFunctions.register(spark)
    NGramFunctions.register(spark)
    BloomFunctions.register(spark)
    SimhashFunctions.register(spark)
    WinnowFunctions.register(spark)
  }

  /** Lowercased names of every function the CH packs register — the
    * `is_ch_pack` flag in system.functions.
    */
  lazy val registeredNames: Set[String] =
    (ClickHouseFunctions.functions.map(_._1) ++
      ChAggregates.functions.map(_._1))
      .map(_.toLowerCase(java.util.Locale.ROOT)).toSet
}
