package graft

import org.scalatest.funsuite.AnyFunSuite

/** The cache contract for query entries that persist a shared intermediate
  * (LlmQueries.materialize): after the consuming DataFrame is evaluated and
  * `releaseShared()` is called — as Verify and Bench do per query — no
  * persisted RDDs linger. Library users composing `SparkEntry.queries`
  * outside those harnesses own the same call.
  */
class CacheDisciplineSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.001"

  test("no dangling persisted RDDs after evaluate + releaseShared") {
    // materialize() is deliberately a no-op under GRAFT_MATERIALIZE=off
    // (the bench A/B switch) — there is no cache to assert on then, and a
    // leftover export from an A/B shell must not fail the suite
    assume(!sys.env.get("GRAFT_MATERIALIZE").contains("off"),
      "GRAFT_MATERIALIZE=off disables the persists under test")
    // other suites may leave RDD-level persists that are not ours to drop
    // (l14's localCheckpoint pins its RDDs by design — unpersisting a
    // checkpoint would sever truncated lineage), so assert on the DELTA
    // this query introduces, not on global emptiness
    graft.queries.LlmQueries.releaseShared()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // l13 is the one entry that pins a shared cache via materialize()
    val df = SparkEntry.queries("l13_langid_trigram")(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    val during = spark.sparkContext.getPersistentRDDs.keySet
    assert((during -- before).nonEmpty,
      "expected l13's materialized gram build to be cached during its run")
    graft.queries.LlmQueries.releaseShared()
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty,
      "releaseShared() must unpersist every materialize()d intermediate")
  }
}
