package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bloom SQL surface (graft.functions.BloomFunctions) and the l22
  * prefilter+confirm decontamination pipeline built on it.
  */
class BloomFunctionsSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.001"

  test("bloom_build/bloom_probe: no false negatives over the built set") {
    graft.functions.BloomFunctions.register(spark)
    val misses = spark.sql(
      """WITH m AS (SELECT id FROM range(1000)),
        |bf AS (SELECT bloom_build(xxhash64(id)) AS b FROM m)
        |SELECT count(*) AS n FROM m
        |WHERE NOT bloom_probe((SELECT b FROM bf), xxhash64(id))""".stripMargin)
      .collect()(0).getLong(0)
    assert(misses === 0L, "a bloom filter can never miss an inserted member")
  }

  test("false positives on a disjoint probe set stay under the sized fpp") {
    graft.functions.BloomFunctions.register(spark)
    // 1k members in an 8M-bit bloom: expected fpp is ~0; allow 1% slack
    val fps = spark.sql(
      """WITH m AS (SELECT id FROM range(1000)),
        |bf AS (SELECT bloom_build(xxhash64(id)) AS b FROM m)
        |SELECT count(*) AS n FROM range(1000000, 1010000)
        |WHERE bloom_probe((SELECT b FROM bf), xxhash64(id))""".stripMargin)
      .collect()(0).getLong(0)
    assert(fps <= 100L, s"fp count $fps exceeds 1% of 10k disjoint probes")
  }

  test("l22 bloom prefilter+confirm is bit-identical to exact decontamination") {
    val bloom = SparkEntry.queries("l22_bloom_decontamination")(spark, sfDir)
    graft.functions.NGramFunctions.register(spark)
    val exact = spark.sql(
      """WITH ev AS (
        |  SELECT DISTINCT g FROM documents
        |  LATERAL VIEW explode(array_distinct(word_ngrams(text, 4))) t AS g
        |  WHERE source IN ('src0', 'src1')
        |), tr AS (
        |  SELECT doc_id, source, g FROM documents
        |  LATERAL VIEW explode(array_distinct(word_ngrams(text, 4))) t AS g
        |  WHERE source NOT IN ('src0', 'src1')
        |), per_doc AS (
        |  SELECT tr.doc_id, tr.source, count(*) AS n_hit_grams
        |  FROM tr JOIN ev ON tr.g = ev.g
        |  GROUP BY tr.doc_id, tr.source
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_contaminated_docs,
        |  CAST(sum(n_hit_grams) AS BIGINT) AS n_hit_grams,
        |  CAST(max(n_hit_grams) AS BIGINT) AS max_hit_grams
        |FROM per_doc GROUP BY source ORDER BY source""".stripMargin)
    val got = bloom.collect().map(_.toSeq).toSeq
    val want = exact.collect().map(_.toSeq).toSeq
    assert(got.nonEmpty, "decontamination must find the injected overlaps")
    assert(got === want,
      "the bloom prefilter must be invisible in the result (confirm join " +
        "removes every false positive)")
  }

  test("the probe runs as a filter with the bloom planted as a subquery " +
    "result, not as a join") {
    val plan = SparkEntry.queries("l22_bloom_decontamination")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      "the map-side prefilter must survive into the physical plan")
    assert(plan.contains("Subquery") || plan.contains("subquery"),
      "the bloom must arrive via a scalar subquery, not a shuffle/join")
  }
}
