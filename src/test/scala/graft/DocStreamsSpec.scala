package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DocStreams

/** Streaming exact-dedup semantics: first observation of a content hash
  * passes, re-observations within the watermark horizon are dropped, and
  * state expires with the watermark.
  */
class DocStreamsSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("dropDuplicatesWithinWatermark dedups within the horizon") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Long)]
    def us(min: Long): Long = min * 60L * 1000 * 1000
    val docs = mem.toDF().toDF("doc_id", "text", "ts_us")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")

    val q = DocStreams.dedupedDocs(docs, horizon = "60 minutes")
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    try {
      def emitted(): Seq[Long] =
        spark.table("deduped").select("doc_id").collect().map(_.getLong(0)).toSeq.sorted

      // first batch: two distinct texts plus an in-batch duplicate
      mem.addData((1L, "alpha text", us(0)), (2L, "beta text", us(1)),
        (3L, "alpha text", us(2)))
      q.processAllAvailable()
      val first = emitted()
      assert(first.length === 2)
      assert(first.contains(2L))
      assert(first.count(d => d == 1L || d == 3L) === 1)

      // re-observation within the horizon: dropped
      mem.addData((4L, "alpha text", us(10)))
      q.processAllAvailable()
      assert(emitted().length === 2)

      // far past the horizon the hash state has been evicted, so the same
      // content is (correctly, per the contract) admitted again
      mem.addData((5L, "gamma text", us(240)))
      q.processAllAvailable()
      mem.addData((6L, "alpha text", us(241)))
      q.processAllAvailable()
      assert(emitted().contains(5L))
      assert(emitted().contains(6L))
    } finally q.stop()
  }

  test("decontamination gate: no contaminated doc passes, streaming " +
    "replay equals the batch gate") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val evalDocs = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "pack my box with five dozen liquor jugs")
    ).toDF("doc_id", "text")
    // 1,3 share a 4-gram with eval; 2,4 are clean
    val train = Seq(
      (1L, "sentence with the quick brown fox inside it"),
      (2L, "a completely unrelated clean training sentence"),
      (3L, "pack my box with something else entirely"),
      (4L, "another clean doc about spark plans"))

    // batch semantics first: exactly the clean docs pass (the bloom is
    // sized so fpp ~ 0 here; the guarantee direction is no false negatives)
    val batchPassed = DocStreams
      .decontaminationGate(train.toDF("doc_id", "text"), evalDocs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchPassed.intersect(Set(1L, 3L)).isEmpty,
      "no doc sharing an eval 4-gram may ever pass the gate")
    assert(batchPassed === Set(2L, 4L))

    // the same gate over a stream: stateless filter, same survivors
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = DocStreams
      .decontaminationGate(mem.toDF().toDF("doc_id", "text"), evalDocs)
      .writeStream.format("memory").queryName("decon_gate")
      .outputMode("append").start()
    try {
      mem.addData(train: _*)
      q.processAllAvailable()
      val streamed = spark.table("decon_gate").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(streamed === batchPassed)
    } finally q.stop()
  }

  test("streaming DSIR scores equal the batch l28 importance exactly") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    Tables.registerAll(spark, dir)
    val w = graft.streaming.DocStreams.dsirWeightsMicro(spark)
    assert(w.length === 1024)

    // batch reference: the l28 gate entry's top-30 (doc_id -> imp)
    val batch = SparkEntry.queries("l28_dsir_importance")(spark, dir)
      .select("doc_id", "imp").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(batch.size === 30)

    // stream exactly those documents through the stateless scorer
    val texts = spark.table("documents")
      .filter(col("doc_id").isin(batch.keySet.toSeq: _*))
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = graft.streaming.DocStreams
      .dsirScore(mem.toDF().toDF("doc_id", "text"), w)
      .select("doc_id", "imp")
      .writeStream.format("memory").queryName("dsir_scores")
      .outputMode("append").start()
    try {
      mem.addData(texts: _*)
      q.processAllAvailable()
      val streamed = spark.table("dsir_scores").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(streamed === batch) // exact equality — micro-unit fixed point
    } finally q.stop()
  }

  test("streaming LM scores equal the batch l30 per-doc means exactly") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    Tables.registerAll(spark, dir)
    val model = graft.streaming.DocStreams.lmModelRow(spark)

    // independent batch formulation of the same per-doc mean (mirrors the
    // l30 entry's docs CTE: 6-dp decimal summands, exact sum)
    val batch = spark.sql(
      """WITH w AS (
        |  SELECT doc_id, filter(split(text, ' '), x -> x <> '') AS ws
        |  FROM documents WHERE doc_id % 11 = 0
        |), big AS (
        |  SELECT doc_id, bg, element_at(split(bg, ' '), 1) AS w1 FROM w
        |  LATERAL VIEW explode(transform(sequence(1, size(ws) - 1),
        |    i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))) t AS bg
        |), trainbig AS (
        |  SELECT bg FROM (SELECT filter(split(text, ' '), x -> x <> '') AS ws
        |                  FROM documents WHERE lang = 'en') u
        |  LATERAL VIEW explode(transform(sequence(1, size(ws) - 1),
        |    i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))) t AS bg
        |), bgc AS (SELECT bg, count(*) AS c FROM trainbig GROUP BY bg
        |), unic AS (
        |  SELECT element_at(split(bg, ' '), 1) AS w1, count(*) AS c1
        |  FROM trainbig GROUP BY 1
        |), v AS (SELECT CAST(count(DISTINCT w1) AS DOUBLE) AS nv FROM unic)
        |SELECT b.doc_id,
        |  round(CAST(sum(CAST(round(ln((coalesce(bgc.c, 0) + 1.0)
        |    / (coalesce(unic.c1, 0) + nv)), 6) AS DECIMAL(18,6))) AS DOUBLE)
        |    / count(*), 6) AS mean_lp
        |FROM big b
        |LEFT JOIN bgc ON b.bg = bgc.bg
        |LEFT JOIN unic ON b.w1 = unic.w1
        |CROSS JOIN v
        |GROUP BY b.doc_id""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(batch.nonEmpty)

    val texts = spark.table("documents")
      .filter(col("doc_id").isin(batch.keySet.toSeq: _*))
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = graft.streaming.DocStreams
      .lmScore(mem.toDF().toDF("doc_id", "text"), model)
      .select("doc_id", "mean_lp")
      .writeStream.format("memory").queryName("lm_scores")
      .outputMode("append").start()
    try {
      mem.addData(texts: _*)
      q.processAllAvailable()
      val streamed = spark.table("lm_scores").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(streamed === batch) // exact — fixed-point fold == decimal Sum
    } finally q.stop()
  }

  test("streaming CDC chunker equals the batch boundary fold exactly") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    Tables.registerAll(spark, dir)
    val texts = spark.table("documents").filter(col("doc_id") % 13 === 0)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    assert(texts.nonEmpty)

    // batch reference through the same operator applied to a static frame
    val batch = graft.streaming.DocStreams
      .chunkedDocs(texts.toDF("doc_id", "text"))
      .select("doc_id", "n_chunks", "chunk_hashes").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[String](2))).toMap
    assert(batch.values.exists(_._1 > 1)) // multi-chunk docs exist

    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = graft.streaming.DocStreams
      .chunkedDocs(mem.toDF().toDF("doc_id", "text"))
      .select("doc_id", "n_chunks", "chunk_hashes")
      .writeStream.format("memory").queryName("cdc_chunks")
      .outputMode("append").start()
    try {
      mem.addData(texts: _*)
      q.processAllAvailable()
      val streamed = spark.table("cdc_chunks").collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[String](2))).toMap
      assert(streamed === batch)
    } finally q.stop()
  }

  test("decontamination gate edge cases: empty eval corpus and NULL text " +
    "both pass (match the batch semantics, no silent drops)") {
    import spark.implicits._
    // empty eval corpus -> NULL bloom blob -> nothing is contaminated;
    // the gate must be a no-op, not a drop-everything NULL predicate
    val docs = Seq((1L, "some training text here okay fine"), (2L, null))
      .toDF("doc_id", "text")
    val noEval = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(DocStreams.decontaminationGate(docs, noEval)
      .select("doc_id").collect().map(_.getLong(0)).toSet === Set(1L, 2L))
    // NULL text has zero grams -> never contaminated -> passes, exactly
    // as batch l22's explode emits nothing for it
    val eval = Seq((9L, "some training text here okay fine")).toDF("doc_id", "text")
    assert(DocStreams.decontaminationGate(docs, eval)
      .select("doc_id").collect().map(_.getLong(0)).toSet === Set(2L))
  }
}
