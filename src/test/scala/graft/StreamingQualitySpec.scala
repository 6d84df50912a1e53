package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.LlmQueries
import graft.streaming.DocStreams

/** The l44b streaming twin's exactness contract: the distilled scorer
  * (weights + frozen standardization moments as literals) must score an
  * arriving document BIT-IDENTICALLY to the batch SQL path (moments
  * computed in-CTE from the corpus) — equality, not tolerance. A drift
  * here means the frozen-moment math diverged from the CTE math and the
  * streaming filter would disagree with the batch census it mirrors.
  */
class StreamingQualitySpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  test("streaming frozen-moment scores equal the batch CTE scores " +
    "exactly, and the keep flag mirrors the census rule") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    Tables.registerAll(spark, sf)

    val scoreExpr = DocStreams.qualityScoreExpr(spark)

    // batch path: the same trained weights, but standardization moments
    // computed in-SQL from the st CTE (the l44b census path)
    val (_, w) = LlmQueries.qualityLrTrain(spark)
    import LlmQueries.{QualityLr, round9}
    val p = QualityLr.p9(round9(w._1).toString, round9(w._2).toString,
      round9(w._3).toString, round9(w._4).toString, round9(w._5).toString)
    val batch = spark.sql(
      s"""WITH ${QualityLr.featuresCte(spark = true, carry = Seq("doc_id"))}
         |SELECT doc_id, $p AS p FROM f""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = DocStreams.scoredDocs(
        mem.toDF().toDF("doc_id", "text"), scoreExpr)
      .writeStream.format("memory").queryName("scored")
      .outputMode("append").start()
    try {
      val docs = spark.table("documents")
        .selectExpr("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      mem.addData(docs.toIndexedSeq)
      q.processAllAvailable()
      val streamed = spark.table("scored")
        .select("doc_id", "p", "keep").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
      assert(streamed.length === batch.size)
      streamed.foreach { case (id, ps, keep) =>
        assert(batch(id) === ps,
          s"doc $id: streaming $ps != batch ${batch(id)}")
        assert(keep === (ps >= 0.5))
      }
      // the filter discriminates on this corpus
      assert(streamed.exists(_._3) && streamed.exists(!_._3))
    } finally q.stop()
  }
}
