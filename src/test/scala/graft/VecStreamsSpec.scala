package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.LlmQueries
import graft.streaming.VecStreams

/** The streaming ADC scorer must equal its batch self over the same
  * vectors, and both must agree with the batch l26b serving query's
  * ADC values — three independent code paths over one persisted index.
  */
class VecStreamsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  private lazy val ready = {
    Tables.registerAll(spark, sf)
    graft.functions.VectorFunctions.register(spark)
    LlmQueries.pqIndex(spark, sf)
    true
  }

  private lazy val inputDir: String = {
    val dir = Files.createTempDirectory("graft-vec-in")
    Files.copy(Paths.get(s"$sf/embeddings.parquet"),
      dir.resolve("embeddings.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  test("streaming ADC scores == batch ADC scores == l26b serving ADC") {
    ready
    val q = VecStreams.adcScores(spark, VecStreams.readVectors(spark, inputDir))
      .writeStream.format("memory").queryName("vec_scores")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streaming = spark.table("vec_scores").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val batch = VecStreams.adcScores(spark, spark.table("embeddings")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(streaming.size === batch.size)
    assert(streaming === batch, "stateless scorer must be mode-invariant")

    // the l26b serving query's reported adc_sim for its returned ids must
    // be exactly what the scorer computes for those vectors
    val served = SparkEntry.queries("l26b_ann_pq_served")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(served.nonEmpty)
    served.foreach { case (id, adc) =>
      assert(math.abs(streaming(id) - adc) < 1e-6,
        s"vec $id: scorer ${streaming(id)} vs served $adc")
    }
  }
}
