package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming vector-pipeline operators: ADC scoring of ARRIVING embedding
  * vectors against the persisted PQ index (`LlmQueries.pqIndex`) — the
  * ML-serving face of the batch l26b entry. The reference has no
  * streaming at all (SURVEY §2.9); a production similarity service scores
  * vectors as they land.
  *
  * Scoring is completely STATELESS: the 16-row codebook and the fixed
  * query's LUT collapse into ONE broadcast row; each micro-batch maps
  * vectors to per-subspace codes with array expressions (`array_min` over
  * a (distance, cid) struct — the same deterministic (d ASC, cid)
  * tie-break as the batch encoder's row_number) and sums decimal LUT
  * partials. No window, no shuffle, no state: throughput is bounded by
  * scan speed alone, and the identical function body serves batch frames,
  * which is how the spec proves streaming == batch.
  */
object VecStreams {

  /** File-source stream of embedding vectors (schema probed from the
    * directory, the EventStreams.readEvents discipline).
    */
  def readVectors(spark: SparkSession, inputDir: String): DataFrame = {
    val physical = spark.read.parquet(inputDir).schema
    spark.readStream.schema(physical).parquet(inputDir)
  }

  private def dot16(a: String, b: String) =
    s"aggregate(zip_with(CAST($a AS ARRAY<DOUBLE>), CAST($b AS ARRAY<DOUBLE>), " +
      s"(x, y) -> x * y), 0d, (acc, v) -> acc + v)"

  /** One broadcastable row: per subspace the cid-ordered centroid arrays
    * (for encoding), the query-LUT decimal partials and norms (for
    * scoring), plus the query norm. Requires `LlmQueries.pqIndex` views
    * and the `embeddings` view on the session.
    */
  private[graft] def lutRow(spark: SparkSession): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    val pivot = (0 until 4).map(i =>
      s"max(CASE WHEN sub = $i THEN cbs END) AS cb$i, " +
        s"max(CASE WHEN sub = $i THEN pds END) AS p$i, " +
        s"max(CASE WHEN sub = $i THEN cs END) AS n$i").mkString(",\n  ")
    spark.sql(
      s"""WITH qsub AS (
         |  SELECT t.s AS sub, slice(e.embedding, t.s * 16 + 1, 16) AS qv
         |  FROM embeddings e LATERAL VIEW explode(sequence(0, 3)) t AS s
         |  WHERE e.vec_id = 0
         |), lut AS (
         |  SELECT c.sub, c.cid, c.ce,
         |    CAST(round(${dot16("qs.qv", "c.ce")}, 6) AS DECIMAL(20, 10)) AS pd,
         |    CAST(round(${dot16("c.ce", "c.ce")}, 6) AS DECIMAL(20, 10)) AS cn2
         |  FROM pq_codebook c JOIN qsub qs ON qs.sub = c.sub
         |), luts AS (
         |  SELECT sub,
         |    transform(array_sort(collect_list(struct(cid, ce))), x -> x.ce) AS cbs,
         |    transform(array_sort(collect_list(struct(cid, pd))), x -> x.pd) AS pds,
         |    transform(array_sort(collect_list(struct(cid, cn2))), x -> x.cn2) AS cs
         |  FROM lut GROUP BY sub
         |)
         |SELECT $pivot,
         |  (SELECT sqrt(vec_dot(embedding, embedding))
         |   FROM embeddings WHERE vec_id = 0) AS qn
         |FROM luts""".stripMargin)
  }

  /** ADC-score a frame of vectors (streaming or batch — same body):
    * encode each row against the broadcast codebook, sum the decimal LUT
    * partials, output (vec_id, adc_sim). The query vector itself is
    * excluded.
    */
  def adcScores(spark: SparkSession, vectors: DataFrame): DataFrame = {
    def codeExpr(i: Int) =
      s"array_min(transform(sequence(0, 3), j -> named_struct(" +
        s"'d', aggregate(zip_with(" +
        s"CAST(slice(embedding, ${i * 16 + 1}, 16) AS ARRAY<DOUBLE>), " +
        s"CAST(element_at(cb$i, j + 1) AS ARRAY<DOUBLE>), " +
        s"(x, y) -> (x - y) * (x - y)), 0d, (acc, v) -> acc + v), " +
        s"'cid', j))).cid"
    val num = (0 until 4).map(i => s"element_at(p$i, c$i + 1)").mkString(" + ")
    val n2 = (0 until 4).map(i => s"element_at(n$i, c$i + 1)").mkString(" + ")
    vectors
      .crossJoin(broadcast(lutRow(spark)))
      .selectExpr(
        Seq("vec_id", "qn") ++
          (0 until 4).map(i => s"${codeExpr(i)} AS c$i") ++
          (0 until 4).flatMap(i => Seq(s"p$i", s"n$i")): _*)
      .where("vec_id <> 0")
      .selectExpr("vec_id",
        s"CAST(($num) AS DOUBLE) / (qn * sqrt(CAST(($n2) AS DOUBLE))) AS adc_sim")
  }
}
