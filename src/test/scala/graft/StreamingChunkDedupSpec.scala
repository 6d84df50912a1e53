package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DocStreams

/** The l46 streaming twin's exactness contract: replaying the corpus
  * through the chained dedup→re-gather stream must reproduce the batch
  * entry's per-doc census EXACTLY (same kept/dropped counts, same
  * rebuilt-text md5), provided arrival order respects the batch rule's
  * tie-break (first occurrence = min (doc_id, position)).
  *
  * Feeding discipline: within one micro-batch the stateful dedup's
  * keep-choice between EQUAL chunks from different docs is a shuffle
  * race, so the spec feeds docs in conflict waves — in doc_id order, a
  * doc lands one wave after the latest earlier doc sharing an eligible
  * chunk with it (so every cross-doc collision resolves across ordered
  * micro-batches, deterministically, min doc_id first). Non-conflicting
  * docs share a wave, keeping the replay to a handful of batches.
  */
class StreamingChunkDedupSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  test("streaming chunk dedup replays to the exact batch census") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    Tables.registerAll(spark, sf)

    val batch = SparkEntry.queries("l46_chunk_dedup")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5))).toMap
    assert(batch.values.map(_._3).sum > 0, "corpus must have dropped chunks")

    // conflict waves from the batch side's own chunking rule
    val docChunks = spark.sql(
      """SELECT doc_id, text,
        |  array_distinct(filter(transform(
        |    sequence(0, CAST(ceil(size(split(text, ' ')) / 8.0) AS INT) - 1),
        |    i -> concat_ws(' ', slice(split(text, ' '), i * 8 + 1, 8))),
        |    c -> size(split(c, ' ')) >= 4)) AS chs
        |FROM documents ORDER BY doc_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2)))
    val maxWave = scala.collection.mutable.Map.empty[String, Int]
    val waves = docChunks.map { case (id, text, chs) =>
      val w = chs.map(c => maxWave.get(c).map(_ + 1).getOrElse(0))
        .foldLeft(0)(math.max)
      chs.foreach(c => maxWave(c) = math.max(maxWave.getOrElse(c, -1), w))
      (w, id, text)
    }
    val nWaves = waves.map(_._1).max + 1
    assert(nWaves >= 2, "sf corpus must force at least one conflict wave")

    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Long)]
    val docs = mem.toDF().toDF("doc_id", "text", "ts_us")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
    val q = DocStreams.chunkDedupedDocs(docs)
      .writeStream.format("memory").queryName("chunk_deduped")
      .outputMode("append").start()
    try {
      (0 until nWaves).foreach { w =>
        mem.addData(waves.filter(_._1 == w).toIndexedSeq.map {
          // +10s: a row at ts=0 sits exactly on Spark's INITIAL watermark
          // (epoch) and is discarded as late by the stateful operators —
          // real pipelines never emit at epoch, specs must not either
          case (_, id, text) => (id, text, (id + 10) * 1000000L)
        })
        q.processAllAvailable()
      }
      // sentinel far past the horizon: advances the watermark so every
      // doc's aggregation window finalizes and emits
      mem.addData((-1L, "sentinel", 3L * 3600 * 1000000))
      q.processAllAvailable()

      val streamed = spark.table("chunk_deduped")
        .where("doc_id >= 0").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getLong(5))).toMap
      assert(streamed.size === batch.size,
        s"streamed ${streamed.size} docs, batch ${batch.size}; missing " +
          (batch.keySet -- streamed.keySet).toSeq.sorted.take(5).mkString(","))
      streamed.foreach { case (id, row) =>
        assert(row === batch(id), s"doc $id: streaming $row != batch ${batch(id)}")
      }
    } finally q.stop()
  }
}
