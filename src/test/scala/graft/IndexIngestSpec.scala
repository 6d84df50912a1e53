package graft

import org.scalatest.funsuite.AnyFunSuite

/** l35 index lifecycle (VERDICT r11 task #7): the IVF-PQ index is a
  * materialized view of the live embedding table — INSERT triggers the
  * d11 subscription, which runs the map-only encoder over the block and
  * appends to the index. Pins: (1) serving AFTER ingest returns the new
  * vectors; (2) the encode is frozen-quantizer (a delta copy gets the
  * identical cell + codes as its source vector — add(), never retrain);
  * (3) the index covers exactly the live table; (4) the serving plan
  * stays training-subtree-free (no Window, no Cartesian).
  */
class IndexIngestSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  private lazy val served = {
    queries.LlmQueries.queries("l35_ann_index_ingest")(spark, sf)
      .collect().toSeq.map(_.getLong(0))
  }

  test("serving after ingest returns ingested vectors (vec_id >= 100000 " +
    "in the top-5)") {
    assert(served.nonEmpty)
    assert(served.exists(_ >= 100000L),
      s"no ingested vector in the served result: $served")
  }

  test("delta rows carry the IDENTICAL cell and PQ codes as their source " +
    "vectors — the frozen-quantizer add() contract") {
    served // runs the entry, leaving the tables in the session
    val idx = spark.table("graft_emb_index")
      .collect().map { r =>
        def n(i: Int) = r.get(i).asInstanceOf[Number].longValue
        n(0) -> (n(1), n(2), n(3), n(4), n(5))
      }.toMap
    val deltas = idx.keys.filter(_ >= 100000L).toSeq
    assert(deltas.nonEmpty, "no delta rows reached the index")
    deltas.foreach { d =>
      assert(idx(d) === idx(d - 100000L),
        s"delta $d encoded differently from its source ${d - 100000L}")
    }
  }

  test("the index covers exactly the live table") {
    served
    val live = spark.table("graft_emb_live").count()
    val idx = spark.table("graft_emb_index").count()
    val orig = spark.table("embeddings").count()
    assert(idx === live)
    assert(live > orig, "the delta insert must have landed")
  }

  test("the serving plan is training-subtree-free: no Window, no " +
    "CartesianProduct") {
    served
    val plan = spark.sql(queries.LlmQueries.ivfPqServedSparkSql(
      index = "graft_emb_index", corpus = "graft_emb_live"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("Window ("), s"training/window subtree leaked:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  // ---- freshness under TRUNCATE (VERDICT r12 task #6) -----------------
  // The reference's part store drops data on TRUNCATE (mgmt.rs:856-905);
  // an MV-maintained index must never serve vectors whose live rows are
  // gone. The protection is structural: serving exact-reranks through an
  // INNER join to the live table, so index rows orphaned by a source
  // TRUNCATE can never reach the result — no tombstone bookkeeping
  // needed, at any scale.

  test("TRUNCATE of the live table: orphaned index rows serve ZERO " +
    "stale vectors") {
    served // builds live + index + quantizer views in the session
    val g = new exec.GraftSession(spark)
    g.sql("TRUNCATE TABLE graft_emb_live")
    assert(spark.table("graft_emb_live").count() === 0L)
    // CH MV semantics: source TRUNCATE does not cascade to the view —
    // the index still holds the orphaned codes...
    assert(spark.table("graft_emb_index").count() > 0L)
    // ...but serving returns nothing: every candidate dies at the
    // live-table rerank join.
    val stale = spark.sql(queries.LlmQueries.ivfPqServedSparkSql(
      index = "graft_emb_index", corpus = "graft_emb_live")).collect()
    assert(stale.isEmpty,
      s"stale vectors served from a truncated corpus: ${stale.mkString(",")}")
  }

  test("TRUNCATE of the index MV keeps the subscription: re-ingest " +
    "repopulates and serves exactly the fresh subset") {
    val g = new exec.GraftSession(spark)
    g.sql("TRUNCATE TABLE graft_emb_index")
    assert(spark.table("graft_emb_index").count() === 0L)
    // the d11 subscription must survive the MV's schema-only truncate
    g.sql("INSERT INTO graft_emb_live SELECT vec_id, embedding " +
      "FROM embeddings WHERE vec_id % 2 = 0")
    val live = spark.table("graft_emb_live").count()
    val idx = spark.table("graft_emb_index").count()
    assert(live > 0L && idx === live,
      s"subscription lost after TRUNCATE: live=$live idx=$idx")
    val res = spark.sql(queries.LlmQueries.ivfPqServedSparkSql(
      index = "graft_emb_index", corpus = "graft_emb_live"))
      .collect().map(_.getLong(0))
    assert(res.nonEmpty)
    assert(res.forall(_ % 2 == 0),
      s"served a vector outside the re-ingested subset: ${res.mkString(",")}")
  }
}
