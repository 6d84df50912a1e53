package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the training-mix trio l49/l50/l51 — the
  * cross-engine value parity is the DuckDB gate; these pin the solver /
  * curriculum / miner CONTRACTS the hash compare can't express (budget
  * conservation, cap enforcement, phase partition, margin violation), and
  * the one physical property the l51 scale story rests on
  * (WindowGroupLimit pruning the top-3 window map-side).
  */
class TrainingMixSpec extends AnyFunSuite {
  import SparkTestSession.spark
  private val sf01 = "/root/testdata/sf0.01"

  test("l49: allocation conserves the budget, caps are enforced, and " +
    "both the saturated and proportional branches are live") {
    val out = SparkEntry.queries("l49_epoch_budget")(spark, sf01).collect()
    val totalToks = spark.sql(
      s"""SELECT CAST(sum(size(filter(split(text, ' '), x -> x <> '')))
         |AS BIGINT) FROM parquet.`$sf01/documents.parquet`""".stripMargin)
      .head.getLong(0)
    val budget = totalToks * 3 / 2
    val allocated = out.map(_.getAs[Long]("alloc_toks")).sum
    val unallocated = out.map(_.getAs[Long]("unallocated")).distinct
    assert(unallocated.length === 1)
    assert(allocated + unallocated.head === budget,
      "every budget token is either allocated or reported unallocated")
    out.foreach { r =>
      assert(r.getAs[Long]("alloc_toks") <= r.getAs[Long]("cap_toks"),
        s"${r.getAs[String]("source")} exceeds its epoch cap")
      assert(r.getAs[Long]("epochs_bp") <= 20000L,
        "no source trains past maxEpochs = 2 (20000 basis points)")
      assert((r.getAs[Int]("saturated") == 1) ===
        (r.getAs[Long]("alloc_toks") == r.getAs[Long]("cap_toks")))
    }
    val sat = out.count(_.getAs[Int]("saturated") == 1)
    assert(sat > 0 && sat < out.length,
      "the corpus must exercise BOTH branches or the solver is vacuous")
  }

  test("l50: phases partition the corpus, replay flows only forward, and " +
    "difficulty ramps across phases") {
    val out = SparkEntry.queries("l50_curriculum_phases")(spark, sf01)
      .collect().sortBy(_.getAs[Int]("phase"))
    assert(out.map(_.getAs[Int]("phase")).toSeq === Seq(1, 2, 3))
    val corpus = spark.read.parquet(s"$sf01/documents.parquet").count()
    val originals = out.map(r =>
      r.getAs[Long]("n_docs") - r.getAs[Long]("n_replay")).sum
    assert(originals === corpus, "originals partition the corpus exactly")
    assert(out.head.getAs[Long]("n_replay") === 0L,
      "phase 1 has nothing earlier to replay")
    assert(out.tail.forall(_.getAs[Long]("n_replay") > 0L),
      "1-in-10 replay must be live in phases 2 and 3 at this SF")
    val meanToks = out.map(r => r.getAs[Long]("sum_toks").toDouble /
      r.getAs[Long]("n_docs"))
    assert(meanToks.sliding(2).forall(w => w(0) < w(1)),
      "mean difficulty must increase phase over phase")
  }

  test("l51: every emitted triplet violates the margin, labels are " +
    "correct, and ranks are within the mining window") {
    val out = SparkEntry.queries("l51_triplet_mining")(spark, sf01)
    out.createOrReplaceTempView("l51_out")
    spark.read.parquet(s"$sf01/embeddings.parquet")
      .createOrReplaceTempView("l51_emb")
    val bad = spark.sql(
      """SELECT count(*) FROM l51_out o
        |JOIN l51_emb a ON a.vec_id = o.anchor
        |JOIN l51_emb p ON p.vec_id = o.pos_id
        |JOIN l51_emb n ON n.vec_id = o.neg_id
        |WHERE p.label <> a.label OR n.label = a.label
        |   OR o.loss <= 0 OR o.neg_rank NOT BETWEEN 1 AND 3
        |   OR (o.kind = 'hard') <> (o.neg_sim >= o.pos_sim)""".stripMargin)
      .head.getLong(0)
    assert(bad === 0L)
    val kinds = spark.sql("SELECT DISTINCT kind FROM l51_out").collect()
      .map(_.getString(0)).toSet
    assert(kinds === Set("hard", "semi"),
      "both violation classes must be live at this SF")
  }

  test("l51 physical plan: the top-3 negatives window is pruned map-side " +
    "by WindowGroupLimit (the 100 TB shape)") {
    val df = SparkEntry.queries("l51_triplet_mining")(spark, sf01)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      "rank <= 3 must push a per-anchor group limit below the shuffle; " +
        "without it every anchor's full corpus row set hits one reducer")
  }
}
