package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the curation-endgame trio l46/l47/l48 — the
  * cross-engine value parity is the DuckDB gate; these pin the properties
  * the gate's hash compare can't express (reconstruction fidelity, the
  * leakage-free-by-construction contract, label correctness of the mined
  * pairs). Runs at sf0.01 where the duplicate signal is non-degenerate
  * (144 dropped chunk occurrences, 3 naive-leaky clusters).
  */
class CurationSplitSpec extends AnyFunSuite {
  import SparkTestSession.spark
  private val sf01 = "/root/testdata/sf0.01"

  test("l46: chunk accounting balances, dedup is non-degenerate, and " +
    "untouched docs rebuild to their exact original text") {
    val out = SparkEntry.queries("l46_chunk_dedup")(spark, sf01)
    out.createOrReplaceTempView("l46_out")
    val bad = spark.sql(
      "SELECT count(*) FROM l46_out WHERE kept_chunks + dropped_chunks <> n_chunks")
      .head.getLong(0)
    assert(bad === 0L, "kept + dropped must equal total chunks per doc")
    val dropped = spark.sql("SELECT sum(dropped_chunks) FROM l46_out")
      .head.getLong(0)
    assert(dropped > 0L, "sf0.01 corpus has repeated chunks; zero dropped " +
      "means the dedup is vacuous")
    // reconstruction fidelity: a doc that lost nothing must rebuild
    // BIT-IDENTICALLY (md5) to its original single-space-joined text
    val infidel = spark.sql(
      s"""SELECT count(*) FROM l46_out o
         |JOIN parquet.`$sf01/documents.parquet` d ON d.doc_id = o.doc_id
         |WHERE o.dropped_chunks = 0 AND o.rebuilt_md5 <> md5(d.text)
         |""".stripMargin).head.getLong(0)
    assert(infidel === 0L, "untouched docs must reconstruct exactly")
  }

  test("l47: every document lands in exactly one split and the naive " +
    "doc-keyed hash would have leaked clusters this split keeps together") {
    val out = SparkEntry.queries("l47_cluster_safe_split")(spark, sf01)
      .collect()
    val total = out.map(_.getAs[Long]("n_docs")).sum
    val corpus = spark.read.parquet(s"$sf01/documents.parquet").count()
    assert(total === corpus, "split census must partition the corpus")
    assert(out.map(_.getAs[String]("split")).toSet === Set("train", "val", "test"))
    val leaky = out.map(_.getAs[Long]("naive_leaky_clusters")).distinct
    assert(leaky.length === 1 && leaky.head > 0L,
      "the audit must show the naive split would have leaked (else the " +
        "operator demonstrates nothing at this SF)")
  }

  test("l48: mined positives share the anchor's label, negatives differ, " +
    "and similarities are valid cosines") {
    val out = SparkEntry.queries("l48_hard_negatives")(spark, sf01)
    out.createOrReplaceTempView("l48_out")
    spark.read.parquet(s"$sf01/embeddings.parquet")
      .createOrReplaceTempView("l48_emb")
    val badLabel = spark.sql(
      """SELECT count(*) FROM l48_out o
        |JOIN l48_emb a ON a.vec_id = o.anchor
        |JOIN l48_emb p ON p.vec_id = o.pos_id
        |JOIN l48_emb n ON n.vec_id = o.neg_id
        |WHERE p.label <> a.label OR n.label = a.label
        |""".stripMargin).head.getLong(0)
    assert(badLabel === 0L)
    val badSim = spark.sql(
      """SELECT count(*) FROM l48_out
        |WHERE pos_sim < -1.000001 OR pos_sim > 1.000001
        |   OR neg_sim < -1.000001 OR neg_sim > 1.000001
        |   OR anchor = pos_id OR anchor = neg_id OR pos_id = neg_id
        |""".stripMargin).head.getLong(0)
    assert(badSim === 0L)
    assert(out.count() > 0)
  }
}
