package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MultimodalOps
import graft.operators.MultimodalOps.{Blob, MediaMeta}

/** The multimodal decode is a REAL codec round-trip (javax.imageio): these
  * tests prove the decode parses actual PNG containers, not payload bytes.
  */
class MultimodalOpsSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("encode/decode round-trips true pixel dimensions") {
    val metas = MultimodalOps.decodePartition(
      MultimodalOps.encodePartition(Iterator((1L, 7, 13), (2L, 256, 1)))).toSeq
    assert(metas === Seq(MediaMeta(1L, 7, 13, 91), MediaMeta(2L, 256, 1, 256)))
  }

  test("payloads are PNG containers, not raw dimension bytes") {
    val blob = MultimodalOps.encodePartition(Iterator((9L, 40, 30))).next()
    val magic = Array(0x89, 'P', 'N', 'G').map(_.toByte)
    assert(blob.payload.take(4).sameElements(magic))
    // the decoder reads the container, so corrupting it must fail loudly
    val corrupt = Blob(9L, blob.payload.map(b => (b ^ 0x5a).toByte))
    intercept[Exception] {
      MultimodalOps.decodePartition(Iterator(corrupt)).toSeq
    }
  }

  test("decodeDocuments recovers the content-hash-derived dimensions") {
    import spark.implicits._
    val docs = Seq((1L, "hello world"), (2L, "spark native engine"))
      .toDF("doc_id", "text")
    val got = MultimodalOps.decodeDocuments(spark, docs)
      .collect().sortBy(_.doc_id)
    // recompute the expected dims from the same md5-nibble arithmetic
    val exp = docs.selectExpr("doc_id",
      "((instr('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16 + instr('0123456789abcdef', substr(md5(text), 2, 1)) - 1) % 64 + 1 AS w",
      "((instr('0123456789abcdef', substr(md5(text), 3, 1)) - 1) * 16 + instr('0123456789abcdef', substr(md5(text), 4, 1)) - 1) % 64 + 1 AS h")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sortBy(_._1)
    got.zip(exp).foreach { case (m, (id, w, h)) =>
      assert(m.doc_id === id)
      assert(m.width === w && m.height === h && m.n_pixels === w * h)
    }
  }
}
