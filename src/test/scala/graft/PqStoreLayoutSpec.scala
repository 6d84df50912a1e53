package graft

import org.scalatest.funsuite.AnyFunSuite

/** The persisted PQ/IVF index stores are written PARTITIONED (multiple
  * part files, vec_id-hash distributed) — the 100 TB fact-table layout
  * VERDICT r15 #5 asked for — while serving stays a map-side scan over
  * the multi-file store (exchange budgets pinned by PlanAuditSpec).
  */
class PqStoreLayoutSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  private def partFiles(glob: String): Seq[java.io.File] = {
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    tmp.listFiles().filter(_.getName.startsWith(glob)).toSeq
      .flatMap(_.listFiles().filter(_.getName.startsWith("part-")))
  }

  test("pq codes store is multi-file; the codebook stays single-file") {
    val served = SparkEntry.queries("l26b_ann_pq_served")(spark, sf)
    assert(served.count() > 0)
    val codes = partFiles("graft-pq-codes-v3-")
    assert(codes.length > 1,
      s"codes store must be a partitioned fact-table write, got " +
        s"${codes.length} part files")
    val codebook = partFiles("graft-pq-codebook-v3-")
    assert(codebook.length === 1, "the 16-row codebook is a dimension")
  }

  test("ivfpq composite store is multi-file and l34 still serves from it") {
    val served = SparkEntry.queries("l34_ann_ivfpq_served")(spark, sf)
    assert(served.count() > 0)
    assert(partFiles("graft-pq-ivfpq-v3-").length > 1)
  }
}
