package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.exec.GraftSession

/** `Nested(a T, b U)` columns — CH's named family of parallel arrays
  * (VERDICT r17 task #2). Storage flattens to `n.a Array(T)` / `n.b
  * Array(U)` (CH flatten_nested=1, the default); DESC shows the flattened
  * members while SHOW CREATE keeps the Nested clause; inserts enforce
  * equal lengths within a family per row; `ARRAY JOIN n` zips the family;
  * plain `n.a` references resolve to the flattened column. Not in the
  * reference (crates/lang/src/bql.pest:359-391 has no array types) — the
  * most common remaining CH DDL idiom per VERDICT r17.
  */
class NestedSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private lazy val g = new GraftSession(spark)

  private def mk(): Unit = {
    g.sql("DROP TABLE IF EXISTS nst_t")
    g.sql("CREATE TABLE nst_t(id Int64, " +
      "n Nested(k String, v Int64)) ENGINE=MergeTree ORDER BY id")
  }

  test("DESC shows the flattened Array members; SHOW CREATE keeps Nested") {
    mk()
    val desc = g.sql("DESC nst_t").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(desc.contains(("n.k", "Array(String)")))
    assert(desc.contains(("n.v", "Array(Int64)")))
    assert(!desc.exists(_._1 == "n"))
    val sc = g.sql("SHOW CREATE TABLE nst_t").collect()(0).getString(0)
    assert(sc.contains("Nested(k String, v Int64)"))
  }

  test("equal-length enforcement: ragged family rows abort the INSERT") {
    mk()
    g.sql("INSERT INTO nst_t VALUES (1, ['a','b'], [10,20])")
    val e = intercept[Exception] {
      g.sql("INSERT INTO nst_t VALUES (2, ['a','b','c'], [1])")
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " " + msgs(t.getCause)
    assert(msgs(e).contains("CHECK constraint"))
    assert(g.sql("SELECT count() AS n FROM nst_t")
      .collect()(0).getLong(0) === 1L)
  }

  test("plain `n.k` references resolve to the flattened column") {
    mk()
    g.sql("INSERT INTO nst_t VALUES (1, ['a','b'], [10,20]), (2, ['c'], [7])")
    val r = g.sql("SELECT id, size(n.k) AS sz, n.v[0] AS first " +
      "FROM nst_t ORDER BY id").collect()
    assert(r.map(x => (x.getLong(0), x.getInt(1), x.getLong(2))).toSeq ===
      Seq((1L, 2, 10L), (2L, 1, 7L)))
  }

  test("ARRAY JOIN n zips the whole family (CH nested interplay)") {
    mk()
    g.sql("INSERT INTO nst_t VALUES (1, ['a','b'], [10,20]), (2, ['c'], [7])")
    val r = g.sql("SELECT id, n.k AS k, n.v AS v FROM nst_t ARRAY JOIN n " +
      "ORDER BY id, k").collect()
    assert(r.map(x => (x.getLong(0), x.getString(1), x.getLong(2))).toSeq ===
      Seq((1L, "a", 10L), (1L, "b", 20L), (2L, "c", 7L)))
  }

  test("explicit member item still works: ARRAY JOIN n.k AS kk") {
    mk()
    g.sql("INSERT INTO nst_t VALUES (1, ['a','b'], [10,20])")
    val r = g.sql("SELECT id, kk FROM nst_t ARRAY JOIN n.k AS kk " +
      "ORDER BY kk").collect()
    assert(r.map(x => (x.getLong(0), x.getString(1))).toSeq ===
      Seq((1L, "a"), (1L, "b")))
  }

  test("INSERT with dotted column list routes members by name") {
    mk()
    g.sql("INSERT INTO nst_t (id, n.v, n.k) VALUES (9, [1,2], ['x','y'])")
    val r = g.sql("SELECT n.k[0] AS k0, n.v[0] AS v0 FROM nst_t").collect()(0)
    assert((r.getString(0), r.getLong(1)) === ("x", 1L))
  }

  test("normalized-script replay keeps the family: TRUNCATE then reuse") {
    mk()
    g.sql("INSERT INTO nst_t VALUES (1, ['a'], [10])")
    g.sql("TRUNCATE TABLE nst_t")
    // replayed table still has flattened members + family metadata
    g.sql("INSERT INTO nst_t VALUES (2, ['z','w'], [5,6])")
    val r = g.sql("SELECT id, n.k AS k FROM nst_t ARRAY JOIN n ORDER BY k")
      .collect()
    assert(r.map(x => (x.getLong(0), x.getString(1))).toSeq ===
      Seq((2L, "w"), (2L, "z")))
    // and raggedness is still rejected post-replay
    intercept[Exception] {
      g.sql("INSERT INTO nst_t VALUES (3, ['only'], [1,2,3])")
    }
  }

  test("ALTER ADD COLUMN n.c extends the family; DROP COLUMN shrinks or " +
    "removes it (CH's nested lifecycle)") {
    mk()
    g.sql("INSERT INTO nst_t VALUES (1, ['a','b'], [10,20])")
    // extend: new member joins the family AND the equal-length check
    g.sql("ALTER TABLE nst_t ADD COLUMN n.w Array(Float64)")
    val desc = g.sql("DESC nst_t").collect().map(_.getString(0)).toSeq
    assert(desc.contains("n.w"))
    val sc = g.sql("SHOW CREATE TABLE nst_t").collect()(0).getString(0)
    assert(sc.contains("Nested(k String, v Int64, w Float64)"), sc)
    intercept[Exception] { // ragged against the NEW member
      g.sql("INSERT INTO nst_t VALUES (2, ['x'], [1], [0.5, 0.6])")
    }
    g.sql("INSERT INTO nst_t VALUES (2, ['x'], [1], [0.5])")
    val zipped = g.sql("SELECT id, n.k AS k, n.w AS w FROM nst_t " +
      "ARRAY JOIN n WHERE id = 2").collect()
    assert(zipped.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((2L, "x")))
    // a dotted add with no family, or a non-Array type, is rejected
    intercept[Exception] {
      g.sql("ALTER TABLE nst_t ADD COLUMN zz.q Array(Int64)") }
    intercept[Exception] {
      g.sql("ALTER TABLE nst_t ADD COLUMN n.bad Int64") }
    // drop one member: family shrinks, check regenerates over the rest
    g.sql("ALTER TABLE nst_t DROP COLUMN n.w")
    intercept[Exception] { // k/v raggedness still enforced
      g.sql("INSERT INTO nst_t VALUES (3, ['y','z'], [7])")
    }
    g.sql("INSERT INTO nst_t VALUES (3, ['y'], [7])")
    // drop the whole family by its name
    g.sql("ALTER TABLE nst_t DROP COLUMN n")
    val after = g.sql("DESC nst_t").collect().map(_.getString(0)).toSeq
    assert(after === Seq("id"))
    g.sql("INSERT INTO nst_t VALUES (4)")
    assert(g.sql("SELECT count() AS c FROM nst_t")
      .collect()(0).getLong(0) === 4L)
  }

  test("Nested rejected outside top level and in ALTER ADD COLUMN") {
    intercept[Exception] {
      g.sql("DROP TABLE IF EXISTS nst_bad; " +
        "CREATE TABLE nst_bad(x Array(Nested(a Int64)))")
    }
    mk()
    intercept[Exception] {
      g.sql("ALTER TABLE nst_t ADD COLUMN m Nested(a Int64)")
    }
  }
}
