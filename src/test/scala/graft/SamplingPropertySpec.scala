package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.parser.ChParser

/** Property coverage for the SAMPLE pipeline's three load-bearing pieces:
  * the tokenizer's totality (it sees every byte a wire client sends), the
  * clause splitter's scope rules, and the arithmetic guarantees of the
  * sign/overflow-safe sampling hash (the r14→r15 fix: the bare Knuth
  * multiply wrapped Int64 past |k|≈2^33 and sent every negative key to
  * window zero). Each property runs 300+ generated cases.
  */
class SamplingPropertySpec extends AnyFunSuite {

  private def check(prop: Prop, min: Int = 300): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(min), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- tokenizer totality ---------------------------------------------

  test("tokenize is total: arbitrary input returns Left or Right, never " +
    "throws, and every token's pos is within the input") {
    check(Prop.forAll(Gen.asciiStr, Gen.listOf(Gen.oneOf(
      "'", "`", "/*", "*/", "--", "\\", "\n", "SAMPLE", "0.5"))) { (s, frags) =>
      val sql = s + frags.mkString(" ")
      ChParser.tokenize(sql) match {
        case Left(_)     => true
        case Right(toks) => toks.forall(t => t.pos >= 0 && t.pos <= sql.length)
      }
    })
  }

  // ---- splitSample scope rules ----------------------------------------

  private val ident: Gen[String] = for {
    h <- Gen.alphaLowerChar
    t <- Gen.listOfN(6, Gen.oneOf(Gen.alphaLowerChar, Gen.numChar))
    s = (h :: t).mkString
    if !Set("sample", "from", "union", "select", "where", "offset",
      "intersect", "except").contains(s)
  } yield s

  test("splitSample finds exactly the top-level clause: correct table, " +
    "fraction, and offset for generated queries with distractors") {
    val cases = for {
      db    <- Gen.option(ident)
      tbl   <- ident
      frac  <- Gen.oneOf("0.5", "0.25", "0.125", "0.3")
      off   <- Gen.option(Gen.oneOf("0.5", "0.25", "0.75"))
      trail <- Gen.oneOf("", " WHERE x < 5", " ORDER BY y")
      lit   <- Gen.oneOf("", ", 'not a SAMPLE 5 clause' AS c")
    } yield (db, tbl, frac, off, trail, lit)
    check(Prop.forAll(cases) { case (db, tbl, frac, off, trail, lit) =>
      val t = db.map(_ + ".").getOrElse("") + tbl
      val offTxt = off.map(" OFFSET " + _).getOrElse("")
      val sql = s"SELECT a$lit FROM $t SAMPLE $frac$offTxt$trail"
      ChParser.splitSample(sql) match {
        case Some(p) =>
          p.table == tbl && p.db == db && p.num == frac && p.offset == off &&
            // the span covers exactly "<table ref> SAMPLE <f> [OFFSET <o>]"
            sql.substring(p.from, p.to).trim ==
              s"$t SAMPLE $frac$offTxt".trim
        case None => false
      }
    })
  }

  test("splitSample never fires inside strings, subqueries, or set-op " +
    "branches (the silent-wrong-rewrite guard)") {
    val cases = for {
      tbl  <- ident
      kind <- Gen.oneOf("string", "subquery", "union")
    } yield (tbl, kind)
    check(Prop.forAll(cases) { case (tbl, kind) =>
      val sql = kind match {
        case "string"   => s"SELECT 'x SAMPLE 0.5' AS s FROM $tbl"
        case "subquery" => s"SELECT * FROM (SELECT a FROM $tbl SAMPLE 0.5) q"
        case "union"    =>
          s"SELECT a FROM $tbl SAMPLE 0.5 UNION ALL SELECT a FROM $tbl"
      }
      ChParser.splitSample(sql).isEmpty
    })
  }

  // ---- the sampling hash's arithmetic guarantees ----------------------

  /** Exactly the SQL the rewrite emits (GraftSession.rewriteSample) and
    * the DuckDB oracles recompute, as Long arithmetic.
    */
  private def hash(k: Long): Long =
    (((k % 2147483648L) + 2147483648L) % 2147483648L) * 2654435761L %
      4294967296L

  private val anyKey: Gen[Long] = Gen.frequency(
    (3, Gen.choose(Long.MinValue, Long.MaxValue)),
    (1, Gen.oneOf(Long.MinValue, Long.MaxValue, 0L, -1L, 1L,
      1L << 33, -(1L << 33), (1L << 31) - 1, -(1L << 31))))

  test("the hash never wraps Int64 (Long result == BigInt result for the " +
    "FULL signed-64 key domain) and lands in [0, 2^32)") {
    check(Prop.forAll(anyKey) { k =>
      val b = ((((BigInt(k) % 2147483648L) + 2147483648L) % 2147483648L) *
        2654435761L) % 4294967296L
      val h = hash(k)
      h == b.toLong && h >= 0 && h < 4294967296L
    }, min = 2000)
  }

  test("OFFSET windows that tile [0,1] PARTITION the key space: every key " +
    "falls in exactly one window, and prefix windows nest") {
    val grids = Gen.oneOf(
      Seq(0.5, 0.5), Seq(0.25, 0.25, 0.25, 0.25),
      Seq(0.125, 0.375, 0.5), Seq(0.3, 0.3, 0.4))
    check(Prop.forAll(anyKey, grids) { (k, fs) =>
      val bounds = fs.scanLeft(0.0)(_ + _)
      val windows = bounds.zip(bounds.tail).map { case (o, hi2) =>
        (math.floor(o * 4294967296d).toLong,
          math.min(4294967296L, math.floor(hi2 * 4294967296d).toLong))
      }
      val h = hash(k)
      val hits = windows.count { case (lo, hi2) => h >= lo && h < hi2 }
      val nest = hash(k) < math.floor(0.25 * 4294967296d).toLong implies
        (hash(k) < math.floor(0.5 * 4294967296d).toLong)
      hits == 1 && nest
    }, min = 1000)
  }

  private implicit class Implies(private val a: Boolean) {
    def implies(b: => Boolean): Boolean = !a || b
  }
}
