package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.exec.GraftSession
import graft.types.BqlType

/** Round-16 fixes for the ADVICE r15 findings: engine-arg/sample-by/check
  * column-DDL guards (#2), dictGet's present-with-NULL vs missing-key
  * distinction (#3), Enum width validation + numeric insert mapping (#4),
  * and the context-sensitive GLOBAL strip (#5). (#1, the FINAL loud-error
  * contract, lives in ReplacingSpec.)
  */
class AdviceFixesSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private lazy val g = new GraftSession(spark)

  test("column DDL on an engine-argument or SAMPLE BY column is rejected; " +
    "so is a column referenced by a CHECK constraint") {
    g.sql("DROP TABLE IF EXISTS af_col")
    g.sql("CREATE TABLE af_col(k Int64, sign Int8, v Int64, s Int64, " +
      "c Int64, CONSTRAINT pos CHECK c >= 0) " +
      "ENGINE=CollapsingMergeTree(sign) ORDER BY k SAMPLE BY s")
    val e1 = intercept[Exception] {
      g.sql("ALTER TABLE af_col DROP COLUMN sign") }
    assert(e1.getMessage.contains("engine argument"))
    val e2 = intercept[Exception] {
      g.sql("ALTER TABLE af_col RENAME COLUMN sign TO sgn") }
    assert(e2.getMessage.contains("engine argument"))
    val e3 = intercept[Exception] {
      g.sql("ALTER TABLE af_col MODIFY COLUMN s String") }
    assert(e3.getMessage.contains("SAMPLE BY"))
    val e4 = intercept[Exception] {
      g.sql("ALTER TABLE af_col DROP COLUMN c") }
    assert(e4.getMessage.contains("CHECK constraint"))
    // a plain payload column still alters fine
    g.sql("ALTER TABLE af_col RENAME COLUMN v TO v2")
    g.sql("DROP TABLE af_col")
  }

  test("dictGet: a key PRESENT with a stored NULL attribute returns NULL, " +
    "not the DEFAULT; a MISSING key still returns the default/type-zero") {
    g.sql("DROP DICTIONARY IF EXISTS af_dict")
    g.sql("DROP TABLE IF EXISTS af_src")
    g.sql("CREATE TABLE af_src(k Int64, v Nullable(Int64), s Nullable(String))")
    g.sql("INSERT INTO af_src VALUES (1, 10, 'a'), (2, NULL, NULL)")
    g.sql("CREATE DICTIONARY af_dict(k Int64, v Nullable(Int64), " +
      "s Nullable(String)) PRIMARY KEY k " +
      "SOURCE(CLICKHOUSE(TABLE 'af_src')) LAYOUT(FLAT()) LIFETIME(0)")
    val rows = g.sql("SELECT x, dictGet('af_dict', 'v', x) AS v, " +
      "dictGet('af_dict', 's', x) AS s, dictHas('af_dict', x) AS h " +
      "FROM (SELECT explode(array(1, 2, 3)) AS x) ORDER BY x").collect()
    // present non-null
    assert(rows(0).getLong(1) === 10L && rows(0).getString(2) === "a")
    // present with stored NULL -> NULL (previously the type-zero default)
    assert(rows(1).isNullAt(1), "stored NULL must surface as NULL")
    assert(rows(1).isNullAt(2), "stored NULL must surface as NULL")
    assert(rows(1).getBoolean(3) === true, "key 2 IS present")
    // missing key -> type-zero default
    assert(rows(2).getLong(1) === 0L && rows(2).getString(2) === "")
    assert(rows(2).getBoolean(3) === false)
    g.sql("DROP DICTIONARY af_dict")
    g.sql("DROP TABLE af_src")
  }

  test("Enum values are width-checked at parse; numeric INSERT literals " +
    "map to their declared name; unknown values abort") {
    assert(BqlType.parse("Enum8('a' = 1, 'b' = 200)").isLeft,
      "200 exceeds Enum8's -128..127")
    assert(BqlType.parse("Enum16('a' = 40000)").isLeft)
    assert(BqlType.parse("Enum8('a' = 99999999999999999999)").isLeft,
      "an overflowing literal must be a parse error, not a wrapped Int")
    assert(BqlType.parse("Enum8('a' = 1, 'b' = 1)").isLeft, "dup value")
    assert(BqlType.parse("Enum8('a' = -128, 'b' = 127)").isRight)

    g.sql("DROP TABLE IF EXISTS af_enum")
    g.sql("CREATE TABLE af_enum(id Int64, e Enum8('low' = 1, 'high' = 2))")
    g.sql("INSERT INTO af_enum VALUES (1, 'low'), (2, 2), (3, 1)")
    val got = g.sql("SELECT id, e FROM af_enum ORDER BY id").collect()
      .map(_.getString(1)).toSeq
    assert(got === Seq("low", "high", "low"),
      "numeric enum literals must map through the declared value->name table")
    intercept[Exception] { g.sql("INSERT INTO af_enum VALUES (4, 3)") }
    intercept[Exception] { g.sql("INSERT INTO af_enum VALUES (5, 'nope')") }
    assert(g.sql("SELECT count() AS n FROM af_enum").collect()(0)
      .getLong(0) === 3L)
    g.sql("DROP TABLE af_enum")
  }

  test("a column actually named `global` survives: the GLOBAL strip only " +
    "fires in modifier position") {
    g.sql("DROP TABLE IF EXISTS af_glob")
    g.sql("CREATE TABLE af_glob(global Int64, k Int64)")
    g.sql("INSERT INTO af_glob VALUES (1, 10), (2, 20), (5, 50)")
    // clause-keyword context: `global` is the column
    assert(g.sql("SELECT count() AS n FROM af_glob WHERE global IN (1, 2)")
      .collect()(0).getLong(0) === 2L)
    assert(g.sql("SELECT count() AS n FROM af_glob WHERE k = 10 " +
      "AND global IN (1)").collect()(0).getLong(0) === 1L)
    // modifier context: `k GLOBAL IN` still strips to plain IN
    assert(g.sql("SELECT count() AS n FROM af_glob WHERE k GLOBAL IN " +
      "(SELECT k FROM af_glob WHERE global = 5)").collect()(0)
      .getLong(0) === 1L)
    g.sql("DROP TABLE af_glob")
  }
}
