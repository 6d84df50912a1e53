package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions

/** VectorDot must agree between its interpreted and codegen paths, and
  * with the SQL higher-order-function formulation it replaced (same IEEE
  * fold order — this is what keeps the DuckDB oracle hash-identical).
  */
class VectorFunctionsSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("vec_dot equals the HOF left-fold bit-for-bit") {
    VectorFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.1f, -0.2f, 0.3f), Array(-0.4f, 0.5f, 0.6f)),
      (Array.fill(64)(0.123f), Array.fill(64)(-0.456f))
    ).toDF("a", "b")
    df.createOrReplaceTempView("vecs")
    val rows = spark.sql(
      """SELECT vec_dot(a, b) AS native,
        |  aggregate(transform(sequence(1, size(a)),
        |    i -> CAST(element_at(a, i) AS DOUBLE) * CAST(element_at(b, i) AS DOUBLE)),
        |    CAST(0 AS DOUBLE), (acc, x) -> acc + x) AS hof
        |FROM vecs""".stripMargin).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    assert(rows(0).getDouble(0) === 32.0)
  }

  test("vec_dot null propagation and type checking") {
    VectorFunctions.register(spark)
    import spark.implicits._
    Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b").createOrReplaceTempView("vnull")
    val r = spark.sql("SELECT vec_dot(a, b) AS d FROM vnull").collect()(0)
    assert(r.isNullAt(0))
    val err = intercept[Exception] {
      spark.sql("SELECT vec_dot(array(1), array(2))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("vec_dot") ||
      err.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
