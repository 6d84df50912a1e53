package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

/** User-defined aggregate surface — SURVEY.md §2.8. The reference exposes
  * `create_udaf` (crates/datafusion/src/physical_plan/udaf.rs) though its
  * server registers none; the Spark-native shape is a typed [[Aggregator]]
  * registered through `functions.udaf`, which Catalyst executes with the
  * same partial/final split as a built-in (map-side combine included — the
  * 100 TB posture comes free).
  */
object GraftUdafs {

  /** Sum of squares. Exact over integer-valued doubles (the testdata's
    * quantity domain): every square and partial sum stays an integer below
    * 2^53, so merge order cannot change the result.
    */
  val sumSq: Aggregator[Double, Double, Double] =
    new Aggregator[Double, Double, Double] {
      override def zero: Double = 0.0
      override def reduce(b: Double, a: Double): Double = b + a * a
      override def merge(b1: Double, b2: Double): Double = b1 + b2
      override def finish(r: Double): Double = r
      override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Scalar UDF example (udf.rs analog): decade bucket of a money value.
    * floor(x/10) is exact IEEE, so cross-engine safe.
    */
  val decadeBucket: Double => Int = x => math.floor(x / 10.0).toInt

  def register(spark: SparkSession): Unit = {
    spark.udf.register("graft_sumsq", functions.udaf(sumSq))
    spark.udf.register("graft_decade", functions.udf(decadeBucket))
  }
}
