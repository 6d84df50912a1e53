package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.AvroFiles

/** The from-scratch Avro container codec (graft.sources.AvroFiles) + DSV2
  * reader (graftavro): every Spark type the engine's tables use must
  * round-trip bit-for-bit through write → read, under both codecs, and the
  * reader must prune columns inside the binary decoder.
  */
class AvroSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val dir = "/root/repo/target/avro-spec"

  private val schema = StructType(Seq(
    StructField("i", IntegerType, nullable = true),
    StructField("l", LongType, nullable = false),
    StructField("f", FloatType, nullable = true),
    StructField("d", DoubleType, nullable = true),
    StructField("b", BooleanType, nullable = true),
    StructField("s", StringType, nullable = true),
    StructField("bin", BinaryType, nullable = true),
    StructField("dt", DateType, nullable = true),
    StructField("ts", TimestampType, nullable = true),
    StructField("dec", DecimalType(12, 2), nullable = true),
    StructField("arr", ArrayType(FloatType, containsNull = false), nullable = true)
  ))

  private val rows = Seq(
    Row(1, 10L, 1.5f, 2.25, true, "hello", Array[Byte](1, 2, 3),
      Date.valueOf("2024-02-29"), Timestamp.valueOf("2024-02-29 12:34:56.789"),
      BigDecimal("12345.67").underlying, Seq(1.0f, -2.5f, 3.25f)),
    Row(null, -3L, null, null, null, null, null, null, null, null, null),
    Row(-2147483648, 9223372036854775807L, Float.MinPositiveValue, -0.0, false,
      "unicode éè 中文", Array.empty[Byte], Date.valueOf("1969-12-31"),
      Timestamp.valueOf("1969-12-31 23:59:59.999"),
      BigDecimal("-9999999999.99").underlying, Seq.empty[Float]),
    Row(42, 0L, -1.25f, 1e300, true, "", Array[Byte](-128, 127),
      Date.valueOf("2000-01-01"), Timestamp.valueOf("2000-01-01 00:00:00"),
      BigDecimal("0.01").underlying, Seq(Float.NaN, Float.PositiveInfinity))
  )

  private def sorted(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    // byte[] compares by reference in Row.toString — render it as hex
    val cols = df.schema.fields.map {
      case f if f.dataType == BinaryType => hex(col(f.name)).as(f.name)
      case f => col(f.name)
    }
    df.select(cols.toIndexedSeq: _*).collect().map(_.toString).sorted.toSeq
  }

  for (codec <- Seq("null", "deflate"))
    test(s"all-types round-trip, codec=$codec") {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), schema)
      AvroFiles.write(df, s"$dir/$codec", codec = codec)
      val back = spark.read.format("graftavro").load(s"$dir/$codec")
      assert(back.schema.map(f => (f.name, f.dataType)) ===
        schema.map(f => (f.name, f.dataType)))
      assert(sorted(back) === sorted(df))
    }

  test("column pruning reaches the scan and skips decode of other fields") {
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    AvroFiles.write(df, s"$dir/prune", codec = "deflate")
    val q = spark.read.format("graftavro").load(s"$dir/prune").select("s", "l")
    val plan = q.queryExecution.executedPlan.toString
    // the DSV2 scan description carries the pruned column list (in writer
    // file order), and none of the other 9 columns reach the scan
    assert(plan.contains("cols=[l,s]"), s"pruned columns not visible in plan:\n$plan")
    assert(sorted(q) === sorted(df.select("s", "l")))
  }

  test("multi-block files stream block by block") {
    val df = spark.range(0, 10000, 1, 1)
      .select(col("id"), concat(lit("row-"), col("id")).as("name"))
    AvroFiles.write(df, s"$dir/blocks", codec = "deflate", rowsPerBlock = 256)
    val back = spark.read.format("graftavro").load(s"$dir/blocks")
    assert(back.count() === 10000)
    assert(back.agg(sum("id")).collect()(0).getLong(0) === 49995000L)
  }

  test("one InputPartition per file (distributed read)") {
    val df = spark.range(0, 64, 1, 4).toDF("id")
    AvroFiles.write(df, s"$dir/parts", codec = "null")
    val back = spark.read.format("graftavro").load(s"$dir/parts")
    assert(back.rdd.getNumPartitions === 4)
    assert(back.agg(sum("id")).collect()(0).getLong(0) === 2016L)
  }

  test("DSV2 write path: df.write.format(graftavro) round-trips") {
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    df.write.format("graftavro").mode("overwrite").save(s"$dir/v2write")
    val back = spark.read.format("graftavro").load(s"$dir/v2write")
    assert(sorted(back) === sorted(df))
    // overwrite truncates: a second write must not accumulate files
    df.write.format("graftavro").mode("overwrite").save(s"$dir/v2write")
    assert(spark.read.format("graftavro").load(s"$dir/v2write").count() === rows.size)
    // no in-progress temp files left behind
    val leftovers = new java.io.File(s"$dir/v2write").listFiles()
      .filter(_.getName.endsWith(".inprogress"))
    assert(leftovers.isEmpty)
  }

  test("c03 avro scan equals the same aggregate over the source parquet") {
    val sfDir = "/root/testdata/sf0.001"
    val avro = SparkEntry.queries("c03_avro_scan")(spark, sfDir)
    val direct = Tables(spark, sfDir, "customer")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"), max(col("c_name")).as("max_name"),
        round(sum(col("c_acctbal").cast("decimal(12,2)")), 2).cast("double").as("total_bal"))
      .orderBy(col("c_nationkey"))
    assert(avro.collect().map(_.toString).toSeq ===
      direct.collect().map(_.toString).toSeq)
  }
}
