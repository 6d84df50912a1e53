package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The 64-bit simhash fingerprint as one codegen'd expression.
  *
  * `simhash64_bands(text)` returns the four 16-bit band values of the
  * document's 64-bit simhash — semantically IDENTICAL (spec-asserted
  * equal) to the l11b SQL pipeline it replaces:
  *
  *   tokens = split(text, ' ')          -- empties included, like explode
  *   per token: md5 hex nibbles 1..16; bit b votes +1 if nibble(1 + b/4)
  *   has bit (b%4) set, else -1; fingerprint bit b = (vote sum > 0);
  *   band j = bits 16j..16j+15, little-endian within the band.
  *
  * What it saves — stated precisely, because partial aggregation already
  * kept the OLD form's shuffle small (one combined row per doc, tokens
  * never crossed the wire): the explode+aggregate materializes every
  * token as a row and pushes it through the hash-agg machinery with 64
  * sum slots, per token. This expression folds the whole vote loop into
  * the scan (reused MessageDigest, one int[64] of votes per document),
  * removing the per-token row + agg-map work entirely — measured 2.0×
  * at sf0.1 (PERF.md r7), and the win GROWS with fingerprint width
  * (parity at 4 minhash slots, 1.5× at 8, 2× at 64), which is exactly
  * the production direction. Same preference-order-(b) move as
  * [[WinnowOps]].
  */
object SimhashOps {
  def bands(s: UTF8String): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val votes = new Array[Int](64)
    // Java's split(regex, -1) keeps trailing empties — same token stream
    // as Spark SQL's split(text, ' ') that the oracle pipeline explodes
    val toks = s.toString.split(" ", -1)
    var t = 0
    while (t < toks.length) {
      val dig = md.digest(toks(t).getBytes(StandardCharsets.UTF_8))
      var b = 0
      while (b < 64) {
        val nibIdx = b >>> 2 // hex-string nibble 0..15: byte nibIdx/2, high first
        val byte = dig(nibIdx >>> 1) & 0xff
        val nib = if ((nibIdx & 1) == 0) byte >>> 4 else byte & 0xf
        votes(b) += (if (((nib >>> (b & 3)) & 1) != 0) 1 else -1)
        b += 1
      }
      t += 1
    }
    val out = new Array[Any](4)
    var j = 0
    while (j < 4) {
      var v = 0
      var bit = 0
      while (bit < 16) {
        if (votes(16 * j + bit) > 0) v |= 1 << bit
        bit += 1
      }
      out(j) = v
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** simhash64_bands(text) — see [[SimhashOps.bands]]. */
case class Simhash64Bands(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"simhash64_bands expects string, got $t")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(s: Any): Any =
    SimhashOps.bands(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.SimhashOps.bands($s);")

  override protected def withNewChildInternal(
      newChild: Expression): Simhash64Bands = copy(child = newChild)
}

object SimhashFunctions {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64_bands",
      { case Seq(s) => Simhash64Bands(s)
        case e => throw new IllegalArgumentException(
          s"simhash64_bands expects 1 argument, got ${e.length}") },
      "built-in")
}
