package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** N-gram extraction for the dedup / language-ID hot loops.
  *
  * The HOF form — `transform(sequence(1, length(text)-2), i -> substr(...))`
  * — evaluates its lambda INTERPRETED per element (higher-order functions
  * sit outside whole-stage codegen), which made gram extraction the
  * dominant cost of l02/l08/l13/l14 (measured: ~2.7 s of l13's 4 s at
  * sf0.1 was the gram build alone). These expressions keep the loop in
  * compiled code (preference order (b) of the build brief, like
  * [[VectorDot]]): codegen emits one static call per row into
  * [[NGramOps]]'s tight loop.
  *
  * Semantics are IDENTICAL to the HOF forms they replace (and to the
  * DuckDB oracle):
  *  - `char_ngrams(s, n)`  ≡ `transform(sequence(1, length(s)-n+1), i -> substr(s, i, n))`
  *  - `word_ngrams(s, n)`  ≡ `transform(sequence(0, size(split(s,' '))-n),
  *                              i -> array_join(slice(split(s,' '), i+1, n), ' '))`
  *    (split on a literal single space, trailing empties kept, exactly
  *    Spark's `split` with limit -1).
  */
object NGramOps {

  def charNGrams(s: UTF8String, n: Int): ArrayData = {
    // UTF8String.substring seeks code points from the byte start, so a
    // substring-per-position loop is O(len²) per document. Decode once and
    // index chars directly; when surrogate pairs make UTF-16 length differ
    // from the code-point count, fall back to the exact code-point walk
    // (substr SQL semantics are code-point based).
    val t = s.toString
    if (t.length == s.numChars()) {
      val count = t.length - n + 1
      if (n <= 0 || count <= 0) return new GenericArrayData(Array.empty[Any])
      val out = new Array[Any](count)
      var i = 0
      while (i < count) {
        out(i) = UTF8String.fromString(t.substring(i, i + n))
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val count = s.numChars() - n + 1
      if (n <= 0 || count <= 0) return new GenericArrayData(Array.empty[Any])
      val out = new Array[Any](count)
      var i = 0
      while (i < count) {
        out(i) = s.substring(i, i + n)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  def wordNGrams(s: UTF8String, n: Int): ArrayData = {
    val toks = s.toString.split(" ", -1)
    val count = toks.length - n + 1
    if (n <= 0 || count <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

abstract class NGramExpression extends BinaryExpression {
  def fnName: String

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$fnName expects (string, int), got ($l, $r)")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(s: Any, n: Any): Any =
    compute(s.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  protected def compute(s: UTF8String, n: Int): ArrayData

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, n) =>
      s"${ev.value} = graft.functions.NGramOps.${javaMethod}($s, $n);")

  protected def javaMethod: String
}

/** Overlapping character n-grams of a string. */
case class CharNGrams(left: Expression, right: Expression) extends NGramExpression {
  val fnName = "char_ngrams"
  protected val javaMethod = "charNGrams"
  protected def compute(s: UTF8String, n: Int): ArrayData = NGramOps.charNGrams(s, n)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharNGrams =
    copy(left = newLeft, right = newRight)
}

/** Overlapping token n-grams (single-space tokenization, space-joined). */
case class WordNGrams(left: Expression, right: Expression) extends NGramExpression {
  val fnName = "word_ngrams"
  protected val javaMethod = "wordNGrams"
  protected def compute(s: UTF8String, n: Int): ArrayData = NGramOps.wordNGrams(s, n)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordNGrams =
    copy(left = newLeft, right = newRight)
}

/** The minhash signature loop as one codegen'd expression.
  *
  * `minhash_sigs(text, n, nHashes)` ≡ the l02 pipeline's
  *   `min(substr(md5(concat(s, '#i')), 1, 8))` per i over the exploded
  * `word_ngrams(text, n)` shingles — but computed inside the scan with a
  * reused MessageDigest, so NO shingle row ever exists: the SQL form
  * explodes every shingle and shuffles them all into the min-aggregation,
  * which at 100 TB is a full shuffle of the shingled corpus. Minima
  * compare byte-wise, identical to UTF8String/lexicographic order on the
  * ASCII hex prefixes.
  */
object MinhashOps {
  private val Hex = "0123456789abcdef".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  def sigs(s: UTF8String, n: Int, nHashes: Int): ArrayData = {
    val toks = s.toString.split(" ", -1)
    val count = toks.length - n + 1
    if (n <= 0 || nHashes <= 0 || count <= 0)
      return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val mins = new Array[Array[Byte]](nHashes)
    var i = 0
    while (i < count) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      val gramLen = sb.length
      var h = 0
      while (h < nHashes) {
        sb.setLength(gramLen)
        sb.append('#').append(h)
        val dig = md.digest(
          sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val hex = new Array[Byte](8)
        var b = 0
        while (b < 4) {
          val v = dig(b) & 0xff
          hex(2 * b) = Hex(v >>> 4)
          hex(2 * b + 1) = Hex(v & 0xf)
          b += 1
        }
        if (mins(h) == null || cmp(hex, mins(h)) < 0) mins(h) = hex
        h += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(UTF8String.fromBytes(_): Any))
  }

  private def cmp(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < 8) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    0
  }
}

/** The Gopher-repetition statistics as one codegen'd expression.
  *
  * `ngram_rep_stats(text, n)` ≡ the l18 pipeline's
  *   `max(c), sum(c)` over `GROUP BY doc_id, g` of the exploded
  * `word_ngrams(text, n)` — i.e. (multiplicity of the most repeated
  * n-gram, total n-gram occurrences) — computed per document with a
  * local hash map: O(grams) time and O(distinct grams) space per doc,
  * which is the complexity the old in-code note wished for but believed
  * impossible (the HOF alternative it correctly rejected was
  * O(n·distinct); a hash map is not). Removes BOTH the (doc, gram)
  * aggregation shuffle and the base⋈topbg join from l18's plan — the
  * only exchange left is the tiny per-source rollup.
  */
object RepStatsOps {
  def stats(s: UTF8String, n: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = s.toString.split(" ", -1)
    val count = toks.length - n + 1
    if (n <= 0 || count <= 0)
      return org.apache.spark.sql.catalyst.InternalRow(0L, 0L)
    val m = new java.util.HashMap[String, Int](math.min(count, 1 << 16))
    var top = 0
    var i = 0
    while (i < count) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      val c = m.merge(sb.toString, 1, (a, b) => a + b)
      if (c > top) top = c
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(top.toLong, count.toLong)
  }
}

/** ngram_rep_stats(text, n) — see [[RepStatsOps.stats]]. */
case class NGramRepStats(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"ngram_rep_stats expects (string, int), got ($l, $r)")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("top_c", LongType, nullable = false),
    StructField("n_bg", LongType, nullable = false)))

  override def nullSafeEval(s: Any, n: Any): Any =
    RepStatsOps.stats(s.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, n) =>
      s"${ev.value} = graft.functions.RepStatsOps.stats($s, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NGramRepStats =
    copy(left = newLeft, right = newRight)
}

/** minhash_sigs(text, n, nHashes) — see [[MinhashOps.sigs]]. */
case class MinhashSigs(first: Expression, second: Expression,
                       third: Expression) extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"minhash_sigs expects (string, int, int), got ($a, $b, $c)")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(s: Any, n: Any, k: Any): Any =
    MinhashOps.sigs(s.asInstanceOf[UTF8String],
      n.asInstanceOf[Int], k.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, n, k) =>
      s"${ev.value} = graft.functions.MinhashOps.sigs($s, $n, $k);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): MinhashSigs =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object NGramFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_ngrams",
      { case Seq(s, n) => CharNGrams(s, n)
        case e => throw new IllegalArgumentException(
          s"char_ngrams expects 2 arguments, got ${e.length}") },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_ngrams",
      { case Seq(s, n) => WordNGrams(s, n)
        case e => throw new IllegalArgumentException(
          s"word_ngrams expects 2 arguments, got ${e.length}") },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ngram_rep_stats",
      { case Seq(s, n) => NGramRepStats(s, n)
        case e => throw new IllegalArgumentException(
          s"ngram_rep_stats expects 2 arguments, got ${e.length}") },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sigs",
      { case Seq(s, n, k) => MinhashSigs(s, n, k)
        case e => throw new IllegalArgumentException(
          s"minhash_sigs expects 3 arguments, got ${e.length}") },
      "built-in")
  }
}
