package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The winnowing/MOSS fingerprint loop as one codegen'd expression.
  *
  * `winnow_fingerprints(text, k, w)` is semantically IDENTICAL (and
  * spec-asserted equal) to the array-function chain it replaces in l16:
  *
  *   array_distinct(transform(sequence(0, size(h) - w),
  *     i -> array_min(slice(h, i + 1, w))))
  *   where h = transform(char_ngrams(text, k), g -> substr(md5(g), 1, 8))
  *
  * i.e. hash every positional k-gram (first 8 lowercase-hex chars of its
  * md5), take the minimum hash of each sliding window of w, distinct in
  * first-occurrence order. The HOF form pays an interpreted lambda + an
  * md5 expression allocation per position and a slice allocation per
  * window (~2·length(text) interpreted calls per document — the dominant
  * cost of l16); this loop hashes into a reused MessageDigest and
  * compares window bytes in place, the same preference-order-(b) move as
  * [[NGramOps]]. Inputs shorter than k+w-1 code points yield an empty
  * array (the SQL form is only defined there under l16's length guard).
  */
object WinnowOps {
  private val Hex = "0123456789abcdef".getBytes(StandardCharsets.US_ASCII)

  private def cmp(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < 8) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    0
  }

  def winnow(s: UTF8String, k: Int, w: Int): ArrayData = {
    if (k <= 0 || w <= 0) return new GenericArrayData(Array.empty[Any])
    val cps = s.numChars()
    val n = cps - k + 1
    if (n < w) return new GenericArrayData(Array.empty[Any])
    val t = s.toString
    // char index == code-point index (no surrogate pairs) -> fast path;
    // NOT an ASCII test: 'é' passes here and re-encodes through UTF-8
    val noSurrogates = t.length == cps
    val md = java.security.MessageDigest.getInstance("MD5")
    val hashes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val gram =
        if (noSurrogates) t.substring(i, i + k).getBytes(StandardCharsets.UTF_8)
        else s.substring(i, i + k).getBytes
      val dig = md.digest(gram) // digest() resets for the next round
      val hex = new Array[Byte](8)
      var b = 0
      while (b < 4) {
        val v = dig(b) & 0xff
        hex(2 * b) = Hex(v >>> 4)
        hex(2 * b + 1) = Hex(v & 0xf)
        b += 1
      }
      hashes(i) = hex
      i += 1
    }
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var start = 0
    while (start + w <= n) {
      var min = hashes(start)
      var j = 1
      while (j < w) {
        if (cmp(hashes(start + j), min) < 0) min = hashes(start + j)
        j += 1
      }
      seen.add(UTF8String.fromBytes(min))
      start += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  /** POSITIONAL winnowing — the full MOSS record: per sliding window of
    * `w` k-gram hashes, the (position, hash) of the window's minimum
    * (LEFTMOST on ties — the deterministic rule the DuckDB oracle states
    * relationally as `ORDER BY h, pos`), deduplicated by selected
    * position. Unlike [[winnow]] (which keeps only the hash set, enough
    * for l16's census), the positions are what lets a diagonal merge
    * reconstruct shared SPANS — and because selection is content-defined,
    * two documents sharing a region select the same grams at the same
    * region-relative offsets REGARDLESS of the region's displacement,
    * closing l25's stride-alignment gap.
    */
  def winnowSpans(s: UTF8String, k: Int, w: Int): ArrayData = {
    if (k <= 0 || w <= 0) return new GenericArrayData(Array.empty[Any])
    val cps = s.numChars()
    val n = cps - k + 1
    if (n < w) return new GenericArrayData(Array.empty[Any])
    val t = s.toString
    val noSurrogates = t.length == cps
    val md = java.security.MessageDigest.getInstance("MD5")
    val hashes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val gram =
        if (noSurrogates) t.substring(i, i + k).getBytes(StandardCharsets.UTF_8)
        else s.substring(i, i + k).getBytes
      val dig = md.digest(gram)
      val hex = new Array[Byte](8)
      var b = 0
      while (b < 4) {
        val v = dig(b) & 0xff
        hex(2 * b) = Hex(v >>> 4)
        hex(2 * b + 1) = Hex(v & 0xf)
        b += 1
      }
      hashes(i) = hex
      i += 1
    }
    // selected positions are strictly increasing window-to-window, so an
    // append + last-position check is a full dedup
    val rows = new scala.collection.mutable.ArrayBuffer[Any]()
    var lastPos = -1
    var start = 0
    while (start + w <= n) {
      var minPos = start
      var j = 1
      while (j < w) {
        if (cmp(hashes(start + j), hashes(minPos)) < 0) minPos = start + j
        j += 1
      }
      if (minPos != lastPos) {
        rows += org.apache.spark.sql.catalyst.InternalRow(
          minPos, UTF8String.fromBytes(hashes(minPos)))
        lastPos = minPos
      }
      start += 1
    }
    new GenericArrayData(rows.toArray)
  }
}

/** The l31 content-defined-chunking boundary scan as one codegen'd
  * expression with a TRUE rolling hash (Karp-Rabin): the hash of the
  * 8-char window at position i+1 derives from the hash at i in O(1)
  * (drop the leading code point, append the trailing one — modular
  * arithmetic over B=257, M=1e9+7), so the whole scan is one integer
  * pass over the document. Replaces the interpreted `aggregate` fold
  * that paid an md5 + hex-conv + substring allocation PER POSITION
  * (BENCH_r16's 180 s l31 entry; VERDICT r16 next-round #2).
  *
  * Boundary rule (shared verbatim by the DuckDB oracle, which recomputes
  * each window hash as the 8-term polynomial — the l47/d16 cross-engine
  * integer-hash discipline):
  *   - window hash h(i) = sum_{j=0..7} cp(i+j) * 257^(7-j)  mod 1e9+7
  *     over CODE POINTS (substr semantics in both engines);
  *   - position i (1-based) is a CANDIDATE iff i+7 <= len and
  *     h(i) % 64 == 0;
  *   - greedy scan: a chunk boundary opens at the first candidate at
  *     least 32 past the previous boundary, with a forced split at 256;
  *   - starts always begin with 1.
  */
object CdcOps {
  private val M = 1000000007L
  private val B = 257L
  private val P7 = 13163680L // 257^7 mod M

  def starts(s: UTF8String): ArrayData = {
    val cps = s.numChars()
    val t = s.toString
    // char index == code-point index when no surrogate pairs (same fast
    // path as WinnowOps.winnow)
    val cp = new Array[Int](cps)
    if (t.length == cps) {
      var i = 0
      while (i < cps) { cp(i) = t.charAt(i); i += 1 }
    } else {
      var i = 0; var ci = 0
      while (ci < t.length) {
        val c = t.codePointAt(ci)
        cp(i) = c; i += 1; ci += Character.charCount(c)
      }
    }
    val out = scala.collection.mutable.ArrayBuffer[Any](1)
    var h = 0L
    if (cps >= 8) {
      var j = 0
      while (j < 8) { h = (h * B + cp(j)) % M; j += 1 }
    }
    var last = 1
    var i = 1
    while (i <= cps) {
      if (i - last >= 256 ||
          (i + 7 <= cps && h % 64 == 0 && i - last >= 32)) {
        out += i; last = i
      }
      if (i + 7 < cps) { // roll to the window starting at i+1
        h = ((h - cp(i - 1) * P7) % M + M) % M
        h = (h * B + cp(i + 7)) % M
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** winnow_fingerprints(text, k, w) — see [[WinnowOps.winnow]]. */
case class WinnowFingerprints(first: Expression, second: Expression,
                              third: Expression) extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"winnow_fingerprints expects (string, int, int), got ($a, $b, $c)")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(s: Any, k: Any, w: Any): Any =
    WinnowOps.winnow(s.asInstanceOf[UTF8String],
      k.asInstanceOf[Int], w.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, k, w) =>
      s"${ev.value} = graft.functions.WinnowOps.winnow($s, $k, $w);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): WinnowFingerprints =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** winnow_spans(text, k, w) — see [[WinnowOps.winnowSpans]]. */
case class WinnowSpans(first: Expression, second: Expression,
                       third: Expression) extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"winnow_spans expects (string, int, int), got ($a, $b, $c)")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("fp", StringType, nullable = false))), containsNull = false)

  override def nullSafeEval(s: Any, k: Any, w: Any): Any =
    WinnowOps.winnowSpans(s.asInstanceOf[UTF8String],
      k.asInstanceOf[Int], w.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, k, w) =>
      s"${ev.value} = graft.functions.WinnowOps.winnowSpans($s, $k, $w);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): WinnowSpans =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** cdc_starts(text) — see [[CdcOps.starts]]. */
case class CdcStarts(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_starts expects a string, got $other")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(s: Any): Any =
    CdcOps.starts(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.CdcOps.starts($s);")

  override protected def withNewChildInternal(
      newChild: Expression): CdcStarts = copy(child = newChild)
}

object WinnowFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cdc_starts",
      { case Seq(s) => CdcStarts(s)
        case e => throw new IllegalArgumentException(
          s"cdc_starts expects 1 argument, got ${e.length}") },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_fingerprints",
      { case Seq(s, k, w) => WinnowFingerprints(s, k, w)
        case e => throw new IllegalArgumentException(
          s"winnow_fingerprints expects 3 arguments, got ${e.length}") },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_spans",
      { case Seq(s, k, w) => WinnowSpans(s, k, w)
        case e => throw new IllegalArgumentException(
          s"winnow_spans expects 3 arguments, got ${e.length}") },
      "built-in")
  }
}
