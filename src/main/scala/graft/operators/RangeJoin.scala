package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval × point range join — another operator family absent from the
  * reference (its DataFusion-6 fork has no range/interval join; a raw
  * `t BETWEEN start AND end` join predicate there would plan as a nested
  * cross product). Matches every point row to every interval row whose
  * `[start, end)` window contains the point's timestamp.
  *
  * Spark-first shape: time-binning turns the inequality join into an
  * equi-join. Intervals explode to the (few) fixed-width bins they overlap
  * (`sequence` over bin ids — map-side, bounded by interval/bin ratio);
  * each point maps to exactly ONE bin; the equi-join on bin id shuffles
  * both sides once and meets each true pair in exactly one bucket (the
  * point's own bin), so no post-join dedup is needed. The exact
  * `start <= t < end` predicate filters bin-mates that don't truly overlap.
  *
  * Cost: one shuffle of |intervals|·(span/bin + 1) + |points| rows, output
  * proportional to true matches — never |I|×|P|. The bin width is the scale
  * lever: pick it near the typical interval span so each interval lands in
  * ~2 bins; at 100 TB both sides partition by bin id, and skewed hot bins
  * (a flash-crowd hour) are handled by AQE skew-join splitting since the
  * join is a plain equi-join.
  */
object RangeJoin {

  private val BinCol = "__rj_bin"

  /** Join `points` to all `intervals` whose `[start, end)` contains `time`.
    * `start`/`end`/`time` must be TIMESTAMP columns; `binSeconds` is the
    * bucket width (choose ≈ the typical interval length).
    * Output: all interval columns + all point columns (names must not
    * collide; rename beforehand). Empty and inverted intervals
    * (`end <= start`) contain no point under the exclusive-end predicate
    * and are dropped up front — without the guard, `sequence(a, b)` on an
    * inverted interval would DESCEND through wrong bins.
    */
  def pointInInterval(intervals: DataFrame, start: String, end: String,
                      points: DataFrame, time: String,
                      binSeconds: Long): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val collide = intervals.columns.toSet.intersect(points.columns.toSet)
    require(collide.isEmpty, s"column collision: ${collide.mkString(",")}")
    val binUs = binSeconds * 1000000L

    // Intervals cover bins floor(start/bin) .. floor(end/bin); `end` is
    // exclusive but a point in end's bin can still precede it, so that bin
    // is included and the exact predicate decides.
    val i = intervals.filter(col(end) > col(start)).withColumn(BinCol,
      explode(sequence(floor(unix_micros(col(start)) / binUs),
        floor(unix_micros(col(end)) / binUs))))
    val p = points.withColumn(BinCol,
      floor(unix_micros(col(time)) / binUs))

    i.join(p, i(BinCol) === p(BinCol) &&
        p(time) >= i(start) && p(time) < i(end))
      .drop(BinCol)
  }
}
