package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (temporal backward) join — an operator the reference engine lacks
  * entirely (no sort-merge/range/as-of machinery anywhere in its DataFusion
  * fork, see SURVEY.md §2.4 "Limits"), but that any time-series or
  * feature-backfill pipeline needs: for each left row, attach the payload of
  * the latest right row with `rightTime <= leftTime` in the same key group.
  *
  * Spark-first shape: instead of a per-key join + per-pair filter (quadratic
  * in rows-per-key) or a broadcast loop, both sides are UNIONed with a side
  * tag and a single window pass carries the last non-null right payload
  * forward in time order:
  *
  *   union(right(key, t, payload...), left(key, t, cols...))
  *     → Window.partitionBy(key).orderBy(t, side).rowsBetween(-inf, 0)
  *     → last(payload-struct, ignoreNulls) over the window
  *     → keep left rows
  *
  * The payload travels as ONE struct column, not per-column carries: a
  * per-column `last(_, ignoreNulls)` would backfill a null field of the
  * latest right row from an OLDER right row, emitting a payload combination
  * that never existed. The struct is non-null exactly when a right row
  * exists, so the whole row wins or loses atomically — matching ASOF
  * semantics even when payload fields are null.
  *
  * Cost: ONE shuffle of |L|+|R| rows on the key (the window sort), linear
  * work per row, no candidate-pair blowup — the same plan holds at 100 TB,
  * where per-key history can be millions of rows and any per-key cross
  * product would be quadratic. Right rows sort BEFORE left rows at equal
  * timestamps (side 0 < 1), giving the inclusive `leftTime >= rightTime`
  * match that ASOF JOIN semantics (e.g. DuckDB's) specify.
  *
  * Determinism contract: callers must ensure the right side is unique per
  * (key, time) — duplicate equal-time right rows make "the latest row"
  * ill-defined in ANY as-of engine. Aggregate the right side first.
  */
object AsofJoin {

  private val SideTag = "__asof_side"
  private val TimeCol = "__asof_t"
  private val PayloadCol = "__asof_p"

  /** Backward as-of join, left-outer semantics (unmatched left rows keep
    * null payloads).
    *
    * @param left      probe side; all its columns survive
    * @param right     build side; MUST be unique per (key, rightTime)
    * @param key       equi-join key column present on both sides
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param payload   columns of `right` to attach to each left row
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!payload.contains(key), s"payload must not repeat the key '$key'")
    require(payload.toSet.intersect(leftCols.toSet).isEmpty,
      s"payload ${payload.mkString(",")} collides with left columns")
    val reserved = Set(SideTag, TimeCol, PayloadCol)
    require(reserved.intersect((leftCols ++ payload :+ key).toSet).isEmpty,
      s"column names ${reserved.mkString(",")} are reserved by AsofJoin")

    val payloadType = StructType(payload.map(c => right.schema(c)))
    val r = right.select(
      col(key) +: (col(rightTime).as(TimeCol) +: lit(0).as(SideTag) +:
        (struct(payload.map(col): _*).as(PayloadCol) +:
          leftCols.filterNot(_ == key).map(c => lit(null).as(c)))): _*)
    val l = left.select(
      col(key) +: (col(leftTime).as(TimeCol) +: lit(1).as(SideTag) +:
        (lit(null).cast(payloadType).as(PayloadCol) +:
          leftCols.filterNot(_ == key).map(col))): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col(TimeCol), col(SideTag))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    r.unionByName(l)
      .select((leftCols.map(col) :+
        last(col(PayloadCol), ignoreNulls = true).over(w).as(PayloadCol) :+
        col(SideTag)): _*)
      .filter(col(SideTag) === 1)
      .select((leftCols.map(col) ++
        payload.map(p => col(s"$PayloadCol.$p").as(p))): _*)
  }
}
