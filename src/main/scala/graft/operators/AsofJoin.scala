package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  *
  * SKEW contract: `backward` sorts each key's ENTIRE merged history inside
  * one task — `Window.partitionBy(key)` partitions cannot be split by AQE,
  * so one pathological key (a single user/symbol holding a billion events)
  * serializes into one executor (VERDICT r6 #2). When key skew is possible,
  * use [[backwardBinned]]: the two-level (key, time-bin) shape bounds every
  * window partition by the bin's row count, at the price of two extra small
  * shuffles (per-bin closings + carry-in). Residual limit: a burst inside
  * ONE bin of one key still lands in one task — size bins below the
  * acceptable per-task row count.
  */
object AsofJoin {

  private val SideTag = "__asof_side"
  private val TimeCol = "__asof_t"
  private val PayloadCol = "__asof_p"
  private val BinCol = "__asof_bin"
  private val CarryCol = "__asof_carry"

  /** Reference a USER-named column literally: backtick-quoted so names
    * containing dots (legal in DataFrame schemas) resolve as one column,
    * never as a nested path (ADVICE r6 #3).
    */
  private def q(n: String): Column = col("`" + n.replace("`", "``") + "`")

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
               payload: Seq[String], strict: Boolean = false,
               forward: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    val (r, l) = tagged(left, right, key, leftTime, rightTime, payload,
      strict)

    // forward as-of (match the EARLIEST right row with rightTime >=
    // leftTime) is backward over reversed time: order the carry window
    // descending and the same side-tag rules give inclusive/strict
    val timeOrd = if (forward) col(TimeCol).desc else col(TimeCol).asc
    val w = Window.partitionBy(q(key))
      .orderBy(timeOrd, col(SideTag))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    r.unionByName(l)
      .select((leftCols.map(q) :+
        last(col(PayloadCol), ignoreNulls = true).over(w).as(PayloadCol) :+
        col(SideTag)): _*)
      .filter(col(SideTag) === 1)
      // getField, not a dot-path col(): a payload name containing '.'
      // must resolve as a literal struct field, not a nested path
      .select((leftCols.map(q) ++
        payload.map(p => col(PayloadCol).getField(p).as(p))): _*)
  }

  /** [[backward]] with a match tolerance (pandas merge_asof's `tolerance`,
    * kdb wj's window): the latest right row qualifies only if it is at
    * most `toleranceUs` microseconds older than the left row — a staler
    * match yields null payloads, because any OLDER right row is farther
    * still. Both time columns must be timestamps. Implementation: the
    * right event-time rides inside the carried payload struct (one extra
    * struct field, not a second window), and a map-side predicate nulls
    * the struct when it is too stale — same single key-shuffle cost as
    * [[backward]], same plan at 100 TB.
    */
  def backwardWithin(left: DataFrame, right: DataFrame, key: String,
                     leftTime: String, rightTime: String,
                     payload: Seq[String], toleranceUs: Long): DataFrame = {
    val RtCol = "__asof_rt"
    val leftCols = left.columns.toSeq
    require(!leftCols.contains(RtCol) && !payload.contains(RtCol) &&
      !right.columns.contains(RtCol),
      s"column name $RtCol is reserved by AsofJoin")
    val right2 = right.withColumn(RtCol, unix_micros(q(rightTime)))
    val (r, l) = tagged(left, right2, key, leftTime, rightTime,
      payload :+ RtCol)

    val w = Window.partitionBy(q(key))
      .orderBy(col(TimeCol), col(SideTag))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val fresh = col(PayloadCol).isNotNull &&
      unix_micros(col(TimeCol)) - col(PayloadCol).getField(RtCol) <=
        lit(toleranceUs)
    r.unionByName(l)
      .select((leftCols.map(q) :+ col(TimeCol) :+
        last(col(PayloadCol), ignoreNulls = true).over(w).as(PayloadCol) :+
        col(SideTag)): _*)
      .filter(col(SideTag) === 1)
      .select((leftCols.map(q) ++
        payload.map(p =>
          when(fresh, col(PayloadCol).getField(p)).as(p))): _*)
  }

  /** Skew-proof two-level variant of [[backward]] for hot keys: windows run
    * per (key, bin) instead of per key, so no single key serializes its
    * whole history into one task.
    *
    *   closings(key, bin) = payload of the LAST right row in the bin
    *     (one aggregation of R keyed (key, bin) — small output)
    *   carry(key, bin)    = latest closing from any EARLIER bin
    *     (window over one row per (key, bin) — tiny)
    *   detail             = backward's union+window, partitioned (key, bin)
    *   result             = coalesce(within-bin match, carry-in)
    *
    * `bin` must be monotone non-decreasing in the time column and applied
    * identically to both sides (e.g. `c => floor(unix_micros(c) / 3.6e9)`
    * for hourly bins on a timestamp). Result is EXACTLY `backward`'s —
    * spec-asserted — because a left row's best match is either inside its
    * own bin (detail window) or the closing row of the latest earlier
    * non-empty bin (carry-in).
    */
  def backwardBinned(left: DataFrame, right: DataFrame, key: String,
                     leftTime: String, rightTime: String,
                     payload: Seq[String], bin: Column => Column): DataFrame = {
    val leftCols = left.columns.toSeq
    val (r0, l0) = tagged(left, right, key, leftTime, rightTime, payload)
    val r = r0.withColumn(BinCol, bin(col(TimeCol)))
    val l = l0.withColumn(BinCol, bin(col(TimeCol)))

    // Level 1: per-bin closing payloads (right side only) + per-bin
    // carry-in over ONE row per (key, bin) — the only per-key-ordered
    // window left, and it is bounded by the bin count, not the row count.
    val closings = r.groupBy(q(key), col(BinCol))
      .agg(max_by(col(PayloadCol), col(TimeCol)).as(CarryCol))
    val bins = r.select(q(key), col(BinCol))
      .unionByName(l.select(q(key), col(BinCol))).distinct()
    val wCarry = Window.partitionBy(q(key)).orderBy(col(BinCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = bins.join(closings, Seq(key, BinCol), "left")
      .select(q(key), col(BinCol),
        last(col(CarryCol), ignoreNulls = true).over(wCarry).as(CarryCol))

    // Level 2: the detailed window, partition-bounded by (key, bin).
    val wBin = Window.partitionBy(q(key), col(BinCol))
      .orderBy(col(TimeCol), col(SideTag))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    r.unionByName(l)
      .select((q(key) +: col(BinCol) +: col(SideTag) +:
        last(col(PayloadCol), ignoreNulls = true).over(wBin).as(PayloadCol) +:
        leftCols.filterNot(_ == key).map(q)): _*)
      .filter(col(SideTag) === 1)
      .join(carries, Seq(key, BinCol), "left")
      .select((leftCols.map(q) ++
        payload.map(p =>
          coalesce(col(PayloadCol), col(CarryCol)).getField(p).as(p))): _*)
  }

  /** Shared side-tagging: right rows carry the payload struct and null left
    * columns; left rows carry their columns and a null payload. Right sorts
    * before left at equal timestamps (side 0 < 1) for the inclusive `>=`
    * match; with `strict` (the `>` form) right rows take side 2 instead,
    * sorting AFTER left at equal timestamps so a same-instant right row is
    * excluded from the running carry.
    */
  private def tagged(left: DataFrame, right: DataFrame, key: String,
                     leftTime: String, rightTime: String,
                     payload: Seq[String],
                     strict: Boolean = false): (DataFrame, DataFrame) = {
    val leftCols = left.columns.toSeq
    require(!payload.contains(key), s"payload must not repeat the key '$key'")
    require(payload.toSet.intersect(leftCols.toSet).isEmpty,
      s"payload ${payload.mkString(",")} collides with left columns")
    val reserved = Set(SideTag, TimeCol, PayloadCol, BinCol, CarryCol)
    require(reserved.intersect((leftCols ++ payload :+ key).toSet).isEmpty,
      s"column names ${reserved.mkString(",")} are reserved by AsofJoin")

    val payloadType = StructType(payload.map(c => right.schema(c)))
    val rightSide = if (strict) 2 else 0
    val r = right.select(
      q(key) +: (q(rightTime).as(TimeCol) +: lit(rightSide).as(SideTag) +:
        (struct(payload.map(q): _*).as(PayloadCol) +:
          leftCols.filterNot(_ == key).map(c => lit(null).as(c)))): _*)
    val l = left.select(
      q(key) +: (q(leftTime).as(TimeCol) +: lit(1).as(SideTag) +:
        (lit(null).cast(payloadType).as(PayloadCol) +:
          leftCols.filterNot(_ == key).map(q))): _*)
    (r, l)
  }
}
