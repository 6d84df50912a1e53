package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment — the incremental twin of
  * `graft.operators.AsofJoin` (a01): each click is matched to the latest
  * view at-or-before it by the same user, over one interleaved event
  * stream. The reference has no streaming machinery at all (SURVEY §2.9);
  * this is beyond-reference surface in the same family as
  * EventStreams/DocStreams.
  *
  * Correctness under out-of-order arrival: a click may only be emitted
  * once the event-time watermark has passed it STRICTLY — from then on no
  * view with an earlier-or-equal timestamp can still arrive, so the match
  * is final and identical to the batch operator's. Until then the click
  * waits in per-user state.
  *
  * State bounds, explicitly: buffered clicks live only until the
  * watermark passes them (≤ one horizon), and view history is pruned to
  * the single latest view at-or-below the watermark (the "floor" — every
  * older view is dominated by it for any future click) plus the
  * in-horizon tail. What remains is ONE floor row per user ever seen.
  * By default that floor is kept forever (`retainIdleUs = Long.MaxValue`),
  * which is what exact batch parity requires: a click arriving after a
  * year of idleness still matches the old view, so the state cost of
  * exactness is O(distinct users), a few dozen bytes each, with no timer
  * churn (no timeout is armed for idle users). Pipelines that prefer
  * bounded state over long-gap matches pass a finite `retainIdleUs`:
  * a user idle past it has their state removed by event-time timeout, and
  * a click after the gap reports no match.
  */
object AsofStreams {

  final case class Enriched(user_id: Long, click_us: Long,
                            view_us: Option[Long], view_value: Option[Double])

  /** views: ascending (ts, value), unique by ts (max value wins — the same
    * determinism rule the batch operator requires of its build side);
    * clicks: unmatured click timestamps, unordered; lastUs: max event time
    * seen for this user (drives idle retention).
    */
  final case class AsofState(views: List[(Long, Double)], clicks: List[Long],
                             lastUs: Long)

  /** Exact epoch micros from a Timestamp (getTime alone truncates to ms). */
  private def tsMicros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  /** Insert keeping ascending ts order and max-value per equal ts. */
  private def insertView(views: List[(Long, Double)],
                         us: Long, v: Double): List[(Long, Double)] = {
    val (below, rest) = views.span(_._1 < us)
    rest match {
      case (t, v0) :: tail if t == us => below ::: (t, math.max(v0, v)) :: tail
      case _ => below ::: (us, v) :: rest
    }
  }

  /** Enrich the `click` rows of an interleaved event stream with the
    * latest same-user `view` at-or-before each (inclusive at equal time,
    * matching `AsofJoin.backward`). `horizonUs` is both the watermark
    * delay and the lateness bound; `retainIdleUs` is the idle-state
    * retention policy described above.
    */
  def asofEnrich(spark: SparkSession, events: DataFrame,
                 horizonUs: Long = 30L * 60 * 1000 * 1000,
                 retainIdleUs: Long = Long.MaxValue): Dataset[Enriched] = {
    import spark.implicits._
    events
      .withWatermark("ts", s"$horizonUs microseconds")
      .filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[(Long, java.sql.Timestamp, String, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[AsofState, Enriched](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state: GroupState[AsofState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val prev = state.getOption.getOrElse(AsofState(Nil, Nil, Long.MinValue))
          var views = prev.views
          var clicks = prev.clicks
          var lastUs = prev.lastUs
          rows.foreach { case (_, t, typ, v) =>
            val us = tsMicros(t)
            lastUs = math.max(lastUs, us)
            if (typ == "view") views = insertView(views, us, v)
            else clicks = us :: clicks
          }
          // Mature strictly below the watermark: Spark only guarantees
          // rows with ts < wm can no longer arrive, so a click == wm
          // could still gain an equal-time view and must keep waiting.
          val (ready, waiting) = clicks.partition(_ < wmUs)
          val out = ready.sorted.map { c =>
            views.takeWhile(_._1 <= c).lastOption match {
              case Some((vu, vv)) => Enriched(uid, c, Some(vu), Some(vv))
              case None => Enriched(uid, c, None, None)
            }
          }
          // Prune views to the floor (latest ≤ wm) + the tail above it:
          // every future click has ts ≥ wm and the floor dominates all
          // older views for it.
          val floor = views.takeWhile(_._1 <= wmUs).lastOption
          val kept = floor.toList ::: views.dropWhile(_._1 <= wmUs)
          val idleExpired = retainIdleUs != Long.MaxValue &&
            lastUs != Long.MinValue && wmUs >= lastUs + retainIdleUs
          if ((waiting.isEmpty && kept.isEmpty) ||
              (waiting.isEmpty && idleExpired)) state.remove()
          else {
            state.update(AsofState(kept, waiting, lastUs))
            // Arm a wake-up only when something is scheduled to happen:
            // the earliest waiting click maturing, or — under finite
            // retention — the idle deadline. An exact-mode idle user
            // keeps state with NO armed timeout (zero timer churn).
            val nextUs = waiting.minOption.orElse(
              if (retainIdleUs != Long.MaxValue) Some(lastUs + retainIdleUs)
              else None)
            nextUs.foreach(n =>
              state.setTimeoutTimestamp(math.max(n, wmUs) / 1000L + 1L))
          }
          out.iterator
      }
  }
}
