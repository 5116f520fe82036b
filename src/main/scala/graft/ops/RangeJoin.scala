package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-containment ("range") join: pair every point row with
  * every interval row whose [lo, hi] contains it. Catalyst plans a
  * bare inequality join (`p.v BETWEEN i.lo AND i.hi`) as
  * BroadcastNestedLoopJoin — an all-pairs scan that is quadratic
  * wall-clock the moment the interval side outgrows a broadcast, and
  * the classic 100 TB scale-killer for event-in-window analytics
  * (turn ts within an incident window, value within a band).
  *
  * The fix is the standard bucketed-expansion rewrite (public
  * knowledge; how warehouse engines and Spark range-join hints
  * execute it): pick a bucket width `w`, explode each interval to
  * the ⌈len/w⌉+1 buckets it overlaps, map each point to its single
  * bucket, EQUI-join on the bucket id, and re-check the precise
  * bounds. Each qualifying pair is produced exactly once (a point
  * lives in exactly one bucket), so no dedup pass is needed. Cost:
  * one shuffle of |points| + |intervals| × avg-buckets-per-interval
  * rows on a key Catalyst can hash — AQE handles skewed buckets.
  * Width tuning: w ≈ the median interval length keeps the expansion
  * factor ~2 while keeping buckets selective; a too-small w blows up
  * the interval side, a too-large w degrades toward all-pairs within
  * a bucket.
  */
object RangeJoin {

  /** Join `points` to the `intervals` whose [loCol, hiCol] contains
    * `pointCol` (both bounds inclusive). Returns all columns of both
    * inputs; callers aggregate. Column names must not overlap.
    *
    * @param bucketWidth equi-join bucket size in value units (> 0);
    *                    ≈ median interval length is the right order
    */
  def bucketed(points: DataFrame, pointCol: String,
               intervals: DataFrame, loCol: String, hiCol: String,
               bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    val overlap = points.columns.toSet
      .intersect(intervals.columns.toSet)
    require(overlap.isEmpty, s"overlapping column names: $overlap")
    val ib = intervals.withColumn("__ib",
      explode(sequence(floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    val pb = points.withColumn("__pb",
      floor(col(pointCol) / bucketWidth).cast("long"))
    pb.join(ib, pb("__pb") === ib("__ib") &&
        col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__pb", "__ib")
  }
}
