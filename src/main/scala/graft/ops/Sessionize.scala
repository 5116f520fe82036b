package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: split each key's event stream into
  * sessions wherever consecutive events are more than `gap` apart —
  * the batch twin of Structured Streaming's session windows, and the
  * first step of turning raw transcript/event logs into
  * training-sized conversation episodes.
  *
  * One shuffle on key + one in-partition sort; the session index is
  * `sum(new-session flag) OVER (ORDER BY ts RANGE UNBOUNDED
  * PRECEDING..CURRENT)` — the RANGE frame (not ROWS) makes tied
  * timestamps share a session index regardless of their physical
  * order, so the operator is deterministic under any partitioning
  * even though `lag` on a tie is not: a tie row's lag is either its
  * tie-sibling's equal ts (diff 0 → flag 0) or the true
  * predecessor's, and the single boundary flag lands in every tied
  * row's RANGE cumsum identically.
  *
  * 100 TB shape: identical to any keyed window op — AQE skew-split
  * handles hot keys; per-session aggregation afterwards is map-side
  * combined on (key, session_idx).
  */
object Sessionize {

  /** Per-event session assignment: input columns + `session_idx`
    * (0-based per key, in time order).
    * @param gapUs session-breaking silence in MICROSECONDS */
  def assign(df: DataFrame, keyCol: String, tsCol: String, gapUs: Long): DataFrame = {
    require(gapUs > 0, s"gap must be positive, got $gapUs")
    val order = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val cum = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val us = unix_micros(col(tsCol).cast("timestamp"))
    val flag = when(
      us - lag(us, 1).over(order) > gapUs, 1L).otherwise(0L)
    df.withColumn("session_idx", sum(flag).over(cum))
  }

  /** Per-session rollup: (key, session_idx, n_events, t_start_us,
    * t_end_us, duration_us). */
  def stats(df: DataFrame, keyCol: String, tsCol: String, gapUs: Long): DataFrame = {
    val us = unix_micros(col(tsCol).cast("timestamp"))
    assign(df, keyCol, tsCol, gapUs)
      .groupBy(col(keyCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(us).as("t_start_us"), max(us).as("t_end_us"))
      .withColumn("duration_us", col("t_end_us") - col("t_start_us"))
  }
}
