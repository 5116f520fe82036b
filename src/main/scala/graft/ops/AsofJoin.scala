package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join: for every left row, attach the most
  * recent right row at-or-before the left row's timestamp with the
  * same key — the dimension-snapshot lookup a transcript pipeline
  * needs constantly (which dictionary release / model config / rate
  * was live when this turn happened?). The reference has no batch
  * equivalent: it resolves time-dependent context with one Neo4j
  * round-trip per value (llm_agent_4o.py's per-term query loop), the
  * N+1 shape our J5 operator de-looped.
  *
  * Spark has no built-in as-of join, and both naive formulations die
  * at scale: a correlated point lookup is N+1 over the driver, and an
  * inequality-only join (`l.key = r.key AND r.ts <= l.ts` + window)
  * materializes every (left, earlier-right) pair before ranking —
  * quadratic in snapshots per key.
  *
  * This implementation is the union-tag-window form (public
  * knowledge: how pandas' merge_asof semantics are re-expressed on
  * shuffle engines): tag right rows 0 and left rows 1, union them on
  * (key, ts, tag, payload), and carry the latest non-null right
  * payload forward with ONE window pass
  * `last(payload, ignoreNulls=true) OVER (PARTITION BY key
  * ORDER BY ts, tag ROWS UNBOUNDED PRECEDING .. CURRENT ROW)`.
  * Cost: a single shuffle of |left|+|right| rows on key plus an
  * in-partition sort — no pair explosion, no driver round-trips.
  * 100 TB shape: the shuffle is the same one any keyed op pays; a
  * hot key (one conversation with millions of turns) is a plain
  * sort-skew problem that AQE's skew-split handles because the
  * window frame is running (ROWS UNBOUNDED PRECEDING), which Spark
  * evaluates streamingly within the sorted partition — no buffering
  * of the whole key group.
  *
  * Semantics (pinned by the DuckDB oracle and AsofJoinSpec):
  *  - a right row at exactly left.ts MATCHES (ASOF `>=`, tag 0 sorts
  *    before tag 1 at equal ts);
  *  - left rows with no earlier right row keep null payloads (LEFT
  *    ASOF join);
  *  - right rows colliding on (key, ts) are reduced to the
  *    lexicographically-greatest payload struct first — a
  *    deterministic MERGE-style tie rule, so the operator never
  *    depends on physical row order.
  */
object AsofJoin {

  /** Left as-of join.
    *
    * @param left     probe side; all its columns are preserved
    * @param right    snapshot side
    * @param key      equi-join column present on both sides
    * @param ts       event-time column present on both sides
    * @param payload  right columns to carry onto matching left rows
    * @param prefix   prepended to carried columns (`asof_<ts>` is the
    *                 matched snapshot's own timestamp)
    */
  def asof(left: DataFrame, right: DataFrame, key: String, ts: String,
           payload: Seq[String], prefix: String = "asof_"): DataFrame = {
    require(payload.nonEmpty, "asof join needs at least one payload column")
    val spark = left.sparkSession
    import spark.implicits._

    // deterministic (key, ts) collision rule: greatest payload struct
    val dedup = right
      .groupBy(col(key), col(ts))
      .agg(max(struct(payload.map(col): _*)).as("__p"))
      .select(col(key) +: col(ts) +: payload.zipWithIndex.map {
        case (c, i) => col("__p").getField(c).as(s"__r_$i")
      }: _*)

    val carried = ts +: payload // asof_<ts> rides along with the payload
    val leftTagged = left.select(
      col(key).as("__k") +: col(ts).as("__t") +: lit(1).as("__tag") +:
        struct(left.columns.map(col): _*).as("__lrow") +:
        carried.indices.map(i => lit(null).as(s"__c_$i")): _*)
    val rightTagged = dedup.select(
      col(key).as("__k") +: col(ts).as("__t") +: lit(0).as("__tag") +:
        lit(null).as("__lrow") +:
        (col(ts) +: payload.indices.map(i => col(s"__r_$i")))
          .zipWithIndex.map { case (c, i) => c.as(s"__c_$i") }: _*)

    val w = Window.partitionBy($"__k").orderBy($"__t", $"__tag")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = leftTagged.unionByName(rightTagged)
      .select($"__tag" +: $"__lrow" +:
        carried.indices.map(i =>
          last(col(s"__c_$i"), ignoreNulls = true).over(w).as(s"__f_$i")): _*)

    filled.filter($"__tag" === 1).select(
      left.columns.map(c => col(s"__lrow.$c")) ++
        carried.zipWithIndex.map { case (c, i) =>
          col(s"__f_$i").as(s"$prefix$c")
        }: _*)
  }
}
