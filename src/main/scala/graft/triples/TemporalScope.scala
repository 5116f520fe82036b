package graft.triples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Temporal scoping of extracted triples — every production KG
  * attaches validity intervals to edges mined from a time-stamped
  * corpus (Wikidata qualifiers, YAGO's occursSince/occursUntil); the
  * reference's Neo4j graph is timeless because its sources are curated
  * releases, but a transcript-mined graph observes each assertion at a
  * moment, and downstream consumers need "when was this edge live" and
  * "the graph as of time T".
  *
  * Scale shape: scoping is one groupBy keyed on the edge identity —
  * map-side partial min/max/count, shuffle only the (dictionary ×
  * predicate)-sized edge domain, never corpus-sized state. Snapshots
  * are a pure filter over the scoped table (partition-prunable when
  * the table is written partitioned by pred).
  */
object TemporalScope {

  /** Collapse time-stamped triple observations to one row per edge
    * with its observed validity window.
    *
    * @param obs (subj, pred, obj, ts_epoch) — one row per observation,
    *            ts_epoch an integral epoch-seconds column (exact; no
    *            engine-specific timestamp formatting on the compare
    *            path)
    * @return (subj, pred, obj, first_seen, last_seen, n_obs)
    */
  def scopeEdges(obs: DataFrame): DataFrame =
    obs.groupBy(col("subj"), col("pred"), col("obj"))
      .agg(min(col("ts_epoch")).cast("long").as("first_seen"),
        max(col("ts_epoch")).cast("long").as("last_seen"),
        count(lit(1)).as("n_obs"))

  /** The graph as of epoch time `t`: edges first observed at or before
    * `t`. With `activeOnly`, edges must also still be live at `t`
    * under a staleness horizon (last observation within `horizon`
    * seconds of `t`) — the "forget edges no transcript has mentioned
    * lately" serving mode. */
  def asOf(scoped: DataFrame, t: Long, activeOnly: Boolean = false,
           horizon: Long = Long.MaxValue): DataFrame = {
    val base = scoped.filter(col("first_seen") <= t)
    if (activeOnly) base.filter(col("last_seen") >= t - horizon) else base
  }
}
