package graft.triples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph snapshot diff — classify every edge as added / removed /
  * retained between two materialized edge tables. The maintenance
  * primitive behind "what changed since yesterday's build": dictionary
  * upgrades retire edges, new transcript batches add them, and both
  * the serving layer (cache invalidation) and the audit trail (what
  * did the v2 dictionary delete?) consume the delta, not the
  * snapshots. The reference rebuilds its Neo4j graph wholesale from
  * curated releases and has no diff surface; a continuously-built
  * graph needs one.
  *
  * Scale shape: one full outer join keyed on the edge identity
  * (subj, pred, obj) — the unavoidable comparison, shuffled on the
  * same key both tables are already bucketed by when written through
  * [[Triples.writeGraph]]; with pred-partitioned tables, diffing one
  * predicate prunes both scans to that partition. Status is a
  * null-flag CASE — map-side, codegen.
  */
object GraphDiff {

  /** @param before (subj, pred, obj) — the older snapshot
    * @param after  (subj, pred, obj) — the newer snapshot
    * @return (subj, pred, obj, status) with status ∈
    *         added | removed | retained
    */
  def diff(before: DataFrame, after: DataFrame): DataFrame = {
    val b = before.select(col("subj"), col("pred"), col("obj"))
      .distinct().withColumn("in_before", lit(1))
    val a = after.select(col("subj"), col("pred"), col("obj"))
      .distinct().withColumn("in_after", lit(1))
    b.join(a, Seq("subj", "pred", "obj"), "full_outer")
      .withColumn("status",
        when(col("in_before").isNull, "added")
          .when(col("in_after").isNull, "removed")
          .otherwise("retained"))
      .select(col("subj"), col("pred"), col("obj"), col("status"))
  }

  /** Per-predicate change summary — the monitoring row a nightly build
    * emits (a predicate suddenly losing half its edges is a dictionary
    * regression, not news). */
  def summary(before: DataFrame, after: DataFrame): DataFrame =
    diff(before, after)
      .groupBy(col("pred"), col("status"))
      .agg(count(lit(1)).as("n"))
}
