package graft.triples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ontology hierarchy rollup — aggregate per-concept observation
  * counts up an is-a DAG so every ancestor carries the total over its
  * subtree (NCIT is exactly such a subsumption hierarchy; "how often
  * does ANY kind of neoplasm appear in the corpus" is a query on the
  * rolled-up table, not the leaf counts). The reference serves
  * subsumption through per-query Cypher traversals; a batch KG
  * precomputes the rollup once per build.
  *
  * Scale shape: the ancestors table ([[GraphTraverse.closure]] over
  * the is-a edges) is ontology-sized — dictionary scale, broadcast —
  * so the rollup is ONE join of the per-concept count table (also
  * dictionary-sized after its corpus aggregation) against it, fan-out
  * bounded by hierarchy depth, then a groupBy on the ancestor key.
  * The corpus is touched only by the upstream count aggregation.
  */
object Hierarchy {

  /** @param isa    (subj, obj) — child → parent is-a edges (a DAG;
    *               closure raises if deeper than its iteration bound)
    * @param direct (code, n_direct) — per-concept direct counts
    *               (concepts absent here count 0)
    * @return (code, n_direct, n_rollup) for EVERY node of the
    *         hierarchy — n_rollup = its own count plus all
    *         descendants'
    */
  def rollupCounts(spark: SparkSession, isa: DataFrame,
                   direct: DataFrame): DataFrame = {
    val d = direct.select(col("code"), col("n_direct").cast("long"))
    val nodes = isa.select(col("subj").as("code"))
      .unionByName(isa.select(col("obj").as("code"))).distinct()
    // contribution pairs: every node contributes to each ancestor AND
    // to itself
    val contrib = GraphTraverse.closure(spark, isa)
      .select(col("src").as("code"), col("dst").as("anc"))
      .unionByName(nodes.select(col("code"), col("code").as("anc")))
    val rollup = contrib.join(d, Seq("code"), "left")
      .groupBy(col("anc"))
      .agg(sum(coalesce(col("n_direct"), lit(0L))).as("n_rollup"))
    rollup
      .join(d.withColumnRenamed("code", "anc"), Seq("anc"), "left")
      .select(col("anc").as("code"),
        coalesce(col("n_direct"), lit(0L)).as("n_direct"),
        col("n_rollup"))
  }
}
