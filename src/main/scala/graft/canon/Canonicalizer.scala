package graft.canon

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dict.ConceptDict

/** Canonicalization: concepts that share a normalized surface
  * (preferred term or synonym) are merged into one canonical code via
  * connected components over the "shares-a-surface" edge list — the
  * north star's connected-components synonym merge. Canonical code =
  * min code in the component (pinned, deterministic).
  */
object Canonicalizer {

  /** Edge list (src, dst) between codes sharing any normalized
    * surface. Built by a self-join of the surface table grouped by
    * surface — dictionary-sized, cheap. */
  def synonymShareEdges(spark: SparkSession, dict: ConceptDict): DataFrame = {
    import spark.implicits._
    val surf = dict.surfaces(spark).select($"norm", $"code").distinct()
    // For each surface: connect every code to the min code of that
    // surface (star pattern — |codes| edges instead of |codes|^2).
    val mins = surf.groupBy($"norm").agg(min($"code").as("src"))
    surf.join(mins, "norm")
      .filter($"code" =!= $"src")
      .select($"src", $"code".as("dst"))
      .distinct()
  }

  /** (code, canonical) for EVERY code (identity rows included, so a
    * plain inner join applies the map). Uses the driver-local CC path:
    * the shares-a-surface graph is dictionary-sized by construction
    * (<= one edge per surface), so the iterative distributed CC would
    * only add serial job-scheduling latency to every pipeline run. */
  def canonicalMap(spark: SparkSession, dict: ConceptDict): DataFrame = {
    import spark.implicits._
    val edges = synonymShareEdges(spark, dict)
    val comp = ConnectedComponents.runLocal(spark, edges)
    val allCodes = dict.ncit.select($"code")
      .unionByName(dict.pv.select($"code"))
      .unionByName(dict.cde.select($"code")).distinct()
    allCodes.join(comp.withColumnRenamed("node", "code"), Seq("code"), "left")
      .select($"code", coalesce($"component", $"code").as("canonical"))
  }
}
