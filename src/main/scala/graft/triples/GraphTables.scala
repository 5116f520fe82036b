package graft.triples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Read-side client for a graph materialized by [[Triples.writeGraph]]
  * — what a consumer of the reference's Neo4j serving graph switches
  * to. Every accessor is a partition-pruned scan (vertices by label,
  * edges by pred: reads touch exactly the partitions named), and the
  * reference's Cypher traversals are provided as named methods so
  * call sites port 1:1 without the in-memory
  * [[graft.dict.ConceptDict]]:
  *
  *  - [[synonymsOf]]  — J1 `(NCIT)-[:HAS_SYNONYM]->(SYN)`
  *    (reference synonym_tool.py:57-88)
  *  - [[mapsTo]]      — J3 flatten `(CDE)-[:HAS_VDM]->(VDM)-[:HAS_PV]->
  *    (PV)-[:HAS_CONCEPT]->(NCIT)` (reference
  *    semantic_retrievers.py:62-76), recomputed from BASE edges so it
  *    stays consistent under incremental edge appends
  *  - [[conceptContext]] — `(CDE)-[:HAS_DEC]->(DEC)-[:HAS_OC]->(OC)`
  *    (reference semantic_retrievers.py:224)
  *  - [[similarTo]]   — the NCIT SIMILAR self-relation (schema.png)
  *
  * All joins here are dictionary-sized: Spark broadcasts them
  * automatically under the default threshold; no shuffle reaches a
  * corpus-scale table through this API.
  */
final case class GraphTables(spark: SparkSession, dir: String) {

  def allVertices: DataFrame = spark.read.parquet(s"$dir/vertices")
  def allEdges: DataFrame = spark.read.parquet(s"$dir/edges")

  /** Label-pruned vertex scan (partition filter, asserted in tests). */
  def vertices(label: String): DataFrame =
    allVertices.filter(col("label") === label)

  /** Pred-pruned edge scan. */
  def edges(pred: String): DataFrame =
    allEdges.filter(col("pred") === pred)

  /** J1: (code, synonym) for one NCIT code, nulls dropped, sorted —
    * the reference's get_synonyms_by_ncit_code de-looped. */
  def synonymsOf(code: String): DataFrame =
    edges("HAS_SYNONYM").filter(col("subj") === code)
      .where(col("obj").isNotNull)
      .select(col("subj").as("code"), col("obj").as("synonym"))
      .orderBy("code", "synonym")

  /** J3 flatten from base edges alone: (ncit_code, cde_code). */
  def mapsTo: DataFrame = {
    val hasVdm = edges("HAS_VDM").select(col("subj").as("cde_code"), col("obj").as("vdm_code"))
    val hasPv = edges("HAS_PV").select(col("subj").as("vdm_code"), col("obj").as("pv_code"))
    // HAS_CONCEPT spans PV/OC/PR sources; restrict to PV via the
    // label-partitioned vertex table (the Cypher `(pv:PV)` label match)
    val pvCodes = vertices("PV").select(col("code").as("pv_code"))
    val hasConcept = edges("HAS_CONCEPT")
      .select(col("subj").as("pv_code"), col("obj").as("ncit_code"))
      .join(pvCodes, "pv_code")
    hasVdm.join(hasPv, "vdm_code").join(hasConcept, "pv_code")
      .select(col("ncit_code"), col("cde_code")).distinct()
  }

  /** CDE concept context: (cde_code, dec_code, oc_code, oc_term). */
  def conceptContext: DataFrame = {
    val hasDec = edges("HAS_DEC").select(col("subj").as("cde_code"), col("obj").as("dec_code"))
    val hasOc = edges("HAS_OC").select(col("subj").as("dec_code"), col("obj").as("oc_code"))
    val oc = vertices("OC").select(col("code").as("oc_code"), col("term").as("oc_term"))
    hasDec.join(hasOc, "dec_code").join(oc, "oc_code")
      .select("cde_code", "dec_code", "oc_code", "oc_term")
  }

  /** SIMILAR neighbors of one NCIT code: (code, similar_code). */
  def similarTo(code: String): DataFrame =
    edges("SIMILAR").filter(col("subj") === code)
      .select(col("subj").as("code"), col("obj").as("similar_code"))
      .orderBy("similar_code")

  /** Canonical (synonym-merged) code for any graph code — identity
    * for codes outside the merge map. */
  def canonicalOf: DataFrame =
    allVertices.select(col("code"), col("canonical")).distinct()
}
