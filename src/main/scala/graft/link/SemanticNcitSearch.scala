package graft.link

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dict.ConceptDict

/** The reference's composed semantic NCIT search,
  * `find_cde_from_ncit_term` (reference semantic_retrievers.py:85-126):
  * vector-KNN over NCIT term embeddings, then the graph fan-out
  *
  *   (node)<-[:HAS_CONCEPT]-(pv:PV)                       — INNER
  *   OPTIONAL MATCH (pv)<-[:HAS_PV]-(vdm)<-[:HAS_VDM]-(cde)
  *   WITH collect(cde.code) AS cdes ...                   — per (node, pv)
  *
  * returning one row per (KNN concept hit, pv) with the collected CDE
  * codes. Concepts with no PV drop out (inner MATCH); a PV with no
  * VDM/CDE chain keeps an empty collection (Cypher collect() of an
  * unmatched OPTIONAL is []; rendered here as the empty string).
  *
  * Spark shape: the NCIT matrix is dictionary-sized, so the KNN is a
  * broadcast scan inside flatMap (no shuffle, no cross join — same
  * pattern as [[DefinitionSearch]]); the fan-out is two BROADCAST
  * joins against dictionary-sized tables, with the per-PV CDE list
  * pre-aggregated on the DICTIONARY side — the corpus-proportional
  * hit stream never shuffles. Cosine is full double precision over
  * raw vectors (bit-exact vs the SQL oracle); ordering pinned
  * (score DESC, code ASC — reference ORDER BY score DESC, ties
  * unspecified, SURVEY.md §7.4).
  */
object SemanticNcitSearch {

  /** Reference default top_k=5 (semantic_retrievers.py:85). */
  val DefaultK = 5

  /** queries: (query_id, text) -> one row per (KNN NCIT hit, PV):
    * (query_id, rank, concept_code, concept_term, pv_code, pv_term,
    * score, of_cdes) where of_cdes = comma-joined sorted CDE codes
    * reachable via the PV's VDM memberships ('' if none). */
  def search(spark: SparkSession, queries: DataFrame, dict: ConceptDict,
             k: Int = DefaultK): DataFrame = {
    import spark.implicits._
    // shared broadcast-KNN kernel (bounded heap, no shuffle)
    val hits = BroadcastKnn.scanTermTopK(spark, queries,
        dict.ncit.select($"code", $"term", $"embedding"), k)
      .withColumnRenamed("code", "concept_code")
      .withColumnRenamed("term", "concept_term")

    // (node)<-[:HAS_CONCEPT]-(pv:PV): inner join with the PV label
    // enforced by joining the pv vertex table
    val pvEdge = dict.hasConcept.toDF("pv_code", "concept_code")
      .join(dict.pv.select($"code".as("pv_code"), $"term".as("pv_term")), "pv_code")
    // per-PV CDE collection pre-aggregated DICTIONARY-side (amortized
    // across queries; the hit stream only broadcast-joins the result)
    val pvCdes = dict.hasPv.toDF("vdm_code", "pv_code")
      .join(dict.hasVdm.toDF("cde_code", "vdm_code"), "vdm_code")
      .groupBy($"pv_code")
      .agg(concat_ws(",", array_sort(collect_list($"cde_code"))).as("of_cdes"))

    hits.join(broadcast(pvEdge), "concept_code")
      .join(broadcast(pvCdes), Seq("pv_code"), "left")
      .select($"query_id", $"rank", $"concept_code", $"concept_term",
        $"pv_code", $"pv_term", $"score",
        coalesce($"of_cdes", lit("")).as("of_cdes"))
  }
}
