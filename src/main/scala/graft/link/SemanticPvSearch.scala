package graft.link

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dict.ConceptDict

/** The reference's primary direct-library entry point,
  * `find_cde_from_pv_term` (reference semantic_retrievers.py:38-83;
  * SURVEY.md §3.3): vector-KNN over PV term embeddings, then the
  * INNER 3-hop fan-out
  *
  *   (node)<-[:HAS_PV]-(vdm:VDM)<-[:HAS_VDM]-(cde:CDE)   — J3
  *
  * one output row per (PV hit, CDE) path with the CDE metadata
  * (reference returns {score, pv_code, pv_term, cde, cde_term,
  * cde_defn}). PV hits whose value domain chain is empty drop out
  * (inner MATCH); a PV in several VDMs fans out to all its CDEs.
  *
  * Spark shape: same as [[SemanticNcitSearch]] — broadcast KNN scan
  * inside flatMap (no shuffle), dictionary-sized broadcast joins for
  * the fan-out; the hit stream never shuffles. Cosine in full double
  * precision over raw vectors; ordering pinned (score DESC, code ASC).
  */
object SemanticPvSearch {

  /** Reference default top_k=5 (semantic_retrievers.py:38). */
  val DefaultK = 5

  /** queries: (query_id, text) -> one row per (KNN PV hit, CDE):
    * (query_id, rank, pv_code, pv_term, cde_code, cde_term, cde_defn,
    * score). */
  def search(spark: SparkSession, queries: DataFrame, dict: ConceptDict,
             k: Int = DefaultK): DataFrame = {
    import spark.implicits._
    // shared broadcast-KNN kernel (bounded heap, no shuffle)
    val hits = BroadcastKnn.scanTermTopK(spark, queries,
        dict.pv.select($"code", $"term", $"embedding"), k)
      .withColumnRenamed("code", "pv_code")
      .withColumnRenamed("term", "pv_term")

    // (node)<-[:HAS_PV]-(vdm)<-[:HAS_VDM]-(cde): inner 3-hop, with the
    // CDE vertex metadata joined in (dictionary-sized, broadcast)
    val chain = dict.hasPv.toDF("vdm_code", "pv_code")
      .join(dict.hasVdm.toDF("cde_code", "vdm_code"), "vdm_code")
      .join(dict.cde.select($"code".as("cde_code"), $"term".as("cde_term"),
        $"definition".as("cde_defn")), "cde_code")
      .select($"pv_code", $"cde_code", $"cde_term", $"cde_defn")

    hits.join(broadcast(chain), "pv_code")
      .select($"query_id", $"rank", $"pv_code", $"pv_term",
        $"cde_code", $"cde_term", $"cde_defn", $"score")
  }
}
