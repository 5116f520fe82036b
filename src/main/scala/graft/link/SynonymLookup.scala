package graft.link

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dict.ConceptDict

/** Set-based synonym lookup — the reference's synonym tools de-looped
  * (reference synonym_tool.py): instead of one Cypher round-trip per
  * input, whole input DataFrames join the broadcast dictionary.
  *
  * Reference fidelity notes (SURVEY.md §2.3 J2):
  *  - [[byCode]] (J1, synonym_tool.py:57-88): 1-hop
  *    NCIT-[:HAS_SYNONYM]->SYN, null synonym terms dropped
  *    (synonym_tool.py:39 filters falsy terms).
  *  - [[byPvTerm]] (J2, synonym_tool.py:19-55): 2-hop
  *    PV-[:HAS_CONCEPT]->NCIT-[:HAS_SYNONYM]->SYN. The PV term match
  *    is **case-sensitive** in the reference (`{term:$pv}`,
  *    synonym_tool.py:27) — deliberately asymmetric with the
  *    case-insensitive term matcher (exact_match.py:80). Preserved.
  */
object SynonymLookup {

  /** J1: codes DataFrame with column `code` -> (code, synonym),
    * sorted, nulls dropped. */
  def byCode(spark: SparkSession, dict: ConceptDict, codes: DataFrame): DataFrame = {
    import spark.implicits._
    codes.select(upper(trim($"code")).as("code")) // ref normalizes codes: llm_agent_4o.py:104
      .join(broadcast(dict.synonyms.toDF()), Seq("code"))
      .where($"term".isNotNull)
      .select($"code", $"term".as("synonym"))
      .orderBy($"code", $"synonym")
  }

  /** J2: pv terms DataFrame with column `pv_term` (matched
    * CASE-SENSITIVELY against pv.term) -> (pv_term, ncit_code,
    * synonym). */
  def byPvTerm(spark: SparkSession, dict: ConceptDict, pvTerms: DataFrame): DataFrame = {
    import spark.implicits._
    val pv = dict.pv.select($"code".as("pv_code"), $"term".as("pv_term"))
    val hc = dict.hasConcept.toDF("pv_code", "ncit_code")
    val syn = dict.synonyms.select($"code".as("ncit_code"), $"term".as("synonym"))
    pvTerms.select($"pv_term") // NO normalization: case-sensitive per reference
      .join(broadcast(pv), Seq("pv_term"))
      .join(broadcast(hc), Seq("pv_code"))
      .join(broadcast(syn), Seq("ncit_code"))
      .where($"synonym".isNotNull)
      .select($"pv_term", $"ncit_code", $"synonym")
      .orderBy($"pv_term", $"ncit_code", $"synonym")
  }
}
