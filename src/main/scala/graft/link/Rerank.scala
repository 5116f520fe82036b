package graft.link

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Functions.cosine_sim
import graft.dict.ConceptDict

/** Context-aware CDE rerank — the set-based de-loop of the
  * reference's worst scale bug: `rerank_with_oc_context`
  * (reference semantic_retrievers.py:208-242) issues ONE Neo4j query
  * + ONE embedding RPC PER candidate row (N+1). Here it is two
  * broadcast joins + one expression over all candidates at once
  * (SURVEY.md §2.3 J5, §4.1).
  *
  * Semantics preserved exactly:
  *  - oc lookup: DISTINCT oc per cde, LIMIT 1 — made deterministic by
  *    ordering on oc term then code (reference order is unspecified;
  *    pinned per SURVEY.md §7.4);
  *  - combined = 0.7 * base + 0.3 * cosine(query, oc)  (weights from
  *    reference semantic_retrievers.py:237);
  *  - a candidate with NO cde code at all skips OC reranking entirely:
  *    combined = raw score (reference semantic_retrievers.py:213-219
  *    `if not cde_code: combined_score = score` — falsy check, so
  *    null AND empty-string codes both pass through);
  *  - a candidate WITH a cde code but no DEC->OC path keeps
  *    oc_score = 0, combined = 0.7 * score
  *    (reference semantic_retrievers.py:229-237).
  */
object Rerank {

  /** cde_code -> (oc_term, oc_embedding), exactly one row per cde
    * (deterministic LIMIT 1). */
  def cdeToOc(spark: SparkSession, dict: ConceptDict): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"cde_code").orderBy($"oc_term".asc, $"oc_code".asc)
    dict.hasDec.toDF("cde_code", "dec_code")
      .join(dict.hasOc.toDF("dec_code", "oc_code"), "dec_code")
      .join(dict.oc.select($"code".as("oc_code"), $"term".as("oc_term"),
        $"embedding".as("oc_embedding")), "oc_code")
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"cde_code", $"oc_term", $"oc_embedding")
  }

  /** @param candidates (query_id, cde_code, score, query_vec:array<float>)
    * @return candidates + oc_term, oc_score, combined_score, ordered by
    *         (query_id, combined_score DESC, cde_code ASC). */
  def rerankWithOcContext(spark: SparkSession, candidates: DataFrame,
                          dict: ConceptDict): DataFrame = {
    import spark.implicits._
    val oc = cdeToOc(spark, dict)
    candidates.join(broadcast(oc), Seq("cde_code"), "left")
      .withColumn("oc_score",
        when($"oc_embedding".isNull, lit(0.0))
          .otherwise(cosine_sim($"query_vec", $"oc_embedding")))
      .withColumn("combined_score",
        when($"cde_code".isNull || $"cde_code" === "", $"score") // no-CDE passthrough
          .otherwise($"score" * 0.7 + $"oc_score" * 0.3))
      .drop("oc_embedding")
      .orderBy($"query_id".asc, $"combined_score".desc, $"cde_code".asc)
  }
}
