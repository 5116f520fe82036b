package graft.link

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.dict.PreparedDict
import graft.functions.{VectorMath, Vectorizer}

/** Definition-embedding semantic search — the reference's specialized
  * retrievers for free-text DESCRIPTIONS (not values):
  * `find_cde_by_definition_similarity` (reference
  * semantic_retrievers.py:129-166, cdeIndex) and
  * `find_ncit_by_definition_similarity`
  * (semantic_retrievers.py:168-205, ncitIndex), surfaced as the agent
  * tools semantic_cde_definition / semantic_ncit_definition
  * (llm_agent_4o.py:337-441).
  *
  * Spark shape: the definition matrix is dictionary-sized (~10^5 rows
  * even at full NCIT scale) so it is BROADCAST once
  * ([[PreparedDict.defs]]); each query row scans it inside a flatMap —
  * no shuffle, no materialized cross join, queries never leave their
  * partitions. Cosine is computed per pair in full double precision
  * over the RAW float vectors ([[VectorMath.cosine]]) so scores are
  * bit-exact against a double-precision SQL oracle.
  *
  * Ordering per reference `ORDER BY score DESC`; ties pinned by code
  * ASC (reference order unspecified; SURVEY.md §7.4).
  */
object DefinitionSearch {

  /** Reference default top_k=5 (semantic_retrievers.py:129). */
  val DefaultK = 5

  /** queries: (query_id, description) -> top-k CDEs by definition
    * cosine: (query_id, rank, code, term, definition, score). */
  def findCdeByDefinition(spark: SparkSession, queries: DataFrame,
                          prepared: PreparedDict, k: Int = DefaultK): DataFrame =
    byDefinition(spark, queries, prepared, "CDE", k)

  /** queries: (query_id, description) -> top-k NCIT concepts by
    * definition cosine. */
  def findNcitByDefinition(spark: SparkSession, queries: DataFrame,
                           prepared: PreparedDict, k: Int = DefaultK): DataFrame =
    byDefinition(spark, queries, prepared, "NCIT", k)

  private def byDefinition(spark: SparkSession, queries: DataFrame,
                           prepared: PreparedDict, ctype: String, k: Int): DataFrame = {
    import spark.implicits._
    val bc = prepared.defs
    val ct = ctype
    val kk = k
    queries.select(queries.col("query_id").cast("string"),
        queries.col("description").cast("string"))
      .as[(String, String)]
      .flatMap { case (qid, desc) =>
        val qv = Vectorizer.vectorizeChar(desc)
        topDefs(qv, bc.value, ct, kk).zipWithIndex.map {
          case ((code, term, defn, score), i) => (qid, i + 1, code, term, defn, score)
        }
      }
      .toDF("query_id", "rank", "code", "term", "definition", "score")
  }

  /** Scan the broadcast definition matrix for one query vector; top-k
    * of the requested node type by (score DESC, code ASC). */
  def topDefs(qv: Array[Float],
              defs: Array[(String, String, String, String, Array[Float])],
              ctype: String, k: Int): Seq[(String, String, String, Double)] = {
    val scored = scala.collection.mutable.ArrayBuffer.empty[(String, String, String, Double)]
    var i = 0
    while (i < defs.length) {
      val (t, code, term, defn, dv) = defs(i)
      if (t == ctype) scored += ((code, term, defn, VectorMath.cosine(qv, dv)))
      i += 1
    }
    scored.sortBy { case (code, _, _, s) => (-s, code) }.take(k).toSeq
  }
}
