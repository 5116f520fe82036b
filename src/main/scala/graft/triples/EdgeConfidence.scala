package graft.triples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edge confidence scoring — the weight a KG serving layer attaches to
  * each mined edge so consumers can threshold by trust. Mirrors the
  * reference's two-signal weighted combine (semantic_retrievers.py's
  * 0.7/0.3 semantic+fuzzy rerank, our F5 operator) but over the
  * signals a TEMPORAL mined edge actually has: observation support
  * (how often the corpus asserted it) and recency (how close its last
  * observation sits to the corpus frontier — stale edges decay).
  *
  *   support_ppm  = 10⁶ · min(n_obs, cap) / cap        (saturating)
  *   recency_ppm  = 10⁶ · (last_seen − lo) / (hi − lo)  (hi > lo)
  *   conf_ppm     = (7·support_ppm + 3·recency_ppm) / 10
  *
  * All three are exact floor-scaled 64-bit integer arithmetic —
  * reduction-order independent, bit-portable to the DuckDB oracle, no
  * float on the compare path (ln/exp decay curves are monotone
  * rescalings; ranking by conf_ppm is ranking by any of them).
  *
  * Scale shape: pure map-side column arithmetic over the scoped edge
  * table ([[TemporalScope.scopeEdges]] output — edge-domain-sized, not
  * corpus-sized); the corpus time bounds arrive as a 1-row aggregate
  * cross-joined in (broadcast, never a driver collect of data rows).
  */
object EdgeConfidence {

  /** @param scoped (subj, pred, obj, first_seen, last_seen, n_obs) —
    *               [[TemporalScope.scopeEdges]] output
    * @param supportCap n_obs value at which support saturates (≥1)
    * @return scoped + (support_ppm, recency_ppm, conf_ppm)
    */
  def score(scoped: DataFrame, supportCap: Long = 10L): DataFrame = {
    require(supportCap >= 1L, "supportCap must be >= 1")
    val bounds = scoped.agg(min(col("first_seen")).as("lo"),
      max(col("last_seen")).as("hi"))
    scoped.crossJoin(broadcast(bounds))
      .withColumn("support_ppm",
        expr(s"(1000000 * least(n_obs, ${supportCap}L)) div ${supportCap}L")
          .cast("long"))
      // single-observation corpora (hi == lo) get full recency rather
      // than a 0/0
      .withColumn("recency_ppm",
        when(col("hi") === col("lo"), lit(1000000L))
          .otherwise(expr("(1000000 * (last_seen - lo)) div (hi - lo)"))
          .cast("long"))
      .withColumn("conf_ppm",
        expr("(7 * support_ppm + 3 * recency_ppm) div 10").cast("long"))
      .drop("lo", "hi")
  }
}
