package graft.triples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity co-occurrence statistics over linked mentions — the
  * statistical KG-enrichment step downstream of entity linking: two
  * concepts that keep showing up in the same conversations are
  * related even when no dictionary edge says so (the reference's
  * graph only carries curated caDSR/NCIT structure — reference
  * schema.png, semantic_retrievers.py:108-109; co-occurrence is how
  * a transcript corpus ADDS edges to it). Emitted as weighted
  * (code_a, COOCCURS_WITH, code_b) candidate edges ranked by lift.
  *
  * Scoring is exact integer arithmetic end to end. PMI/lift needs
  * p(a,b) / (p(a)·p(b)) = pair_n·n_conv / (n_a·n_b); instead of a
  * float log we emit the exact numerator/denominator and the
  * floor-scaled ratio lift_ppm = ⌊10⁶·pair_n·n_conv / (n_a·n_b)⌋ —
  * order-independent, reduction-order-independent and bit-portable
  * to any engine with 64-bit integers (PMI = ln(lift_ppm/10⁶) is a
  * monotone rescale, so ranking by lift_ppm IS ranking by PMI).
  * lift_ppm > 10⁶ means positive association.
  *
  * Scale shape: ONE shuffle keyed on conv_id builds the per-
  * conversation distinct concept set (collect_set state is bounded
  * by the dictionary, not the conversation length); pair expansion
  * is map-side from that set (explode × explode over a bounded
  * array); the pair/count aggregations shuffle only the concept and
  * concept-pair domains — dictionary-sized, negligible next to the
  * corpus regardless of corpus size. The count tables joined back
  * onto pairs are dictionary-sized and broadcast. No self-join of
  * the mention table (the naive formulation shuffles the corpus
  * twice and explodes on hot conversations).
  */
object Cooccurrence {

  /** Per-conversation co-mention pairs with exact lift components.
    *
    * @param links mention-level links: (conv_id, code) — duplicates
    *              (multiple mentions of a concept in a conversation)
    *              are collapsed; presence, not frequency, is counted.
    * @return (code_a, code_b, pair_n, n_a, n_b, n_conv, lift_ppm)
    *         with code_a < code_b, one row per co-occurring pair.
    */
  def convCooccur(links: DataFrame): DataFrame = {
    val m = links.select(col("conv_id"), col("code"))
    // one conv-keyed shuffle; set state bounded by |dictionary|
    val sets = m.groupBy(col("conv_id"))
      .agg(collect_set(col("code")).as("codes"))
    // n_conv as a 1-row broadcast, not a driver round-trip
    val nConv = sets.agg(count(lit(1)).as("n_conv"))
    // per-concept conversation frequency — dictionary-sized result
    val nA = sets.select(explode(col("codes")).as("code"))
      .groupBy(col("code")).agg(count(lit(1)).as("n"))
    // pair expansion map-side: explode × explode over the bounded set
    val pairs = sets
      .select(col("codes"), explode(col("codes")).as("code_a"))
      .select(col("code_a"), explode(col("codes")).as("code_b"))
      .filter(col("code_a") < col("code_b"))
      .groupBy(col("code_a"), col("code_b"))
      .agg(count(lit(1)).as("pair_n"))
    pairs
      .join(broadcast(nA.select(col("code").as("code_a"), col("n").as("n_a"))), "code_a")
      .join(broadcast(nA.select(col("code").as("code_b"), col("n").as("n_b"))), "code_b")
      .crossJoin(broadcast(nConv))
      // exact integer floor division in DECIMAL(38,0) (DuckDB twin:
      // HUGEINT //) — never a double on the compare path, and the
      // numerator 10⁶·pair_n·n_conv cannot wrap 64 bits the way a
      // BIGINT product silently does in Spark once pair_n·n_conv
      // nears ~9·10¹² (plausible at 10¹²-turn corpora; DuckDB would
      // raise instead — the asymmetry this form removes). Result fits
      // BIGINT: lift_ppm ≤ 10⁶·n_conv (pair_n ≤ min(n_a, n_b)), i.e.
      // safe through 10¹² conversations.
      .withColumn("lift_ppm",
        expr("(CAST(1000000 AS DECIMAL(38,0)) * pair_n * n_conv)" +
          " div (CAST(n_a AS DECIMAL(38,0)) * n_b)").cast("long"))
      .select(col("code_a"), col("code_b"), col("pair_n"),
        col("n_a"), col("n_b"), col("n_conv"), col("lift_ppm"))
  }

  /** The co-occurrence pairs as COOCCURS_WITH triples (weight kept as
    * a property column), filtered to positively associated pairs —
    * the edge set a graph-merge ingests alongside the curated ones. */
  def cooccurEdges(links: DataFrame, minPairN: Long = 2L): DataFrame =
    convCooccur(links)
      .filter(col("pair_n") >= minPairN && col("lift_ppm") > 1000000L)
      .select(col("code_a").as("subj"), lit("COOCCURS_WITH").as("pred"),
        col("code_b").as("obj"), col("lift_ppm"))
}
