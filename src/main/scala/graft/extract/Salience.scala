package graft.extract

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity salience per conversation — which linked concepts a
  * conversation is ABOUT, not merely ones it brushed past. Downstream
  * KG consumers weight edges by it (a concept mentioned in 40% of a
  * conversation's turns is a stronger LINKED_TO signal than a
  * drive-by), and training-data curation samples by it (conversations
  * salient for a target domain).
  *
  * Score = fraction of the conversation's turns that mention the
  * concept, as an exact floor-scaled ppm integer (turn presence, not
  * mention frequency — a turn that repeats a term 50 times is one
  * observation, which de-noises verbatim tool output). Ranking per
  * conversation is (salience desc, code asc) — fully deterministic.
  *
  * Scale shape: two aggregations keyed on conv_id / (conv_id, code) —
  * map-side partial counts, shuffle bounded by |convs| × |dictionary|;
  * the per-conv turn total joins back keyed on conv_id (AQE picks
  * broadcast when the conv domain is small). The rank window
  * partitions by conv_id — same key, no extra exchange after the join.
  */
object Salience {

  /** @param mentions (conv_id, turn_idx, code) — linked mentions;
    *                 duplicates within a turn collapse
    * @param turns    (conv_id, turn_idx) — the full turn universe
    *                 (salience denominators count ALL turns, including
    *                 mention-free ones)
    * @return (conv_id, code, n_mention_turns, n_turns, salience_ppm,
    *         rank) — one row per (conversation, mentioned concept)
    */
  def perConversation(mentions: DataFrame, turns: DataFrame): DataFrame = {
    val m = mentions.select(col("conv_id"), col("turn_idx"), col("code"))
      .distinct()
      .groupBy(col("conv_id"), col("code"))
      .agg(count(lit(1)).as("n_mention_turns"))
    val t = turns.select(col("conv_id"), col("turn_idx")).distinct()
      .groupBy(col("conv_id")).agg(count(lit(1)).as("n_turns"))
    val w = Window.partitionBy(col("conv_id"))
      .orderBy(col("salience_ppm").desc, col("code"))
    m.join(t, "conv_id")
      .withColumn("salience_ppm",
        expr("(1000000 * n_mention_turns) div n_turns").cast("long"))
      .withColumn("rank", row_number().over(w))
  }
}
