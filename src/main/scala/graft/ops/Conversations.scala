package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversation-native operators over the BASELINE.json input_hint
  * transcript shape `(conv_id, turn_idx, role, text, tool, ts)` — the
  * table this engine ingests (reference analog: the raw-value streams
  * the kg-toolkit maps one value at a time; here whole conversations
  * are first-class rows of a distributed table).
  *
  * All three operators share one scale shape: a single shuffle keyed
  * on `conv_id` (the natural partitioning of any transcript store —
  * co-partitioned input makes them shuffle-free), windows ordered by
  * the unique-in-conversation `turn_idx`, and no driver participation.
  * A conversation is bounded (10^2-10^4 turns), so per-key state never
  * approaches executor memory even at 100 TB corpus scale; a
  * pathological mega-conversation is ordinary window skew, split by
  * AQE where an aggregation follows.
  */
object Conversations {

  /** Context-response training pairs: for every assistant turn with at
    * least one preceding turn, the previous `nContext` turns rendered
    * as "role: text" lines become the context and the assistant text
    * the response — the supervised-fine-tuning extraction every
    * dialogue pipeline runs over raw transcripts.
    *
    * One window pass (no self-join): `collect_list` over a bounded
    * ROWS frame is evaluated in frame order (turn_idx ASC, unique per
    * conversation), so the rendered context is deterministic under any
    * partitioning. The frame bound keeps per-row state at `nContext`
    * lines no matter how long the conversation is.
    */
  def contextPairs(turns: DataFrame, nContext: Int = 3): DataFrame = {
    require(nContext >= 1, s"nContext must be >= 1, got $nContext")
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
      .rowsBetween(-nContext, -1)
    turns
      .withColumn("context",
        concat_ws("\n", collect_list(concat(col("role"), lit(": "), col("text"))).over(w)))
      .filter(col("role") === "assistant" && col("turn_idx") > 0)
      .select(col("conv_id"), col("turn_idx"), col("context"),
        col("text").as("response"))
  }

  /** Per-conversation integrity report — the transcript-quality gate a
    * training pipeline runs before extraction (drop truncated or
    * corrupted conversations instead of learning from them):
    *
    *  - `n_turns` / `max_idx`: raw size vs the highest index seen;
    *  - `n_gaps`: missing turn indices (= max_idx + 1 - n_turns when
    *    turn_idx is unique; a dropped-message signature);
    *  - `n_role_repeats`: adjacent same-role turns (broken alternation);
    *  - `starts_with_user`: whether index 0 exists and is a user turn;
    *  - `n_tool_turns` / `n_distinct_tools`: tool-use density.
    *
    * One window pass for the lag flag, then one groupBy — both keyed
    * on conv_id, partial-aggregated map-side.
    */
  def integrity(turns: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    turns
      .withColumn("role_repeat",
        when(lag(col("role"), 1).over(w) === col("role"), 1L).otherwise(0L))
      .groupBy(col("conv_id"))
      .agg(
        count(lit(1)).as("n_turns"),
        max(col("turn_idx")).cast("long").as("max_idx"),
        (max(col("turn_idx")).cast("long") + 1L - count(lit(1))).as("n_gaps"),
        sum(col("role_repeat")).as("n_role_repeats"),
        // no turn 0 at all -> NULL comparison -> pinned false
        coalesce(max(when(col("turn_idx") === 0, col("role"))) === "user",
          lit(false)).as("starts_with_user"),
        count(col("tool")).as("n_tool_turns"),
        countDistinct(col("tool")).as("n_distinct_tools"))
  }

  /** Tool-call transition bigram counts: among the tool-bearing turns
    * of each conversation in turn order, how often does tool A hand
    * off to tool B (first tool of a conversation transitions from the
    * sentinel "START")? The Markov-chain statistic behind tool-use
    * analytics and agent-behavior drift detection.
    *
    * lag window over the tool-turn subset (keyed on conv_id), then a
    * two-stage count agg on the (prev, next) pair — the pair domain is
    * tools², tiny, so the final shuffle is negligible at any corpus
    * size.
    */
  def toolTransitions(turns: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    turns.filter(col("tool").isNotNull)
      .withColumn("prev_tool", coalesce(lag(col("tool"), 1).over(w), lit("START")))
      .groupBy(col("prev_tool"), col("tool").as("next_tool"))
      .agg(count(lit(1)).as("n"))
  }

  /** Conversation-level exact dedup — whole conversations (not
    * documents) are the dedup unit for dialogue training data:
    * re-ingested or mirrored transcripts repeat the entire turn
    * sequence under a different conv_id. The fingerprint is the
    * 64-bit hash of the turn texts joined in turn order; the order is
    * pinned by sorting the collected (turn_idx, text) structs —
    * `collect_list` alone has NO ordering guarantee under a groupBy,
    * the classic silent nondeterminism.
    *
    * Shapes: one conv-keyed groupBy (agg state = one conversation's
    * turns, bounded) + one window keyed on the hash (duplicate groups
    * are tiny). Canonical = lexicographically smallest conv_id of the
    * group — deterministic under any partitioning.
    */
  def dedupExact(turns: DataFrame): DataFrame = {
    val rendered = array_join(
      transform(array_sort(collect_list(struct(col("turn_idx"), col("text")))),
        x => x.getField("text")), "\n")
    val w = Window.partitionBy(col("conv_hash"))
    turns.groupBy(col("conv_id"))
      .agg(count(lit(1)).as("n_turns"), rendered.as("rendered"))
      .withColumn("conv_hash", graft.Functions.hash64_str(col("rendered")))
      .withColumn("canonical_id", min(col("conv_id")).over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("is_canonical", (col("conv_id") === col("canonical_id")).cast("int"))
      .select(col("conv_id"), col("n_turns"), col("conv_hash"),
        col("canonical_id"), col("group_size"), col("is_canonical"))
  }
}
