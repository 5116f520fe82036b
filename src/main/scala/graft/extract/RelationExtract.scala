package graft.extract

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pattern-based relation extraction between linked mentions — the
  * step that turns a bag of entity links into TYPED edges: when two
  * dictionary concepts co-occur in one turn with a connective keyword
  * between them ("X … causes … Y"), emit (X, PRED, Y) instead of the
  * untyped co-occurrence edge. The reference's graph carries only
  * curated predicate types (schema.png: IS_PV_OF / MAPS_TO /
  * HAS_SYNONYM); a transcript corpus has to MINE its predicates, and
  * Hearst-style connective patterns are the standard non-LLM baseline.
  *
  * Matching semantics are a single regular expression per (term₁,
  * keyword, term₂) candidate — `\bt₁\b.*\bkw\b.*\bt₂\b` over the
  * lower-cased turn — i.e. "some word-bounded occurrence of t₁, then
  * the keyword, then t₂, in order". Both engines evaluate the SAME
  * pattern (Java regex here, RE2 in the DuckDB oracle; the construct
  * set used — `\b`, `.*`, literals — behaves identically), so the
  * oracle equality is by construction, not by reimplementation.
  *
  * Scale shape: candidates come from the already-detected mention set,
  * NOT from dictionary × corpus — a self-join of per-turn mentions
  * keyed on (conv_id, turn_idx) whose fan-out is bounded by the
  * dictionary size per turn, then one broadcast of the pattern table
  * and a map-side regex test against the turn text. A turn with no
  * two distinct linked mentions never enters the join. The regex
  * evaluates only on (candidate pair × keyword) rows, never on every
  * (turn × dictionary²) combination.
  */
object RelationExtract {

  /** @param turns    (conv_id, turn_idx, text)
    * @param mentions (conv_id, turn_idx, code, term) — detected links,
    *                 one row per distinct concept per turn
    * @param patterns (kw, pred) — connective keyword → predicate name;
    *                 dictionary-sized, broadcast
    * @return (subj, pred, obj, conv_id, turn_idx) — one row per
    *         (ordered concept pair, predicate, turn) whose pattern
    *         fires; subj's term precedes obj's in the text per the
    *         regex order
    */
  def patternRelations(turns: DataFrame, mentions: DataFrame,
                       patterns: DataFrame): DataFrame = {
    val m = mentions.select(col("conv_id"), col("turn_idx"),
      col("code"), col("term")).distinct()
    val pairs = m.as("m1").join(m.as("m2"),
        col("m1.conv_id") === col("m2.conv_id") &&
          col("m1.turn_idx") === col("m2.turn_idx") &&
          col("m1.code") =!= col("m2.code"))
      .select(col("m1.conv_id").as("conv_id"),
        col("m1.turn_idx").as("turn_idx"),
        col("m1.code").as("subj"), col("m1.term").as("t1"),
        col("m2.code").as("obj"), col("m2.term").as("t2"))
    pairs
      .join(turns.select(col("conv_id"), col("turn_idx"), col("text")),
        Seq("conv_id", "turn_idx"))
      .crossJoin(broadcast(patterns.select(col("kw"), col("pred"))))
      // ordered_terms is the linear-scan twin of the
      // \bt₁\b.*\bkw\b.*\bt₂\b regex the oracle evaluates (the regex's
      // .* backtracking is O(n²) per candidate and dominated this
      // operator's cost at sf0.1); greedy leftmost occurrences are
      // complete for existence, so the two are semantically equal
      // (parity property-tested in FunctionsSpec)
      .filter(graft.Functions.ordered_terms(lower(col("text")),
        array(col("t1"), col("kw"), col("t2"))))
      .select(col("subj"), col("pred"), col("obj"),
        col("conv_id"), col("turn_idx"))
  }
}
