package graft.model

import java.sql.Timestamp

/** Core row types of the KG-construction pipeline.
  *
  * Schemas mirror the reference's de-facto Neo4j property schema
  * (reference README.md:116-133) and the transcript input contract
  * (conv_id, turn_idx, role, text, tool, ts) from BASELINE.json.
  * All are plain case classes so `Encoders.product` gives Catalyst
  * encoders for typed Datasets.
  */

/** One transcript turn — the engine's main input row.
  * `tool` is nullable (only role=tool turns carry it). */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: Option[String],
    ts: Timestamp)

/** A dictionary concept (NCIT / PV / CDE vertex).
  * `definition` nullable — the reference guards nulls
  * (reference exact_match.py:58). `embedding` is the deterministic
  * local vector standing in for openai_embedding (SURVEY.md S6). */
final case class Concept(
    code: String,
    term: String,
    definition: Option[String],
    ctype: String,
    embedding: Array[Float])

/** Materialized HAS_SYNONYM edge row: ncit code -> synonym surface
  * (reference synonym_tool.py:29,64 returns only syn.term). */
final case class Synonym(code: String, term: String)

/** Generic dictionary edge (src_code, dst_code) for one rel type. */
final case class DictEdge(src: String, dst: String)

/** A detected mention of a candidate surface inside one turn.
  * `begin`/`end` are char offsets into `text` ([begin, end)).
  * `kind` is "dict" (Aho-Corasick hit) or "value" (quoted raw value,
  * which must go through the fuzzy/semantic ladder stages). */
final case class Mention(
    conv_id: String,
    turn_idx: Int,
    begin: Int,
    end: Int,
    surface: String,
    norm: String,
    kind: String)

/** One mention -> concept link produced by the match ladder.
  * `stage`: 1 exact-code, 2 exact-term, 3 synonym, 4 fuzzy,
  * 5 semantic, 6 definition-embedding (cascade priority per
  * reference llm_agent_4o.py:485-508).
  * `confidence` bands per reference test_semantic_retrievers.py:270-276. */
final case class Link(
    conv_id: String,
    turn_idx: Int,
    begin: Int,
    end: Int,
    surface: String,
    code: String,
    stage: Int,
    score: Double,
    confidence: String)

/** A knowledge-graph triple. pred in
  * {LINKED_TO, MAPS_TO, HAS_SYNONYM, SAME_AS}. */
final case class Triple(subj: String, pred: String, obj: String)
