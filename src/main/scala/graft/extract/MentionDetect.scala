package graft.extract

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Dataset

import graft.dict.AhoCorasick
import graft.functions.Hashing
import graft.model.{Mention, Turn}

/** Stage 1 of the pipeline: per-turn batched mention detection
  * against the broadcast dictionary automaton (north star; SURVEY.md
  * §2.10). One `flatMap` over `Dataset[Turn]` — embarrassingly
  * parallel, no shuffle, dictionary never leaves the broadcast.
  *
  * Two mention kinds:
  *  - "dict": word-bounded Aho–Corasick hits on dictionary surfaces
  *    (replaces the reference's per-value exact/term Neo4j lookups,
  *    reference exact_match.py:17-120, executed set-based here);
  *  - "value": double-quoted raw values (the reference's raw PV
  *    strings arriving via agent input, reference llm_agent_4o.py:69)
  *    which must run the full fuzzy/semantic ladder.
  * When a quoted span coincides with a dict hit the dict mention wins
  * (deterministic preference, SURVEY.md §7.4 tie-break discipline).
  */
object MentionDetect {

  private val Quoted = "\"([^\"]{1,64})\"".r

  def mentionsOf(ac: AhoCorasick, t: Turn): Iterator[Mention] =
    matchesIn(ac, t.conv_id, t.turn_idx, t.text)

  def matchesIn(ac: AhoCorasick, convId: String, turnIdx: Int,
                text: String): Iterator[Mention] = {
    if (text == null || text.isEmpty) return Iterator.empty
    val dictHits = ac.findMatches(text).map { case (b, e) =>
      Mention(convId, turnIdx, b, e, text.substring(b, e),
        Hashing.norm(text.substring(b, e)), "dict")
    }
    val dictSpans = dictHits.iterator.map(m => (m.begin, m.end)).toSet
    val valueHits = Quoted.findAllMatchIn(text).map { m =>
      val b = m.start(1); val e = m.end(1)
      Mention(convId, turnIdx, b, e, text.substring(b, e),
        Hashing.norm(text.substring(b, e)), "value")
    }.filterNot(m => dictSpans.contains((m.begin, m.end)))
    dictHits.iterator ++ valueHits
  }

  def detect(turns: Dataset[Turn], ac: Broadcast[AhoCorasick]): Dataset[Mention] = {
    import turns.sparkSession.implicits._
    // project to the three columns the matcher reads BEFORE the
    // flatMap: the narrow select reaches the parquet scan (ReadSchema
    // prunes role/tool/ts) and the per-turn decode stops allocating
    // a Timestamp + two strings per row that nobody uses
    turns.select(turns("conv_id"), turns("turn_idx"), turns("text"))
      .as[(String, Int, String)]
      .flatMap { case (cid, ti, text) =>
        matchesIn(ac.value, cid, ti, text)
      }
  }
}
