package graft.streaming

import java.sql.Timestamp

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.dict.AhoCorasick
import graft.extract.MentionDetect
import graft.functions.Hashing
import graft.model.Turn

/** Stateful streaming layer: per-conversation FIRST-OCCURRENCE mention
  * emission across micro-batches (`flatMapGroupsWithState` — the
  * custom-state construct SURVEY.md §2.8 reserves for semantics the
  * stateless ingest adapter cannot express).
  *
  * Why it exists: on a transcript firehose the same surface recurs in
  * nearly every turn of a conversation ("the patient", the drug under
  * discussion, ...). Linking each recurrence re-does identical ladder
  * work and re-merges identical LINKED_TO triples. Keyed state makes
  * the dedup incremental: a mention is emitted the first time its
  * normalized surface appears in its conversation, including ACROSS
  * micro-batches — something no stateless operator or per-batch
  * `dropDuplicates` can do (streaming `dropDuplicates` keeps unbounded
  * state per key and never scopes it to a conversation lifecycle).
  *
  * State & scale contract (the 10^12-turn view):
  *  - state per conversation is a flat `Array[Long]` of 8-byte
  *    surface hashes — bounded by DISTINCT surfaces in the
  *    conversation, not by turns, so a 10^5-turn hot conversation
  *    with 200 distinct surfaces holds 1.6 KB;
  *  - the shuffle is keyed by conv_id (the same key the corpus is
  *    already bucketed by downstream); AQE cannot split a single
  *    group, but per-group work is the group's batch slice only;
  *  - event-time timeout (watermark + `idleGap`) REMOVES state for
  *    conversations that stopped producing turns — total state is
  *    O(active conversations), not O(all conversations ever seen).
  *
  * Determinism: within a batch the group iterator is sorted by
  * (turn_idx, begin) before the first-occurrence scan, so the emitted
  * row for a repeated surface is always its earliest position
  * (SURVEY.md §7.4 tie-break discipline), independent of shuffle
  * arrival order.
  */
object StatefulLink {

  /** A mention carrying its turn's event time (watermark column). */
  final case class TimedMention(
      conv_id: String, turn_idx: Int, begin: Int, end: Int,
      surface: String, norm: String, kind: String, ts: Timestamp)

  /** Keyed state: hashes of normalized surfaces already emitted for
    * this conversation. Flat primitive array — product-encoder
    * friendly, no boxing in the state store. */
  final case class ConvSeen(hashes: Array[Long])

  val DefaultIdleGap: String = "30 minutes"

  private def gapMs(gap: String): Long = {
    // reuse Spark's own interval parser via CalendarInterval? A
    // two-token "<n> <unit>" grammar keeps the contract obvious:
    val Array(n, unit) = gap.trim.split("\\s+")
    val ms = unit.toLowerCase match {
      case "second" | "seconds" => 1000L
      case "minute" | "minutes" => 60000L
      case "hour" | "hours"     => 3600000L
      case u => throw new IllegalArgumentException(s"idleGap unit: $u")
    }
    n.toLong * ms
  }

  /** First-occurrence mentions per conversation, stateful across
    * micro-batches. Streaming-only: the event-time timeout needs the
    * watermark this operator installs (batch inputs already have the
    * whole conversation in hand — use a plain window/dropDuplicates
    * there).
    *
    * @param idleGap event-time gap after a conversation's last seen
    *                turn before its state is dropped. A turn arriving
    *                later than the watermark allows re-opens the
    *                conversation with fresh state (documented
    *                re-emission, the standard watermark contract).
    */
  def novelMentions(turns: Dataset[Turn], ac: Broadcast[AhoCorasick],
                    watermarkDelay: String = "1 hour",
                    idleGap: String = DefaultIdleGap): Dataset[TimedMention] = {
    import turns.sparkSession.implicits._
    val gap = gapMs(idleGap)
    val mentions = turns
      .flatMap { t =>
        MentionDetect.mentionsOf(ac.value, t)
          .map(m => TimedMention(m.conv_id, m.turn_idx, m.begin, m.end,
            m.surface, m.norm, m.kind, t.ts))
      }
      .withWatermark("ts", watermarkDelay)

    mentions
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (_: String, batch: Iterator[TimedMention], state: GroupState[ConvSeen]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var seen = state.getOption.map(_.hashes.toSet).getOrElse(Set.empty[Long])
            val sorted = batch.toArray.sortBy(m => (m.turn_idx, m.begin))
            var maxTs = 0L
            val out = Array.newBuilder[TimedMention]
            for (m <- sorted) {
              if (m.ts != null && m.ts.getTime > maxTs) maxTs = m.ts.getTime
              val h = Hashing.hash64(m.norm)
              if (!seen.contains(h)) { seen += h; out += m }
            }
            state.update(ConvSeen(seen.toArray))
            // drop this conversation's state once the watermark passes
            // its last activity + idleGap (timestamp must exceed the
            // current watermark or Spark rejects it)
            val target = math.max(maxTs + gap, state.getCurrentWatermarkMs + 1)
            state.setTimeoutTimestamp(target)
            out.result().iterator
          }
        })
  }
}
