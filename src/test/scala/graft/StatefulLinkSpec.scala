package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.fixtures.Fixtures
import graft.model.Turn
import graft.streaming.StatefulLink

/** Cross-batch keyed state (`flatMapGroupsWithState`): the
  * first-occurrence contract, per-conversation scoping, and
  * event-time state expiry. Micro-batch boundaries are forced with
  * MemoryStream.addData + processAllAvailable so every "across
  * batches" claim is actually across batches.
  */
class StatefulLinkSpec extends SparkTestBase {
  import spark.implicits._

  private def t(conv: String, idx: Int, text: String, at: String): Turn =
    Turn(conv, idx, "user", text, None, Timestamp.valueOf(at))

  test("novel-mention stream dedups within and across micro-batches, per conversation") {
    val dict = Fixtures.dict(spark)
    val ac = dict.broadcastAutomaton(spark)
    val in = MemoryStream[Turn](spark)
    val out = StatefulLink.novelMentions(in.toDS(), ac,
      watermarkDelay = "1 hour", idleGap = "30 minutes")

    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("novel_mentions")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      def rows() = spark.table("novel_mentions")
        .as[StatefulLink.TimedMention].collect().toSeq

      // batch 1: "biopsy" twice in one turn + once more next turn ->
      // ONE emission, at the earliest (turn_idx, begin)
      in.addData(
        t("c1", 0, "schedule a biopsy; the biopsy is urgent", "2026-01-01 00:00:00"),
        t("c1", 1, "biopsy confirmed", "2026-01-01 00:01:00"))
      q.processAllAvailable()
      val b1 = rows()
      assert(b1.map(_.norm) === Seq("biopsy"))
      assert(b1.head.turn_idx === 0 && b1.head.begin === 11)

      // batch 2: same conversation repeats "biopsy" (suppressed by
      // STATE, not by in-batch dedup) and adds "arthritis" (novel);
      // a different conversation's "biopsy" is novel again (state is
      // per-conversation)
      in.addData(
        t("c1", 2, "biopsy results suggest arthritis", "2026-01-01 00:10:00"),
        t("c2", 0, "another biopsy request", "2026-01-01 00:10:00"))
      q.processAllAvailable()
      val b2 = rows().sortBy(m => (m.conv_id, m.turn_idx, m.begin))
      assert(b2.map(m => (m.conv_id, m.norm)) ===
        Seq(("c1", "biopsy"), ("c1", "arthritis"), ("c2", "biopsy")))
      assert(b2.filter(_.conv_id == "c1").map(_.turn_idx) === Seq(0, 2),
        "the batch-2 'biopsy' repeat must be suppressed by cross-batch state")
    } finally q.stop()
  }

  test("property: streaming novel mentions == batch first-occurrences, any micro-batch split") {
    val dict = Fixtures.dict(spark)
    val ac = dict.broadcastAutomaton(spark)
    val surfaces = Seq("biopsy", "stroke", "arthritis", "metastasis",
      "obesity", "heart attack", "dose", "age")
    val rnd = new scala.util.Random(42)
    // 6 conversations x 12 turns, 1-3 known surfaces per turn, all
    // timestamps inside one watermark window (nothing can be late)
    val turns = for {
      c <- 0 until 6; i <- 0 until 12
    } yield {
      val text = Seq.fill(1 + rnd.nextInt(3))(surfaces(rnd.nextInt(surfaces.size)))
        .mkString("patient with ", " and ", " today")
      t(s"conv$c", i, text, f"2026-01-01 00:${i}%02d:00")
    }
    // batch-side expected: earliest (turn_idx, begin) per (conv, norm)
    val expected = turns.flatMap(tn =>
        graft.extract.MentionDetect.matchesIn(ac.value, tn.conv_id, tn.turn_idx, tn.text))
      .groupBy(m => (m.conv_id, m.norm))
      .map { case (_, ms) => ms.minBy(m => (m.turn_idx, m.begin)) }
      .toSeq.map(m => (m.conv_id, m.turn_idx, m.begin, m.norm)).sorted

    // random micro-batch boundaries, turn order preserved
    val in = MemoryStream[Turn](spark)
    val q = StatefulLink.novelMentions(in.toDS(), ac)
      .writeStream.outputMode("append").format("memory")
      .queryName("novel_parity").trigger(Trigger.ProcessingTime(0)).start()
    try {
      var rest = turns.sortBy(tn => (tn.turn_idx, tn.conv_id))
      while (rest.nonEmpty) {
        val k = 1 + rnd.nextInt(15)
        in.addData(rest.take(k))
        rest = rest.drop(k)
        q.processAllAvailable()
      }
      val got = spark.table("novel_parity").as[StatefulLink.TimedMention]
        .collect().toSeq.map(m => (m.conv_id, m.turn_idx, m.begin, m.norm)).sorted
      assert(got === expected)
    } finally q.stop()
  }

  test("idle conversations expire by event time and re-open with fresh state") {
    val dict = Fixtures.dict(spark)
    val ac = dict.broadcastAutomaton(spark)
    val in = MemoryStream[Turn](spark)
    val out = StatefulLink.novelMentions(in.toDS(), ac,
      watermarkDelay = "1 hour", idleGap = "30 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("novel_expiry")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      def rows() = spark.table("novel_expiry")
        .as[StatefulLink.TimedMention].collect().toSeq

      in.addData(t("c1", 0, "first biopsy", "2026-01-01 00:00:00"))
      q.processAllAvailable()
      assert(rows().count(_.conv_id == "c1") === 1)

      // advance the watermark far past c1's (last activity + idleGap)
      // via another conversation; the NEXT batch fires c1's timeout
      in.addData(t("c2", 0, "unrelated stroke report", "2026-01-01 12:00:00"))
      q.processAllAvailable()
      in.addData(t("c2", 1, "watermark push", "2026-01-01 12:00:01"))
      q.processAllAvailable() // c1 times out here; emits nothing
      assert(rows().count(_.conv_id == "c1") === 1)

      // c1 re-opens AFTER expiry: the same surface is novel again
      in.addData(t("c1", 10, "follow-up biopsy", "2026-01-01 12:30:00"))
      q.processAllAvailable()
      val c1 = rows().filter(_.conv_id == "c1").sortBy(_.turn_idx)
      assert(c1.map(m => (m.turn_idx, m.norm)) === Seq((0, "biopsy"), (10, "biopsy")),
        s"expected re-emission after state expiry, got $c1")
    } finally q.stop()
  }
}
