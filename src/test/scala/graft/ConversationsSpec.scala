package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.ops.{Conversations, Sampling}

/** Conversation-native ops over the input_hint transcript shape plus
  * the mixture-epoch resampler. Pins exact context rendering, frame
  * bounds, gap/alternation accounting, the START transition sentinel,
  * and fractional-epoch copy counts. */
class ConversationsSpec extends SparkTestBase {
  import spark.implicits._

  private def turns(rows: (String, Int, String, String, String)*): DataFrame =
    rows.toSeq.map { case (c, i, r, t, tool) =>
      (c, i, r, t, tool, new Timestamp(1704067200000L + i * 1000L))
    }.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")

  test("contextPairs: bounded frame, role-tagged lines, assistant-only") {
    val t = turns(
      ("c1", 0, "user", "hello", null),
      ("c1", 1, "assistant", "hi there", null),
      ("c1", 2, "user", "run it", null),
      ("c1", 3, "tool", "ok: done", "tool_1"),
      ("c1", 4, "assistant", "it ran", null),
      ("c2", 0, "assistant", "orphan", null)) // no context -> dropped
    val got = Conversations.contextPairs(t, nContext = 2)
      .as[(String, Int, String, String)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      ("c1", 1, "user: hello", "hi there"),
      // frame keeps ONLY the previous 2 turns (turn 2 and 3)
      ("c1", 4, "user: run it\ntool: ok: done", "it ran")))
  }

  test("integrity: gaps, role repeats, start role, tool counts") {
    val t = turns(
      ("c1", 0, "user", "a", null),
      ("c1", 1, "assistant", "b", null),
      ("c1", 3, "assistant", "c", "tool_2"), // gap at 2, repeat of role
      ("c1", 4, "tool", "d", "tool_2"),
      ("c2", 1, "assistant", "x", null)) // no turn 0 at all
    val got = Conversations.integrity(t)
      .as[(String, Long, Long, Long, Long, Boolean, Long, Long)]
      .collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      ("c1", 4L, 4L, 1L, 1L, true, 2L, 1L),
      ("c2", 1L, 1L, 1L, 0L, false, 0L, 0L))) // no turn 0 -> false
  }

  test("toolTransitions: START sentinel and in-order bigrams") {
    val t = turns(
      ("c1", 0, "user", "a", null),
      ("c1", 1, "tool", "b", "t_a"),
      ("c1", 2, "user", "c", null), // non-tool turns are invisible
      ("c1", 3, "tool", "d", "t_b"),
      ("c1", 4, "tool", "e", "t_b"),
      ("c2", 0, "tool", "f", "t_b"))
    val got = Conversations.toolTransitions(t)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(
      ("START", "t_a", 1L), ("t_a", "t_b", 1L),
      ("t_b", "t_b", 1L), ("START", "t_b", 1L)))
  }

  test("mixtureEpochs: floor copies + deterministic fractional epoch") {
    val docs = (0L until 200L).map(i =>
      (i, if (i % 2 == 0) "hi" else "lo")).toDF("id", "src")
    val out = Sampling.mixtureEpochs(docs, "id", "src",
        Map("hi" -> 2.5, "lo" -> 0.25), defaultWeight = 1.0)
      .as[(Long, String, Int)].collect()
    val byId = out.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    val mod = 4294967296L
    for (i <- 0L until 200L) {
      val w = if (i % 2 == 0) 2.5 else 0.25
      val frac = w - math.floor(w)
      val keepExtra = Math.floorMod(i * 2654435761L, mod) <
        math.floor(frac * mod).toLong
      val copies = math.floor(w).toInt + (if (keepExtra) 1 else 0)
      val expect = if (copies == 0) None else Some(0 until copies)
      assert(byId.get(i).map(_.toSeq) == expect.map(_.toSeq),
        s"id=$i w=$w copies=$copies got=${byId.get(i)}")
    }
    // the hi stratum alternates 2 vs 3 copies; lo keeps ~25%
    val hiCounts = out.filter(_._2 == "hi").groupBy(_._1).map(_._2.length).toSet
    assert(hiCounts.subsetOf(Set(2, 3)) && hiCounts.size == 2)
  }

  test("mixtureEpochs rejects negative weights") {
    val docs = Seq((1L, "a")).toDF("id", "src")
    val e = intercept[IllegalArgumentException] {
      Sampling.mixtureEpochs(docs, "id", "src", Map("a" -> -0.1), 1.0)
    }
    assert(e.getMessage.contains("must be >= 0"))
  }
}
