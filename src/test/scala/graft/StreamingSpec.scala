package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.fixtures.Fixtures
import graft.streaming.StreamingIngest

class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming mention detection + foreachBatch link sink match the batch path") {
    val dict = Fixtures.dict(spark)
    val inDir = Files.createTempDirectory("graft-stream-in").toString
    val outDir = Files.createTempDirectory("graft-stream-out").toString + "/links"
    val ckDir = Files.createTempDirectory("graft-stream-ck").toString
    val turns = Fixtures.transcripts(spark, 15, 6)
    turns.write.mode("overwrite").parquet(inDir)

    val q = StreamingIngest.linkSink(spark, inDir, dict, outDir, ckDir)
    q.awaitTermination(120000)

    val streamed = spark.read.parquet(outDir)
      .orderBy("conv_id", "turn_idx", "begin").collect()
    val batch = {
      val ac = dict.broadcastAutomaton(spark)
      val mentions = graft.extract.MentionDetect.detect(turns, ac)
      graft.link.MatchLadder.link(spark, mentions, dict).toDF()
        .orderBy("conv_id", "turn_idx", "begin").collect()
    }
    assert(streamed.length == batch.length)
    assert(streamed.sameElements(batch))
  }

  test("streaming triple sink is effectively exactly-once under full replay") {
    val dict = Fixtures.dict(spark)
    val inDir = Files.createTempDirectory("graft-triple-in").toString
    val graphDir = Files.createTempDirectory("graft-triple-graph").toString + "/graph"
    Fixtures.transcripts(spark, 12, 6).write.mode("overwrite").parquet(inDir)

    val q1 = StreamingIngest.tripleSink(spark, inDir, dict, graphDir,
      Files.createTempDirectory("graft-triple-ck1").toString)
    q1.awaitTermination(120000)
    assert(q1.exception.isEmpty)
    val edges = spark.read.parquet(s"$graphDir/edges")
    val afterFirst = edges.count()
    assert(afterFirst > 0)
    assert(edges.distinct().count() == afterFirst, "no duplicate edges")

    // streamed LINKED_TO edges == the batch pipeline's, exactly
    val prepared = graft.dict.PreparedDict.prepare(spark, dict)
    val batchLinked = {
      val turns = spark.read.parquet(inDir).as[graft.model.Turn]
      val res = Pipeline.run(spark, turns, prepared)
      graft.triples.Triples.linkedTo(res.links, prepared.canonical)
        .distinct().orderBy("subj", "obj").collect()
    }
    val streamedLinked = edges.where($"pred" === "LINKED_TO")
      .select("subj", "pred", "obj").orderBy("subj", "obj").collect()
    assert(streamedLinked.sameElements(batchLinked))

    // replay EVERYTHING: a fresh checkpoint reprocesses the whole
    // input (the worst-case at-least-once redelivery); the idempotent
    // MERGE sink must leave the graph bit-identical
    val q2 = StreamingIngest.tripleSink(spark, inDir, dict, graphDir,
      Files.createTempDirectory("graft-triple-ck2").toString)
    q2.awaitTermination(120000)
    assert(q2.exception.isEmpty)
    assert(spark.read.parquet(s"$graphDir/edges").count() == afterFirst,
      "full replay must not add a single edge")
  }

  test("windowed turn-rate stream aggregates with watermark") {
    val inDir = Files.createTempDirectory("graft-stream-rate").toString
    Fixtures.transcripts(spark, 10, 6).write.mode("overwrite").parquet(inDir)
    val agg = StreamingIngest.turnRateStream(spark, inDir)
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName("turn_rate")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // append mode emits only watermark-closed windows; with a single
    // AvailableNow batch nothing may close — assert the query ran clean
    assert(q.exception.isEmpty)
    assert(spark.table("turn_rate").columns.toSet ==
      Set("window", "conv_id", "n_turns"))
  }

  test("session windows: streaming sessions equal the batch sessionizer") {
    import java.sql.Timestamp
    val inDir = Files.createTempDirectory("graft-stream-sess").toString
    def t(h: Int, m: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    // c0: two sessions split by a 7h silence; c1: one session held
    // together by a 5h59m pause (under the 6h gap; the exact-gap
    // boundary differs between engines — see RelOpsSpec — and is
    // deliberately avoided here)
    // the far-future sentinel advances the watermark past every real
    // session's end so append mode (the only mode session windows
    // support) emits them during the terminal no-data micro-batch;
    // the sentinel's own still-open session is the one row NOT
    // emitted, and is excluded from the comparison below
    val rows = (Seq(
      ("c0", 0, t(0, 0)), ("c0", 1, t(0, 10)), ("c0", 2, t(7, 30)),
      ("c0", 3, t(7, 40)),
      ("c1", 0, t(1, 0)), ("c1", 1, t(6, 59))
    ) :+ (("zz", 0, Timestamp.valueOf("2026-01-03 00:00:00"))))
      .map { case (c, i, ts) => (c, i, "user", s"turn $i", null: String, ts) }
    rows.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
      .coalesce(1).write.mode("overwrite").parquet(inDir)

    val q = StreamingIngest.sessionStream(spark, inDir, gap = "6 hours")
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(q.exception.isEmpty)

    val streamed = spark.table("sessions")
      .select($"conv_id", $"n_turns",
        unix_micros($"t_first").as("t_start_us"),
        unix_micros($"t_last").as("t_end_us"),
        unix_micros($"sw.end").as("w_end_us"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map { case (c, n, s, e, w) => (c, s) -> (n, e, w) }.toMap
    val batch = graft.ops.Sessionize.stats(
        spark.read.parquet(inDir).filter($"conv_id" =!= "zz"),
        "conv_id", "ts", gapUs = 21600000000L)
      .select($"conv_id", $"n_events", $"t_start_us", $"t_end_us")
      .as[(String, Long, Long, Long)].collect()
      .map { case (c, n, s, e) => (c, s) -> (n, e) }.toMap

    assert(streamed.keySet == batch.keySet) // same sessions, same starts
    assert(batch.size == 3) // c0 splits at the 7h gap, c1's exact-6h doesn't
    batch.foreach { case (k, (n, end)) =>
      val (sn, send, wend) = streamed(k)
      assert(sn == n && send == end)
      assert(wend == end + 21600000000L) // window end = last event + gap
    }
  }

  test("AvailableNow streaming catalog entries match their batch twins") {
    val sf = "/root/testdata/sf0.001"
    val win = SparkEntry.queries("streaming_windowed_counts")(spark, sf).collect()
    val batchWin = spark.read.parquet(s"$sf/events.parquet")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start").cast("timestamp"))
          .as("window_start_us"),
        col("event_type"), col("n"))
      .orderBy(col("window_start_us"), col("event_type")).collect()
    assert(win.nonEmpty && win.sameElements(batchWin))

    val streamedMentions =
      SparkEntry.queries("streaming_mention_parity")(spark, sf).collect()
    val batchMentions =
      SparkEntry.queries("kg_mention_detect")(spark, sf).collect()
    assert(streamedMentions.nonEmpty &&
      streamedMentions.sameElements(batchMentions))
  }

  test("sink round-trip catalog entries preserve values through JSON") {
    val sf = "/root/testdata/sf0.001"
    val ev = spark.read.parquet(s"$sf/events.parquet")

    val rt = SparkEntry.queries("sink_training_roundtrip")(spark, sf)
    assert(rt.count() == ev.count()) // every row survives the round-trip
    val first = rt.orderBy("event_id").head()
    val firstEv = ev.orderBy("event_id")
      .select(col("event_id"), col("event_type"),
        date_format(col("ts"), "yyyyMMdd").as("dt")).head()
    assert(first == firstEv) // values (incl. recovered partition col) intact

    val ex = SparkEntry.queries("sink_export_roundtrip")(spark, sf).collect()
    val bx = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("event_type")).limit(10).collect()
    assert(ex.nonEmpty && ex.sameElements(bx))
  }
}
