package graft

import java.nio.file.Files

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
}
