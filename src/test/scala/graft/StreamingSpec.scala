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
