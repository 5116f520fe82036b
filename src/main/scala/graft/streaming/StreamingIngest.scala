package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.dict.ConceptDict
import graft.extract.MentionDetect
import graft.link.MatchLadder
import graft.model.Turn

/** Structured Streaming ingest adapter (optional stretch per
  * SURVEY.md §2.8 — the reference is batch/interactive only; this
  * exists so a transcript firehose can feed the same engine).
  *
  *  - [[mentionStream]]: stateless mention detection runs directly on
  *    the stream (flatMap is streaming-safe; no state, no watermark
  *    needed).
  *  - [[turnRateStream]]: event-time windowed per-conversation turn
  *    counts with a watermark (late-data bound).
  *  - [[linkSink]]: the full match ladder uses rank windows (not
  *    streaming-expressible), so it runs per micro-batch via
  *    foreachBatch — the idiomatic escape hatch — appending links to
  *    a partitioned table exactly like the batch path.
  */
object StreamingIngest {

  val turnSchema: StructType = StructType(Seq(
    StructField("conv_id", StringType), StructField("turn_idx", IntegerType),
    StructField("role", StringType), StructField("text", StringType),
    StructField("tool", StringType), StructField("ts", TimestampType)))

  def readTurns(spark: SparkSession, inputDir: String): DataFrame =
    spark.readStream.schema(turnSchema).parquet(inputDir)

  def mentionStream(spark: SparkSession, inputDir: String,
                    dict: ConceptDict): DataFrame = {
    import spark.implicits._
    val ac = dict.broadcastAutomaton(spark)
    MentionDetect.detect(readTurns(spark, inputDir).as[Turn], ac).toDF()
  }

  def turnRateStream(spark: SparkSession, inputDir: String): DataFrame =
    readTurns(spark, inputDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "10 minutes"), col("conv_id"))
      .agg(count(lit(1)).as("n_turns"))

  def linkSink(spark: SparkSession, inputDir: String, dict: ConceptDict,
               outDir: String, checkpointDir: String): StreamingQuery = {
    import spark.implicits._
    // prepare dictionary artifacts ONCE, outside the stream: the slow
    // path would re-collect/re-broadcast the dictionary and leak three
    // cached DataFrames PER micro-batch on a long-running stream
    val prepared = graft.dict.PreparedDict.prepare(spark, dict)
    readTurns(spark, inputDir).as[Turn].writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Turn], _: Long) =>
        val mentions = MentionDetect.detect(batch, prepared.automaton)
        MatchLadder.link(spark, mentions, prepared,
          MatchLadder.DefaultFuzzyK, MatchLadder.DefaultSemanticK,
          MatchLadder.DefaultFuzzyMin, MatchLadder.DefaultSemanticMin).toDF()
          .write.mode("append").parquet(outDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** End-to-end streaming KG construction: each micro-batch runs the
    * full batch pipeline (mention detect -> match ladder -> canonical
    * LINKED_TO triples) and MERGE-upserts the result into the
    * materialized graph via [[graft.triples.GraphMerge]].
    *
    * Delivery semantics: Structured Streaming replays an uncommitted
    * micro-batch after a crash (at-least-once into foreachBatch);
    * composed with the idempotent anti-join merge the EFFECT is
    * exactly-once — a replayed batch's triples are already present
    * and merge as fresh=0 (asserted in StreamingSpec by re-running a
    * processed input against a fresh checkpoint). The static
    * dictionary-derived triples (MAPS_TO, HAS_x, SAME_AS) are merged
    * once up front — also idempotent, so a restarted job re-merging
    * them is a no-op, not a duplication. */
  def tripleSink(spark: SparkSession, inputDir: String, dict: ConceptDict,
                 graphDir: String, checkpointDir: String): StreamingQuery = {
    import spark.implicits._
    val prepared = graft.dict.PreparedDict.prepare(spark, dict)
    graft.triples.GraphMerge.mergeEdges(spark, graphDir,
      prepared.dictTriples.as[graft.model.Triple])
    readTurns(spark, inputDir).as[Turn].writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Turn], _: Long) =>
        val mentions = MentionDetect.detect(batch, prepared.automaton)
        val links = MatchLadder.link(spark, mentions, prepared,
          MatchLadder.DefaultFuzzyK, MatchLadder.DefaultSemanticK,
          MatchLadder.DefaultFuzzyMin, MatchLadder.DefaultSemanticMin)
        graft.triples.GraphMerge.mergeEdges(spark, graphDir,
          graft.triples.Triples.linkedTo(links, prepared.canonical)
            .as[graft.model.Triple])
        (): Unit
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  private val memSinkId = new java.util.concurrent.atomic.AtomicLong(0)

  /** Run a streaming frame to completion under `Trigger.AvailableNow`
    * into a uniquely-named in-memory sink and return the result as a
    * BATCH DataFrame — the bridge that lets a bounded streaming
    * execution sit under the same DuckDB oracle as every batch
    * operator (the correctness gate only sees DataFrames). The input
    * being a static table makes the run deterministic: AvailableNow
    * drains exactly the files present at start, then the query stops.
    *
    * `mode` is "complete" for aggregations (every result row emitted
    * regardless of watermark — no late-data boundary to reconcile
    * with a batch oracle) or "append" for stateless transforms.
    * Checkpoint goes to a fresh temp dir per call: these runs are
    * one-shot oracle executions, not resumable services (the
    * resumable path with a durable checkpoint is [[tripleSink]],
    * exercised in StreamingSpec).
    */
  def runAvailableNow(spark: SparkSession, sdf: DataFrame,
                      mode: String): DataFrame = {
    val name = s"graft_mem_sink_${memSinkId.incrementAndGet()}"
    val ck = java.nio.file.Files.createTempDirectory("graft-oracle-ck").toString
    val q = sdf.writeStream.format("memory").queryName(name)
      .outputMode(mode).option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // resolve the result BEFORE cleanup: the returned DataFrame's plan
    // captures the memory relation directly, so dropping the catalog
    // entry (and the finished query's checkpoint dir) leaks nothing
    // across repeated bench/verify/scale-step invocations in one
    // session — previously every call left a temp view + a checkpoint
    // dir behind for the life of the JVM.
    val out = spark.table(name)
    spark.catalog.dropTempView(name)
    graft.SparkEntry.rmTree(new java.io.File(ck))
    out
  }

  /** Gap-based session windows on the event-time turn stream — the
    * streaming twin of the batch [[graft.ops.Sessionize]] (identical
    * gap semantics: a session extends while consecutive events are
    * ≤ gap apart). Native `session_window` state merges adjacent
    * per-event windows incrementally; the watermark bounds how long
    * an open session waits for late data, so state is dropped instead
    * of accumulating forever — the property that makes this safe on
    * an unbounded firehose. Batch parity (n_turns, [t_first, t_last],
    * window.end = t_last + gap) is asserted in StreamingSpec; the one
    * divergence is the exact-gap boundary (session_window splits at
    * diff ≥ gap, the batch op at diff > gap — pinned in RelOpsSpec).
    */
  def sessionStream(spark: SparkSession, inputDir: String,
                    gap: String = "6 hours",
                    watermark: String = "1 hour"): DataFrame =
    readTurns(spark, inputDir)
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("sw"), col("conv_id"))
      .agg(count(lit(1)).as("n_turns"),
        min(col("ts")).as("t_first"), max(col("ts")).as("t_last"))
}
