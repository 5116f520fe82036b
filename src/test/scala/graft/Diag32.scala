package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Diagnostic: where does the local[32] pipeline time go?
  * Phases: plan construction (driver Catalyst), first count (includes
  * codegen), second count (steady state); plus per-stage wall/task
  * times from a listener. Run: sbt "Test/runMain graft.Diag32 [convs]"
  */
object Diag32 {
  def main(args: Array[String]): Unit = {
    val nConvs = args.headOption.map(_.toLong).getOrElse(160000L)
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.build(s"local[$cores]", cores, "graft-diag32")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long, Long, Int, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for { s <- si.submissionTime; c <- si.completionTime } yield c - s).getOrElse(-1L)
        stages.add((si.stageId, si.name.take(60), wall,
          si.taskMetrics.executorRunTime, si.numTasks,
          si.taskMetrics.jvmGCTime, si.taskMetrics.executorCpuTime / 1000000L))
      }
    })
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[diag] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val prepared = t("prepare dict")(
      graft.dict.PreparedDict.prepare(spark, graft.fixtures.Fixtures.dict(spark)))
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_diag32_$nConvs"
    t("stage corpus")(graft.fixtures.Fixtures.transcripts(spark, nConvs, 8)
      .write.mode("overwrite").parquet(dir))
    import spark.implicits._
    val turns = spark.read.parquet(dir).as[graft.model.Turn]
    t("warm count")(turns.count())
    // warm-up pipeline (JIT/codegen) at 1/10
    t("warmup pipeline")(Pipeline.run(spark,
      spark.read.parquet(dir).as[graft.model.Turn].limit((nConvs).toInt), prepared)
      .triples.count())
    for (round <- 1 to 3) {
      stages.clear()
      val res = t(s"run$round: plan construction")(Pipeline.run(spark, turns, prepared))
      t(s"run$round: triples.count()")(res.triples.count())
      val worst = stages.toArray(Array.empty[(Int, String, Long, Long, Int, Long, Long)])
        .sortBy(-_._3).take(6)
      worst.foreach { case (id, name, wall, task, n, gc, cpu) =>
        println(f"[diag]   stage $id%4d wall=${wall / 1e3}%7.2f s taskSum=${task / 1e3}%8.2f s cpuSum=${cpu / 1e3}%8.2f s gcSum=${gc / 1e3}%7.2f s tasks=$n")
      }
      val s0 = Bench.cpuStat()
      Thread.sleep(1000)
      val s1 = Bench.cpuStat()
      println(f"[diag]   steal now: ${100.0 * (s1._1 - s0._1) / math.max(1, s1._2 - s0._2)}%.1f%%")
    }
    spark.stop()
  }
}
