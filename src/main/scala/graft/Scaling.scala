package graft

import org.apache.spark.sql.SparkSession

/** Two-parallelism scaling harness — the sandbox evidence for the
  * north rule's "N vs 4N executors, scaling efficiency >= 0.8":
  * identical job + identical input at local[N] and local[4N]
  * (no real cluster here; parallelism level stands in for executor
  * count).
  *
  * Each level MUST run in its own JVM: codegen-class accumulation and
  * heap aging in a shared JVM slow whichever level runs second by
  * 2-3x, corrupting the comparison (observed; see tools/scaling.sh,
  * which invokes this main once per level and combines).
  *
  * Single-level mode: set SPARK_GRAFT_SCALE_CORES -> prints one JSON
  * line {"cores":N,"turns":T,"sec":S}. Legacy combined mode (no env)
  * runs both levels in-JVM — convenient but biased; prefer the script.
  */
object Scaling {

  def throughputAt(cores: Int, nConvs: Long): (Long, Double) = {
    val spark = GraftSession.build(s"local[$cores]", math.max(cores, 4), s"graft-scale-$cores")
    try {
      Bench.runPipeline(spark, math.max(50L, nConvs / 10)) // warm-up
      // min of 2 measured runs: the box is shared with the bench
      // driver, min is the least-noise estimator
      val (turns, sec1, _) = Bench.runPipeline(spark, nConvs)
      val (_, sec2, _) = Bench.runPipeline(spark, nConvs)
      (turns, math.min(sec1, sec2))
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  def main(args: Array[String]): Unit = {
    // corpus must be large enough that parallel work dominates fixed
    // job-scheduling overheads — that's also the honest 10^12-turn
    // regime where the efficiency claim matters
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_SCALE_CONVS", "160000").toLong
    sys.env.get("SPARK_GRAFT_SCALE_CORES") match {
      case Some(c) =>
        val stat0 = Bench.cpuStat()
        val (turns, sec) = throughputAt(c.toInt, nConvs)
        val stat1 = Bench.cpuStat()
        val stealPct = if (stat1._2 > stat0._2)
          100.0 * (stat1._1 - stat0._1) / (stat1._2 - stat0._2) else 0.0
        println(s"""{"cores":$c,"turns":$turns,"sec":${f"$sec%.3f"},""" +
          s""""turns_per_sec":${f"${turns / sec}%.1f"},"host_steal_pct":${f"$stealPct%.1f"}}""")
      case None =>
        val n = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "8").toInt
        val (turnsLo, secLo) = throughputAt(n, nConvs)
        val (turnsHi, secHi) = throughputAt(n * 4, nConvs)
        val tpLo = turnsLo / secLo
        val tpHi = turnsHi / secHi
        val eff = (tpHi / tpLo) / 4.0
        println(
          s"""{"metric":"scaling_efficiency","value":${f"$eff%.3f"},"unit":"ratio",""" +
          s""""cores_lo":$n,"cores_hi":${n * 4},"turns":$turnsLo,""" +
          s""""sec_lo":${f"$secLo%.3f"},"sec_hi":${f"$secHi%.3f"},""" +
          s""""turns_per_sec_lo":${f"$tpLo%.1f"},"turns_per_sec_hi":${f"$tpHi%.1f"}}""")
    }
  }
}
