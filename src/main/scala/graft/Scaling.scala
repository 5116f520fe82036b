package graft

import org.apache.spark.sql.SparkSession

/** Two-parallelism scaling harness — the sandbox evidence for the
  * north rule's "N vs 4N executors, scaling efficiency >= 0.8":
  * identical job + identical input at local[N] and local[4N]
  * (no real cluster here; parallelism level stands in for executor
  * count). Prints one JSON line; results recorded in
  * BENCH/BASELINE.md.
  */
object Scaling {

  private def throughputAt(cores: Int, nConvs: Long): (Long, Double) = {
    val spark = GraftSession.build(s"local[$cores]", math.max(cores, 4), s"graft-scale-$cores")
    try {
      Bench.runPipeline(spark, math.max(50L, nConvs / 10)) // warm-up
      val (turns, sec, _) = Bench.runPipeline(spark, nConvs)
      (turns, sec)
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "8").toInt
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_SCALE_CONVS", "40000").toLong
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
