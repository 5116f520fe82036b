package graft

import org.apache.spark.sql.functions._

/** Dev profiler: per-stage wall times of the pipeline at one core
  * count (set SPARK_GRAFT_CPUS / SPARK_GRAFT_SCALE_CONVS). Each stage
  * is forced with a count; repeated twice to expose JIT/cache warmth.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_SCALE_CONVS", "160000").toLong
    val spark = GraftSession.build(s"local[$cpus]", cpus, "graft-profile")
    import spark.implicits._

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val dict = graft.fixtures.Fixtures.dict(spark)
    (1 to 2).foreach { round =>
      println(s"--- round $round (cores=$cpus convs=$nConvs) ---")
      val turns = graft.fixtures.Fixtures.transcripts(spark, nConvs, 8)
      time("turns.count")(turns.count())
      val ac = time("broadcastAutomaton")(dict.broadcastAutomaton(spark))
      val mentions = graft.extract.MentionDetect.detect(turns, ac)
      time("mentions.count")(mentions.count())
      val links = time("ladder.plan")(
        graft.link.MatchLadder.link(spark, mentions, dict))
      // branch-level timings
      val res = graft.link.MatchLadder.resolutionTable(spark, dict)
      val resolved = mentions.toDF().join(broadcast(res), Seq("norm"), "left")
      time("exact.count")(resolved.filter($"code".isNotNull).count())
      time("residue.count")(resolved.filter($"code".isNull).count())
      time("links.count")(links.count())
      time("links.count.again")(links.count())
      val canon = time("canonical")(graft.canon.Canonicalizer.canonicalMap(spark, dict))
      val triples = graft.triples.Triples.all(spark, links, dict, canon)
      time("triples.count")(triples.count())
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
