package graft

import org.apache.spark.sql.functions._

/** Dev diagnostic: classify golden-vs-engine link differences on the
  * fixture corpus (which stages miss, which surfaces, which codes).
  */
object Diag {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[8]", 8, "graft-diag")
    import spark.implicits._
    val dict = graft.fixtures.Fixtures.dict(spark)
    val nConvs = 200L
    val turns = graft.fixtures.Fixtures.transcripts(spark, nConvs, 8).cache()
    val res = Pipeline.run(spark, turns, dict)
    val canon = res.canonical.cache()

    val engine = res.links.toDF()
      .join(broadcast(canon), Seq("code"), "left")
      .select($"conv_id", $"turn_idx", $"surface", $"stage", $"score",
        coalesce($"canonical", $"code").as("ccode"))
      .cache()
    val golden = graft.fixtures.Fixtures.goldenLinks(spark, nConvs, 8)
      .toDF("conv_id", "turn_idx", "code", "gstage")
      .join(broadcast(canon), Seq("code"), "left")
      .select($"conv_id", $"turn_idx", $"gstage",
        coalesce($"canonical", $"code").as("ccode")).distinct().cache()

    val key = Seq("conv_id", "turn_idx", "ccode")
    val missed = golden.join(engine.select(key.map(col): _*).distinct(),
      key, "left_anti")
    val spurious = engine.join(golden.select(key.map(col): _*).distinct(),
      key, "left_anti")

    println(s"== golden=${golden.count()} engine-distinct=${engine.select(key.map(col): _*).distinct().count()}")
    println(s"== missed=${missed.count()} spurious=${spurious.count()}")
    println("-- missed by golden stage:")
    missed.groupBy("gstage").count().orderBy("gstage").show()
    println("-- sample missed rows (with the turn text):")
    missed.join(turns.toDF(), Seq("conv_id", "turn_idx"))
      .select($"conv_id", $"turn_idx", $"ccode", $"gstage", $"text")
      .show(20, truncate = 120)
    println("-- spurious by engine stage:")
    spurious.groupBy("stage").count().orderBy("stage").show()
    spurious.join(turns.toDF(), Seq("conv_id", "turn_idx"))
      .select($"conv_id", $"turn_idx", $"ccode", $"stage", $"score", $"surface", $"text")
      .show(20, truncate = 100)
    spark.stop()
  }
}
