package graft

import org.apache.spark.sql.functions._

import graft.fixtures.Fixtures

class PipelineSpec extends SparkTestBase {
  import spark.implicits._

  private val NConvs = 60L
  private val TurnsPerConv = 8

  lazy val dict = Fixtures.dict(spark)
  lazy val turns = Fixtures.transcripts(spark, NConvs, TurnsPerConv).cache()
  lazy val result = Pipeline.run(spark, turns, dict)

  test("mentions have in-bounds offsets and matching surfaces") {
    val bad = result.mentions.join(turns.toDF(), Seq("conv_id", "turn_idx"))
      .filter($"begin" < 0 || $"end" > length($"text") || $"begin" >= $"end" ||
        expr("substring(text, begin + 1, end - begin)") =!= $"surface")
      .count()
    assert(bad == 0)
    assert(result.mentions.count() > 0)
  }

  test("match ladder P/R >= 0.95 vs golden links (canonicalized)") {
    val canon = result.canonical.cache()
    val engine = result.links.toDF()
      .join(broadcast(canon), Seq("code"), "left")
      .select($"conv_id", $"turn_idx",
        coalesce($"canonical", $"code").as("ccode")).distinct().cache()
    val golden = Fixtures.goldenLinks(spark, NConvs, TurnsPerConv).toDF(
      "conv_id", "turn_idx", "code", "stage")
      .join(broadcast(canon), Seq("code"), "left")
      .select($"conv_id", $"turn_idx",
        coalesce($"canonical", $"code").as("ccode")).distinct().cache()
    val nEngine = engine.count().toDouble
    val nGolden = golden.count().toDouble
    val nBoth = engine.join(golden, Seq("conv_id", "turn_idx", "ccode")).count().toDouble
    val precision = nBoth / nEngine
    val recall = nBoth / nGolden
    info(f"precision=$precision%.4f recall=$recall%.4f engine=${nEngine.toLong} golden=${nGolden.toLong}")
    assert(precision >= 0.95, f"precision $precision%.4f < 0.95")
    assert(recall >= 0.95, f"recall $recall%.4f < 0.95")
  }

  test("exact stage always beats semantic (cascade priority)") {
    // every link whose surface is an exact dictionary surface must be
    // stage <= 3
    val surf = dict.surfaces(spark).select($"norm").distinct()
    val links = result.links.toDF()
      .withColumn("norm", Functions.norm_text($"surface"))
    val viol = links.join(broadcast(surf), "norm").filter($"stage" > 3).count()
    assert(viol == 0)
  }

  test("per-turn text equality under stable ordering across repartition (north-rule invariant)") {
    val base = turns.orderBy($"conv_id", $"turn_idx")
      .select($"conv_id", $"turn_idx", $"text").collect()
    val reparted = turns.repartition(17, $"text")
      .orderBy($"conv_id", $"turn_idx")
      .select($"conv_id", $"turn_idx", $"text").collect()
    assert(base.sameElements(reparted))
  }

  test("triples contain all predicates and LINKED_TO objs are canonical codes") {
    val t = result.triples.cache()
    val preds = t.select($"pred").distinct().as[String].collect().toSet
    assert(preds == Set("LINKED_TO", "MAPS_TO", "HAS_SYNONYM", "SAME_AS",
      "HAS_CONCEPT", "HAS_VDM", "HAS_PV", "HAS_DEC", "HAS_OC", "HAS_PR",
      "HAS_SEMANTIC_TYPE"))
    // LINKED_TO objects must be fixed points of the canonical map
    val nonCanon = t.filter($"pred" === "LINKED_TO")
      .join(result.canonical.withColumnRenamed("code", "obj"), "obj")
      .filter($"obj" =!= $"canonical").count()
    assert(nonCanon == 0)
    // MAPS_TO derived from the dict chain: spot-check a known mapping
    // CDE2001 <- VDM01 <- PV001 <- C18016
    assert(t.filter($"pred" === "MAPS_TO" && $"subj" === "C18016" &&
      $"obj" === "CDE2001").count() == 1)
  }

  test("deterministic across two runs") {
    val r2 = Pipeline.run(spark, turns, dict)
    val a = result.links.toDF().orderBy("conv_id", "turn_idx", "begin", "end").collect()
    val b = r2.links.toDF().orderBy("conv_id", "turn_idx", "begin", "end").collect()
    assert(a.sameElements(b))
  }
}
