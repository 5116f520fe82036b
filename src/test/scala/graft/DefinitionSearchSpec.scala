package graft

import org.apache.spark.sql.functions._

import graft.dict.PreparedDict
import graft.fixtures.Fixtures
import graft.link.{DefinitionSearch, MatchLadder}
import graft.model.Mention

/** Definition-embedding retrievers (reference
  * semantic_retrievers.py:129-205) + their ladder integration
  * (stage 6 fires only for multi-word descriptions every surface
  * stage missed) + the TF-IDF weighted / type-filtered term search.
  */
class DefinitionSearchSpec extends SparkTestBase {
  import spark.implicits._

  lazy val dict = Fixtures.dict(spark)
  lazy val prepared = PreparedDict.prepare(spark, dict)

  test("find NCIT by definition: exact definition text ranks its concept first") {
    // "persistently high blood pressure" IS the definition of C3117
    val q = Seq(("q1", "persistently high blood pressure")).toDF("query_id", "description")
    val res = DefinitionSearch.findNcitByDefinition(spark, q, prepared, k = 3)
      .orderBy($"rank").collect()
    assert(res.length == 3)
    assert(res(0).getAs[String]("code") == "C3117")
    assert(res(0).getAs[Double]("score") > 0.999)
    assert(res(0).getAs[Int]("rank") == 1)
    // returns term + definition payload like the reference metadata
    assert(res(0).getAs[String]("term") == "hypertension")
    assert(res(0).getAs[String]("definition") == "persistently high blood pressure")
  }

  test("find CDE by definition: searches ONLY CDE definitions") {
    val q = Seq(("q1", "er status indicator value")).toDF("query_id", "description")
    val res = DefinitionSearch.findCdeByDefinition(spark, q, prepared, k = 5).collect()
    assert(res.nonEmpty)
    assert(res.forall(_.getAs[String]("code").startsWith("CDE")),
      "cde definition search must never return NCIT codes")
    assert(res.minBy(_.getAs[Int]("rank")).getAs[String]("code") == "CDE2005")
  }

  test("ncit-vs-cde indexes are disjoint (reference cdeIndex/ncitIndex)") {
    val q = Seq(("q1", "malignant neoplasm of lung tissue")).toDF("query_id", "description")
    val ncit = DefinitionSearch.findNcitByDefinition(spark, q, prepared, k = 5)
      .select("code").as[String].collect()
    assert(ncit.forall(_.startsWith("C")) && ncit.forall(!_.startsWith("CDE")))
  }

  test("ladder stage 6: a 5+-word description no surface stage resolves links via definitions") {
    // >= 5 words, shares NO token with any dictionary surface (so the
    // fuzzy stage can't fire) and is too far for trigram/edit-distance
    // surface matching — but paraphrases the C1512 DEFINITION
    // "t cell growth factor" almost verbatim
    val desc = "t cell growth factor protein"
    val m = Seq(("c1", 0, 0, desc.length, desc, desc, "value"))
      .toDF("conv_id", "turn_idx", "begin", "end", "surface", "norm", "kind")
      .as[Mention]
    val links = MatchLadder.link(spark, m, prepared,
      MatchLadder.DefaultFuzzyK, MatchLadder.DefaultSemanticK,
      MatchLadder.DefaultFuzzyMin, MatchLadder.DefaultSemanticMin).collect()
    assert(links.length == 1)
    assert(links(0).stage == 6, s"expected definition stage, got ${links(0)}")
    assert(links(0).code == "C1512")
  }

  test("ladder priority: a description the FUZZY stage can resolve never reaches stage 6") {
    // overlaps the synonym surface "high blood pressure" on rare
    // tokens -> stage 4 wins even though the definition index would
    // also match (reference cascade order llm_agent_4o.py:485-508)
    val desc = "persistently high blood pressure readings"
    val m = Seq(("c1", 0, 0, desc.length, desc, desc, "value"))
      .toDF("conv_id", "turn_idx", "begin", "end", "surface", "norm", "kind")
      .as[Mention]
    val links = MatchLadder.link(spark, m, prepared,
      MatchLadder.DefaultFuzzyK, MatchLadder.DefaultSemanticK,
      MatchLadder.DefaultFuzzyMin, MatchLadder.DefaultSemanticMin).collect()
    assert(links.length == 1)
    assert(links(0).stage == 4, s"fuzzy must outrank definition, got ${links(0)}")
    assert(links(0).code == "C3117")
  }

  test("ladder stage 6 never fires for short junk values") {
    val m = Seq(("c1", 0, 0, 7, "zq91xv", "zq91xv", "value"))
      .toDF("conv_id", "turn_idx", "begin", "end", "surface", "norm", "kind")
      .as[Mention]
    val links = MatchLadder.link(spark, m, prepared,
      MatchLadder.DefaultFuzzyK, MatchLadder.DefaultSemanticK,
      MatchLadder.DefaultFuzzyMin, MatchLadder.DefaultSemanticMin).collect()
    assert(links.isEmpty, s"junk must stay unlinked, got ${links.toSeq}")
  }

  test("type-filtered term search: only the requested node type comes back") {
    val q = Seq(("q1", "tumor stage category")).toDF("query_id", "text")
    val cdeOnly = MatchLadder.termSearch(spark, q, prepared, k = 5,
      typeFilter = Some("CDE")).select("code").as[String].collect()
    assert(cdeOnly.nonEmpty)
    assert(cdeOnly.forall(_.startsWith("CDE")), s"got ${cdeOnly.toSeq}")
    val any = MatchLadder.termSearch(spark, q, prepared, k = 5)
      .select("code").as[String].collect()
    assert(any.exists(!_.startsWith("CDE")), "unfiltered search should span labels")
  }

  test("TF-IDF weighting: rare-token overlap outscores common-token overlap") {
    // "carcinoma" appears in many surfaces (common); "retinoblastoma"
    // in exactly one (rare). A query hitting the rare token must score
    // higher against its surface than a same-shape query hitting only
    // a common token against a two-token surface.
    val q = Seq(("rare", "retinoblastoma xqzkw"), ("common", "carcinoma xqzkw"))
      .toDF("query_id", "text")
    val res = MatchLadder.termSearch(spark, q, prepared, k = 1)
      .select("query_id", "score").as[(String, Double)].collect().toMap
    assert(res("rare") > res("common"),
      s"idf weighting should favor the rare token: $res")
  }
}
