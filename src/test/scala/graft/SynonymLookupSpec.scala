package graft

import graft.fixtures.Fixtures
import graft.link.SynonymLookup

class SynonymLookupSpec extends SparkTestBase {
  import spark.implicits._

  lazy val dict = Fixtures.dict(spark)

  test("byCode: 1-hop synonyms, input code normalized (upper/trim), sorted") {
    val out = SynonymLookup.byCode(spark, dict,
      Seq("  c4878 ").toDF("code")) // lower + padded: ref normalizes
      .as[(String, String)].collect()
    assert(out.map(_._1).forall(_ == "C4878"))
    assert(out.map(_._2).toSeq ==
      Seq("carcinoma of the lung", "lung cancer", "pulmonary carcinoma"))
  }

  test("byPvTerm: 2-hop PV->NCIT->SYN, case-SENSITIVE pv term (reference asymmetry)") {
    // exact case hits
    val hit = SynonymLookup.byPvTerm(spark, dict, Seq("Stage IV").toDF("pv_term"))
      .as[(String, String, String)].collect()
    assert(hit.nonEmpty && hit.forall(_._2 == "C18016"))
    assert(hit.map(_._3).contains("staging"))
    // wrong case misses — unlike the case-insensitive term matcher (P2)
    val miss = SynonymLookup.byPvTerm(spark, dict, Seq("stage iv").toDF("pv_term"))
    assert(miss.count() == 0)
  }

  test("byCode drops unknown codes silently (empty result, no error)") {
    assert(SynonymLookup.byCode(spark, dict, Seq("C9999999").toDF("code")).count() == 0)
  }
}
