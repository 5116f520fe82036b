package graft

import graft.dict.ConceptDict
import graft.model.{Concept, DictEdge, Synonym}

/** Semantics of the composed semantic NCIT search (reference
  * find_cde_from_ncit_term, semantic_retrievers.py:85-126): inner
  * HAS_CONCEPT match drops PV-less KNN hits; a PV with no VDM/CDE
  * chain keeps an empty collection; CDE codes are collected sorted. */
class SemanticNcitSearchSpec extends SparkTestBase {
  import spark.implicits._

  private def embed(t: String) = graft.functions.Vectorizer.vectorizeChar(t)

  private def miniDict: ConceptDict = {
    val ncit = Seq(
      Concept("N1", "alpha thing", None, "NCIT", embed("alpha thing")),
      Concept("N2", "beta thing", None, "NCIT", embed("beta thing"))).toDS()
    val pv = Seq(
      Concept("P1", "Alpha Val", None, "PV", embed("Alpha Val")),
      Concept("P2", "Alpha Other", None, "PV", embed("Alpha Other"))).toDS()
    val cde = Seq(
      Concept("D1", "alpha data element", None, "CDE", embed("alpha data element")),
      Concept("D2", "alpha data element two", None, "CDE", embed("two"))).toDS()
    ConceptDict(
      ncit = ncit, pv = pv, cde = cde,
      vdm = Seq(("V1", "value domain V1")).toDF("code", "term"),
      dec = Seq.empty[(String, String)].toDF("code", "term"),
      oc = Seq.empty[Concept].toDS(),
      synonyms = Seq.empty[Synonym].toDS(),
      hasConcept = Seq(DictEdge("P1", "N1"), DictEdge("P2", "N1")).toDS(),
      hasVdm = Seq(DictEdge("D1", "V1"), DictEdge("D2", "V1")).toDS(),
      hasPv = Seq(DictEdge("V1", "P1")).toDS(), // P2 in NO value domain
      hasDec = Seq.empty[DictEdge].toDS(),
      hasOc = Seq.empty[DictEdge].toDS(),
      pr = Seq.empty[(String, String)].toDF("code", "term"),
      hasPr = Seq.empty[DictEdge].toDS(),
      st = Seq.empty[(String, String)].toDF("code", "term"),
      hasSt = Seq.empty[DictEdge].toDS())
  }

  test("pv search: chainless PVs drop (inner J3); one row per (pv, cde) path") {
    val q = Seq(("q1", "alpha value")).toDF("query_id", "text")
    val rows = graft.link.SemanticPvSearch.search(spark, q, miniDict, k = 2)
      .orderBy($"rank", $"cde_code")
      .as[(String, Int, String, String, String, String, String, Double)]
      .collect()
    // both P1 and P2 are KNN hits (k=2 over 2 PVs) but P2 has no VDM
    // chain -> dropped by the inner MATCH; P1 fans out to both CDEs
    assert(rows.map(_._3).distinct.toSeq == Seq("P1"))
    assert(rows.map(_._5).toSeq == Seq("D1", "D2"))
    assert(rows.map(_._6).toSeq == Seq("alpha data element", "alpha data element two"))
  }

  test("PV-less concepts drop; empty chains collect ''; CDEs sorted") {
    val q = Seq(("q1", "alpha think")).toDF("query_id", "text")
    val rows = graft.link.SemanticNcitSearch.search(spark, q, miniDict, k = 2)
      .orderBy($"rank", $"pv_code")
      .as[(String, Int, String, String, String, String, Double, String)]
      .collect()
    // both N1 and N2 are KNN hits (k=2 over a 2-concept dict) but N2
    // has no PV -> only N1 rows survive, one per PV
    assert(rows.map(_._3).distinct.toSeq == Seq("N1"))
    assert(rows.map(_._5).toSeq == Seq("P1", "P2"))
    val byPv = rows.map(r => r._5 -> r._8).toMap
    assert(byPv("P1") == "D1,D2") // collected SORTED
    assert(byPv("P2") == "")      // PV outside every VDM: empty, not dropped
    // rank 1 must be the closer concept (alpha ~ query)
    assert(rows.forall(_._2 == 1))
    assert(rows.forall(_._7 > 0.5))
  }
}
