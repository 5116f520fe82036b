package graft

import org.apache.spark.sql.functions._

import graft.canon.{Canonicalizer, ConnectedComponents}
import graft.fixtures.Fixtures
import graft.link.Rerank

class CanonRerankSpec extends SparkTestBase {
  import spark.implicits._

  test("connected components: chains, stars, cycles, singletons-absent") {
    val edges = Seq(
      ("a", "b"), ("b", "c"), ("c", "d"),          // chain -> comp a
      ("x", "y"), ("x", "z"),                      // star -> comp x
      ("p", "q"), ("q", "r"), ("r", "p")           // cycle -> comp p
    ).toDF("src", "dst")
    val comp = ConnectedComponents.run(spark, edges)
      .as[(String, String)].collect().toMap
    assert(Seq("a", "b", "c", "d").forall(comp(_) == "a"))
    assert(Seq("x", "y", "z").forall(comp(_) == "x"))
    assert(Seq("p", "q", "r").forall(comp(_) == "p"))
  }

  test("cc converges logarithmically on a long chain (large-star/small-star)") {
    // a 64-node chain needs ~32 rounds of min-label propagation but
    // only O(log n) large-star/small-star alternations
    val chain = (0 until 63).map(i => (f"n$i%02d", f"n${i + 1}%02d")).toDF("src", "dst")
    val (comp, iters) = ConnectedComponents.runLogStarStats(spark, chain)
    val m = comp.as[(String, String)].collect().toMap
    assert(m.size == 64)
    assert(m.values.toSet == Set("n00"), s"all nodes must reach the chain min")
    assert(iters <= 10, s"expected O(log n) rounds, took $iters")
  }

  test("cc label-prop variant matches log-star on the same graph") {
    val edges = Seq(("a", "b"), ("b", "c"), ("x", "y")).toDF("src", "dst")
    val a = ConnectedComponents.run(spark, edges)
      .as[(String, String)].collect().toMap
    val b = ConnectedComponents.runLabelProp(spark, edges)
      .as[(String, String)].collect().toMap
    assert(a == b)
  }

  test("cc is idempotent: reapplying on merged labels changes nothing") {
    val edges = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val comp = ConnectedComponents.run(spark, edges)
    val again = ConnectedComponents.run(spark,
      comp.select($"node".as("src"), $"component".as("dst")))
    val m = again.as[(String, String)].collect().toMap
    assert(m.values.toSet == Set("a"))
  }

  test("canonicalizer merges the shared-synonym fixture pair (C3117 ~ C105586)") {
    val dict = Fixtures.dict(spark)
    val canon = Canonicalizer.canonicalMap(spark, dict)
      .as[(String, String)].collect().toMap
    // shared synonym "blood pressure elevation" merges these two
    assert(canon("C3117") == canon("C105586"))
    // canonical = min code in component
    assert(canon("C3117") <= "C105586" && canon("C3117") <= "C3117")
    // unrelated concepts stay distinct
    assert(canon("C4878") != canon("C3117"))
  }

  test("rerank: combined = 0.7*base + 0.3*oc, missing OC -> oc_score 0") {
    val dict = Fixtures.dict(spark)
    val qv = Fixtures.embed("tumor stage")
    val candidates = Seq(
      ("q1", "CDE2001", 0.9, qv),  // has DEC->OC (neoplasm)
      ("q1", "CDE2008", 0.8, qv)   // no DEC->OC -> fallback
    ).toDF("query_id", "cde_code", "score", "query_vec")
    val rows = Rerank.rerankWithOcContext(spark, candidates, dict).collect()
    val byCde = rows.map(r => r.getAs[String]("cde_code") ->
      (r.getAs[Double]("oc_score"), r.getAs[Double]("combined_score"))).toMap
    assert(byCde("CDE2008")._1 == 0.0)
    assert(math.abs(byCde("CDE2008")._2 - 0.8 * 0.7) < 1e-9)
    val (oc1, comb1) = byCde("CDE2001")
    assert(math.abs(comb1 - (0.9 * 0.7 + oc1 * 0.3)) < 1e-9)
  }

  test("rerank: candidate with NO cde code keeps its RAW score (no 0.7 penalty)") {
    // reference semantic_retrievers.py:213-219: falsy cde_code skips OC
    // reranking entirely -> combined_score = score
    val dict = Fixtures.dict(spark)
    val qv = Fixtures.embed("tumor stage")
    val candidates = Seq(
      ("q1", null.asInstanceOf[String], 0.9, qv), // no cde at all
      ("q1", "", 0.85, qv),                       // empty = falsy in the reference
      ("q1", "CDE2008", 0.8, qv)                  // cde present, no OC -> 0.7*score
    ).toDF("query_id", "cde_code", "score", "query_vec")
    val rows = Rerank.rerankWithOcContext(spark, candidates, dict).collect()
    val byScore = rows.map(r => r.getAs[Double]("score") ->
      r.getAs[Double]("combined_score")).toMap
    assert(byScore(0.9) == 0.9, "null cde must pass raw score through")
    assert(byScore(0.85) == 0.85, "empty cde must pass raw score through")
    assert(math.abs(byScore(0.8) - 0.8 * 0.7) < 1e-9, "cde without OC keeps 0.7*score")
  }

  test("cdeToOc is deterministic limit-1 per cde") {
    val dict = Fixtures.dict(spark)
    val oc = Rerank.cdeToOc(spark, dict)
    assert(oc.groupBy("cde_code").count().filter($"count" > 1).count() == 0)
  }
}
