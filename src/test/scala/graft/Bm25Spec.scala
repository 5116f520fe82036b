package graft

import org.apache.spark.sql.functions._

import graft.fixtures.Fixtures

/** Contracts of the BM25 stage-4 scorer (MatchLadder.bm25TopK) that
  * the DuckDB oracle cannot express directly: the self-normalization
  * fixed point and the saturation/ordering properties the old
  * weighted-Jaccard scorer lacked. */
class Bm25Spec extends SparkTestBase {
  import spark.implicits._

  private lazy val prepared =
    graft.dict.PreparedDict.prepare(spark, Fixtures.dict(spark))

  test("querying an exact surface scores that surface exactly 1.0 at rank 1") {
    // query == surface ⇒ identical (tf, dl) per token ⇒ raw == self
    // ⇒ score is the exact double 1.0 (dyadic sums, one division)
    val q = Seq(("q1", "tumor stage"), ("q2", "high blood pressure"))
      .toDF("query_id", "text")
    val out = graft.link.MatchLadder.termSearchBm25(spark, q, prepared, k = 3)
      .filter($"rank" === 1)
      .select($"query_id", $"surf_norm", $"score")
      .as[(String, String, Double)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2)).toSeq ===
      Seq(("q1", "tumor stage"), ("q2", "high blood pressure")))
    assert(out.forall(_._3 == 1.0), out.mkString(", "))
  }

  test("tf saturation: repeating a query token must not scale its weight linearly") {
    // "stage" repeated 3x: the tf_q=3 self-contribution saturates
    // (k1), so a surface matching the token once keeps score well
    // above 1/3 of the single-occurrence query's — the property a
    // linear bag-of-words overlap gets wrong
    val q = Seq(("one", "stage"), ("three", "stage stage stage"))
      .toDF("query_id", "text")
    val out = graft.link.MatchLadder.termSearchBm25(spark, q, prepared, k = 1)
      .select($"query_id", $"code", $"score")
      .as[(String, String, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out("one")._1 === out("three")._1, "same winning code")
    val ratio = out("three")._2 / out("one")._2
    assert(ratio > 0.5 && ratio < 1.0,
      s"saturated ratio expected in (0.5, 1): $ratio")
  }

  test("rankings differ from weighted Jaccard only in order, never in candidates") {
    // same candidate token-overlap sets: BM25 re-scores, it must not
    // invent or drop candidates (minScore 0 both sides)
    val q = Seq(("q1", "tumor stage category"), ("q2", "smoking status"))
      .toDF("query_id", "text")
    val bm = graft.link.MatchLadder.termSearchBm25(spark, q, prepared,
      k = 1000, minScore = 0.0).select($"query_id", $"code")
    val wj = graft.link.MatchLadder.termSearch(spark, q, prepared,
      k = 1000, minScore = 0.0).select($"query_id", $"code")
    assert(bm.exceptAll(wj).isEmpty && wj.exceptAll(bm).isEmpty)
  }
}
