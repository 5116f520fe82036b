package graft

import graft.canon.{ConnectedComponents, IncrementalCC}
import graft.extract.{Coref, RelationExtract}
import graft.triples.{EdgeConfidence, TemporalScope}

class ExtractOpsSpec extends SparkTestBase {
  import spark.implicits._

  // --- pattern-based relation extraction ---
  test("patternRelations fires only on ordered word-bounded term-kw-term turns") {
    val turns = Seq(
      ("c1", 0, "spark runs fast on the batch layer"), // spark REL_FAST batch
      ("c1", 1, "batch is fast but spark is faster"),  // batch..fast..spark: ordered match; "faster" not word-bounded "fast"? it contains fast+er -> \bfast\b does NOT match "faster"
      ("c1", 2, "sparkly fast batch"),                 // "sparkly" not a word-bounded "spark"
      ("c1", 3, "spark and batch together")            // no keyword
    ).toDF("conv_id", "turn_idx", "text")
    val mentions = Seq(
      ("c1", 0, "K001", "spark"), ("c1", 0, "K008", "batch"),
      ("c1", 1, "K001", "spark"), ("c1", 1, "K008", "batch"),
      ("c1", 3, "K001", "spark"), ("c1", 3, "K008", "batch")
      // turn 2 has no word-bounded mentions, so the detector never
      // emitted any — candidates only come from real mentions
    ).toDF("conv_id", "turn_idx", "code", "term")
    val patterns = Seq(("fast", "REL_FAST")).toDF("kw", "pred")
    val out = RelationExtract.patternRelations(turns, mentions, patterns)
      .select("subj", "obj", "turn_idx").as[(String, String, Int)]
      .collect().toSet
    // turn 0: spark .. fast .. batch -> (K001, K008)
    // turn 1: batch .. fast .. spark -> (K008, K001); "is faster" has no
    //   second word-bounded "fast", so (K001, ..) cannot fire after spark
    assert(out == Set(("K001", "K008", 0), ("K008", "K001", 1)))
  }

  // --- coreference-lite ---
  test("resolveMarkers picks the latest earlier anchored turn, strictly earlier") {
    val turns = Seq(
      ("c1", 0, "spark setup"),        // anchor K001, no marker words
      ("c1", 1, "now run the job"),    // marker 'the' -> antecedent K001@0
      ("c1", 2, "batch mode on"),      // anchor K008
      ("c1", 3, "a retry happened"),   // marker 'a' -> antecedent K008@2
      ("c1", 4, "the batch failed"),   // marker AND anchor: resolves to @2, not itself
      ("c2", 0, "the very first turn") // marker but no earlier anchor -> dropped
    ).toDF("conv_id", "turn_idx", "text")
    val mentions = Seq(
      ("c1", 0, "K001"), ("c1", 2, "K008"), ("c1", 4, "K008")
    ).toDF("conv_id", "turn_idx", "code")
    val out = Coref.resolveMarkers(turns, mentions, Seq("the", "a"))
      .as[(String, Int, String, String, Int)].collect().toSet
    assert(out == Set(
      ("c1", 1, "the", "K001", 0),
      ("c1", 3, "a", "K008", 2),
      ("c1", 4, "the", "K008", 2)))
  }

  test("resolveMarkers reports the first marker in LIST order, not text order") {
    val turns = Seq(("c1", 0, "spark"), ("c1", 1, "a then the"))
      .toDF("conv_id", "turn_idx", "text")
    val mentions = Seq(("c1", 0, "K001")).toDF("conv_id", "turn_idx", "code")
    val out = Coref.resolveMarkers(turns, mentions, Seq("the", "a"))
      .select("marker").as[String].collect()
    assert(out.toSeq == Seq("the")) // 'the' first in the list wins
  }

  // --- edge confidence ---
  test("score combines saturating support and recency in exact ppm") {
    val obs = Seq(
      ("K1", "P", "v1", 100L), ("K1", "P", "v1", 200L), // n=2, last=200
      ("K2", "P", "v1", 300L)                            // n=1, last=300 (hi)
    ).toDF("subj", "pred", "obj", "ts_epoch")
    val out = EdgeConfidence.score(TemporalScope.scopeEdges(obs), supportCap = 2L)
      .select("subj", "support_ppm", "recency_ppm", "conf_ppm")
      .as[(String, Long, Long, Long)].collect()
      .map { case (k, a, b, c) => k -> ((a, b, c)) }.toMap
    // bounds lo=100 hi=300
    assert(out("K1") == ((1000000L, 500000L, 850000L)))  // full support, mid recency
    assert(out("K2") == ((500000L, 1000000L, 650000L)))  // half support, full recency
  }

  test("score gives full recency when the corpus has one instant") {
    val obs = Seq(("K1", "P", "v1", 5L)).toDF("subj", "pred", "obj", "ts_epoch")
    val out = EdgeConfidence.score(TemporalScope.scopeEdges(obs))
      .select("recency_ppm").as[Long].head()
    assert(out == 1000000L)
  }

  // --- incremental connected components ---
  test("merge over a batch equals full recompute, including brand-new nodes") {
    // history: {a,b,c} and {x,y}; batch: c-x bridges them, plus a new
    // isolated pair {p,q} and a new node n attaching to y
    val oldEdges = Seq(("a", "b"), ("b", "c"), ("x", "y")).toDF("src", "dst")
    val newEdges = Seq(("c", "x"), ("p", "q"), ("n", "y")).toDF("src", "dst")
    val oldMap = ConnectedComponents.runAdaptive(spark, oldEdges)
    val inc = IncrementalCC.merge(spark, oldMap, newEdges)
      .as[(String, String)].collect().toMap
    val full = ConnectedComponents.runAdaptive(spark,
        oldEdges.unionByName(newEdges))
      .as[(String, String)].collect().toMap
    assert(inc == full)
    assert(inc("n") == "a" && inc("p") == "p" && inc("q") == "p")
  }

  test("merge with an empty-overlap batch leaves old components intact") {
    val oldEdges = Seq(("a", "b")).toDF("src", "dst")
    val newEdges = Seq(("m", "z")).toDF("src", "dst")
    val oldMap = ConnectedComponents.runAdaptive(spark, oldEdges)
    val inc = IncrementalCC.merge(spark, oldMap, newEdges)
      .as[(String, String)].collect().toMap
    assert(inc == Map("a" -> "a", "b" -> "a", "m" -> "m", "z" -> "m"))
  }
}
