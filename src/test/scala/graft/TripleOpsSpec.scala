package graft

import graft.extract.Salience
import graft.triples.{GraphTraverse, SchemaValidate, TemporalScope}

class TripleOpsSpec extends SparkTestBase {
  import spark.implicits._

  // --- shortestPaths: weighted graph with a cycle, a shortcut that
  // beats the direct edge, and an unreachable node ---
  //   a -1-> b -1-> c,  a -5-> c (direct, loses to a->b->c = 2),
  //   c -1-> a (cycle),  d -1-> e (disconnected from a)
  lazy val wEdges = Seq(
    ("a", "b", 1L), ("b", "c", 1L), ("a", "c", 5L),
    ("c", "a", 1L), ("d", "e", 1L)
  ).toDF("subj", "obj", "w")

  test("shortestPaths relaxes through the cheaper multi-hop route and is cycle-safe") {
    val d = GraphTraverse.shortestPaths(spark, wEdges, Seq("a").toDF("node"))
      .as[(String, Long)].collect().toMap
    assert(d == Map("a" -> 0L, "b" -> 1L, "c" -> 2L)) // not 5; d/e unreachable
  }

  test("shortestPaths multi-source takes the min over seeds") {
    val d = GraphTraverse.shortestPaths(spark, wEdges, Seq("a", "d").toDF("node"))
      .as[(String, Long)].collect().toMap
    assert(d("e") == 1L && d("c") == 2L)
  }

  // --- temporal scoping ---
  lazy val obs = Seq(
    ("c1", "MENTIONED_IN", "v1", 100L), ("c1", "MENTIONED_IN", "v1", 300L),
    ("c1", "MENTIONED_IN", "v1", 200L), ("c2", "MENTIONED_IN", "v1", 250L),
    ("c3", "MENTIONED_IN", "v2", 10L)
  ).toDF("subj", "pred", "obj", "ts_epoch")

  test("scopeEdges collapses observations to exact validity windows") {
    val s = TemporalScope.scopeEdges(obs).collect()
      .map(r => (r.getString(0), r.getString(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(s(("c1", "v1")) == ((100L, 300L, 3L)))
    assert(s(("c3", "v2")) == ((10L, 10L, 1L)))
  }

  test("asOf filters by first_seen, activeOnly also by staleness horizon") {
    val scoped = TemporalScope.scopeEdges(obs)
    // as of t=240: c1 (first 100) and c3 (first 10) in; c2 (first 250) out
    assert(TemporalScope.asOf(scoped, 240L).select("subj")
      .as[String].collect().toSet == Set("c1", "c3"))
    // active within horizon 100 of t=240: last_seen >= 140 -> c1 only
    assert(TemporalScope.asOf(scoped, 240L, activeOnly = true, horizon = 100L)
      .select("subj").as[String].collect().toSet == Set("c1"))
  }

  // --- schema validation ---
  test("validate classifies ok / unknown endpoints / bad signature") {
    val labels = Seq(("K1", "CONCEPT"), ("K2", "CONCEPT"), ("v1", "CONV"))
      .toDF("code", "label")
    val sigs = Seq(("CONCEPT", "LINKED_TO", "CONV"))
      .toDF("subj_label", "pred", "obj_label")
    val tri = Seq(
      ("K1", "LINKED_TO", "v1"),  // ok
      ("K1", "LINKED_TO", "K2"),  // bad_signature (concept->concept)
      ("X9", "LINKED_TO", "v1"),  // unknown_subj
      ("K1", "LINKED_TO", "X8"),  // unknown_obj
      ("X9", "LINKED_TO", "X8")   // both unknown -> unknown_subj wins
    ).toDF("subj", "pred", "obj")
    val v = SchemaValidate.validate(tri, labels, sigs).collect()
      .map(r => (r.getString(0), r.getString(2)) -> r.getString(5)).toMap
    assert(v(("K1", "v1")) == "ok")
    assert(v(("K1", "K2")) == "bad_signature")
    assert(v(("X9", "v1")) == "unknown_subj")
    assert(v(("K1", "X8")) == "unknown_obj")
    assert(v(("X9", "X8")) == "unknown_subj")
    assert(SchemaValidate.violations(tri, labels, sigs).count() == 4L)
  }

  // --- skip-gram pairs ---
  test("skipGramPairs counts within-window ordered pairs per walk") {
    // one 4-node walk a-b-c-d, window 1: adjacent pairs only, both
    // directions; (a,c) etc. excluded
    val corpus = Seq(
      ("a", 0, 0, "a"), ("a", 0, 1, "b"), ("a", 0, 2, "c"), ("a", 0, 3, "d")
    ).toDF("start", "walk", "step", "node")
    val out = graft.triples.RandomWalks.skipGramPairs(corpus, window = 1)
      .as[(String, String, Long)].collect()
      .map { case (c, x, n) => (c, x) -> n }.toMap
    assert(out == Map(
      ("a", "b") -> 1L, ("b", "a") -> 1L, ("b", "c") -> 1L,
      ("c", "b") -> 1L, ("c", "d") -> 1L, ("d", "c") -> 1L))
  }

  test("skipGramPairs never pairs across walks and window 2 reaches 2 steps") {
    val corpus = Seq(
      ("a", 0, 0, "a"), ("a", 0, 1, "b"), ("a", 0, 2, "c"),
      ("z", 1, 0, "z"), ("z", 1, 1, "a") // separate walk reusing node a
    ).toDF("start", "walk", "step", "node")
    val out = graft.triples.RandomWalks.skipGramPairs(corpus, window = 2)
      .as[(String, String, Long)].collect()
      .map { case (c, x, n) => (c, x) -> n }.toMap
    assert(out(("a", "c")) == 1L)          // distance 2 included
    assert(out(("a", "b")) == 1L)          // a->b only in walk 0
    assert(out(("z", "a")) == 1L)          // within walk 1
    assert(!out.contains(("b", "z")))      // never across walks
  }

  // --- graph diff ---
  test("diff classifies added/removed/retained on the edge identity") {
    val before = Seq(("a", "P", "x"), ("a", "P", "y"), ("b", "Q", "z"))
      .toDF("subj", "pred", "obj")
    val after = Seq(("a", "P", "x"), ("c", "P", "w"))
      .toDF("subj", "pred", "obj")
    val out = graft.triples.GraphDiff.diff(before, after)
      .as[(String, String, String, String)].collect()
      .map { case (s0, p, o, st) => (s0, p, o) -> st }.toMap
    assert(out == Map(
      ("a", "P", "x") -> "retained",
      ("a", "P", "y") -> "removed",
      ("b", "Q", "z") -> "removed",
      ("c", "P", "w") -> "added"))
    val sum = graft.triples.GraphDiff.summary(before, after)
      .as[(String, String, Long)].collect().toSet
    assert(sum == Set(("P", "retained", 1L), ("P", "removed", 1L),
      ("Q", "removed", 1L), ("P", "added", 1L)))
  }

  // --- hierarchy rollup ---
  test("rollupCounts sums each subtree once, diamond paths not double-counted") {
    //      root
    //     /    \
    //    a      b     leaf x is-a BOTH a and b (diamond): its count
    //     \    /      reaches root exactly once
    //       x
    val isa = Seq(("x", "a"), ("x", "b"), ("a", "root"), ("b", "root"))
      .toDF("subj", "obj")
    val direct = Seq(("x", 5L), ("a", 2L), ("root", 1L))
      .toDF("code", "n_direct")
    val out = graft.triples.Hierarchy.rollupCounts(spark, isa, direct)
      .as[(String, Long, Long)].collect()
      .map { case (c, d, r) => c -> ((d, r)) }.toMap
    assert(out("x") == ((5L, 5L)))
    assert(out("a") == ((2L, 7L)))       // own 2 + x's 5
    assert(out("b") == ((0L, 5L)))       // no direct count of its own
    assert(out("root") == ((1L, 8L)))    // 1 + 2 + 5: x once, not twice
  }

  // --- salience ---
  test("perConversation scores turn presence over ALL turns, ranks deterministically") {
    // conv c1 has 4 turns (one mention-free); A in 2 turns (one turn
    // twice -> collapses), B in 1
    val mentions = Seq(
      ("c1", 0, "A"), ("c1", 0, "A"), ("c1", 2, "A"), ("c1", 2, "B")
    ).toDF("conv_id", "turn_idx", "code")
    val turns = Seq(("c1", 0), ("c1", 1), ("c1", 2), ("c1", 3))
      .toDF("conv_id", "turn_idx")
    val out = Salience.perConversation(mentions, turns).collect()
      .map(r => r.getString(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5))).toMap
    assert(out("A") == ((2L, 4L, 500000L, 1)))  // 2/4 turns
    assert(out("B") == ((1L, 4L, 250000L, 2)))
  }
}
