package graft

import org.apache.spark.sql.functions._

import graft.triples.{GraphStats, GraphTraverse}

/** Iterative graph algorithms: bounded-depth BFS traversal and
  * integer fixed-point PageRank. Pins min-hop semantics, direction
  * handling, early frontier exhaustion, rank-mass accounting, and the
  * partitioning-invariance that the integer arithmetic buys. */
class GraphAlgoSpec extends SparkTestBase {
  import spark.implicits._

  private def g(pairs: (String, String)*) = pairs.toSeq.toDF("subj", "obj")

  test("khop: chain distances, bounded depth, undirected symmetry") {
    val chain = g("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e")
    val hops = GraphTraverse.kHop(spark, chain, Seq("a").toDF("node"), 3)
      .as[(String, Int)].collect().toMap
    assert(hops == Map("a" -> 0, "b" -> 1, "c" -> 2, "d" -> 3)) // e is 4 away
    // undirected: seeding the far end walks the reversed edges
    val back = GraphTraverse.kHop(spark, chain, Seq("e").toDF("node"), 2)
      .as[(String, Int)].collect().toMap
    assert(back == Map("e" -> 0, "d" -> 1, "c" -> 2))
  }

  test("khop: directed mode follows subj->obj only") {
    val chain = g("a" -> "b", "b" -> "c")
    val fwd = GraphTraverse.kHop(spark, chain, Seq("a").toDF("node"), 3,
      directed = true).as[(String, Int)].collect().toMap
    assert(fwd == Map("a" -> 0, "b" -> 1, "c" -> 2))
    val rev = GraphTraverse.kHop(spark, chain, Seq("c").toDF("node"), 3,
      directed = true).as[(String, Int)].collect().toMap
    assert(rev == Map("c" -> 0)) // no outgoing edges from c
  }

  test("khop: hop is the MINIMUM distance; frontier exhausts early") {
    // diamond plus a direct shortcut: d reachable at hops 1 AND 2
    val dia = g("a" -> "b", "a" -> "c", "b" -> "d", "c" -> "d", "a" -> "d")
    val hops = GraphTraverse.kHop(spark, dia, Seq("a").toDF("node"), 5)
      .as[(String, Int)].collect().toMap
    assert(hops == Map("a" -> 0, "b" -> 1, "c" -> 1, "d" -> 1))
    // isolated seed: loop must exit on the empty frontier, not run 5 rounds
    val iso = GraphTraverse.kHop(spark, dia, Seq("zzz").toDF("node"), 5)
      .as[(String, Int)].collect().toMap
    assert(iso == Map("zzz" -> 0))
  }

  test("khop: multiple seeds take the min over seeds") {
    val chain = g("a" -> "b", "b" -> "c", "c" -> "d")
    val hops = GraphTraverse.kHop(spark, chain,
      Seq("a", "d").toDF("node"), 1).as[(String, Int)].collect().toMap
    assert(hops == Map("a" -> 0, "d" -> 0, "b" -> 1, "c" -> 1))
  }

  test("pagerank: symmetric cycle splits mass equally, conserves it") {
    val scale = 1000000000000L
    val cyc = g("a" -> "b", "b" -> "c", "c" -> "a")
    val r = GraphStats.pageRank(cyc, iters = 5, scale = scale)
      .as[(String, Long)].collect().toMap
    assert(r.keySet == Set("a", "b", "c"))
    assert(r.values.toSet.size == 1, s"symmetry: $r") // identical by symmetry
    // no dangling nodes: only integer-truncation dust is lost
    val total = r.values.sum
    assert(total <= scale && total > scale - 1000, s"total=$total")
  }

  test("pagerank: a hub out-ranks its leaves; dangling mass leaks") {
    val star = g("l1" -> "hub", "l2" -> "hub", "l3" -> "hub", "hub" -> "l1")
    val r = GraphStats.pageRank(star, iters = 5)
      .as[(String, Long)].collect().toMap
    assert(r("hub") > r("l2") && r("hub") > r("l3"))
    // l2/l3 receive nothing: teleport share only — and equal by symmetry
    assert(r("l2") == r("l3"))
    val dang = g("a" -> "b") // b has no out-edges: its damped mass leaks
    val rd = GraphStats.pageRank(dang, iters = 3)
      .as[(String, Long)].collect().toMap
    assert(rd("b") > rd("a")) // b still accumulates a's contribution
    assert(rd.values.sum < 1000000000000L)
  }

  test("negative sampling: deterministic, filtered, bounded per edge") {
    val edges = (1 to 40).map(i =>
      (s"s${i % 8}", "P", s"o${i % 13}")).distinct.toDF("subj", "pred", "obj")
    val k = 3
    val neg1 = graft.triples.NegativeSample.corruptTails(edges, k, bBits = 4)
      .as[(String, String, String, String, Int)].collect().sorted.toSeq
    val neg2 = graft.triples.NegativeSample
      .corruptTails(edges.repartition(5), k, bBits = 4)
      .as[(String, String, String, String, Int)].collect().sorted.toSeq
    assert(neg1 == neg2) // pure function of (edge, slot): no rand(), no order
    assert(neg1.nonEmpty)
    val trueSet = edges.as[(String, String, String)].collect().toSet
    val verts = trueSet.flatMap(t => Set(t._1, t._3))
    neg1.foreach { case (s, p, o, n, slot) =>
      assert(n != o, "no-op corruption must be filtered")
      assert(!trueSet((s, p, n)), "accidental true triple must be filtered")
      assert(verts(n), "corrupted tail must come from the vertex set")
      assert(slot >= 0 && slot < k)
    }
    // bounded: at most k negatives per edge, and draws actually vary
    val perEdge = neg1.groupBy(t => (t._1, t._2, t._3)).view.mapValues(_.size)
    assert(perEdge.values.forall(_ <= k))
    assert(neg1.map(_._4).distinct.size > 3, "draws should spread over vertices")
  }

  test("random walks: valid steps, full length, partitioning-invariant") {
    val edges = (1 to 40).map(i => (s"n${i % 8}", s"n${(i * 5) % 8}"))
      .filter { case (a, b) => a != b }.toDF("subj", "obj")
    val w = graft.triples.RandomWalks.walks(spark, edges,
        walksPerNode = 2, walkLen = 3)
      .as[(String, Int, Int, String)].collect()
    // undirected graph has no sinks: every walk runs the full length
    val byWalk = w.groupBy(r => (r._1, r._2))
    assert(byWalk.values.forall(_.length == 4)) // steps 0..3
    assert(byWalk.values.forall(_.exists(r => r._3 == 0 && r._4 == r._1)))
    // every consecutive (step t -> t+1) pair is a real undirected edge
    val und = edges.as[(String, String)].collect()
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    byWalk.values.foreach { rows =>
      rows.sortBy(_._3).sliding(2).foreach { case Array(a, b) =>
        assert(und((a._4, b._4)), s"${a._4}->${b._4} not an edge")
      }
    }
    // deterministic: a different input partitioning replays every step
    val w2 = graft.triples.RandomWalks.walks(spark, edges.repartition(5),
        walksPerNode = 2, walkLen = 3)
      .as[(String, Int, Int, String)].collect()
    assert(w.sorted.toSeq == w2.sorted.toSeq)
  }

  test("pagerank: identical output under different input partitioning") {
    val edges = (1 to 60).map(i => (s"n${i % 12}", s"n${(i * 7) % 12}"))
      .filter { case (a, b) => a != b }.toDF("subj", "obj")
    val one = GraphStats.pageRank(edges.repartition(1), iters = 4)
      .as[(String, Long)].collect().toMap
    val many = GraphStats.pageRank(edges.repartition(7), iters = 4)
      .as[(String, Long)].collect().toMap
    assert(one == many) // integer fixed-point: no reduction-order drift
  }
}
