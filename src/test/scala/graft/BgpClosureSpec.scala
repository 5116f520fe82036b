package graft

import org.apache.spark.sql.DataFrame

import graft.triples.{BgpQuery, GraphTraverse, Triples}

/** BGP pattern matching over (subj, pred, obj) edges and semi-naive
  * transitive closure. Pins variable binding, constant filters,
  * repeated-variable equality, connectivity enforcement, cycle safety
  * and closure/kHop agreement. */
class BgpClosureSpec extends SparkTestBase {
  import spark.implicits._

  private def e(rows: (String, String, String)*): DataFrame =
    rows.toSeq.toDF("subj", "pred", "obj")

  private val edges = e(
    ("cde1", "HAS_VDM", "vdm1"), ("cde2", "HAS_VDM", "vdm2"),
    ("vdm1", "HAS_PV", "pv1"), ("vdm1", "HAS_PV", "pv2"),
    ("vdm2", "HAS_PV", "pv3"),
    ("pv1", "HAS_CONCEPT", "n1"), ("pv2", "HAS_CONCEPT", "n1"),
    ("pv3", "HAS_CONCEPT", "n2"),
    ("n1", "SIMILAR", "n1")) // self-loop for the repeated-var pattern

  test("bgp: 3-pattern chain binds the full path") {
    val got = BgpQuery.query(edges, Seq(
        ("?cde", "HAS_VDM", "?vdm"), ("?vdm", "HAS_PV", "?pv"),
        ("?pv", "HAS_CONCEPT", "?n")))
      .as[(String, String, String, String)].collect().toSet
    assert(got == Set(
      ("cde1", "vdm1", "pv1", "n1"), ("cde1", "vdm1", "pv2", "n1"),
      ("cde2", "vdm2", "pv3", "n2")))
  }

  test("bgp: constant subject and object filter bindings") {
    val bySubj = BgpQuery.query(edges, Seq(("cde1", "HAS_VDM", "?v")))
      .as[String].collect().toSeq
    assert(bySubj == Seq("vdm1"))
    val byObj = BgpQuery.query(edges, Seq(
        ("?pv", "HAS_CONCEPT", "n1"), ("?vdm", "HAS_PV", "?pv")))
      .as[(String, String)].collect().toSet
    assert(byObj == Set(("pv1", "vdm1"), ("pv2", "vdm1")))
  }

  test("bgp: repeated variable in one pattern means equality") {
    val got = BgpQuery.query(edges, Seq(("?x", "SIMILAR", "?x")))
      .as[String].collect().toSeq
    assert(got == Seq("n1"))
  }

  test("bgp: variable predicate binds; disconnected patterns rejected") {
    val preds = BgpQuery.query(edges, Seq(("pv1", "?p", "?o")))
      .as[(String, String)].collect().toSet
    assert(preds == Set(("HAS_CONCEPT", "n1")))
    val ex = intercept[IllegalArgumentException] {
      BgpQuery.query(edges, Seq(("?a", "HAS_VDM", "?b"), ("?c", "HAS_PV", "?d")))
    }
    assert(ex.getMessage.contains("disconnected"))
  }

  test("bgp runs identically against the materialized fixture edges") {
    // the reference's 3-hop J3 chain as a BGP over Triples.baseEdges
    val dict = graft.fixtures.Fixtures.dict(spark)
    val base = Triples.baseEdges(spark, dict)
    val viaBgp = BgpQuery.query(base, Seq(
        ("?cde", "HAS_VDM", "?vdm"), ("?vdm", "HAS_PV", "?pv"),
        ("?pv", "HAS_CONCEPT", "?ncit")))
      .as[(String, String, String, String)].collect().toSet
    assert(viaBgp.nonEmpty)
    // every binding is a genuine path in the edge set
    val es = base.as[(String, String, String)].collect().toSet
    viaBgp.foreach { case (c, v, p, n) =>
      assert(es(((c, "HAS_VDM", v))) && es(((v, "HAS_PV", p)))
        && es(((p, "HAS_CONCEPT", n))))
    }
  }

  private def pairs(df: DataFrame): Set[(String, String)] =
    df.as[(String, String)].collect().toSet

  test("closure: DAG reachability, length >= 1 only") {
    val g = Seq(("a", "x", "b"), ("b", "x", "c"), ("c", "x", "d"))
      .toDF("subj", "pred", "obj")
    assert(pairs(GraphTraverse.closure(spark, g)) == Set(
      ("a", "b"), ("a", "c"), ("a", "d"),
      ("b", "c"), ("b", "d"), ("c", "d")))
  }

  test("closure: cycle-safe, no self pairs, converges") {
    val g = Seq(("a", "x", "b"), ("b", "x", "a"), ("b", "x", "c"))
      .toDF("subj", "pred", "obj")
    assert(pairs(GraphTraverse.closure(spark, g)) == Set(
      ("a", "b"), ("b", "a"), ("a", "c"), ("b", "c")))
  }

  test("closure agrees with directed kHop reachability from each node") {
    val g = Seq(("a", "x", "b"), ("b", "x", "c"), ("d", "x", "c"),
      ("c", "x", "e")).toDF("subj", "pred", "obj")
    val cl = pairs(GraphTraverse.closure(spark, g))
    for (src <- Seq("a", "b", "c", "d")) {
      val reach = GraphTraverse.kHop(spark, g.select("subj", "obj"),
          Seq(src).toDF("node"), maxHops = 10, directed = true)
        .as[(String, Int)].collect().collect { case (n, h) if h > 0 => n }.toSet
      assert(cl.collect { case (s, d) if s == src => d }.toSet == reach, src)
    }
  }

  test("bgp over pred-partitioned edges prunes each pattern's scan") {
    val dict = graft.fixtures.Fixtures.dict(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft-bgp")
      .toString + "/edges"
    Triples.write(
      Triples.baseEdges(spark, dict).as[graft.model.Triple], dir)
    val q = BgpQuery.query(spark.read.parquet(dir), Seq(
      ("?cde", "HAS_VDM", "?vdm"), ("?vdm", "HAS_PV", "?pv")))
    val plan = q.queryExecution.executedPlan.toString
    // constant predicates became partition filters on their scans —
    // each pattern reads only its own pred=... directory
    assert(plan.contains("PartitionFilters: [isnotnull(pred")
      && plan.contains("HAS_VDM") && plan.contains("HAS_PV"), plan)
    // joins on shared variables only — no cartesian anywhere
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoop"), plan)
    assert(q.count() > 0)
  }

  test("closure maxIters guard raises instead of truncating") {
    val g = Seq(("a", "x", "b"), ("b", "x", "c"), ("c", "x", "d"),
      ("d", "x", "e")).toDF("subj", "pred", "obj")
    val ex = intercept[IllegalArgumentException] {
      GraphTraverse.closure(spark, g, maxIters = 1)
    }
    assert(ex.getMessage.contains("did not converge"))
  }
}
