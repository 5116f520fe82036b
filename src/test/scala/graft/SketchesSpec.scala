package graft

import org.apache.spark.sql.functions._

import graft.ops.Sketches
import graft.triples.GraphStats

/** Distinct-count sketches (KMV, HLL) and graph statistics. The
  * sketch tests pin the two properties that make them production
  * primitives: the MERGE law (batch-splitting must not change the
  * state) and the error envelope on known cardinalities. */
class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus(n: Int, dupEvery: Int = 0) = (1 to n).map { i =>
    val base = s"document number $i with deterministic content"
    if (dupEvery > 0 && i % dupEvery == 0) s"document number ${i - 1} with deterministic content"
    else base
  }.toDF("text")

  test("kmv: exhaustive below k — exact count, estimate = k_used") {
    val r = Sketches.kmvDistinct(corpus(40, dupEvery = 4), "text", k = 64).head()
    // 40 rows, every 4th duplicates its predecessor -> 30 distinct
    assert(r.getAs[Int]("k_used") == 30)
    assert(r.getAs[Double]("est_distinct") == 30.0)
  }

  test("kmv: estimate within 20% at 5000 distinct, k=256") {
    val r = Sketches.kmvDistinct(corpus(5000), "text", k = 256).head()
    val est = r.getAs[Double]("est_distinct")
    assert(math.abs(est / 5000.0 - 1.0) < 0.20, s"est=$est")
    assert(r.getAs[Int]("k_used") == 256)
  }

  test("kmv merge law: reduce over a split equals the whole") {
    val agg = new Sketches.KmvAgg(16)
    val rnd = new scala.util.Random(5)
    val hs = (1 to 500).map(_ => rnd.nextLong())
    val whole = hs.foldLeft(agg.zero)(agg.reduce)
    val (l, rpart) = hs.splitAt(137)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
      rpart.foldLeft(agg.zero)(agg.reduce))
    assert(whole == merged)
    assert(whole == hs.distinct.sorted.take(16))
  }

  test("hll registers: rho matches Long.numberOfLeadingZeros, merge law holds") {
    val b = 6
    val docs = corpus(300)
    val regs = Sketches.hllRegisters(docs, "text", b)
      .as[(Long, Int)].collect().toMap
    // independent reference from first principles
    val expect = docs.as[String].collect()
      .map(graft.functions.Hashing.hash64)
      .groupBy(h => h & ((1 << b) - 1))
      .map { case (reg, hs) =>
        reg -> hs.map { h =>
          val w = h >>> b
          if (w == 0) 64 - b + 1
          else java.lang.Long.numberOfLeadingZeros(w) - b + 1
        }.max
      }
    assert(regs == expect)
    // merge law: registers of a split, max-merged, equal the whole
    val half1 = Sketches.hllRegisters(docs.filter($"text" < "document number 3"), "text", b)
    val half2 = Sketches.hllRegisters(docs.filter(!($"text" < "document number 3")), "text", b)
    val merged = half1.unionByName(half2)
      .groupBy("register").agg(max("max_rho").as("max_rho"))
      .as[(Long, Int)].collect().toMap
    assert(merged == regs)
  }

  test("hll estimate within 30% at 5000 distinct, m=64") {
    val regs = Sketches.hllRegisters(corpus(5000), "text", 6)
    val r = Sketches.hllEstimate(regs, 6).head()
    val est = r.getAs[Double]("est_hll")
    assert(math.abs(est / 5000.0 - 1.0) < 0.30, s"est=$est")
    assert(r.getAs[Long]("n_nonempty") == 64L) // 5000 >> m: all occupied
  }

  test("triangle stats: K4 has 4 triangles; path has none; dirt is canonicalized") {
    def g(pairs: (String, String)*) =
      pairs.toSeq.toDF("subj", "obj")
    val k4 = g("a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c", "b" -> "d", "c" -> "d",
      // noise: reversed duplicate, self loop, exact duplicate
      "b" -> "a", "a" -> "a", "c" -> "d")
    val r = GraphStats.triangleStats(k4).head()
    assert(r.getAs[Long]("n_nodes") == 4L)
    assert(r.getAs[Long]("n_edges") == 6L)
    assert(r.getAs[Long]("n_triangles") == 4L)
    val path = g("a" -> "b", "b" -> "c", "c" -> "d")
    assert(GraphStats.triangleStats(path).head().getAs[Long]("n_triangles") == 0L)
    // triangle + pendant: exactly 1
    val tri = g("x" -> "y", "y" -> "z", "z" -> "x", "z" -> "w")
    assert(GraphStats.triangleStats(tri).head().getAs[Long]("n_triangles") == 1L)
  }

  test("countmin: estimate >= exact for every token (one-sided error)") {
    val docs = corpus(400, dupEvery = 3)
    val cms = Sketches.countMinTable(docs, "text", d = 4, wBits = 12)
    val exact = Sketches.tokenOccurrences(docs, "text")
      .groupBy("token").agg(count(lit(1)).as("exact_n"))
    val est = Sketches.countMinEstimate(cms, exact.select("token"), "token",
      d = 4, wBits = 12)
    val joined = exact.join(est, "token")
      .as[(String, Long, Long)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (t, ex, e) =>
      assert(e >= ex, s"token=$t exact=$ex est=$e") }
  }

  test("countmin: tiny width forces collisions, still never undercounts") {
    val docs = corpus(500)
    // 2 rows x 16 cells for thousands of distinct tokens: heavy collisions
    val cms = Sketches.countMinTable(docs, "text", d = 2, wBits = 4)
    val exact = Sketches.tokenOccurrences(docs, "text")
      .groupBy("token").agg(count(lit(1)).as("exact_n"))
    val joined = exact.join(
      Sketches.countMinEstimate(cms, exact.select("token"), "token",
        d = 2, wBits = 4), "token")
      .as[(String, Long, Long)].collect()
    assert(joined.forall { case (_, ex, e) => e >= ex })
    assert(joined.exists { case (_, ex, e) => e > ex }, "expected collisions")
  }

  test("countmin merge law: cell-wise sum of split tables equals the whole") {
    val docs = corpus(300)
    val whole = Sketches.countMinTable(docs, "text", d = 4, wBits = 8)
      .as[(Int, Long, Long)].collect().toSet
    val h1 = Sketches.countMinTable(
      docs.filter($"text" < "document number 2"), "text", d = 4, wBits = 8)
    val h2 = Sketches.countMinTable(
      docs.filter(!($"text" < "document number 2")), "text", d = 4, wBits = 8)
    val merged = h1.unionByName(h2)
      .groupBy("row", "pos").agg(sum("cnt").as("cnt"))
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == whole)
  }

  test("degree histogram on a known graph") {
    val star = Seq("c" -> "l1", "c" -> "l2", "c" -> "l3").toDF("subj", "obj")
    val h = GraphStats.degreeHistogram(star).as[(Long, Long)].collect().toMap
    assert(h == Map(1L -> 3L, 3L -> 1L))
  }
}
