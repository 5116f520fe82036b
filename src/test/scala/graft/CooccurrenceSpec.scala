package graft

import graft.triples.Cooccurrence

class CooccurrenceSpec extends SparkTestBase {
  import spark.implicits._

  // 4 contexts; duplicate (c1, A) mention must collapse (presence, not
  // frequency). Hand-computed: n_conv=4, n_A=3, n_B=3, n_C=1, n_D=1.
  lazy val links = Seq(
    ("c1", "A"), ("c1", "A"), ("c1", "B"), ("c1", "C"),
    ("c2", "A"), ("c2", "B"),
    ("c3", "A"),
    ("c4", "B"), ("c4", "D")
  ).toDF("conv_id", "code")

  test("convCooccur computes exact integer lift components") {
    val out = Cooccurrence.convCooccur(links).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(out.keySet == Set(("A", "B"), ("A", "C"), ("B", "C"), ("B", "D")))
    // lift_ppm = floor(1e6 * pair_n * n_conv / (n_a * n_b))
    assert(out(("A", "B")) == ((2L, 3L, 3L, 4L, 888888L)))   // 8e6/9
    assert(out(("A", "C")) == ((1L, 3L, 1L, 4L, 1333333L)))  // 4e6/3
    assert(out(("B", "C")) == ((1L, 3L, 1L, 4L, 1333333L)))
    assert(out(("B", "D")) == ((1L, 3L, 1L, 4L, 1333333L)))
  }

  test("cooccurEdges keeps only positively associated pairs above min support") {
    // pair_n>=2 leaves only (A,B), whose lift 888888 <= 1e6 -> empty
    assert(Cooccurrence.cooccurEdges(links, minPairN = 2L).count() == 0L)
    val e = Cooccurrence.cooccurEdges(links, minPairN = 1L).collect()
    assert(e.length == 3)
    assert(e.forall(_.getString(1) == "COOCCURS_WITH"))
    assert(e.forall(_.getLong(3) > 1000000L))
  }

  test("pair ordering is canonical: code_a < code_b, no self-pairs") {
    val rows = Cooccurrence.convCooccur(links).collect()
    assert(rows.forall(r => r.getString(0) < r.getString(1)))
  }
}
