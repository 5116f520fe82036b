package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.canon.ConnectedComponents
import graft.dict.AhoCorasick
import graft.functions.{Hashing, Vectorizer}

/** Property-based invariants (FIXTURES.md §4), sampled from ScalaCheck
  * generators with a FIXED seed (no scalatestplus bridge in the
  * offline cache, so sampling is driven manually — equally effective,
  * deterministic by construction). Pure-JVM properties run densely;
  * Spark properties on a few sampled cases (each case is a job).
  */
class PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.session

  /** Deterministic sample stream from a generator. */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("property: AC mention offsets always in bounds, surfaces match the text (200 cases)") {
    val surfaces = Seq("lung carcinoma", "cancer", "il 2", "stage iv", "no")
    val ac = AhoCorasick.build(surfaces)
    val wordGen = Gen.oneOf("lung", "carcinoma", "cancer", "il", "2", "stage",
      "iv", "no", "notably", "the", "patient", "zzz", "CANCER", "Lung")
    val textGen = Gen.listOf(wordGen).map(_.mkString(" "))
    samples(textGen, 200).foreach { text =>
      ac.findMatches(text).foreach { case (b, e) =>
        assert(b >= 0 && e <= text.length && b < e)
        val surf = Hashing.norm(text.substring(b, e))
        assert(surfaces.contains(surf), s"'$surf' not a dictionary surface in '$text'")
        assert(b == 0 || !Character.isLetterOrDigit(text.charAt(b - 1)))
        assert(e == text.length || !Character.isLetterOrDigit(text.charAt(e)))
      }
    }
  }

  test("property: vectorizer deterministic, unit-norm or zero (200 cases)") {
    samples(Gen.asciiPrintableStr, 200).foreach { s =>
      val a = Vectorizer.vectorizeChar(s)
      assert(a.sameElements(Vectorizer.vectorizeChar(s)))
      val n = a.map(x => x * x.toDouble).sum
      assert(n == 0.0 || math.abs(n - 1.0) < 1e-5, s"norm $n for '$s'")
    }
  }

  test("property: minhash agreement symmetric + reflexive (100 cases)") {
    val g = Gen.listOfN(12, Gen.oneOf("a", "b", "c", "d", "e", "f")).map(_.mkString(" "))
    samples(Gen.zip(g, g), 100).foreach { case (x, y) =>
      val mx = Hashing.minHash(Hashing.wordShingles(x, 3).iterator, 32)
      val my = Hashing.minHash(Hashing.wordShingles(y, 3).iterator, 32)
      def agree(a: Array[Long], b: Array[Long]) = a.zip(b).count(p => p._1 == p._2)
      assert(agree(mx, mx) == 32)
      assert(agree(mx, my) == agree(my, mx))
    }
  }

  test("property: CC matches union-find reference on random graphs (5 sampled)") {
    import spark.implicits._
    val edgeGen = Gen.listOfN(25, Gen.zip(Gen.choose(0, 14), Gen.choose(0, 14)))
      .map(_.filter(p => p._1 != p._2))
    samples(edgeGen, 5).filter(_.nonEmpty).foreach { edges =>
      val df = edges.map { case (a, b) => (f"n$a%02d", f"n$b%02d") }.toDF("src", "dst")
      val got = ConnectedComponents.run(spark, df).as[(String, String)].collect().toMap
      // union-find reference
      val parent = scala.collection.mutable.Map[String, String]()
      def find(x: String): String = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (x, y) = (find(f"n$a%02d"), find(f"n$b%02d"))
        if (x != y) {
          val (lo, hi) = if (x < y) (x, y) else (y, x)
          parent(hi) = lo
        }
      }
      got.keys.groupBy(find).foreach { case (_, nodes) =>
        val labels = nodes.map(got).toSet
        assert(labels.size == 1, s"component split: $nodes -> $labels")
        assert(labels.head == nodes.min, s"canonical ${labels.head} != min ${nodes.min}")
      }
    }
  }

  test("property: lsh-then-verify reports exact jaccards, subset of exact op (3 corpora)") {
    import spark.implicits._
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val doc = Gen.listOfN(8, word).map(_.mkString(" "))
    samples(Gen.listOfN(12, doc), 3).foreach { docsList =>
      val df = docsList.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.ops.Dedup.lshVerified(df, "doc_id", "text",
        estThreshold = 0.2, threshold = 0.5)
        .select("id_a", "id_b", "jaccard").collect()
      // every reported jaccard equals a driver-side set recompute
      val tokSets = docsList.map(t => Hashing.norm(t).split(" ").distinct.toSet)
      got.foreach { r =>
        val (a, b) = (r.getLong(0).toInt, r.getLong(1).toInt)
        val j = tokSets(a).intersect(tokSets(b)).size.toDouble /
          tokSets(a).union(tokSets(b)).size
        assert(math.abs(r.getDouble(2) - j) < 1e-12 && j >= 0.5)
      }
      // and the pair set never exceeds the exact operator's
      val exact = graft.ops.Dedup.ngramJaccard(df, "doc_id", "text", threshold = 0.5)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet.subsetOf(exact))
    }
  }

  test("property: pipeline links identical across repartitionings") {
    import spark.implicits._
    val dict = graft.fixtures.Fixtures.dict(spark)
    val turns = graft.fixtures.Fixtures.transcripts(spark, 12, 5)
    val r1 = Pipeline.run(spark, turns.repartition(1), dict)
      .links.orderBy("conv_id", "turn_idx", "begin").collect()
    val r2 = Pipeline.run(spark, turns.repartition(13), dict)
      .links.orderBy("conv_id", "turn_idx", "begin").collect()
    assert(r1.sameElements(r2))
  }

  test("property: any batching of an edge set MERGEs to its distinct union (4 sampled)") {
    import spark.implicits._
    import graft.model.Triple
    // random multisets of triples over a small key space (collisions
    // within AND across batches guaranteed), random batch splits —
    // invariants: final table = distinct union, independent of the
    // batching; sum of per-merge fresh counts = distinct total;
    // re-merging the whole set afterwards adds 0
    val tripleGen = for {
      s <- Gen.choose(0, 5); p <- Gen.oneOf("LINKED_TO", "MAPS_TO", "SAME_AS")
      o <- Gen.choose(0, 5)
    } yield Triple(s"s$s", p, s"o$o")
    val caseGen = for {
      ts <- Gen.listOfN(40, tripleGen)
      nBatches <- Gen.choose(1, 5)
      cuts <- Gen.listOfN(ts.length, Gen.choose(0, nBatches - 1))
    } yield ts.zip(cuts)
    samples(caseGen, 4).foreach { tagged =>
      val dir = java.nio.file.Files.createTempDirectory("graft-mergeprop").toString + "/g"
      val batches = tagged.groupBy(_._2).toSeq.sortBy(_._1).map(_._2.map(_._1))
      val freshSum = batches.map(b =>
        graft.triples.GraphMerge.mergeEdges(spark, dir, b.toDS())).sum
      val expect = tagged.map(_._1).distinct
      val got = spark.read.parquet(s"$dir/edges")
        .select("subj", "pred", "obj").as[Triple].collect()
      assert(got.length == expect.length && got.toSet == expect.toSet)
      assert(freshSum == expect.length.toLong)
      assert(graft.triples.GraphMerge.mergeEdges(spark, dir,
        tagged.map(_._1).toDS()) == 0L)
    }
  }
}
