package graft

import org.apache.spark.sql.functions._

import graft.dict.AhoCorasick
import graft.functions.{Hashing, Vectorizer}

class FunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("cosine_sim expression matches zip_with/aggregate SQL form and handles nulls") {
    val df = Seq(
      (Array(1.0f, 0.0f, 2.0f), Array(1.0f, 0.0f, 2.0f)),
      (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
      (Array(0.5f, -0.5f, 1.5f), Array(-1.0f, 2.0f, 0.25f)),
      (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f))
    ).toDF("a", "b")
    val rows = df.select(
      Functions.cosine_sim($"a", $"b").as("expr"),
      Functions.cosine_sim_sql($"a", $"b").as("sql")).collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
    assert(math.abs(rows(0).getDouble(0) - 1.0) < 1e-9)
    assert(math.abs(rows(1).getDouble(0)) < 1e-9)
    assert(rows(3).getDouble(0) == 0.0) // zero-norm -> 0
    // null -> 0.0 (reference semantic_retrievers.py:38-39)
    val withNull = Seq((Some(Array(1.0f)), None: Option[Array[Float]]))
      .toDF("a", "b")
      .select(Functions.cosine_sim($"a", $"b").as("c")).collect()
    assert(withNull(0).getDouble(0) == 0.0)
  }

  test("cosine_sim registered for SQL") {
    val got = spark.sql(
      "SELECT cosine_sim(array(cast(1.0 as float), cast(2.0 as float)), " +
        "array(cast(1.0 as float), cast(2.0 as float)))").collect()(0).getDouble(0)
    assert(math.abs(got - 1.0) < 1e-9)
  }

  test("aho-corasick finds word-bounded longest matches with offsets") {
    val ac = AhoCorasick.build(Seq("lung carcinoma", "lung cancer", "cancer",
      "carcinoma of the lung", "no"))
    val text = "patient has lung cancer; cancer confirmed, notably no mets"
    val hits = ac.findMatches(text).map { case (b, e) => text.substring(b, e) }
    // "lung cancer" (longest from 'lung'), bare "cancer", bare "no";
    // "notably" must NOT match "no" (word boundary)
    assert(hits == Vector("lung cancer", "cancer", "no"))
    // case-insensitive, offsets preserved
    val t2 = "Lung Carcinoma staged"
    val h2 = ac.findMatches(t2)
    assert(h2 == Vector((0, 14)))
    assert(ac.findMatches("") == Vector.empty)
    assert(ac.findMatches("nothing here") == Vector.empty)
  }

  test("hashing + vectorizer determinism and normalization") {
    assert(Hashing.hash64("spark") == Hashing.hash64("spark"))
    assert(Hashing.norm("  Foo   BAR ") == "foo bar")
    val v1 = Vectorizer.vectorizeChar("lung carcinoma")
    val v2 = Vectorizer.vectorizeChar("lung carcinoma")
    assert(v1.sameElements(v2))
    // l2-normalized
    assert(math.abs(v1.map(x => x * x.toDouble).sum - 1.0) < 1e-5)
    // misspelling stays close, junk stays far
    def cos(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x * y.toDouble }.sum
    val mis = Vectorizer.vectorizeChar("lung carcnoma")
    val junk = Vectorizer.vectorizeChar("zq431xv")
    assert(cos(v1, mis) > 0.7, s"misspelling cosine ${cos(v1, mis)}")
    assert(cos(v1, junk) < 0.5, s"junk cosine ${cos(v1, junk)}")
  }

  test("hash64_str column expression: known vectors, UTF-8 handling, JVM parity") {
    // pinned vectors cross-checked against the DuckDB HUGEINT oracle
    // implementation (tools/gen_sketch_oracles.py) — these exact
    // values anchor both engines to FNV-1a 64 + splitmix64 over UTF-8
    assert(Hashing.hash64("hello") == java.lang.Long.parseUnsignedLong("17575560079636620544"))
    assert(Hashing.hash64("héllo wörld") == java.lang.Long.parseUnsignedLong("11699540833507948141"))
    assert(Hashing.hash64("") == java.lang.Long.parseUnsignedLong("14087677454934409008"))
    val rows = Seq("hello", "héllo wörld", "a b c")
      .toDF("s").select(Functions.hash64_str($"s").as("h")).collect()
    assert(rows.map(_.getLong(0)).sameElements(
      Array("hello", "héllo wörld", "a b c").map(Hashing.hash64)))
  }

  test("native word_shingles is byte-identical to the builtin Column formulation") {
    // the formulation word_shingles replaced (kept here as the
    // semantic reference): array_distinct over a transform/slice
    // sliding window on the SQL-normalized token split
    def reference(text: org.apache.spark.sql.Column, n: Int) = {
      val toks = split(Functions.norm_text(text), " ")
      when(size(toks) < n, array().cast("array<string>"))
        .otherwise(array_distinct(transform(
          sequence(lit(1), size(toks) - (n - 1)),
          i => array_join(slice(toks, i, lit(n)), " "))))
    }
    val cases = Seq(
      null.asInstanceOf[String], "", " ", "   ", "one", "one two",
      "one two three", "one two three four five",
      "a b c a b c a b c",                 // duplicate shingles
      "\tTab  Lead mixed\nWS trail\t",     // non-space ws at edges
      "  spaces  only   collapse  ",
      "UPPER Case MiXeD tokens here",
      "a nbsp stays inside token x y" // nbsp is NOT \s
    )
    val df = cases.toDF("t")
    for (n <- Seq(2, 3, 4)) {
      val rows = df.select(
        Functions.word_shingles($"t", n).as("native"),
        reference($"t", n).as("ref")).collect()
      for ((r, c) <- rows.zip(cases)) {
        val nat = Option(r.getSeq[String](0)).map(_.toList)
        val ref = Option(r.getSeq[String](1)).map(_.toList)
        assert(nat === ref, s"n=$n text=${Option(c).map("'" + _ + "'")}")
      }
    }
  }

  test("rlike_cached matches Spark's rlike on every (text, pattern) pair incl nulls") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    val texts = Seq("spark runs fast on batch", "sparkly faster", "", null)
    val pats = Seq("\\bspark\\b.*\\bfast\\b", "\\bfast\\b", "^$", "spark")
    val rows = for (t <- texts; p <- pats) yield (t, p)
    val df = rows.toDF("t", "p")
    val out = df.select(
        Functions.rlike_cached(col("t"), col("p")).as("cached"),
        expr("t rlike p").as("native"))
      .collect()
    out.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getBoolean(0) == r.getBoolean(1))
    }
  }

  test("ordered_terms equals the \\b..\\b.*\\b..\\b regex on a random word grid") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array, col, concat, lit, lower}
    val vocab = Seq("spark", "data", "table", "fast", "big", "x1")
    val rnd = new scala.util.Random(42)
    // '\n' as a vocab element: regex `.` matches no newline, so a
    // witness never crosses lines — the scan must agree on multi-line
    // text too (the round-4 advice gap)
    val texts = (0 until 300).map(_ =>
      (0 until rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")) ++
      (0 until 200).map { _ =>
        val toks = (0 until 2 + rnd.nextInt(12))
          .map(_ => vocab(rnd.nextInt(vocab.length)))
        toks.head + toks.tail.map(t =>
          (if (rnd.nextBoolean()) "\n" else " ") + t).mkString
      } ++
      Seq("sparkly fast data", "data tablefast spark", "", "spark fast spark",
        "spark\nfast data", "spark fast\ndata", "spark\n\nfast\ndata",
        "spark fast data\n", "\nspark fast data")
    val parts = Seq(("spark", "fast", "data"), ("data table", "fast", "spark"),
      ("fast", "fast", "fast"), ("x1", "big", "table"))
    val rows = for (t <- texts; (a, b, c) <- parts) yield (t, a, b, c)
    val out = rows.toDF("t", "a", "b", "c").select(
        Functions.ordered_terms(lower(col("t")),
          array(col("a"), col("b"), col("c"))).as("scan"),
        lower(col("t")).rlike("").as("dummy"),
        org.apache.spark.sql.functions.expr(
          "lower(t) rlike concat('\\\\b', a, '\\\\b.*\\\\b', b, '\\\\b.*\\\\b', c, '\\\\b')")
          .as("re"))
      .collect()
    out.foreach(r => assert(r.getBoolean(0) == r.getBoolean(2)))
  }

  test("simhash/minhash behave as similarity sketches") {
    val a = "the quick brown fox jumps over the lazy dog near the river bank today"
    val b = "the quick brown fox jumps over the lazy dog near the river bank yesterday"
    val c = "completely different words appear in this unrelated document about spark"
    def ham(x: Long, y: Long): Int = java.lang.Long.bitCount(x ^ y)
    val (ha, hb, hc) = (Hashing.simHash64(Hashing.tokenize(a).iterator),
      Hashing.simHash64(Hashing.tokenize(b).iterator),
      Hashing.simHash64(Hashing.tokenize(c).iterator))
    assert(ham(ha, hb) < ham(ha, hc))
    val (ma, mb, mc) = (Hashing.minHash(Hashing.wordShingles(a, 3).iterator, 64),
      Hashing.minHash(Hashing.wordShingles(b, 3).iterator, 64),
      Hashing.minHash(Hashing.wordShingles(c, 3).iterator, 64))
    def sim(x: Array[Long], y: Array[Long]): Double =
      x.zip(y).count { case (p, q) => p == q } / 64.0
    assert(sim(ma, mb) > sim(ma, mc))
    assert(sim(ma, ma) == 1.0)
  }
}
