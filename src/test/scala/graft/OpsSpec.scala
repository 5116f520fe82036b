package graft

import org.apache.spark.sql.functions._

import graft.ops.{Ann, Dedup, Multimodal, Sampling, TextAnalysis}

class OpsSpec extends SparkTestBase {
  import spark.implicits._

  lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1L, "the quick brown fox jumps over the lazy dog near the river shore"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank"), // exact dup of 0
    (3L, "spark shuffles partition data across executors for wide dependencies"),
    (4L, "der hund und die katze sind nicht zu haus und das ist gut"),
    (5L, "completely unrelated content about databases and columnar storage")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts") {
    val d = Dedup.exact(docs, "doc_id", "text").collect()
    assert(d.length == 5) // 6 docs, one exact pair
    val dup = d.find(_.getLong(2) == 2L).get
    assert(dup.getLong(1) == 0L) // survivor = min id
  }

  test("minhash lsh finds the near-dup pair and not unrelated docs") {
    val pairs = Dedup.minHashLsh(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L))) // near dup
    assert(pairs.contains((0L, 2L))) // exact dup
    assert(!pairs.exists { case (a, b) => Set(a, b).contains(5L) && Set(a, b).contains(3L) })
  }

  test("lsh-then-verify: exact jaccard only on LSH candidates, subset of exact op") {
    val out = Dedup.lshVerified(docs, "doc_id", "text",
      estThreshold = 0.3, threshold = 0.5).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[Double]("jaccard") >= 0.5 &&
      r.getAs[Long]("id_a") < r.getAs[Long]("id_b")))
    val pairs = out.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((0L, 2L))) // exact dup survives verify at 1.0
    assert(pairs.contains((0L, 1L))) // near dup (one token differs)
    // LSH-proposed + verified pairs are a subset of the exact
    // prefix-filtered operator's output at the same threshold
    val exact = Dedup.ngramJaccard(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.subsetOf(exact))
  }

  test("simhash finds near dups within hamming budget") {
    val pairs = Dedup.simHash(docs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 2L))) // identical -> hamming 0
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("ngram jaccard near-dup pairs") {
    val pairs = Dedup.ngramJaccard(docs, "doc_id", "text", threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 2L)) && pairs.contains((1L, 2L)))
    assert(pairs.size == 3)
  }

  test("ngram jaccard prefix filter bounds candidates on a stopword-heavy corpus") {
    // 60 docs, each = the same 10 ubiquitous stopwords + 5 unique rare
    // tokens: a naive inverted index on ALL tokens yields every pair
    // (60*59/2 = 1770 candidates via the shared stopwords); the prefix
    // filter indexes only each doc's rarest tokens, so candidates stay
    // near the true near-dup count.
    val stop = (1 to 10).map(i => s"common$i").mkString(" ")
    val heavy = (0 until 60).map { i =>
      // docs 2k and 2k+1 share their rare tokens -> true near-dups
      val grp = i / 2
      (i.toLong, s"$stop rare${grp}a rare${grp}b rare${grp}c rare${grp}d uniq$i")
    }.toDF("doc_id", "text")
    val tokSets = heavy.select($"doc_id".as("id"),
      array_distinct(split(Functions.norm_text($"text"), " ")).as("toks"))
    val nCand = Dedup.ngramJaccardCandidates(tokSets, threshold = 0.8).count()
    assert(nCand < 200, s"prefix filter produced $nCand candidates (naive would be 1770)")
    // and the exact result still finds every true pair (jaccard 14/16 < 0.8? ->
    // shared = 10 stop + 4 rare = 14 of 16 union = 0.875 >= 0.8)
    val pairs = Dedup.ngramJaccard(heavy, "doc_id", "text", threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert((0 until 30).forall(g => pairs.contains((2L * g, 2L * g + 1))), "missed a true pair")
    assert(pairs.size == 30)
  }

  test("brute-force ann topk is exact, ordered, self-excluded") {
    val vecs = Seq(
      ("a", Array(1.0f, 0.0f, 0.0f)), ("b", Array(0.9f, 0.1f, 0.0f)),
      ("c", Array(0.0f, 1.0f, 0.0f)), ("d", Array(-1.0f, 0.0f, 0.0f))
    ).toDF("id", "vec")
    val res = Ann.bruteForceTopK(spark, vecs.filter($"id" === "a"), vecs, k = 2)
      .orderBy("rank").as[(String, Int, String, Double)].collect()
    assert(res.map(_._3).toSeq == Seq("b", "c"))
    assert(res(0)._4 > 0.99 && res(1)._4 == 0.0)
  }

  test("brute-force ann: heap ordering matches full sort incl. ties") {
    // many exact score ties (duplicate vectors) — the bounded heap's
    // eviction order must reproduce (cos DESC, id ASC) exactly
    val vecs = (0 until 40).map { i =>
      (f"v$i%02d", Array(1.0f, (i % 4) * 0.1f, 0.0f))
    }.toDF("id", "vec")
    val res = Ann.bruteForceTopK(spark, vecs, vecs, k = 5)
      .as[(String, Int, String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    res.foreach { case (qid, rows) =>
      val full = (0 until 40).map(i => (f"v$i%02d", Array(1.0f, (i % 4) * 0.1f, 0.0f)))
        .filter(_._1 != qid)
        .map { case (cid, cv) =>
          val qv = Array(1.0f, (qid.drop(1).toInt % 4) * 0.1f, 0.0f)
          (cid, graft.functions.VectorMath.cosine(qv, cv))
        }
        .sortBy { case (c, s) => (-s, c) }.take(5)
      assert(rows.map(r => (r._3, r._4)).toSeq == full, s"query $qid")
    }
  }

  test("brute-force ann refuses a corpus beyond the broadcast ceiling") {
    val vecs = (0 until 20).map(i => (i.toString, Array(1.0f, i.toFloat)))
      .toDF("id", "vec")
    val e = intercept[IllegalArgumentException] {
      Ann.bruteForceTopK(spark, vecs, vecs, k = 2, maxBroadcast = 10L)
    }
    assert(e.getMessage.contains("too large to broadcast"), e.getMessage)
  }

  test("lsh ann recalls obvious neighbors") {
    val n = 40
    val vecs = (0 until n).map { i =>
      val base = Array.tabulate(64)(d => graft.functions.Vectorizer.vectorizeChar(s"group${i % 4}")(d))
      val v = base.clone(); v(i % 64) += 0.05f
      (i.toString, v)
    }.toDF("id", "vec")
    val res = Ann.lshTopK(spark, vecs, k = 3, nBits = 8, tables = 4)
    // every query should find at least one same-group neighbor
    val hits = res.withColumn("qg", expr("cast(query_id as int) % 4"))
      .withColumn("cg", expr("cast(id as int) % 4"))
      .groupBy("query_id").agg(max(when($"qg" === $"cg", 1).otherwise(0)).as("ok"))
    val recall = hits.agg(avg("ok")).as[Double].collect()(0)
    assert(recall > 0.8, s"lsh recall $recall")
  }

  test("ivf ann: high recall vs brute force on clustered vectors") {
    val n = 60
    val vecs = (0 until n).map { i =>
      val base = graft.functions.Vectorizer.vectorizeChar(s"cluster-${i % 5}-anchor-text")
      val v = base.clone(); v(i % 64) += 0.08f
      (i.toString, v)
    }.toDF("id", "vec")
    val exact = Ann.bruteForceTopK(spark, vecs, vecs, k = 3)
      .select("query_id", "id").as[(String, String)].collect().toSet
    val ivf = Ann.ivfTopK(spark, vecs, k = 3, nCentroids = 10, nProbe = 3)
      .select("query_id", "id").as[(String, String)].collect().toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall > 0.85, s"ivf recall $recall")
    // multi-assignment redundancy must not lose candidates: recall is
    // monotone in nAssign (each list is a superset of the 1-assign one)
    val ivf2 = Ann.ivfTopK(spark, vecs, k = 3, nCentroids = 10, nProbe = 3, nAssign = 2)
      .select("query_id", "id").as[(String, String)].collect().toSet
    val recall2 = (exact intersect ivf2).size.toDouble / exact.size
    assert(recall2 >= recall, s"multi-assign recall $recall2 < $recall")
  }

  test("language id picks stopword-dominant language, und for no signal") {
    val out = docs.select($"doc_id", TextAnalysis.langId($"text").as("lang"))
      .as[(Long, String)].collect().toMap
    assert(out(0L) == "en" && out(4L) == "de")
    val und = Seq((9L, "zzz qqq xxx")).toDF("doc_id", "text")
      .select(TextAnalysis.langId($"text")).as[String].collect()(0)
    assert(und == "und")
  }

  test("quality features are sane") {
    val q = TextAnalysis.quality(docs, "doc_id", "text")
      .filter($"doc_id" === 0).collect()(0)
    assert(q.getAs[Int]("n_words") == 13)
    assert(q.getAs[Double]("stopword_ratio") > 0.2)
    assert(q.getAs[Double]("quality_score") > 0.0)
  }

  test("token counts: whitespace and bpe-ish") {
    val r = Seq((1L, "hello, world! x2")).toDF("doc_id", "text")
      .select(TextAnalysis.wsTokenCount($"text").as("ws"),
        TextAnalysis.bpeishTokenCount($"text").as("bp")).collect()(0)
    assert(r.getInt(0) == 3)
    // hello , world ! x 2 -> 6
    assert(r.getInt(1) == 6)
  }

  test("multimodal decode parses real BMP/WAV/AVI headers; deterministic") {
    val media = Multimodal.mediaFromText(docs, "doc_id", "text")
    val d1 = Multimodal.decode(spark, media).orderBy("media_id").collect()
    val d2 = Multimodal.decode(spark, media.repartition(7)).orderBy("media_id").collect()
    assert(d1.sameElements(d2))
    assert(d1.forall(r => r.n_bytes > 0 && r.valid))
    // image rows: dims come from the parsed BITMAPINFOHEADER and must
    // equal what the synthesizer declared; 24bpp -> 3 channels
    val img = d1.filter(_.kind == "image")
    val declared = media.filter($"kind" === "image")
      .select($"media_id", $"declared_w", $"declared_h")
      .as[(Long, Int, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(img.nonEmpty && img.forall(r =>
      (r.width, r.height) == declared(r.media_id) && r.channels == 3))
    // audio rows: channels parsed from the fmt chunk (1 or 2), height 1
    val aud = d1.filter(_.kind == "audio")
    assert(aud.nonEmpty && aud.forall(r =>
      (r.channels == 1 || r.channels == 2) && r.height == 1 && r.width > 0))
    // video rows: dims parsed from the AVI avih header (<=16), 24bpp
    val vid = d1.filter(_.kind == "video")
    val vDeclared = media.filter($"kind" === "video")
      .select($"media_id", $"declared_w", $"declared_h")
      .as[(Long, Int, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(vid.nonEmpty && vid.forall(r =>
      (r.width, r.height) == vDeclared(r.media_id) &&
        r.width <= 16 && r.height <= 16 && r.channels == 3))
    // frame sampling walks the REAL movi chunk list: 1-4 frames per
    // video at the stream's 100 ms clock, indexes contiguous from 0
    val frames = Multimodal.frameSample(spark, media).collect()
    assert(frames.nonEmpty && frames.forall(f => f.offset_ms == f.frame_idx * 100))
    val byId = frames.groupBy(_.media_id)
    assert(byId.values.forall(fs => fs.length >= 1 && fs.length <= 4 &&
      fs.map(_.frame_idx).sorted.sameElements(0 until fs.length)))
    assert(byId.keySet == vid.map(_.media_id).toSet)
  }

  test("avi round-trip: synthesized container parses back to its inputs") {
    import Multimodal.{Codec, MediaSynth}
    val fill = "framedata".getBytes
    val avi = MediaSynth.avi(5, 3, 2, fill)
    val (w, h, ch, _, ok) = Codec.decode(avi, 0, 0)
    assert(ok && w == 5 && h == 3 && ch == 3)
    val stride = ((3 * 5 + 3) / 4) * 4 // 16-aligned row: 16 bytes
    assert(avi.length == 224 + 2 * (8 + 3 * stride))
    // frame 1's first pixel byte is fill(1) (cycled from offset fi)
    assert(avi(224 + (8 + 3 * stride) + 8) == fill(1))
    // corrupt the avih fourCC -> quarantined
    val bad = avi.clone(); bad(24) = 'x'
    assert(!Codec.decode(bad, 0, 0)._5)
    // truncate mid-movi -> structurally unsound
    val short = java.util.Arrays.copyOfRange(avi, 0, avi.length - 4)
    assert(!Codec.decode(short, 0, 0)._5)
  }

  test("multimodal decode quarantines corrupted headers (valid=false, no throw)") {
    import Multimodal.{Codec, MediaSynth}
    val good = MediaSynth.bmp(4, 3, "pixels".getBytes)
    assert(Codec.decode(good, 0, 0) match {
      case (4, 3, 3, _, true) => true; case _ => false
    })
    // truncate mid-header: magic claims BMP but no parseable header
    val truncated = java.util.Arrays.copyOfRange(good, 0, 20)
    val (w1, h1, c1, _, ok1) = Codec.decode(truncated, 9, 9)
    assert(!ok1 && w1 == 0 && h1 == 0 && c1 == 0)
    // header intact but pixel area missing -> structurally unsound
    val short = java.util.Arrays.copyOfRange(good, 0, 60)
    assert(!Codec.decode(short, 9, 9)._5)
    // WAV with a lying data-chunk length
    val wav = MediaSynth.wav(2, 8000, "samples".getBytes)
    wav(40) = 0x7f.toByte; wav(41) = 0x7f.toByte // dataLen >> payload
    assert(!Codec.decode(wav, 9, 9)._5)
    // WAV whose length field decodes NEGATIVE (0xFFFFFFFF): must be
    // quarantined, not passed off as valid with a negative width
    val wavNeg = MediaSynth.wav(2, 8000, "samples".getBytes)
    wavNeg(40) = 0xff.toByte; wavNeg(41) = 0xff.toByte
    wavNeg(42) = 0xff.toByte; wavNeg(43) = 0xff.toByte
    val (wn, _, _, _, okN) = Codec.decode(wavNeg, 9, 9)
    assert(!okN && wn == 0)
    // BMP with a forged width near 2^30: the int stride product
    // overflows negative and must not defeat the truncation check
    val bmpBig = MediaSynth.bmp(4, 3, "pixels".getBytes)
    bmpBig(18) = 0xab.toByte; bmpBig(19) = 0xaa.toByte
    bmpBig(20) = 0xaa.toByte; bmpBig(21) = 0x2a.toByte // w = 0x2AAAAAAB
    assert(!Codec.decode(bmpBig, 9, 9)._5)
    // and through the full Spark path: corrupted rows flow as
    // valid=false rows, valid ones keep decoding
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", good, 4, 3),
      Multimodal.MediaRow(2L, "image", truncated, 4, 3)).toDS().toDF()
    val out = Multimodal.decode(spark, rows).orderBy("media_id").collect()
    assert(out.map(_.valid).toSeq == Seq(true, false))
  }

  test("embedding cosine dedup refuses a block beyond the pairwise ceiling") {
    // one degenerate block (all rows share blk=0) past maxBlockRows:
    // the guard must fail fast with the routing advice, BEFORE any
    // pairwise row is generated
    val emb = (0 until 20).map(i => (i.toLong, Array(1.0f, i.toFloat), 0))
      .toDF("vec_id", "embedding", "label")
    val e = intercept[IllegalArgumentException] {
      Dedup.embeddingCosine(emb, "vec_id", "embedding", "label",
        threshold = 0.9, maxBlockRows = 10L)
    }
    assert(e.getMessage.contains("pairwise") &&
      e.getMessage.contains("Ann.lshTopK"), e.getMessage)
    // and a well-blocked input still works under the same ceiling
    val ok = (0 until 20).map(i => (i.toLong, Array(1.0f, 0.0f), i % 4))
      .toDF("vec_id", "embedding", "label")
    assert(Dedup.embeddingCosine(ok, "vec_id", "embedding", "label",
      threshold = 0.9, maxBlockRows = 10L).count() > 0)
  }

  test("cluster canonical: transitive closure over pairs, singletons kept") {
    // pairs 0-1, 1-2 but NOT 0-2 at this threshold shape: clusters
    // must still merge {0,1,2} (similarity isn't transitive; CC is)
    val pairs = Seq((0L, 1L), (1L, 2L)).toDF("id_a", "id_b")
    val out = Dedup.clusterCanonical(spark, docs, "doc_id", pairs)
      .orderBy("doc_id").collect()
    assert(out.length == 6) // one row per input doc
    val canon = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(canon(0L) == 0L && canon(1L) == 0L && canon(2L) == 0L)
    assert(canon(3L) == 3L && canon(4L) == 4L && canon(5L) == 5L)
    val sizes = out.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sizes(1L) == 3L && sizes(5L) == 1L)
    // exactly one canonical per cluster; canonical = numeric min
    val canonRows = out.filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    assert(canonRows == Set(0L, 3L, 4L, 5L))
    // numeric (not lexicographic-string) min: ids 9 and 10 cluster to 9
    val p2 = Seq((9L, 10L)).toDF("id_a", "id_b")
    val d2 = Seq((9L, "x"), (10L, "y")).toDF("doc_id", "text")
    val c2 = Dedup.clusterCanonical(spark, d2, "doc_id", p2).collect()
    assert(c2.forall(_.getLong(1) == 9L))
  }

  test("decontamination flags shared shingles, never reports the benchmark itself") {
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon"), // shares 'beta gamma delta'
      (1L, "totally different words entirely here"),
      (2L, "beta gamma delta") // fully contained in bench doc
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "x beta gamma delta y")).toDF("doc_id", "text")
    val out = graft.ops.Decontaminate.report(corpus, "doc_id", "text", bench)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet == Set(0L, 2L))
    assert(out(2L) == ((1, 1L, 1.0))) // its single shingle is contaminated
    assert(out(0L)._1 == 3 && out(0L)._2 == 1L) // 1 of its 3 shingles
    // docs shorter than n produce no shingles -> never flagged
    val short = Seq((7L, "beta gamma")).toDF("doc_id", "text")
    assert(graft.ops.Decontaminate.report(short, "doc_id", "text", bench).isEmpty)
  }

  test("bloom prefilter: no false negatives, hits bounded below by exact") {
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon"),
      (1L, "totally different words entirely here"),
      (2L, "beta gamma delta")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "x beta gamma delta y")).toDF("doc_id", "text")
    val bloom = graft.ops.Decontaminate.bloomReport(
      corpus, "doc_id", "text", bench, n = 3, mBits = 16, k = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val exact = graft.ops.Decontaminate.report(corpus, "doc_id", "text", bench)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // every exactly-contaminated doc must bloom-hit (one-sided filter) ...
    exact.foreach { case (id, nShared) =>
      assert(bloom.contains(id), s"false negative on doc $id")
      assert(bloom(id)._1 >= nShared)
      assert(bloom(id)._2 == nShared) // reported exact count agrees
    }
    // ... and bloom hits never undershoot exact hits on any row
    bloom.values.foreach { case (b, e) => assert(b >= e) }
  }

  test("bloom prefilter: saturated filter admits false positives, never drops") {
    // k*mBits = 4 bits -> 16-position filter; a multi-doc bench saturates
    // it, so disjoint corpus shingles collide in (almost) every probe
    val corpus = Seq((0L, "one two three four five six seven"))
      .toDF("doc_id", "text")
    val bench = (100L to 130L).map(i =>
      (i, s"bench row $i unique content piece ${i * 31}")).toDF("doc_id", "text")
    val bloom = graft.ops.Decontaminate.bloomReport(
      corpus, "doc_id", "text", bench, n = 3, mBits = 2, k = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    // nothing is exactly shared ...
    assert(graft.ops.Decontaminate.report(corpus, "doc_id", "text", bench).isEmpty)
    // ... yet the saturated filter flags the doc with exact=0 (FPs observable)
    assert(bloom.get(0L).exists { case (b, e) => b >= 1 && e == 0 })
  }

  test("int8 quantization: known values, zero guard, error bound") {
    val d = Seq(
      (1L, Seq(1.0f, -0.5f, 0.0f, 0.25f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = graft.ops.Embeddings.quantizeInt8(d, "vec_id", "embedding")
      .as[(Long, Int, Int, Double)].collect()
      .map { case (id, dim, qv, s) => (id, dim) -> (qv, s) }.toMap
    // scale = 1/127; v/scale = v*127; HALF_UP floor(x+0.5):
    // -63.5 + 0.5 = -63 (rounds toward +inf — pinned, not half-even)
    assert(q((1L, 0))._1 == 127)
    assert(q((1L, 1))._1 == -63)
    assert(q((1L, 2))._1 == 0)
    assert(q((1L, 3))._1 == 32) // 31.75 -> 32
    assert(q((2L, 0)) == ((0, 0.0))) // zero vector: guarded division
    // reconstruction error bound on real fixture-ish data
    val vecs = (0 until 50).map(i =>
      (i.toLong, (0 until 16).map(j => ((i * 31 + j * 7) % 41 - 20) / 20.0f)))
      .toDF("vec_id", "embedding")
    val rows = graft.ops.Embeddings.quantizeInt8(vecs, "vec_id", "embedding")
      .as[(Long, Int, Int, Double)].collect()
    val src = vecs.as[(Long, Seq[Float])].collect().toMap
    rows.foreach { case (id, dim, qv, _) =>
      val v = src(id)(dim).toDouble
      val scale = src(id).map(x => math.abs(x.toDouble)).max / 127.0
      if (scale > 0)
        assert(math.abs(qv * scale - v) <= scale / 2 + 1e-12,
          s"id=$id d=$dim v=$v q=$qv")
    }
  }

  test("stratified sampling: deterministic, rate-respecting, stratum-scoped") {
    val n = 4000
    val d = (0 until n).map(i => (i.toLong, if (i % 2 == 0) "en" else "xx"))
      .toDF("doc_id", "lang")
    val s1 = graft.ops.Sampling.stratified(d, "doc_id", "lang",
      Map("en" -> 0.5), defaultRate = 0.1)
    val ids1 = s1.select("doc_id").as[Long].collect().toSet
    // identical on re-run and under different partitioning
    val ids2 = graft.ops.Sampling.stratified(d.repartition(7), "doc_id", "lang",
      Map("en" -> 0.5), defaultRate = 0.1)
      .select("doc_id").as[Long].collect().toSet
    assert(ids1 == ids2)
    val en = ids1.count(_ % 2 == 0).toDouble / (n / 2)
    val xx = ids1.count(_ % 2 == 1).toDouble / (n / 2)
    assert(math.abs(en - 0.5) < 0.05, s"en rate $en")
    assert(math.abs(xx - 0.1) < 0.05, s"xx rate $xx")
    // rate 0 and 1 are exact, not approximate
    val all = graft.ops.Sampling.stratified(d, "doc_id", "lang",
      Map("en" -> 1.0), defaultRate = 0.0).select("lang").as[String].collect()
    assert(all.length == n / 2 && all.forall(_ == "en"))
    intercept[IllegalArgumentException] {
      graft.ops.Sampling.stratified(d, "doc_id", "lang", Map("en" -> 1.5), 0.1)
    }
  }

  test("pii redaction removes emails, ips, long digit runs; counts match") {
    val d = Seq(
      (0L, "write to a.user+tag@sub.example.org or admin@ex.io from 192.168.0.1"),
      (1L, "card 4111111111111111 and 12 short 123456789012 not-16 12345678901234567"),
      (2L, "clean text with no pii at all")
    ).toDF("doc_id", "text")
    val out = d.select(col("doc_id") +: TextAnalysis.piiRedact(col("text")): _*)
      .orderBy("doc_id").collect()
    val r0 = out(0)
    assert(r0.getString(1) == "write to <EMAIL> or <EMAIL> from <IP>")
    assert(r0.getInt(2) == 2 && r0.getInt(3) == 1 && r0.getInt(4) == 0)
    val r1 = out(1)
    // the 12-digit run is below the 13-16 window and the 17-digit run
    // is above it (\b forbids a partial match inside the longer run) —
    // only the 16-digit card number is redacted
    assert(r1.getString(1).contains("<NUM>") &&
      r1.getString(1).contains("123456789012") &&
      r1.getString(1).contains("12345678901234567"))
    assert(r1.getInt(4) == 1)
    val r2 = out(2)
    assert(r2.getString(1) == "clean text with no pii at all" &&
      r2.getInt(2) == 0 && r2.getInt(3) == 0 && r2.getInt(4) == 0)
  }

  test("line-repetition signals: known fractions, empty text, null text") {
    val d = Seq(
      (0L, "aa\nbb\naa\ncc\naa"),  // 5 lines, 3 distinct; aa repeats 2 extra (4 of 10 chars)
      (1L, "x\ny\nz"),             // no repetition
      (2L, ""),                    // one empty line, zero chars
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetition(d, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getInt(1) == 5 &&
      out(0).getDouble(2) == 0.4 && out(0).getDouble(3) == 0.4)
    assert(out(1).getInt(1) == 3 &&
      out(1).getDouble(2) == 0.0 && out(1).getDouble(3) == 0.0)
    assert(out(2).getInt(1) == 1 &&
      out(2).getDouble(2) == 0.0 && out(2).getDouble(3) == 0.0)
    assert(out(3).isNullAt(1) && out(3).isNullAt(2) && out(3).isNullAt(3))
  }

  test("chunking: window arithmetic, overlap content, partial tail, short doc") {
    val d = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks, 2 windows
      (2L, (1 to 4).map(i => s"t$i").mkString(" ")),  // exactly one window
      (3L, "solo"),                                   // short doc
      (4L, (1 to 12).map(i => s"t$i").mkString(" "))  // boundary: 12 = 4 + 2*4
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunk(d, "doc_id", "text",
        chunkTokens = 4, stride = 4) // no overlap
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    assert(out.filter(_._1 == 1L).toSeq == Seq(
      (1L, 0, "t1 t2 t3 t4", 4), (1L, 1, "t5 t6 t7 t8", 4),
      (1L, 2, "t9 t10", 2))) // partial tail keeps every token once
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0, "t1 t2 t3 t4", 4)))
    assert(out.filter(_._1 == 3L).toSeq == Seq((3L, 0, "solo", 1)))
    assert(out.count(_._1 == 4L) == 3) // exact multiple: no empty 4th window

    val overlapped = TextAnalysis.chunk(d.filter(col("doc_id") === 1L),
        "doc_id", "text", chunkTokens = 4, stride = 2)
      .orderBy("chunk_idx").collect().map(_.getString(2))
    assert(overlapped.toSeq == Seq("t1 t2 t3 t4", "t3 t4 t5 t6",
      "t5 t6 t7 t8", "t7 t8 t9 t10")) // 2-token overlap, no partial needed
  }

  test("k-per-group sampling: exact counts, smallest buckets, short strata") {
    val d = (0L until 200L).map(i => (i, if (i % 4 == 0) "big" else "bigger"))
      .toDF("id", "s")
      .unionByName(Seq((1000L, "tiny"), (1001L, "tiny")).toDF("id", "s"))
    val out = Sampling.kPerGroup(d, "id", "s", k = 10, safety = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val byGroup = out.groupBy(_._1)
    assert(byGroup("big").length == 10 && byGroup("bigger").length == 10)
    assert(byGroup("tiny").length == 2) // n < k -> all rows, rk dense
    assert(byGroup("tiny").map(_._4).sorted.toSeq == Seq(1, 2))
    // selected = the k smallest buckets of the stratum (brute-force check)
    val bruteBig = d.filter(col("s") === "big")
      .withColumn("b", Sampling.bucket(col("id")))
      .orderBy(col("b"), col("id")).limit(10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(byGroup("big").map(_._2).toSet == bruteBig)
    // determinism: second run selects the identical ids
    val again = Sampling.kPerGroup(d, "id", "s", k = 10, safety = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(again == out.map(t => (t._1, t._2)).toSet)
  }

  test("split assignment: group-consistent, validated fractions, deterministic") {
    val d = (0L until 300L).map(i => (i, s"conv-${i % 60}"))
      .toDF("id", "conv")
    val out = Sampling.assignSplit(d, "conv",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    // every group lands in exactly one split (the leakage invariant)
    assert(out.groupBy("conv").agg(countDistinct(col("split")).as("k"))
      .filter(col("k") =!= 1).count() == 0)
    // all three splits present at 60 groups and total preserved
    val bySplit = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit.values.sum == 300L)
    assert(bySplit("train") > bySplit("val")) // 0.8 dominates at 60 groups
    // deterministic across repartitionings
    val again = Sampling.assignSplit(d.repartition(7), "conv",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("id", "split").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again == out.select("id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet)
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(d, "conv", Seq("a" -> 0.5, "b" -> 0.4))
    }
  }
}
