package graft

import org.apache.spark.sql.functions._

import graft.fixtures.Fixtures

/** Physical-plan assertions — "is this the plan we'd want at 100 TB"
  * encoded as tests: broadcasts where expected, filters/projections
  * pushed into the parquet scan, partial aggregation, whole-stage
  * codegen on the hot path, no shuffle on bucketed co-located joins.
  */
class PlanSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("exact lookup pushes filter and prunes columns at the scan") {
    val p = plan("p1_exact_code_lookup")
    assert(p.contains("PushedFilters: [IsNotNull(p_partkey), EqualTo(p_partkey,42)]"), p)
    assert(p.contains("ReadSchema") &&
      p.contains("p_partkey") && !p.contains("p_retailprice"), p)
  }

  test("mention detect prunes the transcript scan to conv_id/turn_idx/text") {
    val dir = java.nio.file.Files.createTempDirectory("graft-plan-turns").toString
    Fixtures.transcripts(spark, 5, 4).write.mode("overwrite").parquet(dir)
    val turns = spark.read.parquet(dir).as[graft.model.Turn]
    val ac = Fixtures.dict(spark).broadcastAutomaton(spark)
    val p = graft.extract.MentionDetect.detect(turns, ac)
      .queryExecution.executedPlan.toString
    // the narrow projection must reach the file scan: role/tool/ts
    // never leave the parquet footer
    val read = "ReadSchema: [^\n]*".r.findFirstIn(p).getOrElse("")
    assert(read.contains("conv_id") && read.contains("text"), p)
    // "ts:" (not "ts,") also catches ts surviving as the LAST ReadSchema field
    assert(!read.contains("role") && !read.contains("tool") && !read.contains("ts:"), p)
  }

  test("small-dim joins broadcast; no sort-merge on dimension tables") {
    val p = plan("j2_join_2hop")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("group agg is partial + final (map-side combine) with codegen") {
    val df = SparkEntry.queries("a1_group_agg")(spark, sf)
    df.collect() // finalize the AQE plan
    val p = df.queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    // whole-stage codegen spans print as "*(n) " in plan trees
    assert("\\*\\(\\d+\\) HashAggregate".r.findFirstIn(p).isDefined, p)
  }

  test("ladder stages join via broadcast; transcript side never sort-merges") {
    val dict = Fixtures.dict(spark)
    val turns = Fixtures.transcripts(spark, 20, 4)
    val ac = dict.broadcastAutomaton(spark)
    val mentions = graft.extract.MentionDetect.detect(turns, ac)
    val links = graft.link.MatchLadder.link(spark, mentions, dict)
    val p = links.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), "dictionary joins must broadcast")
    assert(!p.contains("SortMergeJoin"),
      "no sort-merge join anywhere in the ladder:\n" + p.take(4000))
    assert(!p.contains("CartesianProduct"), "no cartesian products")
  }

  test("top-k limit 1 compiles to TakeOrderedAndProject (no full sort)") {
    val p = plan("w4_limit1")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("ivf centroid seeding is a distributed TakeOrdered, never a corpus collect") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    // the seeding subplan shows up in the first job's plan: materialize
    // via the public API and assert the overall query has no cartesian
    // product and no sort-merge join (bucket join is broadcast/hash)
    val df = graft.ops.Ann.ivfTopK(spark, e, k = 3)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    // and the operator source contains no corpus-wide collect: guarded
    // by construction (seeding uses orderBy(hash).limit(n)) — assert
    // the plan's only exchanges are the bucket join + top-k window
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("prefix-filtered ngram jaccard: hash joins + partial agg, no cartesian") {
    val df = SparkEntry.queries("dedup_ngram_jaccard")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert("HashAggregate".r.findAllIn(p).size >= 2, "map-side combine expected\n" + p.take(3000))
  }

  test("typed term search joins the dictionary broadcast-side only") {
    val prepared = graft.dict.PreparedDict.prepare(spark, Fixtures.dict(spark))
    val q = Seq(("q1", "tumor stage")).toDF("query_id", "text")
    val df = graft.link.MatchLadder.termSearch(spark, q, prepared, k = 3,
      typeFilter = Some("CDE"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("bucketed co-located join needs no shuffle exchange") {
    // default warehouse dir (spark-warehouse/, gitignored) — the
    // warehouse conf is static and cannot change post-session
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_b")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_b")
    val joined = spark.table("li_b").join(spark.table("o_b"),
      $"l_orderkey" === $"o_orderkey")
    // disable broadcast so the co-location is what saves the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"),
        "bucketed join must not shuffle:\n" + p.take(3000))
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }

  test("lsh-then-verify: bucket joins + partial agg, no cartesian anywhere") {
    val df = SparkEntry.queries("dedup_lsh_verified")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "map-side combine expected\n" + p.take(3000))
  }

  test("SIMILAR edge derivation is a broadcast scan: no join operator at all") {
    val df = graft.triples.Triples.similarEdges(spark, Fixtures.dict(spark), k = 2)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the all-pairs cosine must stay inside the per-row heap scan of
    // the broadcast matrix — a nested-loop/cartesian plan here would
    // materialize |NCIT|^2 rows at production dictionary scale
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin") && !p.contains("SortMergeJoin"), p.take(3000))
  }

  test("packing projection stays in whole-stage codegen (no scalar UDF)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "n_chars")
    val df = graft.ops.Packing.packByOffset(spark, docs, "doc_id", "n_chars", 2048L)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the old partition->offset lookup was a Scala UDF, which shows up
    // as a non-codegen Project outside any WholeStageCodegen span
    assert(!p.contains("UDF"), "no scalar UDF in the packing plan:\n" + p.take(3000))
    val projLines = p.linesIterator.filter(l =>
      l.contains("Project") && l.contains("start_offset")).toSeq
    assert(projLines.nonEmpty, p.take(3000))
    // codegen'd operators are printed with a '*(n)' stage prefix; the
    // plan string repeats the tree once more for AQE's initial plan
    // (unprefixed), so assert on the executed copy via exists
    assert(projLines.exists(_.contains("*(")),
      "packing projection must be inside WholeStageCodegen:\n" + projLines.mkString("\n"))
  }

  test("salted aggregation equals direct groupBy (skew path correctness)") {
    val t = Seq.tabulate(500)(i => (s"conv-${i % 7}", i, s"text $i" * (i % 5 + 1)))
      .toDF("conv_id", "turn_idx", "text")
    val direct = t.groupBy($"conv_id")
      .agg(count(lit(1)).as("n_turns"), sum(length($"text")).as("total_chars"))
      .orderBy($"conv_id").collect()
    val salted = graft.ops.Skew.saltedAgg(t, "conv_id", 8,
      Seq("conv_id", "turn_idx"),
      Seq(count(lit(1)).as("pc"), sum(length($"text")).as("ps")),
      Seq(sum($"pc").as("n_turns"), sum($"ps").as("total_chars")))
      .orderBy($"conv_id").collect()
    assert(direct.sameElements(salted))
  }

  test("unordered dedup/decontam operators plan no global sort, no range exchange") {
    // the operators return unordered pair/report SETS (ordering lives
    // in the oracle-compared catalog wrappers); the production path
    // must therefore be free of the range-partition exchange + global
    // Sort a total orderBy would cost at 100 TB pair volume
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cases = Seq(
      "minHashLsh" -> graft.ops.Dedup.minHashLsh(docs, "doc_id", "text", threshold = 0.5),
      "simHash" -> graft.ops.Dedup.simHash(docs, "doc_id", "text"),
      "ngramJaccard" -> graft.ops.Dedup.ngramJaccard(docs, "doc_id", "text", threshold = 0.8),
      "embeddingCosine" -> graft.ops.Dedup.embeddingCosine(emb, "vec_id", "embedding", "label"),
      "decontamReport" -> graft.ops.Decontaminate.report(
        docs.filter($"doc_id" % 37 =!= 0), "doc_id", "text",
        bench = docs.filter($"doc_id" % 37 === 0)))
    for ((name, df) <- cases) {
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("rangepartitioning"),
        s"$name must not range-partition for a global sort:\n" + p.take(3000))
      // window-local sorts print global=false ("], false, 0"); a
      // global Sort would print "], true, 0"
      assert(!p.contains("], true, 0"),
        s"$name must not plan a global Sort:\n" + p.take(3000))
    }
  }

  test("AQE splits the skewed partition of a hot-key sort-merge join") {
    // deliberately hot key (90% of the big side) with the thresholds
    // lowered to fixture scale so AQE's skew-join handling — the
    // second line of defense after explicit salting (SURVEY §4.2) —
    // actually fires: the final adaptive plan must carry the skew
    // marker, and the result must equal the explicitly salted join.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> scala.util.Try(conf.get(k)).toOption).toMap
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    try {
      val big = spark.range(0, 50000).select(
        when($"id" % 10 =!= 0, "hot").otherwise(concat(lit("k"), $"id" % 50))
          .as("norm"),
        concat(lit("payload-"), $"id").as("payload"))
      val dim = (Seq("hot") ++ (0 until 50).map(i => s"k$i"))
        .toDF("norm").withColumn("code", concat(lit("C"), $"norm"))
      // max(length(payload)) keeps the payload column flowing through
      // the exchange so the hot partition actually crosses the lowered
      // byte threshold; the aggregation keys on `code` (not the join
      // key) — an agg re-using the join key's partitioning would make
      // the skew split cost an extra exchange, which AQE declines
      // unless forced (the production shape: the candidate join's
      // consumer is keyed differently)
      val joined = big.join(dim, "norm")
        .groupBy($"code").agg(count(lit(1)).as("n"),
          max(length($"payload")).as("plen"))
      val rows = joined.collect().sortBy(_.getString(0))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), p.take(500))
      assert(p.contains("skew=true"),
        "AQE skew-join split must fire on the hot key:\n" + p.take(4000))
      // row-equality against the explicit salted two-phase aggregation
      // over the same join, computed with skew handling out of the
      // picture (broadcast dim: no skewed shuffle to begin with)
      conf.set("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      val salted = graft.ops.Skew.saltedAgg(
        big.join(broadcast(dim), "norm"), "code", 8,
        Seq("norm", "payload"),
        Seq(count(lit(1)).as("pc"), max(length($"payload")).as("pl")),
        Seq(sum($"pc").as("n"), max($"pl").as("plen")))
        .collect().sortBy(_.getString(0))
      assert(rows.sameElements(salted),
        "skew-split join result must equal the salted-aggregation twin")
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
    }
  }

  test("kPerGroup is a lazy transform: the guard rides the plan, no eager job") {
    val d = (0L until 5000L).map(i => (i, s"s${i % 3}")).toDF("id", "s")
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val out = graft.ops.Sampling.kPerGroup(d, "id", "s", k = 7)
    Thread.sleep(500) // let any (wrongly) launched job register
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before,
      s"kPerGroup must not run jobs at call time (was $before, now $after)")
    // the undershoot guard is part of the returned plan itself
    val analyzed = out.queryExecution.analyzed.toString
    assert(analyzed.contains("assert_true"),
      "undershoot guard must ride the returned plan:\n" + analyzed.take(2000))
    // and the single execution still produces the exact contract
    assert(out.groupBy("s").count().collect().forall(_.getLong(1) == 7L))
  }

  test("chunking is map-only: no exchange, inside whole-stage codegen") {
    val p = graft.ops.TextAnalysis.chunk(
        spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text"),
        "doc_id", "text", chunkTokens = 32, stride = 24)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)      // zero shuffles
    assert(p.contains("*(1)"), p)           // one whole-stage codegen span
    assert(!p.contains("*(2)"), p)          // ...and only one
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), p)
    // projection pruned to the two used columns at the scan
    val read = "ReadSchema: [^\n]*".r.findFirstIn(p).getOrElse("")
    assert(read.contains("doc_id") && read.contains("text") &&
      !read.contains("source"), p)
  }
}
