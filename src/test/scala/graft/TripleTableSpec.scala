package graft

import java.nio.file.Files

import graft.fixtures.Fixtures

class TripleTableSpec extends SparkTestBase {
  import spark.implicits._

  test("pred-partitioned triple table prunes partitions at read") {
    val dir = Files.createTempDirectory("graft-triples").toString + "/edges"
    val res = Pipeline.run(spark, Fixtures.transcripts(spark, 15, 6),
      Fixtures.dict(spark))
    graft.triples.Triples.write(res.triples, dir)
    // layout: one directory per predicate
    val preds = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("pred=")).sorted
    assert(preds.sameElements(Array("pred=HAS_CONCEPT", "pred=HAS_DEC",
      "pred=HAS_OC", "pred=HAS_PR", "pred=HAS_PV", "pred=HAS_SEMANTIC_TYPE",
      "pred=HAS_SYNONYM", "pred=HAS_VDM", "pred=LINKED_TO", "pred=MAPS_TO",
      "pred=SAME_AS")))
    // predicate filter becomes a partition filter (no data read from
    // other predicates)
    val q = spark.read.parquet(dir).filter($"pred" === "LINKED_TO")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(pred"), plan)
    assert(q.count() > 0)
  }

  test("graph materialization: label-partitioned vertices + pruned read-back") {
    val dict = Fixtures.dict(spark)
    val canonical = graft.canon.Canonicalizer.canonicalMap(spark, dict)
    val verts = graft.triples.Triples.vertices(spark, dict, canonical)
    val edges = graft.triples.Triples.mapsTo(spark, dict)
      .unionByName(graft.triples.Triples.sameAs(canonical))
      .as[graft.model.Triple]
    val dir = Files.createTempDirectory("graft-graph").toString
    graft.triples.Triples.writeGraph(verts, edges, dir)
    val labels = new java.io.File(s"$dir/vertices").listFiles().map(_.getName)
      .filter(_.startsWith("label=")).sorted
    assert(labels.sameElements(Array("label=CDE", "label=DEC", "label=NCIT",
      "label=OC", "label=PR", "label=PV", "label=SYN", "label=SemanticType",
      "label=VDM")))
    // label filter prunes partitions
    val v = spark.read.parquet(s"$dir/vertices").filter($"label" === "NCIT")
    val plan = v.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(label"), plan)
    assert(v.count() == Fixtures.ncitRows.size)
    // canonical applies the synonym-merge: C3117 ~ C105586 (shared
    // synonym "blood pressure elevation"), min code wins
    val canonOf = verts.filter($"code".isin("C3117", "C105586"))
      .select($"code", $"canonical").as[(String, String)].collect().toMap
    assert(canonOf("C3117") == "C105586" && canonOf("C105586") == "C105586")
    // codes outside the merge map (OC/VDM/DEC) are their own canonical
    val oc = verts.filter($"label" === "OC").select($"code", $"canonical")
      .as[(String, String)].collect()
    assert(oc.nonEmpty && oc.forall { case (c, k) => c == k })
  }

  test("reference J3 traversal runs from the materialized tables ALONE") {
    // A consumer replacing Neo4j with the materialized graph must be
    // able to run (cde)-[:HAS_VDM]->(vdm)-[:HAS_PV]->(pv)-[:HAS_CONCEPT]->
    // (ncit) (reference semantic_retrievers.py:62-76) with NO access to
    // the in-memory ConceptDict — base edges + vertices only.
    val dict = Fixtures.dict(spark)
    val canonical = graft.canon.Canonicalizer.canonicalMap(spark, dict)
    val verts = graft.triples.Triples.vertices(spark, dict, canonical)
    val edges = graft.triples.Triples.baseEdges(spark, dict)
      .unionByName(graft.triples.Triples.hasSynonym(spark, dict))
      .as[graft.model.Triple]
    val dir = Files.createTempDirectory("graft-graph-j3").toString
    graft.triples.Triples.writeGraph(verts, edges, dir)

    def edge(pred: String) = spark.read.parquet(s"$dir/edges")
      .filter($"pred" === pred)
    val hasVdm = edge("HAS_VDM").select($"subj".as("cde"), $"obj".as("vdm"))
    val hasPv = edge("HAS_PV").select($"subj".as("vdm"), $"obj".as("pv"))
    val hasConcept = edge("HAS_CONCEPT").select($"subj".as("pv"), $"obj".as("ncit"))
    val traversed = hasVdm.join(hasPv, "vdm").join(hasConcept, "pv")
      .select($"ncit", $"cde").distinct()
      .as[(String, String)].collect().toSet
    // must equal the MAPS_TO flatten computed from the dict itself
    val expected = graft.triples.Triples.mapsTo(spark, dict)
      .select($"subj", $"obj").as[(String, String)].collect().toSet
    assert(traversed == expected)
    assert(traversed.contains(("C18016", "CDE2001"))) // known chain
    // each pred filter prunes to exactly its partition
    val plan = edge("HAS_VDM").queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(pred") &&
      plan.contains("HAS_VDM"), plan)
    // the schema.png grounding paths run from tables alone too:
    // DEC-[:HAS_PR]->PR-[:HAS_CONCEPT]->NCIT (PR label enforced via
    // the vertex table) and OC-[:HAS_CONCEPT]->NCIT
    val prVerts = spark.read.parquet(s"$dir/vertices")
      .filter($"label" === "PR").select($"code".as("pr"))
    val decToNcit = edge("HAS_PR").select($"subj".as("dec"), $"obj".as("pr"))
      .join(prVerts, "pr")
      .join(edge("HAS_CONCEPT").select($"subj".as("pr"), $"obj".as("ncit")), "pr")
      .select($"dec", $"ncit").as[(String, String)].collect().toSet
    assert(decToNcit == Fixtures.decPr.map { case (d, _, _, n) => (d, n) }.toSet)
    val ocToNcit = edge("HAS_CONCEPT")
      .filter($"subj".startsWith("OC"))
      .select($"subj", $"obj").as[(String, String)].collect().toSet
    assert(ocToNcit == Fixtures.ocGround.toSet) // OC02 stays ungrounded
    // and the reference J1 synonym hop also runs from tables alone:
    // NCIT code -> SYN vertices via HAS_SYNONYM edge -> SYN vertex rows
    val synEdges = edge("HAS_SYNONYM").filter($"subj" === "C4878")
      .select($"obj".as("code"))
    val synVerts = spark.read.parquet(s"$dir/vertices")
      .filter($"label" === "SYN")
    val terms = synEdges.join(synVerts, "code").select($"term")
      .as[String].collect().toSet
    assert(terms == Set("carcinoma of the lung", "lung cancer", "pulmonary carcinoma"))
  }

  test("GraphTables client runs every reference traversal from disk alone") {
    val dict = Fixtures.dict(spark)
    val canonical = graft.canon.Canonicalizer.canonicalMap(spark, dict)
    val verts = graft.triples.Triples.vertices(spark, dict, canonical)
    val edges = graft.triples.Triples.baseEdges(spark, dict)
      .unionByName(graft.triples.Triples.hasSynonym(spark, dict))
      .unionByName(graft.triples.Triples.similarEdges(spark, dict, k = 2)
        .drop("score"))
      .as[graft.model.Triple]
    val dir = Files.createTempDirectory("graft-graph-client").toString
    graft.triples.Triples.writeGraph(verts, edges, dir)
    val g = graft.triples.GraphTables(spark, dir)
    // J1 synonym lookup
    assert(g.synonymsOf("C4878").select($"synonym").as[String].collect().toSet ==
      Set("carcinoma of the lung", "lung cancer", "pulmonary carcinoma"))
    // J3 flatten from base edges == the dict-derived MAPS_TO (the
    // OC/PR HAS_CONCEPT grounding rows must NOT leak in)
    val expected = graft.triples.Triples.mapsTo(spark, dict)
      .select($"subj", $"obj").as[(String, String)].collect().toSet
    assert(g.mapsTo.as[(String, String)].collect().toSet == expected)
    // CDE concept context equals the fixture chain
    assert(g.conceptContext.as[(String, String, String, String)]
      .collect().toSet == Fixtures.decOc.toSet)
    // SIMILAR fan-out at k=2
    assert(g.similarTo("C4878").count() == 2)
    // canonical map: merged pair agrees with the writer
    val canon = g.canonicalOf.as[(String, String)].collect().toMap
    assert(canon("C3117") == "C105586")
    // label/pred scans prune partitions
    val plan = g.vertices("NCIT").queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(label"), plan)
  }

  test("SIMILAR self-relation: top-k cosine neighbors, no self-loops") {
    val dict = Fixtures.dict(spark)
    val rows = graft.triples.Triples.similarEdges(spark, dict, k = 2)
      .select($"subj", $"obj", $"score").as[(String, String, Double)].collect()
    assert(rows.length == Fixtures.ncitRows.size * 2)
    assert(rows.forall { case (a, b, _) => a != b })
    // distributed heap scan == driver-side brute force for one subject
    val embed = Fixtures.ncitRows.map { case (c, t, _, _) =>
      c -> Fixtures.embed(t) }.toMap
    val expect = embed.keys.filter(_ != "C4878").toSeq
      .map(c => (c, graft.functions.VectorMath.cosine(embed("C4878"), embed(c))))
      .sortBy { case (c, s) => (-s, c) }.take(2).map(_._1)
    val got = rows.filter(_._1 == "C4878").sortBy(r => (-r._3, r._2))
      .map(_._2).toSeq
    assert(got == expect)
    // the too-big-to-broadcast variant (LSH-bucketed self-join) keeps
    // the same output contract and recovers a usable fraction of the
    // exact edges even on this isotropic worst-case fixture
    val exact = rows.map { case (a, b, _) => (a, b) }.toSet
    val ann = graft.triples.Triples
      .similarEdgesAnn(spark, dict, k = 2, nBits = 6, tables = 8)
      .select($"subj", $"obj", $"score").as[(String, String, Double)].collect()
    assert(ann.forall { case (a, b, _) => a != b })
    val recall = ann.map { case (a, b, _) => (a, b) }.toSet
      .intersect(exact).size.toDouble / exact.size
    info(f"LSH SIMILAR recall@2 vs exact: $recall%.3f")
    assert(recall >= 0.5, f"recall $recall%.3f")
  }

  test("entry() flagship returns non-empty triples (driver smoke contract)") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSeq == Seq("subj", "pred", "obj"))
  }
}
