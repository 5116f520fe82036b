package graft.triples

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.dict.ConceptDict
import graft.model.{Link, Triple}

/** Triple emission + graph materialization — the partitioned
  * vertex/edge tables that replace Neo4j serving (north star).
  *
  * Predicates:
  *  - (mention_key, LINKED_TO, canonical_code): one per match-ladder
  *    winner; mention_key = conv_id#turn_idx#begin (stable, derived,
  *    no monotonically_increasing_id — ids must survive recompute
  *    for resumability).
  *  - (ncit_code, MAPS_TO, cde_code): the CDE<-VDM<-PV<-NCIT chain
  *    (reference semantic_retrievers.py:62-76, J3) flattened once,
  *    set-based.
  *  - (ncit_code, HAS_SYNONYM, syn_term): materialized dictionary
  *    edges (reference synonym_tool.py:63-66, J1).
  *  - (code, SAME_AS, canonical): canonicalization merges.
  */
object Triples {

  def mentionKey(convId: org.apache.spark.sql.Column,
                 turnIdx: org.apache.spark.sql.Column,
                 begin: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat_ws("#", convId, turnIdx, begin)

  def linkedTo(links: Dataset[Link], canonical: DataFrame): DataFrame = {
    links.toDF()
      .join(broadcast(canonical), Seq("code"), "left")
      .select(
        mentionKey(col("conv_id"), col("turn_idx"), col("begin")).as("subj"),
        lit("LINKED_TO").as("pred"),
        coalesce(col("canonical"), col("code")).as("obj"))
  }

  def mapsTo(spark: SparkSession, dict: ConceptDict): DataFrame = {
    import spark.implicits._
    dict.hasVdm.toDF("cde_code", "vdm_code")
      .join(dict.hasPv.toDF("vdm_code", "pv_code"), "vdm_code")
      .join(dict.hasConcept.toDF("pv_code", "ncit_code"), "pv_code")
      .select($"ncit_code".as("subj"), lit("MAPS_TO").as("pred"),
        $"cde_code".as("obj"))
      .distinct()
  }

  def hasSynonym(spark: SparkSession, dict: ConceptDict): DataFrame = {
    import spark.implicits._
    dict.synonyms.select($"code".as("subj"),
      lit("HAS_SYNONYM").as("pred"), $"term".as("obj")).distinct()
  }

  def sameAs(canonical: DataFrame): DataFrame =
    canonical.filter(col("code") =!= col("canonical"))
      .select(col("code").as("subj"), lit("SAME_AS").as("pred"),
        col("canonical").as("obj"))

  /** The BASE dictionary edges exactly as the reference's serving
    * graph exposes them (reference semantic_retrievers.py:108-109 and
    * :224; labels at README.md:116-124; full relationship set incl.
    * HAS_PR in reference schema.png): HAS_CONCEPT ({PV,OC,PR}->NCIT),
    * HAS_VDM (CDE->VDM), HAS_PV (VDM->PV), HAS_DEC (CDE->DEC),
    * HAS_OC (DEC->OC), HAS_PR (DEC->PR), HAS_SEMANTIC_TYPE
    * (NCIT->SemanticType, reference synonym_tool.py:90-96). MAPS_TO
    * is the flatten DERIVED from these; the base edges ship alongside
    * it so a consumer of the materialized tables can run every
    * reference traversal (J3/J4/J5) without the in-memory
    * ConceptDict. */
  def baseEdges(spark: SparkSession, dict: ConceptDict): DataFrame = {
    import spark.implicits._
    def e(ds: Dataset[graft.model.DictEdge], pred: String): DataFrame =
      ds.select($"src".as("subj"), lit(pred).as("pred"), $"dst".as("obj"))
    e(dict.hasConcept, "HAS_CONCEPT")
      .unionByName(e(dict.hasVdm, "HAS_VDM"))
      .unionByName(e(dict.hasPv, "HAS_PV"))
      .unionByName(e(dict.hasDec, "HAS_DEC"))
      .unionByName(e(dict.hasOc, "HAS_OC"))
      .unionByName(e(dict.hasPr, "HAS_PR"))
      .unionByName(e(dict.hasSt, "HAS_SEMANTIC_TYPE"))
      .distinct()
  }

  /** NCIT-[:SIMILAR]->NCIT edges (the self-relation in reference
    * schema.png): for each concept, its top-`k` most-similar OTHER
    * concepts by term-embedding cosine, ties broken by code
    * (score DESC, code ASC — the engine's pinned tie order).
    *
    * Spark shape: delegates to [[graft.ops.Ann.bruteForceTopK]] — the
    * NCIT matrix broadcasts (dictionary contract, ~10^5 x 64 floats)
    * and each row heap-scans it (O(C log k)); no cross join, no
    * shuffle. Exact; bit-identical to the SQL oracle. */
  def similarEdges(spark: SparkSession, dict: ConceptDict, k: Int = 2): DataFrame = {
    import spark.implicits._
    val vecs = dict.ncit.select($"code".as("id"), $"embedding".as("vec"))
    graft.ops.Ann.bruteForceTopK(spark, vecs, vecs, k, excludeSelf = true)
      .select($"query_id".as("subj"), lit("SIMILAR").as("pred"),
        $"id".as("obj"), $"cos".as("score"))
  }

  /** [[similarEdges]] for dictionaries too large to broadcast:
    * LSH-bucketed self-join via [[graft.ops.Ann.lshTopK]] (bucket-keyed
    * shuffle, candidate pairs only — never all-pairs). APPROXIMATE:
    * only same-bucket neighbors are scored, so recall < 1; raise
    * `tables` / lower `nBits` to trade compute for recall
    * (recall floor pinned on the fixture in TripleTableSpec). */
  def similarEdgesAnn(spark: SparkSession, dict: ConceptDict, k: Int = 2,
                      nBits: Int = 12, tables: Int = 4): DataFrame = {
    import spark.implicits._
    val vecs = dict.ncit.select($"code".as("id"), $"embedding".as("vec"))
    graft.ops.Ann.lshTopK(spark, vecs, k, nBits, tables)
      .select($"query_id".as("subj"), lit("SIMILAR").as("pred"),
        $"id".as("obj"), $"cos".as("score"))
  }

  def all(spark: SparkSession, links: Dataset[Link], dict: ConceptDict,
          canonical: DataFrame): Dataset[Triple] = {
    import spark.implicits._
    linkedTo(links, canonical)
      .unionByName(mapsTo(spark, dict))
      .unionByName(hasSynonym(spark, dict))
      .unionByName(sameAs(canonical))
      .unionByName(baseEdges(spark, dict))
      .as[Triple]
  }

  /** Per-batch form: dictionary-derived triples come precomputed from
    * [[graft.dict.PreparedDict]] so a transcript batch pays only the
    * corpus-proportional LINKED_TO derivation. */
  def all(spark: SparkSession, links: Dataset[Link],
          prepared: graft.dict.PreparedDict): Dataset[Triple] = {
    import spark.implicits._
    linkedTo(links, prepared.canonical)
      .unionByName(prepared.dictTriples)
      .as[Triple]
  }

  /** Materialize as a pred-partitioned edge table (partition pruning
    * by predicate at read time; on a real cluster this is the Iceberg
    * edge table, SURVEY.md §1.3 format note). */
  def write(triples: Dataset[Triple], dir: String): Unit =
    triples.write.mode("overwrite").partitionBy("pred").parquet(dir)

  /** Unified vertex table — one row per graph node across every label
    * (the Neo4j node store flattened into a single partitioned table,
    * reference README.md:116-124 labels NCIT/PV/SYN/CDE/VDM/DEC/OC,
    * plus PR from reference schema.png).
    * SYN vertices are keyed by the synonym TERM (one vertex per
    * distinct surface; HAS_SYNONYM edges' obj is the term, so edge
    * endpoints join this table directly).
    * `canonical` applies the synonym-merge map (identity for codes
    * outside the map — VDM/DEC/OC/PR/SYN never participate in surface
    * sharing). Dictionary-sized, so the canonical join broadcasts. */
  def vertices(spark: SparkSession, dict: ConceptDict,
               canonical: DataFrame): DataFrame = {
    import spark.implicits._
    def cpt(ds: Dataset[graft.model.Concept], label: String): DataFrame =
      ds.select($"code", lit(label).as("label"), $"term", $"definition")
    val plain = dict.vdm.select($"code", lit("VDM").as("label"), $"term",
        lit(null).cast("string").as("definition"))
      .unionByName(dict.dec.select($"code", lit("DEC").as("label"), $"term",
        lit(null).cast("string").as("definition")))
      .unionByName(dict.pr.select($"code", lit("PR").as("label"), $"term",
        lit(null).cast("string").as("definition")))
      .unionByName(dict.st.select($"code", lit("SemanticType").as("label"),
        $"term", lit(null).cast("string").as("definition")))
    val syn = dict.synonyms
      .select($"term".as("code"), lit("SYN").as("label"), $"term",
        lit(null).cast("string").as("definition"))
      .distinct()
    cpt(dict.ncit, "NCIT").unionByName(cpt(dict.pv, "PV"))
      .unionByName(cpt(dict.cde, "CDE")).unionByName(cpt(dict.oc, "OC"))
      .unionByName(plain).unionByName(syn)
      .join(broadcast(canonical), Seq("code"), "left")
      .select($"code", $"label", $"term", $"definition",
        coalesce($"canonical", $"code").as("canonical"))
  }

  /** The full graph-materialization sink (north star: partitioned
    * vertex/edge tables replacing Neo4j serving): vertices partitioned
    * by label, edges by pred — reads filtered on label/pred prune to
    * exactly the partitions named (asserted in PlanSpec). Layout is
    * format-agnostic: Iceberg in production, parquet here. */
  def writeGraph(vertices: DataFrame, edges: Dataset[Triple], dir: String): Unit = {
    vertices.write.mode("overwrite").partitionBy("label").parquet(s"$dir/vertices")
    write(edges, s"$dir/edges")
  }
}
