package graft.dict

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{Concept, DictEdge, Synonym}
import graft.functions.Hashing

/** The concept dictionary — Spark-side stand-in for the reference's
  * Neo4j graph (labels NCIT/PV/SYN/CDE/VDM/DEC/OC per reference
  * README.md:116-124, plus PR from reference schema.png). One typed
  * Dataset per vertex label plus (src,dst) edge tables per
  * relationship (SURVEY.md §1.3).
  *
  * The dictionary is small relative to the transcript corpus
  * (~10^5 concepts vs 10^12 turns), so every use is broadcast-side:
  * surfaces into an Aho–Corasick automaton, vectors into a broadcast
  * KNN matrix, code->term maps into broadcast hash joins.
  */
final case class ConceptDict(
    ncit: Dataset[Concept],
    pv: Dataset[Concept],
    cde: Dataset[Concept],
    vdm: DataFrame,            // (code, term)
    dec: DataFrame,            // (code, term)
    oc: Dataset[Concept],      // needs embeddings for OC-context rerank
    synonyms: Dataset[Synonym],        // HAS_SYNONYM: ncit code -> surface
    hasConcept: Dataset[DictEdge],     // {pv|oc|pr} code -> ncit code (schema.png)
    hasVdm: Dataset[DictEdge],         // cde -> vdm
    hasPv: Dataset[DictEdge],          // vdm -> pv
    hasDec: Dataset[DictEdge],         // cde -> dec
    hasOc: Dataset[DictEdge],          // dec -> oc
    pr: DataFrame,                     // (code, term) — DEC Property label
    hasPr: Dataset[DictEdge],          // dec -> pr
    st: DataFrame,                     // (code, term) — SemanticType label
                                       // (reference synonym_tool.py:90-96)
    hasSt: Dataset[DictEdge]) {        // ncit -> st (HAS_SEMANTIC_TYPE)

  /** (norm surface, code, kind) for every linkable surface: NCIT
    * preferred terms + synonyms + PV terms. Used for the exact/synonym
    * ladder stages and the AC automaton. */
  def surfaces(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val t = ncit.select(graft.Functions.norm_text($"term").as("norm"),
      $"code", lit("term").as("kind"))
    val s = synonyms.select(graft.Functions.norm_text($"term").as("norm"),
      $"code", lit("synonym").as("kind"))
    val p = pv.select(graft.Functions.norm_text($"term").as("norm"),
      $"code", lit("pv").as("kind"))
    t.unionByName(s).unionByName(p).distinct()
  }

  /** Broadcast AC automaton over all normalized surfaces. Collecting
    * here is intentional: the dictionary is the SMALL side by design
    * (reference corpus: >100k NCIT concepts — comfortably
    * driver-sized); transcripts never pass through the driver. */
  def broadcastAutomaton(spark: SparkSession): Broadcast[AhoCorasick] = {
    import spark.implicits._
    val surf = surfaces(spark).select($"norm").as[String]
      .collect().distinct
    spark.sparkContext.broadcast(AhoCorasick.build(surf))
  }
}

object ConceptDict {

  /** Load from a directory of parquet tables (the production path;
    * `format` would be "iceberg" on a real cluster — same schemas,
    * SURVEY.md §1.3 note on the missing Iceberg jar in-sandbox). */
  def load(spark: SparkSession, dir: String, format: String = "parquet"): ConceptDict = {
    import spark.implicits._
    def t(name: String): DataFrame = spark.read.format(format).load(s"$dir/$name")
    ConceptDict(
      ncit = t("ncit").as[Concept],
      pv = t("pv").as[Concept],
      cde = t("cde").as[Concept],
      vdm = t("vdm"),
      dec = t("dec"),
      oc = t("oc").as[Concept],
      synonyms = t("synonyms").as[Synonym],
      hasConcept = t("has_concept").as[DictEdge],
      hasVdm = t("has_vdm").as[DictEdge],
      hasPv = t("has_pv").as[DictEdge],
      hasDec = t("has_dec").as[DictEdge],
      hasOc = t("has_oc").as[DictEdge],
      pr = t("pr"),
      hasPr = t("has_pr").as[DictEdge],
      st = t("st"),
      hasSt = t("has_st").as[DictEdge])
  }

  /** Persist all tables (partitioned layout mirrors the production
    * Iceberg DDL: small dimension tables, unpartitioned). */
  def save(d: ConceptDict, dir: String): Unit = {
    d.ncit.write.mode("overwrite").parquet(s"$dir/ncit")
    d.pv.write.mode("overwrite").parquet(s"$dir/pv")
    d.cde.write.mode("overwrite").parquet(s"$dir/cde")
    d.vdm.write.mode("overwrite").parquet(s"$dir/vdm")
    d.dec.write.mode("overwrite").parquet(s"$dir/dec")
    d.oc.write.mode("overwrite").parquet(s"$dir/oc")
    d.synonyms.write.mode("overwrite").parquet(s"$dir/synonyms")
    d.hasConcept.write.mode("overwrite").parquet(s"$dir/has_concept")
    d.hasVdm.write.mode("overwrite").parquet(s"$dir/has_vdm")
    d.hasPv.write.mode("overwrite").parquet(s"$dir/has_pv")
    d.hasDec.write.mode("overwrite").parquet(s"$dir/has_dec")
    d.hasOc.write.mode("overwrite").parquet(s"$dir/has_oc")
    d.pr.write.mode("overwrite").parquet(s"$dir/pr")
    d.hasPr.write.mode("overwrite").parquet(s"$dir/has_pr")
    d.st.write.mode("overwrite").parquet(s"$dir/st")
    d.hasSt.write.mode("overwrite").parquet(s"$dir/has_st")
  }
}
