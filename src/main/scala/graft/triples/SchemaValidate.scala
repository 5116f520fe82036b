package graft.triples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triple-level schema validation — the SHACL-lite gate a KG loader
  * runs before merging extracted edges into the serving graph. The
  * reference gets this implicitly from curated inputs (caDSR/NCIT
  * structure can't emit an edge the schema forbids); a transcript
  * extraction pipeline CAN (a linker bug emits concept→concept
  * LINKED_TO, a resumed stage replays rows naming codes a dictionary
  * upgrade removed), so the merge boundary needs an explicit
  * signature check: every (label(subj), pred, label(obj)) must appear
  * in the allowed-signature table.
  *
  * Scale shape: the label map and the signature table are
  * dictionary-sized — both joins broadcast; validation is map-only
  * over the triple stream, zero corpus shuffle. The verdict column is
  * a CASE over null-flags — codegen-friendly, no UDF.
  */
object SchemaValidate {

  /** Classify each triple against the schema.
    *
    * @param triples    (subj, pred, obj)
    * @param labels     (code, label) — the vertex label map; a node
    *                   absent here is an unknown-node violation
    * @param signatures (subj_label, pred, obj_label) — allowed shapes
    * @return triples + (subj_label, obj_label, verdict) where verdict
    *         ∈ ok | unknown_subj | unknown_obj | bad_signature
    *         (unknown_subj wins when both endpoints are unknown)
    */
  def validate(triples: DataFrame, labels: DataFrame,
               signatures: DataFrame): DataFrame = {
    val subjL = labels.select(col("code").as("subj"), col("label").as("subj_label"))
    val objL = labels.select(col("code").as("obj"), col("label").as("obj_label"))
    val sig = signatures.select(col("subj_label"), col("pred"), col("obj_label"))
      .withColumn("sig_ok", lit(1))
    triples
      .join(broadcast(subjL), Seq("subj"), "left")
      .join(broadcast(objL), Seq("obj"), "left")
      .join(broadcast(sig), Seq("subj_label", "pred", "obj_label"), "left")
      .withColumn("verdict",
        when(col("subj_label").isNull, "unknown_subj")
          .when(col("obj_label").isNull, "unknown_obj")
          .when(col("sig_ok").isNull, "bad_signature")
          .otherwise("ok"))
      .select(col("subj"), col("pred"), col("obj"),
        col("subj_label"), col("obj_label"), col("verdict"))
  }

  /** The rows a merge must reject, with the violation kind. */
  def violations(triples: DataFrame, labels: DataFrame,
                 signatures: DataFrame): DataFrame =
    validate(triples, labels, signatures).filter(col("verdict") =!= "ok")
}
