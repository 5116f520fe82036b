package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-column storage ops. At 10^12-row scale the embedding
  * column IS the table (a 64-dim float32 vector is 256 bytes against
  * ~100 bytes of everything else), so lossy narrowing is the single
  * biggest storage/IO lever a training-data pipeline has.
  */
object Embeddings {

  /** Symmetric per-vector int8 quantization (the standard
    * max-abs/127 scheme): scale = max|v|/127, q_d = round(v_d/scale)
    * clamped to [−127, 127]. Pure per-row column math — no shuffle,
    * no UDF; map-side in whatever job reads the vectors.
    *
    * Determinism contract: max over the array is exact in IEEE
    * doubles regardless of fold order; the divide and the
    * floor(x+0.5) round (HALF_UP — pinned explicitly because
    * built-in round() is HALF_UP in Spark but half-even in DuckDB)
    * are elementwise, so the quantized values are engine-portable and
    * oracle-pinned. All-zero vectors get scale 0 and q = 0 (guarded
    * division).
    *
    * Output is EXPLODED to (id, d, q, scale6) rows rather than an
    * array column: scalar rows hash portably in the cross-engine
    * oracle compare, and the long format is what quantization-error
    * analyses aggregate anyway. Production writers re-`collect_list`
    * to an array<byte> column — a free map-side reshape.
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val absMax = aggregate(
      transform(col(vecCol), x => abs(x.cast("double"))),
      lit(0.0), (acc, x) => greatest(acc, x))
    df.select(col(idCol).as("id"), col(vecCol).as("vec"),
        (absMax / 127.0).as("scale"))
      .select(col("id"), col("scale"),
        posexplode(col("vec")).as(Seq("d", "v")))
      .select(col("id"), col("d"),
        when(col("scale") === 0.0, lit(0L)).otherwise(
          greatest(lit(-127L), least(lit(127L),
            floor(col("v").cast("double") / col("scale") + 0.5))))
          .cast("int").as("q"),
        (floor(col("scale") * 1e6 + 0.5) / 1e6).as("scale6"))
  }
}
