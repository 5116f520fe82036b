package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training pipelines: image/audio/
  * video as opaque `binary` columns + typed metadata, processed in
  * BATCHES per partition (the Scala analog of mapInPandas: one
  * decoder instantiation per partition, vectorized iteration, stable
  * output schema).
  *
  * The actual byte decoding is STUBBED (this container ships no
  * image/audio codecs): [[FakeCodec]] derives deterministic
  * pseudo-features from the bytes. Everything Spark-side — schema,
  * batch shape, partitioning, null handling — is real and tested;
  * swapping in a real codec changes only FakeCodec's body.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                            declared_w: Int, declared_h: Int)
  final case class DecodedRow(media_id: Long, kind: String, n_bytes: Int,
                              width: Int, height: Int, channels: Int,
                              checksum: Long)
  final case class FrameRow(media_id: Long, frame_idx: Int, offset_ms: Int,
                            frame_checksum: Long)

  /** STUB decoder — deterministic fake features in place of a real
    * image/audio library. Real implementation would go exactly here,
    * one instance per partition (see [[decode]]). */
  object FakeCodec {
    def decode(payload: Array[Byte], declaredW: Int, declaredH: Int): (Int, Int, Int, Long) = {
      var cs = 1469598103934665603L
      var i = 0
      while (i < payload.length) { cs = (cs ^ (payload(i) & 0xff)) * 1099511628211L; i += 1 }
      // a real codec would parse the header; the stub trusts declared dims
      (declaredW, declaredH, 3, cs)
    }
  }

  /** Synthesize a media table from any text DataFrame (deterministic
    * fake payloads; the binary column IS real binary — this is the
    * schema/partitioning path a 100 TB image corpus would use,
    * partitioned so one partition's payloads fit executor memory). */
  def mediaFromText(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      (when(col(idCol) % 3 === 0, "image")
        .when(col(idCol) % 3 === 1, "audio").otherwise("video")).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"),
      // engine-portable hash64 (not xxhash64) so the synthetic dims
      // are recomputable by the DuckDB oracle
      (pmod(graft.Functions.hash64_str(col(textCol)), lit(1920)) + 1)
        .cast("int").as("declared_w"),
      (pmod(graft.Functions.hash64_str(concat(col(textCol), lit("|h"))), lit(1080)) + 1)
        .cast("int").as("declared_h"))

  /** Batched per-partition decode — the mapInPandas-shaped hot path:
    * codec state initialized once per partition, rows streamed. */
  def decode(spark: SparkSession, media: DataFrame): Dataset[DecodedRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition decoder init would happen here (real codec)
      rows.map { r =>
        val (w, h, ch, cs) = FakeCodec.decode(r.payload, r.declared_w, r.declared_h)
        DecodedRow(r.media_id, r.kind, r.payload.length, w, h, ch, cs)
      }
    }
  }

  /** Deterministic frame sampling for video rows: every `everyMs`
    * millisecond up to a duration derived from payload size (stub),
    * exploded to one row per sampled frame. */
  def frameSample(spark: SparkSession, media: DataFrame, everyMs: Int = 1000,
                  maxFrames: Int = 8): Dataset[FrameRow] = {
    import spark.implicits._
    media.as[MediaRow].filter(_.kind == "video").mapPartitions { rows =>
      rows.flatMap { r =>
        val durationMs = math.min(maxFrames * everyMs, r.payload.length * 10)
        (0 until durationMs by everyMs).iterator.zipWithIndex.map { case (off, idx) =>
          val sliceEnd = math.min(r.payload.length, (off / 10) + 32)
          val slice = java.util.Arrays.copyOfRange(r.payload, math.min(off / 10, sliceEnd), sliceEnd)
          var cs = 1469598103934665603L
          slice.foreach(bb => { cs = (cs ^ (bb & 0xff)) * 1099511628211L })
          FrameRow(r.media_id, idx, off, cs)
        }
      }
    }
  }
}
