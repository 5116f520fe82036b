package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal-column plumbing for training pipelines: image/audio/
  * video as opaque `binary` columns + typed metadata, processed in
  * BATCHES per partition (the Scala analog of mapInPandas: one
  * decoder instantiation per partition, vectorized iteration, stable
  * output schema).
  *
  * All three modalities are REAL formats: [[MediaSynth]] writes valid
  * BMP (24bpp, BITMAPINFOHEADER), WAV (PCM, canonical 44-byte header)
  * and AVI (RIFF, LIST hdrl/avih + vids/DIB stream + LIST movi of
  * '00db' frames) byte payloads, and [[Codec.decode]] PARSES those
  * headers — dims/channels/frame counts come from the bytes, never
  * from the declared columns; corrupted headers take the error path
  * (valid = false) instead of killing the job, and [[frameSample]]
  * walks the actual movi chunk list. Unknown containers fall back to
  * declared metadata (the quarantine-tolerant path a mixed 100 TB
  * corpus needs).
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                            declared_w: Int, declared_h: Int)
  /** `valid` = header parsed and structurally sound; invalid rows
    * carry zero dims so downstream filters can quarantine them. */
  final case class DecodedRow(media_id: Long, kind: String, n_bytes: Int,
                              width: Int, height: Int, channels: Int,
                              checksum: Long, valid: Boolean)
  final case class FrameRow(media_id: Long, frame_idx: Int, offset_ms: Int,
                            frame_checksum: Long)

  /** Deterministic byte-level writers for real media formats — the
    * synthesis side of the multimodal fixtures. Layouts are fixed so
    * the DuckDB oracle can rebuild the exact byte stream
    * (tools/gen_sketch_oracles.py). */
  object MediaSynth {
    private def le32(buf: Array[Byte], off: Int, v: Int): Unit = {
      buf(off) = (v & 0xff).toByte
      buf(off + 1) = ((v >>> 8) & 0xff).toByte
      buf(off + 2) = ((v >>> 16) & 0xff).toByte
      buf(off + 3) = ((v >>> 24) & 0xff).toByte
    }
    private def le16(buf: Array[Byte], off: Int, v: Int): Unit = {
      buf(off) = (v & 0xff).toByte
      buf(off + 1) = ((v >>> 8) & 0xff).toByte
    }

    /** 24bpp BMP: 14-byte file header + 40-byte BITMAPINFOHEADER +
      * h rows of stride ((3w+3)/4)*4; the pixel area is filled by
      * cycling `fill` (zeros when empty). */
    def bmp(w: Int, h: Int, fill: Array[Byte]): Array[Byte] = {
      val stride = ((3 * w + 3) / 4) * 4
      val size = 54 + h * stride
      val b = new Array[Byte](size)
      b(0) = 'B'; b(1) = 'M'
      le32(b, 2, size); le32(b, 10, 54)
      le32(b, 14, 40); le32(b, 18, w); le32(b, 22, h)
      le16(b, 26, 1); le16(b, 28, 24)
      le32(b, 34, h * stride); le32(b, 38, 2835); le32(b, 42, 2835)
      var i = 0
      while (i < h * stride) {
        b(54 + i) = if (fill.length == 0) 0 else fill(i % fill.length)
        i += 1
      }
      b
    }

    /** Minimal standards-shaped AVI (RIFF 'AVI '): LIST hdrl with
      * avih + one 'vids'/'DIB ' stream (strh + strf BITMAPINFOHEADER,
      * 24bpp, 10 fps), then LIST movi holding `nFrames` uncompressed
      * '00db' frames of h x stride bytes. Frame i's pixel area cycles
      * `fill` starting at offset i (zeros when empty) — fully
      * deterministic so the DuckDB oracle rebuilds the byte stream.
      * Fixed layout: header region is exactly 224 bytes, frame chunk i
      * begins at 224 + i*(8 + h*stride). */
    def avi(w: Int, h: Int, nFrames: Int, fill: Array[Byte]): Array[Byte] = {
      val stride = ((3 * w + 3) / 4) * 4
      val flen = h * stride
      val total = 224 + nFrames * (8 + flen)
      val b = new Array[Byte](total)
      def fourcc(off: Int, s: String): Unit = {
        var i = 0; while (i < 4) { b(off + i) = s.charAt(i).toByte; i += 1 }
      }
      fourcc(0, "RIFF"); le32(b, 4, total - 8); fourcc(8, "AVI ")
      fourcc(12, "LIST"); le32(b, 16, 192); fourcc(20, "hdrl")
      fourcc(24, "avih"); le32(b, 28, 56)
      le32(b, 32, 100000)        // usPerFrame (10 fps)
      le32(b, 48, nFrames)       // totalFrames
      le32(b, 56, 1)             // streams
      le32(b, 60, flen)          // suggestedBufferSize
      le32(b, 64, w); le32(b, 68, h)
      fourcc(88, "LIST"); le32(b, 92, 116); fourcc(96, "strl")
      fourcc(100, "strh"); le32(b, 104, 56)
      fourcc(108, "vids"); fourcc(112, "DIB ")
      le32(b, 128, 1)            // scale
      le32(b, 132, 10)           // rate -> 10 fps
      le32(b, 140, nFrames)      // stream length in frames
      le32(b, 144, flen)         // suggestedBufferSize
      le16(b, 160, w); le16(b, 162, h) // rcFrame right/bottom
      fourcc(164, "strf"); le32(b, 168, 40)
      le32(b, 172, 40); le32(b, 176, w); le32(b, 180, h)
      le16(b, 184, 1); le16(b, 186, 24)
      le32(b, 192, flen); le32(b, 196, 2835); le32(b, 200, 2835)
      fourcc(212, "LIST"); le32(b, 216, 4 + nFrames * (8 + flen))
      fourcc(220, "movi")
      var f = 0
      while (f < nFrames) {
        val off = 224 + f * (8 + flen)
        fourcc(off, "00db"); le32(b, off + 4, flen)
        var j = 0
        while (j < flen) {
          b(off + 8 + j) = if (fill.length == 0) 0 else fill((f + j) % fill.length)
          j += 1
        }
        f += 1
      }
      b
    }

    /** PCM WAV, canonical 44-byte header, 8-bit samples, `data` as
      * the sample stream. */
    def wav(channels: Int, sampleRate: Int, data: Array[Byte]): Array[Byte] = {
      val b = new Array[Byte](44 + data.length)
      b(0) = 'R'; b(1) = 'I'; b(2) = 'F'; b(3) = 'F'
      le32(b, 4, 36 + data.length)
      b(8) = 'W'; b(9) = 'A'; b(10) = 'V'; b(11) = 'E'
      b(12) = 'f'; b(13) = 'm'; b(14) = 't'; b(15) = ' '
      le32(b, 16, 16); le16(b, 20, 1); le16(b, 22, channels)
      le32(b, 24, sampleRate); le32(b, 28, sampleRate * channels)
      le16(b, 32, channels); le16(b, 34, 8)
      b(36) = 'd'; b(37) = 'a'; b(38) = 't'; b(39) = 'a'
      le32(b, 40, data.length)
      System.arraycopy(data, 0, b, 44, data.length)
      b
    }
  }

  /** Header-parsing decoder. BMP, WAV and AVI are decoded from their
    * bytes; unknown containers fall back to declared metadata.
    * Malformed magic-carrying payloads return valid=false with zeroed
    * dims — a 100 TB pipeline quarantines bad rows, it does not throw
    * per row. */
  object Codec {
    private def le32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    private def le16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

    def fnv(payload: Array[Byte]): Long = {
      var cs = 1469598103934665603L
      var i = 0
      while (i < payload.length) { cs = (cs ^ (payload(i) & 0xff)) * 1099511628211L; i += 1 }
      cs
    }

    /** (width, height, channels, checksum, valid). */
    def decode(payload: Array[Byte], declaredW: Int, declaredH: Int): (Int, Int, Int, Long, Boolean) = {
      val cs = fnv(payload)
      if (payload.length >= 2 && payload(0) == 'B' && payload(1) == 'M') {
        // BMP: width @18, height @22 (LE32), bpp @28 (LE16)
        if (payload.length < 54) return (0, 0, 0, cs, false)
        val w = le32(payload, 18); val h = le32(payload, 22)
        val bpp = le16(payload, 28)
        // stride in Long: a forged width near 2^30 overflows the int
        // 3*w product and a negative stride would defeat the length
        // check below, marking a truncated payload valid
        val stride = ((bpp.toLong / 8 * w + 3) / 4) * 4
        if (w <= 0 || h <= 0 || bpp % 8 != 0 || bpp == 0 ||
            payload.length < 54 + h.toLong * stride) (0, 0, 0, cs, false)
        else (w, h, bpp / 8, cs, true)
      } else if (payload.length >= 12 && payload(0) == 'R' && payload(1) == 'I' &&
                 payload(2) == 'F' && payload(3) == 'F' &&
                 payload(8) == 'W' && payload(9) == 'A' &&
                 payload(10) == 'V' && payload(11) == 'E') {
        // WAV: channels @22 (LE16), bits @34 (LE16), dataLen @40 (LE32)
        if (payload.length < 44) return (0, 0, 0, cs, false)
        val ch = le16(payload, 22); val bits = le16(payload, 34)
        val dataLen = le32(payload, 40)
        // dataLen < 0: a forged length field (e.g. 0xFFFFFFFF) decodes
        // negative and would pass the truncation check below
        if (ch <= 0 || bits % 8 != 0 || bits == 0 || dataLen < 0 ||
            payload.length < 44 + dataLen.toLong) (0, 0, 0, cs, false)
        else (dataLen / (ch * (bits / 8)), 1, ch, cs, true) // width = samples/channel
      } else if (payload.length >= 12 && payload(0) == 'R' && payload(1) == 'I' &&
                 payload(2) == 'F' && payload(3) == 'F' &&
                 payload(8) == 'A' && payload(9) == 'V' &&
                 payload(10) == 'I' && payload(11) == ' ') {
        // AVI (MediaSynth.avi layout): avih at fixed offset 24 inside
        // LIST hdrl — totalFrames @48, width @64, height @68; bpp from
        // the strf BITMAPINFOHEADER @186 (LE16)
        if (payload.length < 224 ||
            payload(12) != 'L' || payload(20) != 'h' ||
            payload(24) != 'a' || payload(25) != 'v' ||
            payload(26) != 'i' || payload(27) != 'h') return (0, 0, 0, cs, false)
        val nf = le32(payload, 48)
        val w = le32(payload, 64); val h = le32(payload, 68)
        val bpp = le16(payload, 186)
        val stride = ((bpp.toLong / 8 * w + 3) / 4) * 4
        if (w <= 0 || h <= 0 || nf < 0 || bpp % 8 != 0 || bpp == 0 ||
            payload.length < 224 + nf.toLong * (8 + h.toLong * stride))
          (0, 0, 0, cs, false)
        else (w, h, bpp / 8, cs, true)
      } else if (payload.length >= 4 && payload(0) == 'R' && payload(1) == 'I' &&
                 payload(2) == 'F' && payload(3) == 'F') {
        // RIFF magic with an unknown/truncated form tag
        (0, 0, 0, cs, false)
      } else {
        // unknown container: opaque bytes, trust declared dims
        (declaredW, declaredH, 3, cs, true)
      }
    }
  }

  /** Synthesize a media table from any text DataFrame: REAL BMP bytes
    * for image rows, REAL WAV bytes for audio rows, REAL minimal AVI
    * bytes for video rows (deterministic dims/channels/frame counts
    * from engine-portable hash64 so the DuckDB oracle rebuilds the
    * exact byte streams). The binary column IS real binary — this is
    * the schema/partitioning path a 100 TB media corpus would use,
    * partitioned so one partition's payloads fit executor memory. */
  def mediaFromText(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .map { case (id, text0) =>
        val text = if (text0 == null) "" else text0 // null text -> empty payload, not an NPE
        val tb = text.getBytes(StandardCharsets.UTF_8)
        def pm(s: String, m: Long): Int =
          (java.lang.Math.floorMod(graft.functions.Hashing.hash64(s), m) + 1).toInt
        (id % 3) match {
          case 0 =>
            val w = pm(text, 64); val h = pm(text + "|h", 64)
            MediaRow(id, "image", MediaSynth.bmp(w, h, tb), w, h)
          case 1 =>
            val ch = pm(text + "|c", 2)
            MediaRow(id, "audio", MediaSynth.wav(ch, 8000, tb), tb.length / ch, 1)
          case _ =>
            val w = pm(text, 16); val h = pm(text + "|h", 16)
            val nf = pm(text + "|f", 4)
            MediaRow(id, "video", MediaSynth.avi(w, h, nf, tb), w, h)
        }
      }.toDF()
  }

  /** Batched per-partition decode — the mapInPandas-shaped hot path:
    * codec state initialized once per partition, rows streamed,
    * malformed rows quarantined via valid=false (never a throw). */
  def decode(spark: SparkSession, media: DataFrame): Dataset[DecodedRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition decoder init would happen here (real codecs
      // with native state; Codec is stateless)
      rows.map { r =>
        val (w, h, ch, cs, ok) = Codec.decode(r.payload, r.declared_w, r.declared_h)
        DecodedRow(r.media_id, r.kind, r.payload.length, w, h, ch, cs, ok)
      }
    }
  }

  /** Deterministic frame sampling for video rows. AVI payloads are
    * REAL: the movi chunk list is walked, each '00db' frame's actual
    * bytes are checksummed, and offset_ms comes from the stream's
    * scale/rate clock (`everyMs` does not apply to a real container's
    * own timeline; `maxFrames` still caps the output). Non-AVI video
    * payloads (opaque containers) fall back to the byte-slice stub:
    * every `everyMs` ms up to a duration derived from payload size. */
  def frameSample(spark: SparkSession, media: DataFrame, everyMs: Int = 1000,
                  maxFrames: Int = 8): Dataset[FrameRow] = {
    import spark.implicits._
    media.as[MediaRow].filter(_.kind == "video").mapPartitions { rows =>
      rows.flatMap { r =>
        val p = r.payload
        // FULL 'RIFF'+'AVI ' magic: a partial match must not reach
        // decode's unknown-container fallback (valid=true, zero dims)
        // and then be walked as an AVI — that would throw on header
        // reads, in the module whose contract is quarantine-not-throw
        val (w, h, chn, _, isAvi) =
          if (p.length >= 12 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' &&
              p(3) == 'F' && p(8) == 'A' && p(9) == 'V' &&
              p(10) == 'I' && p(11) == ' ') Codec.decode(p, 0, 0)
          else (0, 0, 0, 0L, false)
        if (isAvi) {
          def le32At(off: Int): Long = {
            var v = 0L; var i = 0
            while (i < 4) { v |= (p(off + i) & 0xffL) << (8 * i); i += 1 }
            v
          }
          val stride = ((chn * w + 3) / 4) * 4
          val flen = h * stride
          val nf = math.min(le32At(48).toInt, maxFrames)
          // frame clock: scale @128 / rate @132 (le32) -> ms per frame
          val msPerFrame = (1000L * le32At(128) / math.max(1L, le32At(132))).toInt
          (0 until nf).iterator.map { fi =>
            val off = 224 + fi * (8 + flen)
            var cs = 1469598103934665603L
            var j = 0
            while (j < flen) {
              cs = (cs ^ (p(off + 8 + j) & 0xff)) * 1099511628211L; j += 1
            }
            FrameRow(r.media_id, fi, fi * msPerFrame, cs)
          }
        } else {
          val durationMs = math.min(maxFrames * everyMs, p.length * 10)
          (0 until durationMs by everyMs).iterator.zipWithIndex.map { case (off, idx) =>
            val sliceEnd = math.min(p.length, (off / 10) + 32)
            val slice = java.util.Arrays.copyOfRange(p, math.min(off / 10, sliceEnd), sliceEnd)
            var cs = 1469598103934665603L
            slice.foreach(bb => { cs = (cs ^ (bb & 0xff)) * 1099511628211L })
            FrameRow(r.media_id, idx, off, cs)
          }
        }
      }
    }
  }
}
