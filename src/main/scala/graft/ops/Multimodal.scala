package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` payloads with typed
  * metadata, and a feature-extraction pass with the real Spark plumbing
  * (typed Dataset, mapPartitions with intra-partition batching — the Scala
  * analogue of mapInPandas' batch iteration).
  *
  * The payloads are REAL public formats and the decoder is a REAL byte
  * parser — no metadata shortcut anywhere in the feature path:
  *
  *   - images are PNG (ISO/IEC 15948): signature, IHDR with CRC-32,
  *     IDAT, IEND;
  *   - videos are APNG: a PNG whose acTL chunk carries the frame count;
  *   - audio is WAV (RIFF): `fmt ` chunk (PCM, mono, 8 kHz, 8-bit) +
  *     `data` chunk.
  *
  * `decode` dispatches on the MAGIC BYTES (not the `kind` column), walks
  * the chunk structure, verifies the PNG IHDR CRC-32 and the RIFF/WAVE
  * tags, and derives every feature column — kind, dimensions, frame
  *  count, duration, checksum — from the parsed payload alone. A corrupted
  * signature, a flipped CRC byte, or a truncated chunk makes the record
  * undecodable (`None`), which the corruption specs in PipelineSpec pin.
  * Pixel/sample DECODING (inflate the IDAT zlib stream, PCM DSP) is out of
  * scope in this container — the payload carries the document text as the
  * IDAT/data body — but every header field the features come from is real
  * format structure parsed from real bytes.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int)

  case class MediaFeatures(doc_id: Long, kind: String, byte_len: Int,
      width: Int, height: Int, n_frames: Long, duration_ms: Long,
      checksum: Long)

  /** Resized/sampled representation: target dims after aspect-preserving
    * resize — the source dims come from the PARSED payload header, not
    * the metadata columns (a real decoder resizes pixels; this computes
    * the header-level plan for it) — plus up to `maxFrames`
    * evenly-spaced frame byte-offsets (the frame-sample access pattern a
    * video pipeline feeds the decoder). Undecodable payloads drop, like
    * `extractFeatures`. */
  case class MediaSample(doc_id: Long, kind: String, out_w: Int, out_h: Int,
      frame_offsets: Array[Long])

  // ---------------------------------------------------------------- bytes
  private val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def crc32(parts: Array[Byte]*): Long = {
    val c = new java.util.zip.CRC32
    parts.foreach(c.update)
    c.getValue
  }

  private def be32(v: Long): Array[Byte] = Array(
    ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
    ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
    ((v >>> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte)

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    be32(data.length.toLong) ++ t ++ data ++ be32(crc32(t, data))
  }

  /** A real PNG: signature + IHDR(width, height, 8-bit, truecolor) +
    * optional acTL(nFrames) [APNG] + one IDAT carrying `data` + IEND.
    * Overhead over `data`: 57 bytes plain, 77 with acTL. */
  private[graft] def pngBytes(w: Int, h: Int, data: Array[Byte],
      nFrames: Option[Long]): Array[Byte] = {
    val ihdr = be32(w.toLong) ++ be32(h.toLong) ++
      Array[Byte](8, 2, 0, 0, 0) // depth 8, truecolor, deflate, none, none
    val actl = nFrames.map(n => chunk("acTL", be32(n) ++ be32(0L)))
    PngSig ++ chunk("IHDR", ihdr) ++ actl.getOrElse(Array.empty[Byte]) ++
      chunk("IDAT", data) ++ chunk("IEND", Array.empty[Byte])
  }

  /** A real WAV: RIFF/WAVE + `fmt ` (PCM, 1 channel, `rate` Hz, 8-bit) +
    * `data` carrying `data`. Overhead over `data`: 44 bytes. */
  private[graft] def wavBytes(data: Array[Byte],
      rate: Int = 8000): Array[Byte] =
    "RIFF".getBytes("US-ASCII") ++ le32(36L + data.length) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16L) ++
      le16(1) ++ le16(1) ++ le32(rate.toLong) ++ le32(rate.toLong) ++
      le16(1) ++ le16(8) ++
      "data".getBytes("US-ASCII") ++ le32(data.length.toLong) ++ data

  private def be32At(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def le32At(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def le16At(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def asciiAt(b: Array[Byte], i: Int, n: Int): String =
    new String(b, i, n, "US-ASCII")

  // --------------------------------------------------------------- decode
  /** Parse one payload. PNG: signature + chunk walk, IHDR CRC-32
    * verified, dims from IHDR, frame count from acTL (absent -> 1 ->
    * "image", present -> "video"). WAV: RIFF/WAVE tags + chunk walk,
    * sample count = data length / block align, duration from byte rate.
    * Returns None for anything that is not a structurally valid payload
    * of either format — bad magic, truncated chunk, CRC mismatch,
    * non-PCM fmt. The checksum is the CRC-32 of the whole payload. */
  private[graft] def decode(r: MediaRecord): Option[MediaFeatures] = try {
    val b = r.payload
    if (b.length >= 8 && b.take(8).sameElements(PngSig)) {
      // IHDR must be the first chunk (PNG spec) and its CRC must hold
      if (be32At(b, 8) != 13L || asciiAt(b, 12, 4) != "IHDR") return None
      if (crc32(java.util.Arrays.copyOfRange(b, 12, 29)) != be32At(b, 29))
        return None
      val w = be32At(b, 16).toInt
      val h = be32At(b, 20).toInt
      if (w <= 0 || h <= 0) return None
      var frames = Option.empty[Long]
      var sawEnd = false
      var i = 33 // past IHDR
      while (i + 8 <= b.length && !sawEnd) {
        val len = be32At(b, i)
        val typ = asciiAt(b, i + 4, 4)
        if (i + 12 + len > b.length) return None // truncated chunk
        if (typ == "acTL") frames = Some(be32At(b, i + 8))
        if (typ == "IEND") sawEnd = true
        i += 12 + len.toInt
      }
      if (!sawEnd) return None
      Some(MediaFeatures(r.doc_id,
        if (frames.isDefined) "video" else "image", b.length,
        w, h, frames.getOrElse(1L), 0L, crc32(b)))
    } else if (b.length >= 12 && asciiAt(b, 0, 4) == "RIFF" &&
        asciiAt(b, 8, 4) == "WAVE") {
      var rate = 0L; var byteRate = 0L; var blockAlign = 0
      var dataLen = -1L
      var i = 12
      while (i + 8 <= b.length) {
        val id = asciiAt(b, i, 4)
        val len = le32At(b, i + 4)
        if (i + 8 + len > b.length) return None // truncated chunk
        if (id == "fmt ") {
          if (len < 16 || le16At(b, i + 8) != 1) return None // PCM only
          rate = le32At(b, i + 12)
          byteRate = le32At(b, i + 16)
          blockAlign = le16At(b, i + 20)
        }
        if (id == "data") dataLen = len
        i += 8 + len.toInt
      }
      if (rate <= 0 || byteRate <= 0 || blockAlign <= 0 || dataLen < 0)
        return None
      Some(MediaFeatures(r.doc_id, "audio", b.length, 0, 0,
        dataLen / blockAlign, dataLen * 1000L / byteRate, crc32(b)))
    } else None
  } catch { case _: ArrayIndexOutOfBoundsException => None }

  /** Build a media table from documents: REAL format bytes with the
    * document text as the IDAT/data body, kind cycling image/audio/video
    * by doc_id, PNG dims derived from n_chars (+1: the PNG spec forbids
    * zero dimensions). The width/height metadata columns mirror what the
    * encoder wrote — `decode` never reads them (spec-pinned: it
    * re-derives both from the IHDR bytes). */
  def toMediaTable(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("text"),
      col("n_chars").cast("int").as("n_chars"))
      .as[(Long, String, Int)]
      .mapPartitions(_.map { case (id, text, nChars) =>
        val data = text.getBytes("UTF-8")
        val w = nChars % 640 + 1
        val h = nChars % 480 + 1
        (id % 3) match {
          case 0 => MediaRecord(id, "image", pngBytes(w, h, data, None), w, h)
          case 1 => MediaRecord(id, "audio", wavBytes(data), 0, 0)
          case _ => MediaRecord(id, "video",
            pngBytes(w, h, data, Some(data.length / 1024L + 1L)), w, h)
        }
      }).toDF()
  }

  def sampleFrames(media: DataFrame, targetW: Int = 224,
      maxFrames: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.grouped(64).flatMap(_.flatMap { r =>
        decode(r).map { f =>
          val w = math.max(f.width, 1) // parsed audio dims are 0x0
          val scale = targetW.toDouble / w
          // scale the RAW height and clamp the RESULT (clamping height
          // before scaling would turn a degenerate 0-height medium into
          // out_h = scale instead of the 1-pixel floor)
          val n = math.min(maxFrames, r.payload.length / 1024 + 1)
          val stride = math.max(r.payload.length / math.max(n, 1), 1)
          MediaSample(r.doc_id, f.kind, targetW,
            math.max((f.height * scale).toInt, 1),
            Array.tabulate(n)(i => i.toLong * stride))
        }
      })
    }.toDF()
  }

  /** Concatenated IDAT body of a structurally valid PNG/APNG payload —
    * the same signature + IHDR-CRC + chunk-walk validation as [[decode]],
    * returning the compressed-stream bytes a real decoder would inflate.
    * None for non-PNG or corrupt payloads (so WAV audio drops out of the
    * image-hash path by construction, keyed on MAGIC BYTES, never the
    * metadata columns). */
  private[graft] def pngIdatBody(b: Array[Byte]): Option[Array[Byte]] = try {
    if (b.length < 8 || !b.take(8).sameElements(PngSig)) return None
    if (be32At(b, 8) != 13L || asciiAt(b, 12, 4) != "IHDR") return None
    if (crc32(java.util.Arrays.copyOfRange(b, 12, 29)) != be32At(b, 29))
      return None
    val out = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    var i = 33
    while (i + 8 <= b.length && !sawEnd) {
      val len = be32At(b, i)
      val typ = asciiAt(b, i + 4, 4)
      if (i + 12 + len > b.length) return None
      if (typ == "IDAT") out.write(b, i + 8, len.toInt)
      if (typ == "IEND") sawEnd = true
      i += 12 + len.toInt
    }
    if (!sawEnd) None else Some(out.toByteArray)
  } catch { case _: ArrayIndexOutOfBoundsException => None }

  /** 56-bit difference hash (dHash) over the DETERMINISTIC stub bitmap:
    * pixel decoding is out of scope in this container (no codec libs —
    * the IDAT body carries the document text, see the object doc), so
    * the "decoded bitmap" is a reproducible fake any engine can rebuild:
    * the body's code points tile into an 8×8 grid of contiguous slices
    * (code point i of L lands in cell i·64/L), cell value = sum of its
    * code points mod 256, and bit (r, c) = [cell(r,c) < cell(r,c+1)]
    * packed LSB-first at r·7+c — the classic horizontal-gradient dHash
    * over an 8-column brightness grid, 8 rows × 7 comparisons = 56 bits
    * (inside a signed 64-bit long, like d19's 60-bit posture). A REAL
    * deployment swaps `gridOf` for inflate+resize-to-8×9-grayscale and
    * keeps everything downstream — the banding, pairing, and oracle
    * shapes don't change. Iteration is per CODE POINT (surrogate pairs
    * contribute one code point to one cell, `i` advancing by
    * `charCount`), matching the oracle's per-character `unicode()` walk —
    * a per-UTF-16-unit walk would double-count supplementary characters
    * and mis-stride the cell index on any non-BMP text reaching the
    * public `phashIngestSink` path. */
  private[graft] def dHash56(body: String): Long = {
    val l = body.codePointCount(0, body.length)
    val g = new Array[Long](64)
    var i = 0  // UTF-16 index
    var ci = 0 // code-point index — the cell stride the oracle sees
    while (i < body.length) {
      val cp = body.codePointAt(i)
      g(((ci.toLong * 64) / l).toInt) += cp
      i += Character.charCount(cp)
      ci += 1
    }
    var c = 0
    while (c < 64) { g(c) = g(c) % 256; c += 1 }
    var sig = 0L
    var r = 0
    while (r < 8) {
      var cc = 0
      while (cc < 7) {
        if (g(r * 8 + cc) < g(r * 8 + cc + 1)) sig |= 1L << (r * 7 + cc)
        cc += 1
      }
      r += 1
    }
    sig
  }

  /** Per-image perceptual hash over a media table: (doc_id, phash) for
    * every payload that parses as PNG/APNG; audio and corrupt payloads
    * drop. Same embarrassingly-parallel mapPartitions batch shape as
    * [[extractFeatures]] — one task per split, no shuffle. */
  def phash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.grouped(64).flatMap(_.flatMap { r =>
        pngIdatBody(r.payload).map { body =>
          (r.doc_id, dHash56(new String(body, "UTF-8")))
        }
      })
    }.toDF("doc_id", "phash")
  }

  /** Perceptual near-dup image pairs — the multimodal bridge into the
    * dedup family: dHash signatures banded through the SAME distinct-
    * signature Hamming engine as d4/d19 (`Dedup.bandedHammingPairs`,
    * maxHamming+1 near-equal bands over the 56 bits — pigeonhole makes
    * banded == brute force for any maxHamming < 56, which is what makes
    * the hash-equality oracle possible). Output (doc1 < doc2, hamming).
    * Scale shape inherits the engine's: banding over distinct signature
    * VALUES, output-proportional re-expansion — exact-duplicate images
    * (the bulk of image dup mass) never inflate the candidate join. */
  def phashPairs(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 56,
      "maxHamming must sit inside the 56-bit signature")
    val bands = maxHamming + 1
    val base = 56 / bands
    val extra = 56 % bands
    val widths = Array.tabulate(bands)(i => base + (if (i < extra) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _).take(bands)
    Dedup.bandedHammingPairs(
      phash(toMediaTable(documents)).select(col("doc_id"),
        col("phash").as("simhash")),
      widths, offsets, maxHamming)
  }

  /** Extract the PCM `data` chunk of a structurally valid WAV (RIFF
    * walk mirroring `decode`'s audio branch); None for non-WAV, non-PCM,
    * or truncated payloads — so PNG/APNG images drop out of the audio
    * path the same way audio drops out of [[pngIdatBody]]. */
  private[graft] def wavDataBody(b: Array[Byte]): Option[Array[Byte]] =
    try {
      if (b.length < 12 || asciiAt(b, 0, 4) != "RIFF" ||
        asciiAt(b, 8, 4) != "WAVE") return None
      var pcm = false
      var out = Option.empty[Array[Byte]]
      var i = 12
      while (i + 8 <= b.length) {
        val id = asciiAt(b, i, 4)
        val len = le32At(b, i + 4)
        if (i + 8 + len > b.length) return None // truncated chunk
        if (id == "fmt ") {
          if (len < 16 || le16At(b, i + 8) != 1) return None // PCM only
          pcm = true
        }
        if (id == "data")
          out = Some(java.util.Arrays.copyOfRange(b, i + 8,
            i + 8 + len.toInt))
        i += 8 + len.toInt
      }
      if (pcm) out else None
    } catch { case _: ArrayIndexOutOfBoundsException => None }

  /** 31-bit energy-envelope fingerprint over the DETERMINISTIC stub
    * samples — the audio sibling of [[dHash56]] (chromaprint-lite): the
    * PCM body's code points tile into 32 contiguous windows (point i of
    * L lands in window i·32/L), window value = sum mod 256, bit w =
    * [env(w) < env(w+1)] packed LSB-first — a temporal-gradient
    * envelope hash, robust to level shifts the way dHash is robust to
    * brightness. A REAL deployment swaps the stub envelope for
    * mean-|PCM|-per-window over decoded samples and keeps the banding,
    * pairing, and oracle shapes. Per-code-point iteration matches the
    * oracle's per-character walk (the d21 surrogate lesson, pinned by
    * the dHash code-point spec). */
  private[graft] def envHash31(body: String): Long = {
    val l = body.codePointCount(0, body.length)
    if (l == 0) return 0L
    val g = new Array[Long](32)
    var i = 0
    var ci = 0
    while (i < body.length) {
      val cp = body.codePointAt(i)
      g(((ci.toLong * 32) / l).toInt) += cp
      i += Character.charCount(cp)
      ci += 1
    }
    var w = 0
    while (w < 32) { g(w) = g(w) % 256; w += 1 }
    var sig = 0L
    var c = 0
    while (c < 31) { if (g(c) < g(c + 1)) sig |= 1L << c; c += 1 }
    sig
  }

  /** Per-clip envelope hash over a media table: (doc_id, ahash) for
    * every payload that parses as PCM WAV; images and corrupt payloads
    * drop. Same no-shuffle mapPartitions batch shape as [[phash]]. */
  def audioHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.grouped(64).flatMap(_.flatMap { r =>
        wavDataBody(r.payload).map { body =>
          (r.doc_id, envHash31(new String(body, "UTF-8")))
        }
      })
    }.toDF("doc_id", "ahash")
  }

  /** Near-dup AUDIO pairs — completes the multimodal dedup bridge
    * (text d2-d19, images d21, audio here): envelope hashes banded
    * through the same distinct-signature Hamming engine, maxHamming+1
    * near-equal bands over the 31 bits (pigeonhole: banded == brute
    * force). Output (doc1 < doc2, hamming). */
  def audioPairs(documents: DataFrame, maxHamming: Int = 2): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 31,
      "maxHamming must sit inside the 31-bit signature")
    val bands = maxHamming + 1
    val base = 31 / bands
    val extra = 31 % bands
    val widths = Array.tabulate(bands)(i => base + (if (i < extra) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _).take(bands)
    Dedup.bandedHammingPairs(
      audioHash(toMediaTable(documents)).select(col("doc_id"),
        col("ahash").as("simhash")),
      widths, offsets, maxHamming)
  }

  /** Feature extraction over the media table: typed mapPartitions, batched
    * 64 records at a time inside each partition (the batch shape a
    * vectorized decoder wants). Runs embarrassingly parallel — one task
    * per input split, no shuffle. Undecodable payloads drop out (the
    * filter-on-parse-failure a real media pipeline applies). */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val ds: Dataset[MediaRecord] = media.as[MediaRecord]
    ds.mapPartitions { it =>
      it.grouped(64).flatMap { batch => batch.flatMap(decode) }
    }.toDF()
  }

  /** Oracle-checkable projection of the feature pass (checksum is covered
    * by ScalaTest instead — CRC-32 isn't DuckDB SQL). */
  def mediaFeatureSummary(documents: DataFrame): DataFrame =
    extractFeatures(toMediaTable(documents))
      .select(col("doc_id"), col("kind"), col("byte_len"), col("width"),
        col("height"), col("n_frames"), col("duration_ms"))
}
