package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque binary + typed metadata,
  * with a per-partition decode/feature-extract stage (the Scala analog
  * of a batch mapInPandas UDF).
  *
  * The decode kernel is REAL for two public fixed-layout formats, both
  * implemented as pure-JVM header walks (no codec jars exist in this
  * build, and none are needed for these):
  *
  *  - binary PPM (P6) — the netpbm image format: ASCII header
  *    `P6 <width> <height> <maxval>` with `#` comments, then one
  *    whitespace byte, then width·height packed RGB triples
  *    (netpbm.sourceforge.net/doc/ppm.html);
  *  - RIFF/WAVE PCM — chunk walk over `RIFF…WAVE`, `fmt ` (PCM tag,
  *    channels, sample rate, bits) and `data` (16-bit LE samples),
  *    skipping unknown chunks with word alignment.
  *
  * [[decode]] dispatches on the payload's magic bytes; anything that
  * is neither format is an `opaque` row with byte-window features, and
  * a payload that CLAIMS a format but fails its parse is reported as
  * `corrupt` — never silently reclassified. Formats this simple keep
  * the decoder honest AND testable: the l69/l70 oracles replay the
  * pixel/sample arithmetic in closed form, so a mis-walked header
  * diverges from DuckDB instead of passing vacuously.
  *
  * Scale notes: mapPartitions processes each partition as one iterator
  * (amortizing any per-batch model/codec setup, exactly like a Pandas
  * UDF batch); the binary payloads never shuffle — decode happens
  * in-place on the scan partitioning, and only fixed-width stat/
  * feature rows flow downstream.
  */
object Multimodal {

  // ---- pure-JVM codecs ----------------------------------------------

  /** Decoded P6 stats: dimensions + exact per-channel byte sums (the
    * integer face of mean R/G/B — portable, unlike float means). */
  final case class PpmImage(width: Int, height: Int,
      rSum: Long, gSum: Long, bSum: Long)

  /** Decoded PCM/WAVE stats: format fields + exact sample-value sum. */
  final case class WavAudio(channels: Int, sampleRate: Int,
      bitsPerSample: Int, nSamples: Long, sampleSum: Long)

  /** Build a P6 payload: minimal header + width·height RGB triples from
    * `pixel(byteIndex)` (masked to an octet). The planted-payload
    * generator for specs and the l69/l70 queries. */
  def encodePpm(w: Int, h: Int, pixel: Int => Int): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    header ++ Array.tabulate(w * h * 3)(i => (pixel(i) & 0xff).toByte)
  }

  /** Build a mono-default PCM16 RIFF/WAVE payload. */
  def encodeWav(sampleRate: Int, samples: Array[Short],
      channels: Int = 1): Array[Byte] = {
    val dataSize = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** P6 header walk + pixel accounting. Returns None on any structural
    * violation: wrong magic, missing/oversized dimension tokens,
    * maxval ≠ 255 (two-byte-per-sample PPMs are out of scope), or a
    * pixel payload shorter than width·height·3. Trailing junk after
    * the payload is tolerated (the frame sampler hands in fixed-size
    * slices that may pad). */
  /** The P6 header walk shared by every PPM decoder here: returns
    * (width, height, raster offset) or None on any structural
    * violation — wrong magic, missing/oversized dimension tokens,
    * maxval ≠ 255 (two-byte-per-sample PPMs are out of scope), or a
    * pixel payload shorter than width·height·3. Trailing junk after
    * the raster is tolerated (the frame sampler hands in fixed-size
    * slices that may pad). */
  private def ppmHeader(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    var i = 2
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
    // '#' comments run to end-of-line and may appear wherever
    // whitespace may (the netpbm grammar)
    def skipWsAndComments(): Unit = {
      var go = true
      while (go && i < bytes.length) {
        if (isWs(bytes(i))) i += 1
        else if (bytes(i) == '#') {
          while (i < bytes.length && bytes(i) != '\n') i += 1
        } else go = false
      }
    }
    def token(): Int = { // -1 = malformed; 9 digits bounds toInt
      skipWsAndComments()
      val st = i
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') i += 1
      if (i == st || i - st > 9) -1
      else new String(bytes, st, i - st, "US-ASCII").toInt
    }
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    val w = token(); val h = token(); val maxv = token()
    if (w <= 0 || h <= 0 || maxv != 255) return None
    // exactly ONE whitespace byte separates maxval from the raster
    if (i >= bytes.length || !isWs(bytes(i))) return None
    i += 1
    if (bytes.length - i < w.toLong * h * 3) return None
    Some((w, h, i))
  }

  def decodePpm(bytes: Array[Byte]): Option[PpmImage] =
    ppmHeader(bytes).map { case (w, h, off) =>
      var (r, g, b) = (0L, 0L, 0L)
      var p = 0
      while (p < w * h) {
        r += bytes(off + 3 * p) & 0xff
        g += bytes(off + 3 * p + 1) & 0xff
        b += bytes(off + 3 * p + 2) & 0xff
        p += 1
      }
      PpmImage(w, h, r, g, b)
    }

  /** Per-pixel grayscale decode: same header walk as [[decodePpm]],
    * returning each pixel's integer luma `(r + g + b) div 3` (floor
    * division — exact and portable, unlike float luma weights). The
    * input to perceptual hashing (l94), where the pixel VALUES matter,
    * not just their channel sums. */
  def decodePpmGray(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
    ppmHeader(bytes).map { case (w, h, off) =>
      val px = Array.tabulate(w * h) { p =>
        ((bytes(off + 3 * p) & 0xff) + (bytes(off + 3 * p + 1) & 0xff) +
          (bytes(off + 3 * p + 2) & 0xff)) / 3
      }
      (w, h, px)
    }

  /** Box-filter resize of a decoded P6 image to a `tw`×`th` grayscale
    * thumbnail — the standard area-average downsample (OpenCV's
    * INTER_AREA on integer grids) that precedes any fixed-input vision
    * encoder. Target pixel (X, Y) averages the exact source block
    * x ∈ [X·w div tw, (X+1)·w div tw) × y ∈ [Y·h div th, (Y+1)·h div
    * th): the integer block partition tiles the source exactly (every
    * source pixel in exactly one block, arbitrary w×h — no
    * factor-alignment requirement), and the average is floor division
    * over the block area, so the thumbnail is integer-exact and
    * engine-replayable in closed form. Returns None for non-PPM or
    * corrupt payloads (the [[decodePpmGray]] contract), and None when
    * the source is smaller than the target on either axis (an empty
    * block has no average — upsampling is a different kernel, and
    * silently emitting 0s would corrupt every downstream feature). */
  def resizeBoxGray(bytes: Array[Byte], tw: Int, th: Int): Option[Array[Int]] =
    decodePpmGray(bytes).filter { case (w, h, _) => w >= tw && h >= th }
      .map { case (w, h, px) =>
        Array.tabulate(tw * th) { t =>
          val tx = t % tw
          val ty = t / tw
          val x0 = tx * w / tw; val x1 = (tx + 1) * w / tw
          val y0 = ty * h / th; val y1 = (ty + 1) * h / th
          var s = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) { s += px(y * w + x); x += 1 }
            y += 1
          }
          (s / ((x1 - x0).toLong * (y1 - y0))).toInt
        }
      }

  /** RIFF/WAVE chunk walk. Requires PCM (format tag 1) at 16 bits;
    * unknown chunks (LIST, fact, …) are skipped with RIFF's odd-size
    * pad byte. Returns None if either required chunk is missing or the
    * declared data size overruns the payload. */
  def decodeWav(bytes: Array[Byte]): Option[WavAudio] = {
    def ascii(off: Int, s: String): Boolean =
      off + s.length <= bytes.length &&
        s.indices.forall(k => bytes(off + k) == s.charAt(k))
    def u16(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    if (bytes.length < 44 || !ascii(0, "RIFF") || !ascii(8, "WAVE"))
      return None
    var off = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // tag, ch, rate, bits
    var data: Option[(Int, Long)] = None         // offset, size
    while (off + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val size = u32(off + 4)
      val body = off + 8
      if (body + size > bytes.length) return None
      if (ascii(off, "fmt ") && size >= 16)
        fmt = Some((u16(body), u16(body + 2), u32(body + 4).toInt,
          u16(body + 14)))
      else if (ascii(off, "data")) data = Some((body, size))
      off = body + size.toInt + (size.toInt & 1) // word-align odd chunks
    }
    for {
      (tag, ch, rate, bits) <- fmt
      (dOff, dSize) <- data
      if tag == 1 && bits == 16 && ch >= 1
    } yield {
      val n = dSize / 2
      var sum = 0L
      var k = 0
      while (k < n) { sum += u16(dOff + 2 * k).toShort; k += 1 }
      WavAudio(ch, rate, bits, n, sum)
    }
  }

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_bytes", BinaryType),
    StructField("media_meta", StructType(Seq(
      StructField("modality_tag", StringType),
      StructField("declared_size", LongType))))))

  /** Declared output contract of [[decode]] — the actual schema is
    * encoder-derived; LlmSpec asserts the two stay in lockstep. */
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("modality", StringType),
    StructField("feature", ArrayType(DoubleType))))

  /** Wrap a documents-like frame into the media schema (text bytes stand
    * in for the opaque payload). `carry` appends pass-through columns
    * after the media triple (the no-carry schema is [[mediaSchema]]). */
  def asMedia(docs: DataFrame, carry: Seq[String] = Nil): DataFrame =
    docs.select(Seq(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media_bytes"),
      struct(col("lang").as("modality_tag"),
        col("n_chars").as("declared_size")).as("media_meta")) ++
      carry.map(col): _*)

  /** One payload through the magic-byte dispatch: modality plus a
    * fixed-width feature vector. Image features are
    * [width, height, rSum, gSum, bSum]; audio
    * [channels, sampleRate, nSamples, sampleSum]; `opaque` falls back
    * to byte-window sums (real arithmetic over real bytes — the
    * feature a pipeline hashes when no codec claims the payload); a
    * payload that CLAIMS a format but fails its parse is `corrupt`
    * with an empty vector, never silently reclassified as opaque. */
  def decodeOne(bytes: Array[Byte]): (String, Array[Double]) = {
    def claimsPpm = bytes.length >= 2 &&
      bytes(0) == 'P' && bytes(1) == '6'
    def claimsWav = bytes.length >= 12 &&
      "RIFF".indices.forall(k => bytes(k) == "RIFF".charAt(k)) &&
      "WAVE".indices.forall(k => bytes(8 + k) == "WAVE".charAt(k))
    if (claimsPpm) decodePpm(bytes) match {
      case Some(im) => ("image", Array[Double](im.width, im.height,
        im.rSum.toDouble, im.gSum.toDouble, im.bSum.toDouble))
      case None => ("corrupt", Array.empty[Double])
    } else if (claimsWav) decodeWav(bytes) match {
      case Some(au) => ("audio", Array[Double](au.channels,
        au.sampleRate, au.nSamples.toDouble, au.sampleSum.toDouble))
      case None => ("corrupt", Array.empty[Double])
    } else ("opaque", Array.tabulate(4)(i =>
      bytes.slice(i * 8, i * 8 + 8).map(_.toDouble).sum))
  }

  /** The decode/feature-extract stage over a media frame. Typed
    * `Dataset.mapPartitions` (not an RDD hop): the plan stays a
    * Deserialize→MapPartitions→Serialize span inside the Dataset
    * pipeline — Tungsten row format on both sides, encoder-derived
    * schema instead of driver-side reflection, and the same
    * one-iterator-per-partition shape a codec needs to amortize its
    * setup. */
  def decode(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("media_bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val (modality, feature) = decodeOne(bytes)
          (id, bytes.length, modality, feature)
        }
      }
      .toDF("doc_id", "n_bytes", "modality", "feature")
  }

  /** Frame sampling over the opaque payload — the video-style stage:
    * treat the byte stream as fixed-size frames, keep every `every`-th
    * (a real pipeline decodes only those — sampling must happen BEFORE
    * decode to be worth anything). This variant counts frames without
    * decoding (payload-agnostic); [[frameSampleDecode]] is the variant
    * that runs the real PPM decoder on the kept frames.
    * Same per-partition shape as [[decode]]: payloads never
    * shuffle, the sampler runs on the scan partitioning, and the
    * output is a tiny per-item stat row. */
  def frameSample(spark: SparkSession, media: DataFrame,
      frameBytes: Int = 32, every: Int = 4): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("media_bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val n = bytes.length
          val nFrames = (n + frameBytes - 1) / frameBytes
          val sampled = (0 until nFrames by every)
            .map(i => bytes.slice(i * frameBytes,
              math.min((i + 1) * frameBytes, n)))
          (id, nFrames.toLong, sampled.size.toLong,
            sampled.map(_.length.toLong).sum)
        }
      }
      .toDF("doc_id", "n_frames", "n_sampled", "sampled_bytes")
  }

  /** Frame sampling WITH per-frame decode — the stage [[frameSample]]
    * exists to feed: slice the payload into fixed-size frames, keep
    * every `every`-th, and run the REAL image decoder on exactly the
    * kept frames (sampling before decode is the whole economy — a
    * video pipeline never decodes the frames it drops). Emits per-item
    * accounting: frames seen / sampled / successfully decoded, plus
    * the exact channel-sum checksum of the decoded pixels, so a
    * truncated tail frame shows up as n_decoded < n_sampled rather
    * than vanishing. Same shape as [[frameSample]]: payloads never
    * shuffle, output is one fixed-width stat row per item. */
  def frameSampleDecode(spark: SparkSession, media: DataFrame,
      frameBytes: Int, every: Int): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("media_bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val n = bytes.length
          val nFrames = (n + frameBytes - 1) / frameBytes
          val decoded = (0 until nFrames by every).map { i =>
            decodePpm(bytes.slice(i * frameBytes,
              math.min((i + 1) * frameBytes, n)))
          }
          val ok = decoded.flatten
          (id, nFrames.toLong, decoded.size.toLong, ok.size.toLong,
            ok.map(im => im.rSum + im.gSum + im.bSum).sum)
        }
      }
      .toDF("doc_id", "n_frames", "n_sampled", "n_decoded", "checksum")
  }
}
