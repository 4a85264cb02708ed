package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: media payloads as opaque `binary` columns with a
  * typed metadata struct, processed by a per-partition typed pipeline.
  *
  * The decode step is a REAL codec: image payloads are Netpbm rasters
  * (P5 grayscale / P6 RGB — the public netpbm format spec: ASCII
  * header `P5\n<w> <h>\n<maxval>\n` with whitespace/#-comment
  * tolerance, then w·h·channels raw bytes after exactly one
  * whitespace), audio payloads are RIFF/WAV PCM16 (chunk-walking
  * parser — [[decodeWav]]), and both parsers genuinely validate, not
  * stand in. The container has no JPEG/PNG libraries, so
  * the ENCODER side manufactures PGM payloads from document text bytes
  * (deterministic, so every downstream feature is SQL-recomputable and
  * oracle-checked end-to-end); a production build swaps the payload
  * source for real camera/scan bytes and, for compressed formats, only
  * the body of [[decodeNetpbm]] — the distributed shape (map-only
  * `mapPartitions` over binary payloads, no shuffle, no driver
  * involvement, decode-once-then-feature) is exactly what runs at
  * 100 TB.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata (the reference keeps
    * arbitrary props next to entity ids the same way). */
  final case class Media(doc_id: Long, payload: Array[Byte], meta_source: String, meta_len: Long)

  /** A decoded raster: dimensions + sample depth + channel count +
    * row-major samples (1 byte per sample — maxval ≤ 255). */
  final case class RasterImage(width: Int, height: Int, maxval: Int,
                               channels: Int, pixels: Array[Byte])

  /** Features a decoder emits: REAL decoded dimensions, pixel count,
    * the encoded payload size, a deterministic pixel checksum, and
    * frame-sample stats (every `FrameStride`-th pixel = "frame"). */
  final case class MediaFeatures(doc_id: Long, width: Long, height: Long,
                                 n_pixels: Long, payload_bytes: Long,
                                 checksum: Long, n_frames: Long, first_byte: Long)

  val FrameStride = 16

  /** Pixel columns per manufactured image row (the encoder contract:
    * text bytes wrap at this width, zero-padded to fill the last
    * row). */
  val Width = 16

  /** Encode a grayscale raster as a binary PGM (P5) payload — the
    * netpbm spec's minimal writer: `P5\n<w> <h>\n255\n` + row-major
    * bytes. */
  def encodePgm(pixels: Array[Byte], width: Int, height: Int): Array[Byte] = {
    require(width >= 0 && height >= 0 && pixels.length == width * height,
      s"pixel buffer ${pixels.length} != $width x $height")
    s"P5\n$width $height\n255\n".getBytes("US-ASCII") ++ pixels
  }

  /** Parse a binary Netpbm payload (P5 grayscale or P6 RGB): validates
    * the magic, reads the ASCII header tokens with full
    * whitespace-run and `#`-comment tolerance (the spec allows both),
    * requires 1-byte samples (maxval ≤ 255) and a complete raster
    * after the single post-maxval whitespace. LOUD on malformed
    * input — a decoder that guesses past a bad header corrupts every
    * feature downstream. */
  def decodeNetpbm(bytes: Array[Byte]): RasterImage = {
    require(bytes.length >= 2 && bytes(0) == 'P',
      s"not a Netpbm payload (${bytes.length} bytes)")
    val channels = bytes(1).toChar match {
      case '5' => 1
      case '6' => 3
      case m => throw new IllegalArgumentException(s"unsupported Netpbm magic P$m")
    }
    var i = 2
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
    def nextInt(): Int = {
      while (i < bytes.length && (isWs(bytes(i)) || bytes(i) == '#')) {
        if (bytes(i) == '#') while (i < bytes.length && bytes(i) != '\n') i += 1
        else i += 1
      }
      require(i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9',
        s"malformed Netpbm header at byte $i")
      var v = 0
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); i += 1
      }
      v
    }
    val w = nextInt()
    val h = nextInt()
    val maxval = nextInt()
    require(maxval > 0 && maxval <= 255, s"unsupported maxval $maxval (1-byte samples only)")
    require(i < bytes.length && isWs(bytes(i)),
      "missing single whitespace between maxval and raster")
    i += 1
    val n = w * h * channels
    require(bytes.length - i >= n,
      s"truncated raster: need $n bytes after the header, have ${bytes.length - i}")
    RasterImage(w, h, maxval, channels, java.util.Arrays.copyOfRange(bytes, i, i + n))
  }

  /** Documents → media table: each doc's UTF-8 bytes wrap into a
    * [[Width]]-column grayscale image (zero-padded final row) and
    * encode as a REAL PGM payload; metadata stays a typed column. */
  def mediaFromDocs(docs: DataFrame): Dataset[Media] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"), col("source"))
      .as[(Long, String, String)]
      .mapPartitions(_.map { case (id, text, source) =>
        val tb = text.getBytes("UTF-8")
        val h = (tb.length + Width - 1) / Width
        Media(id, encodePgm(java.util.Arrays.copyOf(tb, Width * h), Width, h),
          source, text.length.toLong)
      })
  }

  /** Decode one payload into its features: REAL parse first, then
    * deterministic pixel statistics. */
  def decodeFeatures(m: Media): MediaFeatures = {
    val img = decodeNetpbm(m.payload)
    val px = img.pixels
    var checksum = 0L
    var i = 0
    while (i < px.length) { checksum = (checksum + (px(i) & 0xffL)) % 997L; i += 1 }
    MediaFeatures(m.doc_id, img.width.toLong, img.height.toLong, px.length.toLong,
      m.payload.length.toLong, checksum,
      ((px.length + FrameStride - 1) / FrameStride).toLong,
      if (px.nonEmpty) (px(0) & 0xffL) else -1L)
  }

  final case class PerceptualHash(doc_id: Long, phash: Long)

  /** dHash perceptual fingerprint — the key-level image dedup public
    * web-scale pipelines run (LAION-style pHash/dHash screening): the
    * decoded raster pools into a 9×8 brightness grid (integer cell
    * boundaries over the padded pixel array) and bit (r,c) records
    * whether cell (r,c) is brighter than its right neighbor — 64 bits
    * of BRIGHTNESS GRADIENTS, so a uniform exposure shift leaves the
    * fingerprint bit-identical (the class exact content-hash dedup is
    * blind to). Unequal cell widths compare by integer cross-multiply
    * (sumA·nB > sumB·nA — exact, engine ≡ oracle; no float division).
    * Map-only typed decode; pairs ride [[graft.dedup.Dedup
    * .hammingPairs]] — d4's Manku chunk machinery, exact recall at the
    * radius. */
  def dHash(media: Dataset[Media]): Dataset[PerceptualHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      val px = decodeNetpbm(m.payload).pixels
      val vals = new Array[Long](px.length)
      var i = 0
      while (i < px.length) { vals(i) = (px(i) & 0xffL); i += 1 }
      val (sums, cnts) = gradientCells(vals)
      var bits = 0L
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          val a = r * 9 + c
          if (sums(a) * cnts(a + 1) > sums(a + 1) * cnts(a))
            bits |= (1L << (r * 8 + c))
          c += 1
        }
        r += 1
      }
      PerceptualHash(m.doc_id, bits)
    })
  }

  /** The 72-cell integer pooling every perceptual fingerprint in the
    * file shares (dHash image grid, audioHash band energies, tHash
    * time×position cells): integer cell boundaries `⌊g·P/72⌋` over the
    * value array, per-cell (sum, count). Unequal cell widths compare
    * downstream by integer cross-multiply — exact, engine ≡ oracle. */
  private def gradientCells(vals: Array[Long]): (Array[Long], Array[Long]) = {
    val P = vals.length
    val sums = new Array[Long](72)
    val cnts = new Array[Long](72)
    var g = 0
    while (g < 72) {
      val lo = (g.toLong * P / 72).toInt
      val hi = ((g + 1).toLong * P / 72).toInt
      var s = 0L
      var i = lo
      while (i < hi) { s += vals(i); i += 1 }
      sums(g) = s; cnts(g) = (hi - lo).toLong
      g += 1
    }
    (sums, cnts)
  }

  /** Band-energy gradient hash — the AUDIO sibling of [[dHash]] (the
    * d35 screen; the key-level audio dedup a media pipeline runs
    * before any model): the decoded waveform's ABSOLUTE amplitudes
    * pool into the shared 72 cells (here: time-band energies) and bit
    * (r,c) records whether band (r,c) is louder than its right
    * neighbor — 64 bits of ENERGY GRADIENTS. Uniform gain scales every
    * band equally, and (for the delta-encoded synthesis) a uniform
    * byte shift cancels in the deltas entirely except at sample 0 —
    * both land re-ingest twins within a small Hamming radius where
    * exact content-hash dedup sees nothing. Integer-exact end to end
    * (cross-multiply comparisons), map-only decode. */
  def audioHash(media: Dataset[Media]): Dataset[PerceptualHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      val sm = decodeWav(m.payload).samples
      val vals = new Array[Long](sm.length)
      var i = 0
      while (i < sm.length) { vals(i) = math.abs(sm(i).toLong); i += 1 }
      val (sums, cnts) = gradientCells(vals)
      var bits = 0L
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          val a = r * 9 + c
          if (sums(a) * cnts(a + 1) > sums(a + 1) * cnts(a))
            bits |= (1L << (r * 8 + c))
          c += 1
        }
        r += 1
      }
      PerceptualHash(m.doc_id, bits)
    })
  }

  /** Temporal-gradient (motion-signature) hash — the VIDEO sibling of
    * [[dHash]] (the d36 screen): the decoded frame stream's pixels
    * pool into the shared 72 cells read as a 9×8 TIME × position grid,
    * and bit (r,c) records whether cell (r,c) is brighter than the
    * SAME position one time-row later — 64 bits of ACROSS-FRAME
    * gradients (what changes over time), where dHash's bits are
    * within-image gradients. A uniform exposure shift cancels in the
    * equal-count cross-multiplies, so brightness-shifted re-encodes of
    * the same footage land within a small Hamming radius. Integer-
    * exact end to end, map-only decode. */
  def tHash(media: Dataset[Media]): Dataset[PerceptualHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      val px = decodeNetpbm(m.payload).pixels
      val vals = new Array[Long](px.length)
      var i = 0
      while (i < px.length) { vals(i) = (px(i) & 0xffL); i += 1 }
      val (sums, cnts) = gradientCells(vals)
      var bits = 0L
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          val a = r * 8 + c // 9 time-rows × 8 position columns
          val b = a + 8     // same position, next time-row
          if (sums(a) * cnts(b) > sums(b) * cnts(a))
            bits |= (1L << (r * 8 + c))
          c += 1
        }
        r += 1
      }
      PerceptualHash(m.doc_id, bits)
    })
  }

  /** The typed feature-extraction pipeline: batch-shaped partition-wise
    * processing (the Scala analog of `mapInPandas` batches). */
  def extractFeatures(media: Dataset[Media]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map(decodeFeatures))
  }

  def features(spark: SparkSession, docs: DataFrame): DataFrame =
    extractFeatures(mediaFromDocs(docs)).toDF()

  final case class ResizedMedia(doc_id: Long, payload: Array[Byte], meta_source: String,
                                orig_w: Long, orig_h: Long, new_w: Long, new_h: Long)

  /** 2-D average-pool downsample: decode the PGM, average each
    * `factor`×`factor` pixel block (integer division — exact, engine ≡
    * oracle), re-encode the smaller raster as a NEW PGM payload so
    * resized media flows through the same decode/feature/frame
    * operators. Trailing rows/columns that do not fill a block drop
    * (truncating `div` on both dimensions). Map-only, no shuffle, the
    * payload never leaves the executor; a production build swaps only
    * the block loop for the codec's resampler. */
  def resize(media: Dataset[Media], factor: Int): Dataset[ResizedMedia] = {
    require(factor >= 1, "resize factor must be >= 1")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      val img = decodeNetpbm(m.payload)
      require(img.channels == 1, s"resize expects grayscale (P5), got ${img.channels} channels")
      val w2 = img.width / factor
      val h2 = img.height / factor
      val out = new Array[Byte](w2 * h2)
      var r = 0
      while (r < h2) {
        var c = 0
        while (c < w2) {
          var sum = 0L
          var dr = 0
          while (dr < factor) {
            var dc = 0
            while (dc < factor) {
              sum += img.pixels((r * factor + dr) * img.width + c * factor + dc) & 0xffL
              dc += 1
            }
            dr += 1
          }
          out(r * w2 + c) = (sum / (factor.toLong * factor)).toByte
          c += 1
        }
        r += 1
      }
      ResizedMedia(m.doc_id, encodePgm(out, w2, h2), m.meta_source,
        img.width.toLong, img.height.toLong, w2.toLong, h2.toLong)
    })
  }

  /** Resized media re-enters the pipeline as ordinary Media — resize →
    * decode → features composes in one map-only plan. */
  def asMedia(resized: Dataset[ResizedMedia]): Dataset[Media] = {
    val spark = resized.sparkSession
    import spark.implicits._
    resized.map(r => Media(r.doc_id, r.payload, r.meta_source, r.new_w * r.new_h))
  }

  final case class MediaEmbedding(doc_id: Long, embedding: Array[Float])

  /** Embed stand-in for an image/audio embedding model over the
    * DECODED raster: dims frame-window pixel sums as floats (exact:
    * sums stay far below 2^24), zero-padded. Deterministic and
    * SQL-recomputable, so the full binary → decode → embed → ANN
    * pipeline is oracle-checkable; a production build swaps only this
    * body for the model call. The shape is the thing: one map-only
    * typed pass emits the `Array[Float]` column every `graft.ann`
    * operator consumes. */
  def embed(media: Dataset[Media], dims: Int = 16): Dataset[MediaEmbedding] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      val px = decodeNetpbm(m.payload).pixels
      val emb = new Array[Float](dims)
      var d = 0
      while (d < dims) {
        val start = d * FrameStride
        var sum = 0L
        var j = start
        while (j < math.min(start + FrameStride, px.length)) { sum += px(j) & 0xffL; j += 1 }
        emb(d) = sum.toFloat
        d += 1
      }
      MediaEmbedding(m.doc_id, emb)
    })
  }

  /** Encode an RGB raster as a binary PPM (P6) payload — same header
    * grammar as P5, three bytes per pixel. */
  def encodePpm(pixels: Array[Byte], width: Int, height: Int): Array[Byte] = {
    require(width >= 0 && height >= 0 && pixels.length == width * height * 3,
      s"pixel buffer ${pixels.length} != $width x $height x 3")
    s"P6\n$width $height\n255\n".getBytes("US-ASCII") ++ pixels
  }

  /** Documents → RGB media: consecutive text-byte TRIPLES become
    * (r, g, b) pixels, wrapped at [[Width]] columns (zero-padded final
    * pixels/row) and encoded as a REAL PPM payload — the color branch
    * of the codec exercised end to end. */
  def mediaFromDocsRgb(docs: DataFrame): Dataset[Media] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"), col("source"))
      .as[(Long, String, String)]
      .mapPartitions(_.map { case (id, text, source) =>
        val tb = text.getBytes("UTF-8")
        val nPix = (tb.length + 2) / 3
        val h = (nPix + Width - 1) / Width
        Media(id, encodePpm(java.util.Arrays.copyOf(tb, Width * h * 3), Width, h),
          source, text.length.toLong)
      })
  }

  /** Per-channel statistics a color decoder emits: decoded geometry +
    * exact per-channel byte sums (zero padding is sum-neutral, so the
    * oracle recomputes each channel from the text bytes by stride). */
  final case class RgbFeatures(doc_id: Long, width: Long, height: Long,
                               n_pixels: Long, r_sum: Long, g_sum: Long, b_sum: Long)

  /** Decode P6 payloads and emit per-channel sums — map-only, same
    * batch shape as the grayscale path; refuses non-RGB payloads
    * loudly (a channel-blind sum over grayscale would silently
    * triple-count). */
  def rgbFeatures(media: Dataset[Media]): Dataset[RgbFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      val img = decodeNetpbm(m.payload)
      require(img.channels == 3, s"rgbFeatures expects P6 (RGB), got ${img.channels} channel(s)")
      val px = img.pixels
      var r = 0L; var g = 0L; var b = 0L
      var i = 0
      while (i < px.length) {
        r += px(i) & 0xffL
        g += px(i + 1) & 0xffL
        b += px(i + 2) & 0xffL
        i += 3
      }
      RgbFeatures(m.doc_id, img.width.toLong, img.height.toLong,
        (px.length / 3).toLong, r, g, b)
    })
  }

  // --- audio branch (m7): RIFF/WAV PCM16 ---------------------------------

  /** A decoded audio clip: sample rate + mono 16-bit samples. */
  final case class AudioClip(sampleRate: Int, samples: Array[Short])

  /** Encode mono PCM16 samples as a canonical RIFF/WAV payload (the
    * public WAVE spec: `RIFF<size>WAVE` + a 16-byte `fmt ` chunk
    * (PCM=1, mono, 16-bit) + a `data` chunk of little-endian int16
    * samples). */
  def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    require(sampleRate > 0, s"bad sample rate $sampleRate")
    val n = samples.length
    val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16) // block align, bits/sample
      .put("data".getBytes("US-ASCII")).putInt(2 * n)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Parse a RIFF/WAV payload: validates the RIFF/WAVE magic, then
    * WALKS the chunk list (4-byte id, LE size, odd-size pad — the spec
    * allows any chunk order and foreign chunks like LIST/INFO between
    * fmt and data), requires PCM (format 1), mono, 16-bit, and a
    * complete data chunk. LOUD on malformed input — same contract as
    * [[decodeNetpbm]]: a decoder that guesses corrupts every feature
    * downstream. A fixed-offset 44-byte "parser" would break on the
    * first real-world file with an INFO chunk; this one doesn't. */
  def decodeWav(bytes: Array[Byte]): AudioClip = {
    require(bytes.length >= 12 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE",
      s"not a RIFF/WAVE payload (${bytes.length} bytes)")
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 12
    var sampleRate = -1
    var dataOff = -1
    var dataLen = -1
    while (i + 8 <= bytes.length && (sampleRate < 0 || dataOff < 0)) {
      val id = new String(bytes, i, 4, "US-ASCII")
      val size = bb.getInt(i + 4)
      require(size >= 0 && i + 8 + size <= bytes.length,
        s"truncated chunk '$id' at byte $i: size $size, have ${bytes.length - i - 8}")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too short ($size bytes)")
          val fmt = bb.getShort(i + 8)
          val channels = bb.getShort(i + 10)
          val bits = bb.getShort(i + 22)
          require(fmt == 1, s"unsupported WAV format $fmt (PCM only)")
          require(channels == 1, s"unsupported channel count $channels (mono only)")
          require(bits == 16, s"unsupported sample width $bits (16-bit only)")
          sampleRate = bb.getInt(i + 12)
          require(sampleRate > 0, s"bad sample rate $sampleRate")
        case "data" =>
          require(size % 2 == 0, s"odd data chunk size $size for 16-bit samples")
          dataOff = i + 8; dataLen = size
        case _ => // foreign chunk (LIST, INFO, fact, ...): skip
      }
      i += 8 + size + (size & 1) // chunks pad to even offsets
    }
    require(sampleRate > 0, "missing fmt chunk")
    require(dataOff >= 0, "missing data chunk")
    val samples = new Array[Short](dataLen / 2)
    var j = 0
    while (j < samples.length) { samples(j) = bb.getShort(dataOff + 2 * j); j += 1 }
    AudioClip(sampleRate, samples)
  }

  /** Synthesis sample rate for manufactured clips (8 kHz telephony). */
  val SampleRate = 8000

  /** Documents → audio media: text bytes DELTA-encode into PCM16
    * samples (sᵢ = (bᵢ − bᵢ₋₁)·256, b₋₁ = 0) — a sign-oscillating,
    * full-scale waveform (plain (b−128) would leave every ASCII sample
    * negative and the zero-crossing statistic degenerate), so an
    * endianness or width bug in the codec shifts every downstream
    * statistic. Same contract as [[mediaFromDocs]]: deterministic, so
    * every feature is SQL-recomputable from the text bytes; a
    * production build swaps the payload source for real microphone
    * bytes. */
  def audioFromDocs(docs: DataFrame, skipNonAscii: Boolean = false): Dataset[Media] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // boundary valve for real corpora (one UTF-8 doc must not abort a
    // whole ingest): skipNonAscii drops non-ASCII docs DECLARATIVELY at
    // the synthesis boundary (the predicate reaches the scan), so the
    // loud per-byte contract below only ever fires on contract bugs,
    // not on data. Default stays loud — silently narrowing a corpus is
    // the worse failure for the oracle-checked fixtures.
    val base =
      if (skipNonAscii) docs.filter(col("text").rlike("^[\\x00-\\x7F]*$"))
      else docs
    base.select(col("doc_id").cast("long"), col("text"), col("source"))
      .as[(Long, String, String)]
      .mapPartitions(_.map { case (id, text, source) =>
        val tb = text.getBytes("UTF-8")
        val samples = new Array[Short](tb.length)
        var prev = 0
        var i = 0
        while (i < tb.length) {
          // ASCII-only synthesis contract (shared with the m7 oracle,
          // which reads CODEPOINTS via ascii(substr)): bytes ≥ 0x80
          // give |delta| up to 255, and delta·256 would silently wrap
          // past Short range — loud here, like every codec in the file
          require(tb(i) >= 0,
            s"audioFromDocs synthesizes from ASCII text only (doc $id has " +
              f"byte 0x${tb(i) & 0xff}%02x at offset $i); real audio enters " +
              "via decodeWav, not this synthesis stub")
          val b = tb(i) & 0xff
          samples(i) = ((b - prev) * 256).toShort // ASCII ⇒ |delta| ≤ 127 ⇒ |sample| ≤ 32512 fits
          prev = b
          i += 1
        }
        Media(id, encodeWav(samples, SampleRate), source, tb.length.toLong)
      })
  }

  /** Waveform statistics a real audio front-end computes before any
    * model sees the clip (all integer, engine ≡ oracle): duration,
    * total absolute amplitude (energy), peak, and the zero-crossing
    * count (sign(x) = x < 0 — a silence/noisiness signal; zero counts
    * as non-negative, deterministically). */
  final case class AudioFeatures(doc_id: Long, n_samples: Long, sample_rate: Long,
                                 duration_ms: Long, payload_bytes: Long,
                                 sum_abs: Long, peak: Long, zero_crossings: Long)

  /** Decode WAV payloads and emit waveform statistics — map-only, the
    * payload never leaves the executor; the same batch shape as every
    * other decoder in the family. */
  def audioFeatures(media: Dataset[Media]): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      val clip = decodeWav(m.payload)
      val s = clip.samples
      var sumAbs = 0L; var peak = 0L; var zc = 0L
      var i = 0
      while (i < s.length) {
        val a = math.abs(s(i).toLong)
        sumAbs += a
        if (a > peak) peak = a
        if (i > 0 && (s(i) < 0) != (s(i - 1) < 0)) zc += 1
        i += 1
      }
      AudioFeatures(m.doc_id, s.length.toLong, clip.sampleRate.toLong,
        s.length.toLong * 1000L / clip.sampleRate, m.payload.length.toLong,
        sumAbs, peak, zc)
    })
  }

  /** Audio embed stub — the AUDIO branch's entry into the standing
    * vector indexes, closing the media-similarity loop the image
    * branch has via [[embed]]→m4 (until round 15 the waveform
    * features terminated at statistics): dim d = the absolute-
    * amplitude sum over the d-th [[FrameStride]]-sample window of the
    * DECODED PCM16 waveform — the per-window energy profile an audio
    * front-end banks before any model sees the clip. Deterministic
    * and SQL-recomputable from the text bytes (each window sum ≤
    * 16·65280 < 2²⁴, exact in Float), so the full binary → decodeWav
    * → embed → trained-IVF pipeline is oracle-checkable; a production
    * build swaps ONLY this body for the audio-model call. Map-only;
    * payloads never leave the executor. */
  def audioEmbed(media: Dataset[Media], dims: Int = 16): Dataset[MediaEmbedding] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      val s = decodeWav(m.payload).samples
      val emb = new Array[Float](dims)
      var d = 0
      while (d < dims) {
        var sum = 0L
        var j = d * FrameStride
        val end = math.min(j + FrameStride, s.length)
        while (j < end) { sum += math.abs(s(j).toLong); j += 1 }
        emb(d) = sum.toFloat
        d += 1
      }
      MediaEmbedding(m.doc_id, emb)
    })
  }

  final case class SegmentEmbedding(seg_id: Long, embedding: Array[Float])

  /** Per-SEGMENT embed stub — the VIDEO branch's entry into the
    * standing vector indexes ([[sceneCuts]] emits the segments; this
    * gives each one a fixed-dim feature so "find similar shots" rides
    * the same trained IVF as the image (m4) and audio (m9) branches):
    * dim d = the window-sum of the segment's d-th frame, 0 past the
    * segment's end — the fixed-length head profile a real per-shot
    * embedding replaces (every sum ≤ 16·255, exact in Float).
    * Segmentation is the EXACT sceneCuts rule (|Δwindow-sum| >
    * threshold opens a segment; the first frame never cuts), applied
    * per doc sequentially — map-only, no window shuffle: a doc's
    * frames never leave its row. seg_id = doc_id·1000 + seg_idx —
    * LOUD past 1000 segments, because the packing is also the
    * oracle's contract. Empty payloads emit no segments. */
  def segmentEmbed(media: Dataset[Media], threshold: Long,
                   dims: Int = 16): Dataset[SegmentEmbedding] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { m =>
      val px = decodeNetpbm(m.payload).pixels
      val n = (px.length + FrameStride - 1) / FrameStride
      val ws = new Array[Long](n)
      var f = 0
      while (f < n) {
        var s = 0L
        var j = f * FrameStride
        val end = math.min(j + FrameStride, px.length)
        while (j < end) { s += px(j) & 0xffL; j += 1 }
        ws(f) = s
        f += 1
      }
      val segOf = new Array[Int](n)
      var seg = 0
      var i = 1
      while (i < n) {
        if (math.abs(ws(i) - ws(i - 1)) > threshold) seg += 1
        segOf(i) = seg
        i += 1
      }
      require(seg < 1000,
        s"doc ${m.doc_id}: ${seg + 1} segments exceed the seg_id packing (doc_id*1000 + seg)")
      val out = Seq.newBuilder[SegmentEmbedding]
      var start = 0
      var g = 0
      var k = 1
      while (k <= n) {
        if (k == n || segOf(k) != g) {
          val emb = new Array[Float](dims)
          var d = 0
          while (d < dims && start + d < k) { emb(d) = ws(start + d).toFloat; d += 1 }
          out += SegmentEmbedding(m.doc_id * 1000L + g, emb)
          start = k
          g += 1
        }
        k += 1
      }
      out.result()
    })
  }

  /** One decoded "frame": sampled position + pixel value + a windowed
    * stat over the following stride (a stand-in for per-frame features
    * like pixel means or audio chunk energy). */
  final case class Frame(idx: Int, offset: Long, value: Long, window_sum: Long)

  final case class MediaFrames(doc_id: Long, n_frames: Long, frames: Seq[Frame])

  /** Temporal segmentation over the decoded frame stream — the
    * shot/scene-cut detection step a video pipeline runs before
    * per-segment sampling (public practice: threshold the inter-frame
    * signal delta; here the deterministic window-sum stands in for the
    * histogram/SSIM delta a production build plugs in). A CUT opens a
    * new segment wherever |signal(i) − signal(i−1)| > threshold; each
    * segment emits (doc_id, seg_idx, first_frame, n_frames, seg_sum).
    * The first frame never cuts (lag is NULL → no jump), so segment 0
    * always exists and segments partition the frame stream exactly.
    *
    * Shape: map-only decode + explode, then ONE doc-keyed shuffle —
    * lag and the running cut count share the same window partitioning,
    * and the per-segment aggregate's keys are a superset of it (the
    * p26 proof pattern: no second exchange). Frames per doc are
    * bounded by payload size, so the window sort is bounded like the
    * packer's shards. */
  def sceneCuts(media: Dataset[Media], threshold: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy("doc_id").orderBy("idx")
    extractFrames(media).toDF()
      .select(col("doc_id"), explode(col("frames")).as("f"))
      .select(col("doc_id"), col("f.idx").as("idx"), col("f.window_sum").as("ws"))
      .withColumn("__cut",
        when(abs(col("ws") - lag(col("ws"), 1).over(byDoc)) > threshold, 1L)
          .otherwise(0L))
      .withColumn("seg_idx", sum(col("__cut")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "seg_idx").agg(
        min(col("idx")).cast("long").as("first_frame"),
        count(lit(1)).as("n_frames"),
        sum(col("ws")).as("seg_sum"))
  }

  /** Frame-level extraction with a NESTED output column
    * (array<struct>) — the schema shape real per-frame features
    * (embeddings, pixel stats) come back in — over the DECODED
    * raster. Map-only like the scalar path; downstream ops explode or
    * index the array lazily. */
  def extractFrames(media: Dataset[Media]): Dataset[MediaFrames] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      val px = decodeNetpbm(m.payload).pixels
      val frames = px.indices.by(FrameStride).zipWithIndex.map { case (off, i) =>
        var sum = 0L
        var j = off
        while (j < math.min(off + FrameStride, px.length)) { sum += px(j) & 0xffL; j += 1 }
        Frame(i, off.toLong, px(off) & 0xffL, sum)
      }
      MediaFrames(m.doc_id, frames.length.toLong, frames)
    })
  }
}
