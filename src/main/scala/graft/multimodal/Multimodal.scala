package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: media payloads as opaque `binary` columns with a
  * typed metadata struct, processed by a per-partition typed pipeline.
  *
  * The decode step is a STUB (image/audio codecs are not in this
  * container): `decodeStub` stands in for e.g. a JPEG decode and is a
  * deterministic byte-level computation, so the full Spark plumbing —
  * binary column, partition-wise batch iteration, typed output schema —
  * is real and verified end-to-end. A production build swaps ONLY the
  * body of `decodeStub` for the codec call; the distributed shape
  * (map-only `mapPartitions` over binary payloads, no shuffle, no
  * driver involvement) is exactly what runs at 100 TB.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata (the reference keeps
    * arbitrary props next to entity ids the same way). */
  final case class Media(doc_id: Long, payload: Array[Byte], meta_source: String, meta_len: Long)

  /** Features a decoder would emit: size, a deterministic checksum, and
    * frame-sample stats (every `stride`-th byte = "frame"). */
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, checksum: Long, n_frames: Long, first_byte: Long)

  val FrameStride = 16

  /** decode STUB — byte-level stand-in for a real image/audio decode. */
  def decodeStub(m: Media): MediaFeatures = {
    val bytes = m.payload
    var checksum = 0L
    var i = 0
    while (i < bytes.length) { checksum = (checksum + (bytes(i) & 0xffL)) % 997L; i += 1 }
    val nFrames = (bytes.length + FrameStride - 1) / FrameStride
    MediaFeatures(m.doc_id, bytes.length.toLong, checksum, nFrames.toLong,
      if (bytes.nonEmpty) (bytes(0) & 0xffL) else -1L)
  }

  /** Documents → media table: payload = UTF-8 bytes standing in for an
    * encoded image; metadata stays a typed column. */
  def mediaFromDocs(docs: DataFrame): Dataset[Media] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").cast("long").as("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      col("source").as("meta_source"),
      length(col("text")).cast("long").as("meta_len")).as[Media]
  }

  /** The typed feature-extraction pipeline: batch-shaped partition-wise
    * processing (the Scala analog of `mapInPandas` batches). */
  def extractFeatures(media: Dataset[Media]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map(decodeStub))
  }

  def features(spark: SparkSession, docs: DataFrame): DataFrame =
    extractFeatures(mediaFromDocs(docs)).toDF()

  final case class ResizedMedia(doc_id: Long, payload: Array[Byte],
                                meta_source: String, orig_bytes: Long, new_bytes: Long)

  /** Resize STUB — stand-in for an image resize / audio resample:
    * block-average the payload by `factor` (the byte-level analog of
    * average-pool downsampling), emitting a NEW smaller binary payload
    * so resized media flows through the same decode/feature/frame
    * operators. Map-only, no shuffle, payload never leaves the
    * executor; a production build swaps only the block loop for the
    * codec's resampler. */
  def resize(media: Dataset[Media], factor: Int): Dataset[ResizedMedia] = {
    require(factor >= 1, "resize factor must be >= 1")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      val bytes = m.payload
      val out = new Array[Byte]((bytes.length + factor - 1) / factor)
      var b = 0
      while (b < out.length) {
        val start = b * factor
        val end = math.min(start + factor, bytes.length)
        var sum = 0L
        var j = start
        while (j < end) { sum += bytes(j) & 0xffL; j += 1 }
        out(b) = (sum / (end - start)).toByte
        b += 1
      }
      ResizedMedia(m.doc_id, out, m.meta_source, bytes.length.toLong, out.length.toLong)
    })
  }

  /** Resized media re-enters the pipeline as ordinary Media — resize →
    * decode → features composes in one map-only plan. */
  def asMedia(resized: Dataset[ResizedMedia]): Dataset[Media] = {
    val spark = resized.sparkSession
    import spark.implicits._
    resized.map(r => Media(r.doc_id, r.payload, r.meta_source, r.new_bytes))
  }

  final case class MediaEmbedding(doc_id: Long, embedding: Array[Float])

  /** Embed STUB — stand-in for an image/audio embedding model: dims
    * frame-window byte sums as floats (exact: sums stay far below
    * 2^24), zero-padded. Deterministic and SQL-recomputable, so the
    * full binary → embed → ANN pipeline is oracle-checkable; a
    * production build swaps only this body for the model call. The
    * shape is the thing: one map-only typed pass emits the
    * `Array[Float]` column every `graft.ann` operator consumes. */
  def embed(media: Dataset[Media], dims: Int = 16): Dataset[MediaEmbedding] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      val bytes = m.payload
      val emb = new Array[Float](dims)
      var d = 0
      while (d < dims) {
        val start = d * FrameStride
        var sum = 0L
        var j = start
        while (j < math.min(start + FrameStride, bytes.length)) { sum += bytes(j) & 0xffL; j += 1 }
        emb(d) = sum.toFloat
        d += 1
      }
      MediaEmbedding(m.doc_id, emb)
    })
  }

  /** One decoded "frame": sampled position + byte value + a windowed
    * stat over the following stride (a stand-in for per-frame features
    * like pixel means or audio chunk energy). */
  final case class Frame(idx: Int, offset: Long, value: Long, window_sum: Long)

  final case class MediaFrames(doc_id: Long, n_frames: Long, frames: Seq[Frame])

  /** Frame-level extraction with a NESTED output column
    * (array<struct>) — the schema shape real per-frame features
    * (embeddings, pixel stats) come back in. Map-only like the scalar
    * path; downstream ops explode or index the array lazily. */
  def extractFrames(media: Dataset[Media]): Dataset[MediaFrames] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      val bytes = m.payload
      val frames = bytes.indices.by(FrameStride).zipWithIndex.map { case (off, i) =>
        var sum = 0L
        var j = off
        while (j < math.min(off + FrameStride, bytes.length)) { sum += bytes(j) & 0xffL; j += 1 }
        Frame(i, off.toLong, bytes(off) & 0xffL, sum)
      }
      MediaFrames(m.doc_id, frames.length.toLong, frames)
    })
  }
}
