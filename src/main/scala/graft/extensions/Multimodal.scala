package graft.extensions

import graft.Ctx
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata,
  * processed in executor-side batches via mapPartitions over a typed
  * Dataset — the Scala analogue of mapInPandas batch UDF processing.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic stand-in for the real decoder (it computes
  * cheap byte statistics). Everything around it — the binary column, the
  * metadata struct, the per-partition batch iteration, the output schema —
  * is the real plumbing a decode/resize/feature-extract stage needs, and is
  * partition-parallel (no shuffle: map-only over the scan).
  */
object Multimodal {

  /** One media record: payload + typed metadata (the schema a real pipeline
    * would carry for images/audio: id, modality tag, source, size). */
  final case class MediaRecord(
    media_id: Long, modality: String, source: String,
    declared_size: Long, payload: Array[Byte])

  final case class MediaFeatures(
    media_id: Long, modality: String, source: String,
    byte_length: Long, first_byte: Int, checksum64: Long)

  /** The `documents` table viewed as a media table: text bytes become the
    * opaque binary payload (stand-in for image/audio bytes). */
  def mediaTable(ctx: Ctx): DataFrame =
    ctx.tbl("documents").select(
      col("doc_id").as("media_id"),
      lit("text").as("modality"),
      col("source"),
      col("n_chars").cast("long").as("declared_size"),
      encode(col("text"), "UTF-8").as("payload"))

  /** STUB decoder — deterministic byte statistics in place of a real
    * image/audio decode. Real implementation would decode payload batches
    * here (one codec init per partition, batched I/O). */
  private def decodeStub(r: MediaRecord): MediaFeatures = {
    val bytes = r.payload
    val first = if (bytes.nonEmpty) bytes(0) & 0xff else -1
    var sum = 0L
    var i = 0
    while (i < math.min(bytes.length, 64)) { sum += (bytes(i) & 0xff); i += 1 }
    MediaFeatures(r.media_id, r.modality, r.source,
      bytes.length.toLong, first, sum % 997)
  }

  /** Batched feature extraction: typed Dataset -> mapPartitions (codec init
    * once per partition) -> typed features. Map-only, scales with input. */
  def mediaFeatures(ctx: Ctx): DataFrame = {
    val spark = ctx.spark
    import spark.implicits._
    val ds: Dataset[MediaRecord] = mediaTable(ctx).as[MediaRecord]
    ds.mapPartitions { it =>
      // real pipeline: initialize decoder/codec once here
      it.map(decodeStub)
    }.toDF()
  }

  final case class Resized(
    media_id: Long, modality: String, original_bytes: Long,
    resized_bytes: Int, pad_bytes: Int, was_truncated: Boolean,
    resized_checksum: Long)

  /** Resize: normalize every payload to a fixed `target` byte length —
    * truncate long payloads, zero-pad short ones — the batch-shape stand-in
    * for image resize / audio resample (fixed-size tensors out regardless of
    * input size). Same mapPartitions structure; zero padding contributes
    * nothing to the checksum stub, mirroring how letterbox padding carries
    * no signal. */
  def mediaResize(ctx: Ctx, target: Int = 64): DataFrame = {
    val spark = ctx.spark
    import spark.implicits._
    mediaTable(ctx).as[MediaRecord].mapPartitions { it =>
      // real pipeline: initialize the resize kernel once here
      it.map { r =>
        val n = math.min(r.payload.length, target)
        var sum = 0L
        var i = 0
        while (i < n) { sum += (r.payload(i) & 0xff); i += 1 }
        Resized(r.media_id, r.modality, r.payload.length.toLong,
          target, math.max(0, target - r.payload.length),
          r.payload.length > target, sum % 997)
      }
    }.toDF()
  }

  final case class Frame(
    media_id: Long, frame_idx: Int, frame_bytes: Int, frame_checksum: Long)

  /** Frame sampling: each payload is treated as a sequence of fixed-size
    * frames and every `stride`-th full frame is emitted as its own row —
    * the one-record-in, many-frames-out shape of video frame extraction.
    * flatMap inside mapPartitions keeps the decode-batch structure of
    * [[mediaFeatures]] (codec init once per partition, rows stream out);
    * map-only, no shuffle, output size = input frames / stride. The frame
    * "decode" is the same deterministic byte-checksum stub. */
  def frameSample(ctx: Ctx, frameBytes: Int = 32, stride: Int = 4): DataFrame = {
    val spark = ctx.spark
    import spark.implicits._
    mediaTable(ctx).as[MediaRecord].mapPartitions { it =>
      // real pipeline: initialize the demuxer/decoder once here
      it.flatMap { r =>
        val nFrames = r.payload.length / frameBytes
        (0 until nFrames by stride).iterator.map { i =>
          val off = i * frameBytes
          var sum = 0L
          var j = off
          while (j < off + frameBytes) { sum += (r.payload(j) & 0xff); j += 1 }
          Frame(r.media_id, i, frameBytes, sum % 997)
        }
      }
    }.toDF()
  }
}
