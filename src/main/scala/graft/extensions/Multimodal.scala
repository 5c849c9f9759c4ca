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
}
