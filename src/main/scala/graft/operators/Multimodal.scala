package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (binary-column) plumbing for a training-data pipeline:
  * image/audio/video content as opaque BINARY columns with typed metadata,
  * batched per-partition feature extraction, and oracle-checkable
  * native-function features (byte length, md5) where no decoder is needed.
  *
  * The actual media decode is STUBBED (no image/audio libs in this
  * container): `DeterministicFakeDecoder` derives fake-but-stable
  * "features" from the bytes. The Spark-side plumbing — schema, binary
  * column handling, partition-batched extraction, feature schema — is real
  * and tested; swap the decoder to go live.
  */
object Multimodal {

  /** Extracted feature row. width/height/duration are decoder outputs —
    * fake here, real with a real decoder.
    */
  case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      content_md5: String,
      width: Int,
      height: Int,
      embedding: Array[Float])

  /** Decoder contract: one batch of (id, type, bytes) per call — the same
    * batch shape a Pandas-UDF/mapInPandas implementation would see, so a
    * vectorized decoder drops in without plan changes.
    */
  trait MediaDecoder extends Serializable {
    def decodeBatch(rows: Iterator[(Long, String, Array[Byte])]): Iterator[MediaFeatures]
  }

  /** STUB decoder: deterministic fake decode. A real implementation would
    * decode image bytes (e.g. JPEG → WxH + a CNN embedding); that step is
    * the only ??? here.
    */
  object DeterministicFakeDecoder extends MediaDecoder {
    def decodeBatch(rows: Iterator[(Long, String, Array[Byte])]): Iterator[MediaFeatures] =
      rows.map { case (id, mtype, bytes) =>
        val md5 = java.security.MessageDigest.getInstance("MD5").digest(bytes)
        val hex = md5.map("%02x".format(_)).mkString
        // fake dimensions from the hash — stable stand-ins for real decode
        val w = 64 + (java.lang.Byte.toUnsignedInt(md5(0)) % 64)
        val h = 64 + (java.lang.Byte.toUnsignedInt(md5(1)) % 64)
        val emb = Array.tabulate(8)(i =>
          (java.lang.Byte.toUnsignedInt(md5(i % md5.length)) / 255.0f))
        MediaFeatures(id, mtype, bytes.length.toLong, hex, w, h, emb)
      }
  }

  /** Stand-in media table: document text bytes as the binary payload
    * (deterministic; real pipelines read image/audio files the same way —
    * `spark.read.format("binaryFile")`).
    */
  def synthesizeMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("text/plain").as("media_type"),
      col("text").cast("binary").as("content"))

  /** Partition-batched feature extraction through the decoder — the
    * mapInPandas-shaped path. One decoder call per partition batch, rows
    * streamed, nothing collected.
    */
  def extractFeatures(
      spark: SparkSession, media: DataFrame, decoder: MediaDecoder): DataFrame = {
    import spark.implicits._
    media
      .select(col("media_id").cast("long"), col("media_type"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(rows => decoder.decodeBatch(rows))
      .toDF()
  }

  /** Frame sampling: split the binary payload into fixed-size "frames" and
    * keep every `every`-th one — the video-pipeline access pattern (decode
    * is per-frame downstream). Pure built-ins: `substring` works on BINARY,
    * frames stay opaque bytes; md5 fingerprints make the output
    * deterministic and small.
    */
  def frameSample(media: DataFrame, frameBytes: Int, every: Int): DataFrame =
    media
      .select(
        col("media_id"),
        posexplode(transform(
          sequence(lit(0),
            greatest(floor((length(col("content")) - 1) / frameBytes).cast("int"), lit(0))),
          i => substring(col("content"), (i * frameBytes + 1).cast("int"), lit(frameBytes))))
          .as(Seq("frame_idx", "frame")))
      .where(col("frame_idx") % every === 0 && length(col("frame")) > 0)
      .select(
        col("media_id"), col("frame_idx"),
        length(col("frame")).cast("long").as("frame_bytes"),
        md5(col("frame")).as("frame_md5"))
      .orderBy(col("media_id"), col("frame_idx"))

  /** Resize stub: recompute target dimensions preserving aspect ratio —
    * the metadata side of a resize; actual pixel resampling would live in
    * the decoder (the ??? of this container).
    */
  def resizeMeta(features: DataFrame, maxSide: Int): DataFrame =
    features.select(
      col("media_id"), col("width"), col("height"),
      least(lit(maxSide) / greatest(col("width"), col("height")).cast("double"), lit(1.0))
        .as("scale"))
      .select(
        col("media_id"),
        round(col("width") * col("scale")).cast("int").as("resized_w"),
        round(col("height") * col("scale")).cast("int").as("resized_h"))

  /** Native-function feature subset — no decoder, pure codegen'd built-ins
    * (octet length + md5), hence DuckDB-oracle-checkable end to end.
    */
  def binaryStats(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("media_type"),
      length(col("content")).cast("long").as("n_bytes"),
      md5(col("content")).as("content_md5"))
      .orderBy(col("media_id"))
}
