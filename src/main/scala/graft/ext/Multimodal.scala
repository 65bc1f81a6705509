package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.Tables

/**
 * Multimodal column handling: media payloads as opaque `binary` columns
 * with typed metadata, plus a decode/feature-extract stage.
 *
 * The container has no image/audio codecs, so [[decodeStub]] is a
 * clearly-marked deterministic FAKE decoder; everything around it — the
 * binary column model, the metadata schema, the mapPartitions batch shape,
 * the partition-parallel execution — is the real plumbing a production
 * decoder drops into (swap `fakeDecode` for a JNI/codec call; the Spark
 * plan is unchanged). The `documents.text` bytes stand in for media blobs.
 *
 * Scale notes: decode runs per-partition with zero shuffle; binary payloads
 * stay off the driver; metadata extraction (sizes, hashes, headers) is pure
 * codegen'd column work. For real media one would also set
 * spark.sql.files.maxPartitionBytes so one partition's blobs fit in memory.
 */
object Multimodal {

  /** Media-ish frame: payload blob + typed metadata columns. */
  def mediaFrame(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents").select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      struct(
        col("source").as("origin"),
        col("n_chars").as("raw_size"),
        lit("text/fake").as("mime")).as("meta"))

  /**
   * Metadata extraction over binary payloads — pure column expressions:
   * byte length, content hash, 4-byte header (hex), and a frame count for
   * a fixed 256-byte "frame" size (how video frame-sampling bookkeeping
   * looks before the codec runs).
   */
  def mediaMetadata(spark: SparkSession, dir: String): DataFrame =
    mediaFrame(spark, dir).select(
        col("media_id"),
        col("meta.origin").as("origin"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("payload_md5"),
        lower(hex(substring(col("payload"), 1, 4))).as("header_hex"),
        ceil(octet_length(col("payload")).cast("double") / 256)
          .cast("long").as("n_frames"))
      .orderBy(col("media_id"))

  /**
   * Frame sampling: chunk each payload into fixed 256-byte "frames",
   * keep every `stride`-th one, emit per-frame metadata — the
   * bookkeeping half of video frame-sampling (the decode itself is the
   * [[decodeStub]] stage). The explode is per-row and shuffle-free; at
   * scale the frame stream stays co-partitioned with its media.
   */
  def frameSample(spark: SparkSession, dir: String,
      frameSize: Int = 256, stride: Int = 2): DataFrame =
    mediaFrame(spark, dir)
      .select(col("media_id"), col("payload"),
        octet_length(col("payload")).cast("long").as("n_bytes"))
      .select(col("media_id"), col("payload"),
        explode(sequence(lit(0L),
          ceil(col("n_bytes").cast("double") / frameSize).cast("long") - 1))
          .as("frame_idx"))
      .where(col("frame_idx") % stride === 0)
      .select(col("media_id"), col("frame_idx"),
        md5(expr(s"substring(payload, CAST(frame_idx * $frameSize + 1 AS INT), $frameSize)"))
          .as("frame_md5"),
        octet_length(expr(
          s"substring(payload, CAST(frame_idx * $frameSize + 1 AS INT), $frameSize)"))
          .cast("long").as("frame_bytes"))
      .orderBy(col("media_id"), col("frame_idx"))

  case class MediaIn(media_id: Long, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, width: Int, height: Int,
      channels: Int, feature: Array[Float])

  /**
   * STUB DECODER — deterministic fake standing in for an image/audio
   * decode (no codec libraries in this container). Derives pseudo
   * dimensions from the byte length and a 4-dim "embedding" from byte
   * sums. Replace the body with a real codec call to productionize; the
   * mapPartitions batch shape and the output schema are the real contract.
   */
  def decodeStub(frame: Dataset[MediaIn]): Dataset[MediaFeatures] = {
    import frame.sparkSession.implicits._
    frame.mapPartitions { it =>
      it.map { m =>
        val n = m.payload.length
        // ??? real decode goes here; deterministic fake below
        val w = 16 + (n % 64); val h = 16 + ((n / 64) % 64)
        val feat = Array.tabulate(4) { i =>
          val slice = m.payload.iterator.drop(i * n / 4).take(n / 4)
          slice.foldLeft(0L)((a, b) => a + (b & 0xff)).toFloat / math.max(1, n / 4)
        }
        MediaFeatures(m.media_id, w, h, 3, feat)
      }
    }
  }

  /**
   * STUB RESIZE — deterministic fake standing in for an image resize:
   * keeps every `factor`-th byte of the payload and scales the fake
   * dimensions accordingly. Replace the body with a real scaler; the
   * Dataset-to-Dataset shape (no shuffle, per-partition batches) is the
   * production contract.
   */
  def resizeStub(frame: Dataset[MediaIn], factor: Int = 4): Dataset[MediaIn] = {
    import frame.sparkSession.implicits._
    frame.mapPartitions(_.map { m =>
      // ??? real resample goes here; deterministic fake below
      val out = m.payload.zipWithIndex.collect {
        case (b, i) if i % factor == 0 => b
      }
      MediaIn(m.media_id, out)
    })
  }

  /** The decode pipeline end-to-end: frame → stub decode → features. */
  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val in = mediaFrame(spark, dir)
      .select(col("media_id"), col("payload")).as[MediaIn]
    decodeStub(in).toDF()
      .withColumn("feat_mean",
        round(aggregate(col("feature"), lit(0.0),
          (a, x) => a + x.cast("double")) / size(col("feature")), 4))
      .select(col("media_id"), col("width"), col("height"), col("channels"),
        col("feat_mean"))
      .orderBy(col("media_id"))
  }
}
