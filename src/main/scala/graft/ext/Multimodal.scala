package graft.ext

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed partition-wise through a typed Dataset (the Scala
  * analog of mapInPandas batch UDFs).
  *
  * The actual media decode is STUBBED (no image/audio libraries in this
  * environment): `FakeDecoder` derives deterministic "decoded" properties
  * from the payload's md5, so the Spark-side plumbing — binary schema,
  * partition-wise batching, typed output schema — is real and testable, and
  * the DuckDB oracle can reproduce the stub arithmetic exactly. Swapping
  * `FakeDecoder.decode` for a real JNI/library call is the only change needed
  * in production.
  *
  * Scale notes: decode is a narrow mapPartitions (no shuffle); payloads never
  * pass through an aggregation, and metadata extraction keeps only small
  * typed columns so downstream pruning drops the heavy binary column early.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, n_bytes: Long, content_hash: String,
                       width: Long, height: Long, n_frames: Long)

  private[ext] def md5Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes).map("%02x".format(_)).mkString

  /** Deterministic stand-in for an image/video decoder. */
  object FakeDecoder {
    def decode(payload: Array[Byte]): (String, Long, Long, Long) = {
      val hex = md5Hex(payload)
      val h = java.lang.Long.parseLong(hex.substring(0, 8), 16)
      val width = 160L + (h % 8) * 80L
      val height = 120L + ((h / 8) % 8) * 60L
      val frames = 1L + (h % 16)
      (hex, width, height, frames)
    }
  }

  /** Documents → media table: text bytes standing in for media payloads. */
  def asMedia(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** Partition-wise decode: one decoder instance per partition (the
    * expensive-initialization pattern real decoders need), rows streamed
    * through it in batch.
    */
  def decodeMeta(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val (hex, w, h, f) = FakeDecoder.decode(r.payload)
        MediaMeta(r.doc_id, r.payload.length.toLong, hex, w, h, f)
      }
    }.toDF()
  }

  case class MediaResized(doc_id: Long, w_in: Long, h_in: Long,
                          w_out: Long, h_out: Long, n_bytes_out: Long,
                          resized_hash: String)
  case class MediaFeatures(doc_id: Long, features: Array[Long])

  /** Resize plumbing: decode (stub) → resize to a fixed target → re-encoded
    * payload summary. The resized payload is represented by its content hash
    * (md5 over payload ++ "WxH" — deterministic, oracle-reproducible) and
    * the raw-RGB output size; a real pipeline swaps the hash line for the
    * actual scaler. Narrow mapPartitions, one decoder per partition, binary
    * column dropped on output.
    */
  def resize(spark: SparkSession, media: DataFrame,
             wOut: Long = 224L, hOut: Long = 224L): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val (_, w, h, _) = FakeDecoder.decode(r.payload)
        val hex = md5Hex(r.payload ++ s"${wOut}x$hOut".getBytes("UTF-8"))
        MediaResized(r.doc_id, w, h, wOut, hOut, wOut * hOut * 3L, hex)
      }
    }.toDF()
  }

  /** Feature-extraction plumbing: media → fixed-width feature vector (the
    * embed-the-image step). The stub derives 8 features from 4-hex-char
    * slices of the payload md5 — integer-valued so the oracle matches
    * exactly; a real pipeline replaces the slice loop with a model forward
    * pass. The feature column is a genuine Array column, so downstream
    * similarity operators (Similarity.*) consume it unchanged.
    */
  val NumFeatures = 8

  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val hex = md5Hex(r.payload)
        val feats = Array.tabulate(NumFeatures) { i =>
          java.lang.Long.parseLong(hex.substring(i * 4, i * 4 + 4), 16)
        }
        MediaFeatures(r.doc_id, feats)
      }
    }.toDF()
  }

  /** Frame sampling stub: every `stride`-th "frame" of the payload (fixed
    * 64-byte frames), as (doc_id, frame_idx, frame_hash) — the shape a video
    * pipeline fans out to, kept fully deterministic.
    *
    * Frames are BYTE-indexed (media payloads have no character semantics).
    * The DuckDB oracle slices characters, so the verification query restricts
    * to payloads whose byte and char lengths agree (ASCII), where the two
    * framings coincide exactly — see SparkEntry `ext_frame_sample`.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, stride: Int = 4): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].flatMap { r =>
      val frames = r.payload.grouped(64).toArray
      frames.indices.by(stride).map { i =>
        (r.doc_id, i.toLong, md5Hex(frames(i)))
      }
    }.toDF("doc_id", "frame_idx", "frame_hash")
  }

  /** Media similarity search — the step that closes the multimodal loop
    * (decode → feature vector → nearest neighbor), i.e. image/video
    * near-dup detection over extracted features. Candidates come from a
    * coarse sign-bit bucket over the feature dimensions (each dim
    * contributes its high bit — 2^NumFeatures buckets, the sign-LSH
    * posture of [[Similarity.signBucket]] applied to integer features),
    * then the exact integer squared distance ranks within buckets;
    * items alone in their bucket are absent, approximate by design.
    * Everything downstream of [[extractFeatures]] is exact integer, so the
    * whole pipeline sits under the hash oracle — with a real model's float
    * embeddings, this operator is [[Similarity]]'s cosine family instead.
    */
  def mediaTopNeighbor(spark: SparkSession, media: DataFrame,
                       maxBucket: Int = Similarity.MaxBucket): DataFrame =
    Similarity.bucketedTop1Neighbor(
      extractFeatures(spark, media)
        .withColumn("bucket", expr(
          """aggregate(
            |  zip_with(features, sequence(0, size(features) - 1),
            |    (x, i) -> IF(x >= 32768L, shiftleft(1L, i), 0L)),
            |  0L, (a, x) -> a + x)""".stripMargin)),
      "bucket", "doc_id", "features", maxBucket)
}
