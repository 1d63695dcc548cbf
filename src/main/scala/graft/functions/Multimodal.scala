package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * processed per-partition in bounded batches.
  *
  * The decode step is STUBBED (this container ships no image/audio codecs):
  * [[decodeStub]] derives a deterministic fake "decoded frame set" from the
  * bytes themselves. Everything around it is the real Spark shape a
  * production decode would use:
  *   - payloads live in one `binary` column, metadata in scalar columns, so
  *     parquet stores payloads contiguously and scans prune them away when a
  *     query touches only metadata;
  *   - heavy per-record work runs in `mapPartitions` over an iterator (the
  *     Scala analog of `mapInPandas`' batch loop): constant memory per task,
  *     parallelism = partitions, no driver involvement;
  *   - output is a typed Dataset so downstream plans stay columnar.
  */
object Multimodal {

  /** A media record: opaque payload + typed metadata (the schema a 100 TB
    * media lake would carry per object).
    */
  final case class MediaRecord(
      doc_id: Long,
      media_type: String,
      payload: Array[Byte])

  /** Extracted features per record: byte length, frame count (one frame per
    * 64-byte window — the stub's stand-in for decoded frames / samples), and
    * a per-frame mean-byte "feature" vector.
    */
  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      byte_len: Long,
      n_frames: Long,
      frame_means: Array[Double])

  val FrameBytes = 64

  /** STUB decode: a real implementation would hand `payload` to an image /
    * audio codec here. The stub "decodes" 64-byte windows as frames and
    * emits each frame's mean byte value — deterministic, so tests and
    * oracles can pin the plumbing end-to-end.
    */
  def decodeStub(payload: Array[Byte]): Array[Double] =
    payload.grouped(FrameBytes).map { frame =>
      math.round(frame.map(b => (b & 0xff).toDouble).sum / frame.length * 100.0) / 100.0
    }.toArray

  /** Feature extraction over a Dataset of media records: per-partition
    * iterator processing, one record in flight at a time.
    */
  def extractFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        val means = decodeStub(r.payload)
        MediaFeatures(r.doc_id, r.media_type, r.payload.length.toLong,
          means.length.toLong, means)
      }
    }
  }

  /** Frame sampling: keep every `stride`-th decoded frame (the video
    * keyframe-sampling step). Pure per-record array work — composes inside
    * the same partition pass as the decode, no shuffle, no payload copies.
    */
  def frameSample(feats: Dataset[MediaFeatures], stride: Int): Dataset[MediaFeatures] = {
    import feats.sparkSession.implicits._
    feats.map { f =>
      val kept = f.frame_means.zipWithIndex
        .collect { case (m, i) if i % stride == 0 => m }
      f.copy(n_frames = kept.length.toLong, frame_means = kept)
    }
  }

  /** Resize the frame sequence to at most `target` frames by averaging
    * fixed-size groups (the thumbnail / temporal-downsample step). Group
    * means stay UNROUNDED — precision decisions belong to the consumer, and
    * the deterministic group boundaries (ceil(n/target), sequential sums)
    * keep the operator oracle-reproducible.
    */
  def resizeFrames(feats: Dataset[MediaFeatures], target: Int): Dataset[MediaFeatures] = {
    import feats.sparkSession.implicits._
    feats.map { f =>
      val n = f.frame_means.length
      if (n <= target) f
      else {
        val g = (n + target - 1) / target
        val resized = f.frame_means.grouped(g)
          .map(grp => grp.sum / grp.length).toArray
        f.copy(n_frames = resized.length.toLong, frame_means = resized)
      }
    }
  }

  /** Lift the documents table into a media table: UTF-8 text bytes as the
    * opaque payload (the deterministic stand-in for real image/audio blobs).
    */
  def documentsAsMedia(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id"),
      (when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video")).as("media_type"),
      col("text").cast(BinaryType).as("payload"))
      .as[MediaRecord]
  }
}
