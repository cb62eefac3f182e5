package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `BINARY` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * The decode step is a clearly-marked deterministic STUB (the real codec /
  * model libraries are not in this container); everything Spark-side —
  * schema, Dataset encoders, mapPartitions batch shape, metadata contract —
  * is real. A real decoder slots into `decodeBatch` unchanged: it receives
  * an iterator of (id, bytes) per partition, exactly the shape batched
  * inference wants (cf. the reference's implicit-embedding boundary,
  * `email_fetching.py:54-57`, made explicit here).
  *
  * Scale: decoding is narrow (no shuffle); partition size bounds batch
  * memory. Binary payloads stay columnar in parquet; metadata columns are
  * scalar so filters on them prune without touching the blobs.
  */
object Multimodal {

  /** A media row: opaque payload + its declared kind. */
  case class MediaRow(id: Long, kind: String, bytes: Array[Byte])

  /** Typed decode output — the metadata a real decoder would produce. */
  case class MediaMeta(id: Long, kind: String, byte_len: Long,
                       width: Long, height: Long, n_frames: Long)

  /** STUB decode: deterministic fake deriving plausible metadata from the
    * payload alone. Replace the body with a real codec call; the signature
    * (partition iterator → iterator, i.e. one batch per partition) is the
    * real contract.
    */
  def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaMeta] =
    rows.map { r =>
      val len = r.bytes.length.toLong
      MediaMeta(r.id, r.kind, len,
        width = 16L + len % 64,
        height = 16L + (len / 64) % 64,
        n_frames = if (r.kind == "video") 1L + len % 7 else 1L)
    }

  /** Dataset pipeline: (id, kind, bytes) → decoded metadata. */
  def decode(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(decodeBatch)
  }

  /** Frame-sample STUB for video rows: every `stride`-th frame index. */
  def sampleFrames(meta: Dataset[MediaMeta], stride: Int = 2): DataFrame = {
    import meta.sparkSession.implicits._
    meta.filter(_.kind == "video")
      .select(col("id"), col("n_frames"),
        sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong)).as("frame_idx"))
  }

  /** Build a media Dataset from any (id, text-ish) source by treating the
    * UTF-8 bytes as the payload — the in-repo stand-in for reading real
    * blobs via `spark.read.format("binaryFile")`.
    */
  def fromText(df: DataFrame, idCol: String, textCol: String, kind: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).as("id"), lit(kind).as("kind"),
        encode(col(textCol), "UTF-8").as("bytes"))
      .as[MediaRow]
  }
}
