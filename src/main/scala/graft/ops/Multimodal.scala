package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, batch-shaped decode/feature
  * pipelines as Dataset transforms.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic STUB (`stubDecode`) — what is real and
  * tested is the Spark side: schema, narrow per-row transforms (no shuffle
  * until an aggregation asks for one), fixed-width feature vectors ready
  * for the Similarity ops, and batch iteration via mapPartitions (the
  * Scala analog of a mapInPandas batch loop: one decoder instance per
  * partition, rows streamed through it).
  */
object Multimodal {

  final case class MediaRow(id: Long, kind: String, media: Array[Byte],
                            width: Int, height: Int)
  final case class MediaFeatures(id: Long, kind: String, byteLen: Long,
                                 features: Array[Float])

  /** derive a deterministic fake media table from a text table: payload =
    * utf8 bytes (stand-in for encoded image/audio), metadata from length */
  def fakeMediaTable(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .map { case (id, text) =>
        val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val kind = if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video"
        MediaRow(id, kind, bytes, width = 64 + (id % 64).toInt, height = 64)
      }
  }

  /** STUB decoder: a real pipeline would decode the codec here (PIL/ffmpeg
    * equivalent); this deterministic fake produces a 16-bin byte histogram
    * normalized to unit L1 mass — shape-compatible with a real embedding. */
  def stubDecode(media: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < media.length) {
      hist((media(i) & 0xff) >> 4) += 1f
      i += 1
    }
    if (media.nonEmpty) {
      var j = 0
      while (j < 16) { hist(j) /= media.length.toFloat; j += 1 }
    }
    hist
  }

  /** batched feature extraction: one "decoder" per partition, rows streamed
    * through it (mapInPandas-shaped, Scala-side) */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would happen here (codec contexts etc.)
      rows.map { r =>
        MediaFeatures(r.id, r.kind, r.media.length.toLong, stubDecode(r.media))
      }
    }
  }

  /** resize stub: keeps the plumbing honest — metadata transform + payload
    * passthrough (a real implementation re-encodes the payload) */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map(r => r.copy(width = w, height = h))
  }

  final case class FrameRow(id: Long, frame: Int, payload: Array[Byte])

  /** Frame sampling for video rows: a 1 -> N row expansion (flatMap — the
    * Spark plumbing a real decoder drives), emitting every `stride`-th
    * "frame". The DECODE is the stub: frames are fixed-size payload slices
    * standing in for decoded frames; the row-explosion shape, schema, and
    * per-partition batching are the real, tested parts. */
  def frameSample(media: Dataset[MediaRow], stride: Int = 2,
                  frameBytes: Int = 64): Dataset[FrameRow] = {
    require(stride >= 1 && frameBytes >= 1)
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      if (r.kind != "video") Iterator.empty
      else {
        val numFrames = math.max(1, r.media.length / frameBytes)
        (0 until numFrames by stride).iterator.map { f =>
          val lo = f * frameBytes
          val hi = math.min(r.media.length, lo + frameBytes)
          FrameRow(r.id, f, java.util.Arrays.copyOfRange(r.media, lo, math.max(lo, hi)))
        }
      }
    }
  }
}
