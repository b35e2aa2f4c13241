package graft.llm

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video travel
  * as opaque `binary` columns next to typed metadata, processed per-partition
  * in batches (the Scala analogue of `mapInPandas`: one iterator of rows per
  * partition, shared decoder state per partition, explicit output schema).
  *
  * The actual codecs are STUBBED — this container ships no image/audio
  * libraries — with deterministic byte-derived fakes, clearly marked below.
  * Schema, partitioning, batch shape, and the operator signatures are real
  * and tested; swapping in a real decoder changes only the marked function
  * bodies.
  */
object MultimodalOps {

  /** Make an opaque media column from any string column (test stand-in for
    * reading real image/audio bytes). */
  def asMedia(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("media_id"),
      encode(col(textCol), "UTF-8").as("media"),
      lit("application/octet-stream").as("media_type"))

  private val metaSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("format", StringType)))

  /** "Decode" each media blob to image metadata.
    *
    * STUB: a real implementation would parse the image header (JPEG/PNG) —
    * no codec ships in this container, so width/height derive
    * deterministically from the byte length. The mapPartitions shape (one
    * decoder per partition, iterator-in/iterator-out batches) is the real
    * production plumbing.
    */
  def decodeImageMeta(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("media")).mapPartitions { rows =>
      // per-partition decoder state would be initialized here (real codec)
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val n = if (bytes == null) 0 else bytes.length
        // STUB decode: deterministic fake dimensions from byte length
        val width = 16 + n % 240
        val height = 16 + (n * 7) % 240
        Row(id, n, width, height, 3, "stub")
      }
    }(Encoders.row(metaSchema))

  private val frameSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("frame_ts_ms", LongType),
    StructField("frame", BinaryType)))

  /** Sample `n` frames per media blob (video frame-sampling plumbing).
    * STUB: frames are byte slices; a real impl would seek+decode. 1→N row
    * explosion, schema, and ordering are real. */
  def sampleFrames(media: DataFrame, n: Int, frameMs: Long = 40L): DataFrame =
    media.select(col("media_id"), col("media")).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        if (bytes == null || bytes.isEmpty) Iterator.empty
        else (0 until n).iterator.map { i =>
          val start = (bytes.length.toLong * i / n).toInt
          val end = math.min(bytes.length, start + 16)
          Row(id, i, i * frameMs, java.util.Arrays.copyOfRange(bytes, start, end))
        }
      }
    }(Encoders.row(frameSchema))

  /** Byte-level feature extraction: a deterministic 16-dim embedding from
    * rolling byte statistics. STUB for a real vision/audio encoder; the
    * Array[Float] output column matches the `embeddings` table shape. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("features", ArrayType(FloatType))))
    media.select(col("media_id"), col("media")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.empty[Byte])
        val acc = new Array[Float](16)
        var i = 0
        while (i < bytes.length) {
          acc(i % 16) += (bytes(i) & 0xff) / 255.0f
          i += 1
        }
        val norm = math.max(1, bytes.length / 16)
        Row(id, acc.map(_ / norm).toIndexedSeq)
      }
    }(Encoders.row(schema))
  }
}
