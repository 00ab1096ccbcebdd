package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize /
  * frame-sample operators.
  *
  * The Spark-side plumbing here is real and tested — schemas, partition
  * behavior, batch-shaped `mapPartitions` processing (the Scala analog of
  * `mapInPandas`: one iterator per partition, decoder state initialized
  * once per partition, never per row). The codec itself is STUBBED with a
  * deterministic fake (this container ships no image/audio libraries):
  * [[StubCodec]] derives pixel/sample statistics from the bytes' md5, so
  * outputs are reproducible and the stub swaps for a real decoder without
  * touching any plumbing.
  *
  * Scale notes: binary payloads ride through scans untouched (parquet
  * stores them as BYTE_ARRAY; column pruning means media bytes are read
  * ONLY by operators that need them). Decode is embarrassingly parallel —
  * no shuffle — and `spark.sql.files.maxPartitionBytes` sizes partitions
  * so a partition of blobs fits executor memory.
  */
object Multimodal {

  /** Canonical media table schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true))),
      nullable = true)))

  /** Deterministic stand-in for a real image/audio codec. A real
    * deployment replaces these bodies with JNI/javacpp calls; signatures
    * and batch shape stay identical.
    */
  object StubCodec {
    private def digest(bytes: Array[Byte]): Array[Byte] =
      java.security.MessageDigest.getInstance("MD5").digest(bytes)

    /** "Decode" an image: byte count + md5-derived channel means. */
    def imageStats(bytes: Array[Byte]): (Int, Double, Double, Double) = {
      val d = digest(bytes)
      (bytes.length,
        (d(0) & 0xff) / 255.0, (d(1) & 0xff) / 255.0, (d(2) & 0xff) / 255.0)
    }

    /** "Extract" a fixed-width embedding from any payload. */
    def embed(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var block = digest(bytes)
      var i = 0
      while (i < dim) {
        if (i % 16 == 0 && i > 0) block = digest(block)
        out(i) = ((block(i % 16) & 0xff) - 127.5f) / 127.5f
        i += 1
      }
      out
    }

    /** "Resize": deterministic re-encode marker (length-preserving stub). */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      digest(bytes) ++ Array(((w >> 8) & 0xff).toByte, (w & 0xff).toByte,
        ((h >> 8) & 0xff).toByte, (h & 0xff).toByte)
  }

  private val statsSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("mean_r", DoubleType, nullable = false),
    StructField("mean_g", DoubleType, nullable = false),
    StructField("mean_b", DoubleType, nullable = false)))

  /** Decode + per-item stats via mapPartitions: codec initialized once per
    * partition, rows processed as a stream (constant memory per partition).
    */
  def decodeStats(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(statsSchema)
    media.select("media_id", "kind", "bytes").mapPartitions { it =>
      // per-partition init point (real codecs allocate contexts here)
      it.map { r =>
        val (n, mr, mg, mb) = StubCodec.imageStats(r.getAs[Array[Byte]]("bytes"))
        Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"), n, mr, mg, mb)
      }
    }(enc)
  }

  private val embedSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false),
      nullable = false)))

  /** Feature extraction: binary -> Array[Float] embedding column, ready for
    * [[Similarity]] knn/dedup operators downstream.
    */
  def featureExtract(media: DataFrame, dim: Int = 64): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(embedSchema)
    media.select("media_id", "bytes").mapPartitions { it =>
      it.map(r => Row(r.getAs[Long]("media_id"),
        StubCodec.embed(r.getAs[Array[Byte]]("bytes"), dim).toSeq))
    }(enc)
  }

  /** Resize: returns the same table shape with transformed bytes and
    * updated metadata — composable with further media ops.
    */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    media.select("media_id", "kind", "bytes", "meta").mapPartitions { it =>
      it.map { r =>
        Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"),
          StubCodec.resize(r.getAs[Array[Byte]]("bytes"), w, h),
          Row(w, h, null, null))
      }
    }(enc)
  }

  /** Frame sampling for video payloads: explode each video into every k-th
    * frame index with a per-frame pseudo-decode. Pure column program (the
    * frame index fan-out is `explode(sequence(...))`, not driver-side).
    */
  def sampleFrames(media: DataFrame, everyK: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("bytes"),
        coalesce(col("meta.n_frames"), lit(1)).as("n_frames"))
      .select(col("media_id"), col("bytes"),
        explode(sequence(lit(0),
          greatest(col("n_frames") - 1, lit(0)), lit(everyK))).as("frame_idx"))
      .select(col("media_id"), col("frame_idx"),
        md5(concat(col("bytes"), col("frame_idx").cast("string").cast("binary")))
          .as("frame_digest"))
}
