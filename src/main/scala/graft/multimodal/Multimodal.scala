package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media as opaque `binary` columns + typed metadata structs,
  * processed in partition-local batches.
  *
  * The DECODE step is a clearly-marked deterministic STUB — the container
  * has no image/audio codecs — but everything Spark-side is real and tested:
  * schema shape, `mapPartitions` batching with an explicit Row encoder,
  * partition sizing by byte budget, and feature-column output shape. A real
  * deployment swaps [[FeatureExtractor.stub]] for a codec-backed extractor
  * with the same signature.
  */
object Multimodal {

  val MetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** content + metadata schema for a media table. */
  def mediaSchema(idType: DataType = LongType): StructType = StructType(Seq(
    StructField("media_id", idType),
    StructField("content", BinaryType),
    StructField("meta", MetaType)))

  /** A batch-oriented media→feature function: bytes in, fixed-dim float
    * features out. Implementations must be deterministic per byte content. */
  trait FeatureExtractor extends Serializable {
    def dims: Int
    def extract(content: Array[Byte]): Array[Float]
  }

  object FeatureExtractor {
    /** STUB decode: a real implementation would decode the media here
      * (JPEG/PNG/WAV codec) and run a feature net. This stand-in derives
      * deterministic pseudo-features from a rolling byte hash so pipelines
      * are fully testable without codecs. */
    def stub(featureDims: Int): FeatureExtractor = new FeatureExtractor {
      val dims = featureDims
      def extract(content: Array[Byte]): Array[Float] = {
        val out = new Array[Float](dims)
        var h = 1125899906842597L
        var i = 0
        while (i < content.length) {
          h = 31 * h + content(i)
          out(i % dims) += (h % 1000).toFloat / 1000f
          i += 1
        }
        out
      }
    }
  }

  /** Parse a metadata struct from the (stub) media header: first 4 bytes →
    * format tag, next bytes → fake dimensions. Deterministic, tested shape. */
  def attachMeta(df: DataFrame, contentCol: String = "content"): DataFrame = {
    val c = col(contentCol)
    df.withColumn("meta", struct(
      when(length(c) >= 4, substring(c.cast("string"), 1, 4)).otherwise(lit("bin"))
        .as("format"),
      (pmod(crc32(c), lit(1920)) + 1).cast("int").as("width"),
      (pmod(crc32(c), lit(1080)) + 1).cast("int").as("height"),
      length(c).cast("long").as("duration_ms")))
  }

  /** Partition-local batched feature extraction over the binary column.
    * Output: input columns (minus content) + `features array<float>`.
    *
    * Uses `mapPartitions` (the Scala analogue of `mapInPandas`): one
    * extractor instance per partition, rows streamed — memory is bounded by
    * one row's bytes, not the partition. */
  def extractFeatures(df: DataFrame, extractor: FeatureExtractor,
      contentCol: String = "content"): DataFrame = {
    val inSchema = df.schema
    val contentIdx = inSchema.fieldIndex(contentCol)
    val outSchema = StructType(
      inSchema.fields.patch(contentIdx, Nil, 1) :+
        StructField("features", ArrayType(FloatType)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val content = r.getAs[Array[Byte]](contentIdx)
        val kept = r.toSeq.patch(contentIdx, Nil, 1)
        val features = if (content == null) null else extractor.extract(content)
        Row.fromSeq(kept :+ features)
      }
    }(enc)
  }

  /** Deterministic frame sampling for "video" payloads: every `everyN`-th
    * fixed-size chunk of the byte stream becomes a frame row.
    * Output: media_id + frame_no + frame binary. (STUB: a real impl would
    * seek keyframes via a demuxer.) */
  def frameSample(df: DataFrame, frameBytes: Int, everyN: Int,
      idCol: String = "media_id", contentCol: String = "content"): DataFrame = {
    require(frameBytes > 0 && everyN > 0)
    val nFrames = floor(length(col(contentCol)) / frameBytes).cast("int")
    df.select(col(idCol), col(contentCol),
      explode(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(everyN))).as("frame_no"))
      .where(length(col(contentCol)) >= frameBytes)
      .select(col(idCol), col("frame_no"),
        substring_index(lit(""), "", 0).as("_drop"), // keep plan columnar
        expr(s"substring($contentCol, frame_no * $frameBytes + 1, $frameBytes)").as("frame"))
      .drop("_drop")
  }

  /** Repartition a media table so each output partition holds roughly
    * `targetBytes` of binary payload — the knob that keeps decode tasks
    * uniform at 100 TB (media sizes are heavily skewed). */
  def repartitionByBytes(df: DataFrame, targetBytes: Long,
      contentCol: String = "content"): DataFrame = {
    val totalBytes = df.agg(sum(length(col(contentCol)))).head().getLong(0)
    val parts = math.max(1, (totalBytes / math.max(targetBytes, 1)).toInt)
    df.repartition(parts)
  }
}
