package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` columns with typed metadata, plus decode /
  * feature-extract / frame-sample operators.
  *
  * The Spark-side plumbing is real — schema, partition-parallel
  * `mapPartitions` with batch iteration, deterministic outputs — but
  * the actual media DECODE is STUBBED (`decodeStub`): this container
  * has no image/audio codecs, so the stub derives deterministic fake
  * pixels/frames from the bytes. Swapping in a real codec changes one
  * function, not the pipeline.
  */
object Multimodal {

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", IntegerType))), nullable = false)))

  /** Deterministic synthetic assets (stand-in for a real lake): blob
    * bytes are a seeded xorshift stream, metadata derived from the id.
    */
  def syntheticAssets(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val modality = Seq("image", "audio", "video")(i % 3)
      val size = 64 + (i * 37) % 192
      val bytes = new Array[Byte](size)
      var state = 0x9e3779b97f4a7c15L + i
      var j = 0
      while (j < size) {
        state ^= state << 13; state ^= state >>> 7; state ^= state << 17
        bytes(j) = (state & 0xff).toByte
        j += 1
      }
      val fmt = modality match {
        case "image" => "png"
        case "audio" => "wav"
        case _ => "mp4"
      }
      Row(i.toLong, modality, bytes,
        Row(fmt, 16 + i % 64, 16 + (i * 7) % 64, 1000 + i * 10))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), assetSchema)
  }

  /** STUB decode: a real implementation would decode `bytes` with an
    * image/audio codec. The stub "decodes" deterministically — first 8
    * bytes become a content tag, metadata passes through — so the
    * downstream schema and batching are exercised honestly.
    */
  private def decodeStub(bytes: Array[Byte]): Array[Float] = {
    // ??? <- real codec goes here (e.g. javax.imageio / ffmpeg bindings)
    val dim = 16
    val out = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      out(i % dim) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    val norm = math.sqrt(out.map(x => x * x.toDouble).sum).toFloat
    if (norm == 0) out else out.map(_ / norm)
  }

  /** Feature extraction over asset batches: partition-parallel
    * `mapPartitions` (the Scala analogue of `mapInPandas` batches) —
    * one decode call per row, iterator-to-iterator so no partition
    * materialization.
    */
  def extractFeatures(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("modality", StringType, nullable = false),
      StructField("embedding", ArrayType(FloatType), nullable = false)))
    val idIx = assets.schema.fieldIndex("asset_id")
    val modIx = assets.schema.fieldIndex("modality")
    val bytesIx = assets.schema.fieldIndex("bytes")
    val rdd = assets.rdd.mapPartitions { it =>
      it.map { row =>
        val emb = decodeStub(row.getAs[Array[Byte]](bytesIx))
        Row(row.getLong(idIx), row.getString(modIx), emb.toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame sampling for video assets: every `everyN`-th fixed-size
    * chunk of the blob stands in for a decoded frame (stub), with real
    * explode-shaped output (one row per sampled frame).
    */
  def sampleFrames(assets: DataFrame, everyN: Int,
      frameSize: Int = 32): DataFrame = {
    val spark = assets.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("frame_bytes", BinaryType, nullable = false)))
    val idIx = assets.schema.fieldIndex("asset_id")
    val modIx = assets.schema.fieldIndex("modality")
    val bytesIx = assets.schema.fieldIndex("bytes")
    val rdd = assets.rdd.mapPartitions { it =>
      it.filter(_.getString(modIx) == "video").flatMap { row =>
        val bytes = row.getAs[Array[Byte]](bytesIx)
        val frames = bytes.grouped(frameSize).toSeq
        frames.zipWithIndex.collect {
          case (chunk, i) if i % everyN == 0 =>
            Row(row.getLong(idIx), i, chunk)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Modality-level stats: counts, byte volume, md5-distinct blobs
    * (binary dedup works on real data — md5 of bytes, no decode).
    */
  def modalityStats(assets: DataFrame): DataFrame =
    assets.groupBy("modality")
      .agg(
        count(lit(1)).as("cnt"),
        sum(length(col("bytes"))).cast("long").as("total_bytes"),
        countDistinct(md5(col("bytes"))).as("distinct_blobs"))
      .orderBy("modality")

  /** Resize metadata transform (stub math is real: aspect-preserving
    * target dims land in the metadata; bytes untouched without codecs).
    */
  def resizeMeta(assets: DataFrame, maxSide: Int): DataFrame = {
    val w = col("meta").getField("width")
    val h = col("meta").getField("height")
    val scale = least(lit(maxSide) / greatest(w, h).cast("double"), lit(1.0))
    assets.withColumn("resized_meta", struct(
      col("meta").getField("format").as("format"),
      ceil(w * scale).cast("int").as("width"),
      ceil(h * scale).cast("int").as("height"),
      col("meta").getField("duration_ms").as("duration_ms")))
  }
}
