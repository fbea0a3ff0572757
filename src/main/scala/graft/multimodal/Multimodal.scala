package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` columns with typed metadata, plus decode /
  * feature-extract / frame-sample operators.
  *
  * The Spark-side plumbing is real — schema, partition-parallel
  * `mapPartitions` with batch iteration, deterministic outputs. The
  * IMAGE decode is real: `javax.imageio` (in the JDK) encodes the
  * synthetic PNG fixtures and decodes them in [[extractFeatures]] /
  * [[imageStats]]. The AUDIO decode is real too: `javax.sound.sampled`
  * (also JDK-only) encodes the synthetic 16-bit PCM WAV fixtures and
  * decodes them in [[extractFeatures]] / [[audioStats]]. VIDEO decode
  * stays STUBBED (`decodeStub`) — this container has no video codecs —
  * and blobs that fail decode fall back to the stub, so the pipeline
  * never half-dies on a corrupt asset (it quarantines by `decoded`
  * flag).
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

  /** Deterministic REAL-PNG image assets: image `i` is a w×h RGB
    * pattern — pixel (x, y) has r = i + (x % 2), g = 2i, b = 3i —
    * encoded with `javax.imageio` (JDK-only, no external codecs). The
    * closed-form pixel function means decoded-pixel statistics are
    * re-derivable arithmetically by the oracle: mean_r over the image
    * is exactly (i·w·h + h·⌊w/2⌋) / (w·h).
    */
  def syntheticImageAssets(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val w = 16 + i % 16
      val h = 16 + (i * 3) % 16
      Row(i.toLong, "image", encodePng(i, w, h),
        Row("png", w, h, 0))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), assetSchema)
  }

  private def encodePng(i: Int, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = i + (x % 2)
        val g = 2 * i
        val b = 3 * i
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** REAL image decode: `javax.imageio.ImageIO.read` over the blob.
    * Returns None when the bytes aren't a decodable image (ImageIO's
    * null contract), letting callers quarantine instead of crash.
    */
  def decodeImage(bytes: Array[Byte]):
      Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes)))
    catch { case _: java.io.IOException => None }

  /** Deterministic REAL-WAV audio assets: asset `i` is mono 16-bit PCM
    * at 8 kHz with `ns = 64 + (i·13) % 128` samples; sample `t` is the
    * closed form `((i·37 + t·29) % 2001) − 1000` — encoded through
    * `javax.sound.sampled.AudioSystem` (JDK-only, no external codecs).
    * Like the PNG fixtures, the closed-form sample function makes
    * decoded-sample statistics re-derivable arithmetically by the
    * oracle, so a stats match proves the WAV encode → decode
    * round-trip reproduces the exact samples.
    */
  def syntheticAudioAssets(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val ns = 64 + (i * 13) % 128
      Row(i.toLong, "audio", encodeWav(i, ns),
        Row("wav", 0, 0, ns * 1000 / 8000))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), assetSchema)
  }

  private val wavFormat = new javax.sound.sampled.AudioFormat(
    8000f, 16, 1, true, false) // 8 kHz, 16-bit, mono, signed, little-endian

  private def encodeWav(i: Int, ns: Int): Array[Byte] = {
    val pcm = new Array[Short](ns)
    var t = 0
    while (t < ns) {
      pcm(t) = (((i * 37 + t * 29) % 2001) - 1000).toShort
      t += 1
    }
    encodePcmWav(pcm)
  }

  /** Encode raw 16-bit mono samples as a WAV blob (JDK-only). */
  private[multimodal] def encodePcmWav(samples: Array[Short]): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    var t = 0
    while (t < samples.length) {
      pcm(2 * t) = (samples(t) & 0xff).toByte
      pcm(2 * t + 1) = ((samples(t) >> 8) & 0xff).toByte
      t += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), wavFormat, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** REAL audio decode: `javax.sound.sampled.AudioSystem` parses the
    * WAV container and yields the PCM frames; 16-bit signed samples are
    * re-assembled respecting the stream's declared endianness. Returns
    * None (quarantine, not crash) for non-WAV blobs or unsupported
    * sample layouts.
    */
  def decodeAudio(bytes: Array[Byte]): Option[(Int, Array[Short])] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val f = ais.getFormat
      if (f.getEncoding !=
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          f.getSampleSizeInBits != 16 || f.getChannels != 1) None
      else {
        val raw = ais.readAllBytes()
        val samples = new Array[Short](raw.length / 2)
        var t = 0
        while (t < samples.length) {
          val (lo, hi) =
            if (f.isBigEndian) (raw(2 * t + 1), raw(2 * t))
            else (raw(2 * t), raw(2 * t + 1))
          samples(t) = (((hi & 0xff) << 8) | (lo & 0xff)).toShort
          t += 1
        }
        Some((f.getSampleRate.toInt, samples))
      }
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** STUB decode for audio/video (no codecs in this container) and
    * the fallback for undecodable image blobs: deterministically
    * folds the bytes into a normalized vector, so the downstream
    * schema and batching are exercised honestly.
    */
  private def decodeStub(bytes: Array[Byte]): Array[Float] = {
    // ??? <- real audio/video codec goes here (e.g. ffmpeg bindings)
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
    * materialization. Image blobs go through the REAL ImageIO decode
    * (features from actual pixels: channel means, dimensions,
    * aspect); audio/video and undecodable blobs take the stub, and
    * the `decoded` flag records which path ran (the quarantine
    * column a lake pipeline filters on).
    */
  def extractFeatures(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("modality", StringType, nullable = false),
      StructField("embedding", ArrayType(FloatType), nullable = false),
      StructField("decoded", BooleanType, nullable = false)))
    val idIx = assets.schema.fieldIndex("asset_id")
    val modIx = assets.schema.fieldIndex("modality")
    val bytesIx = assets.schema.fieldIndex("bytes")
    val rdd = assets.rdd.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](bytesIx)
        val modality = row.getString(modIx)
        val (emb, decoded) = modality match {
          case "image" => decodeImage(bytes) match {
            case Some(img) => (imageFeatures(img), true)
            case None => (decodeStub(bytes), false)
          }
          case "audio" => decodeAudio(bytes) match {
            case Some((rate, samples)) => (audioFeatures(rate, samples), true)
            case None => (decodeStub(bytes), false)
          }
          case _ => (decodeStub(bytes), false)
        }
        Row(row.getLong(idIx), modality, emb.toSeq, decoded)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** 16-dim feature vector from decoded pixels: normalized channel
    * means, dimensions, aspect, and a 10-bin luminance histogram.
    */
  private def imageFeatures(
      img: java.awt.image.BufferedImage): Array[Float] = {
    val w = img.getWidth
    val h = img.getHeight
    var sr, sg, sb = 0L
    val hist = new Array[Long](10)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
        sr += r; sg += g; sb += b
        val lum = (r * 299 + g * 587 + b * 114) / 1000
        hist(math.min(lum / 26, 9)) += 1
        x += 1
      }
      y += 1
    }
    val n = (w * h).toFloat
    Array[Float](
      sr / n / 255f, sg / n / 255f, sb / n / 255f,
      w / 256f, h / 256f, w.toFloat / h) ++
      hist.map(_ / n)
  }

  /** 16-dim feature vector from decoded PCM: normalized mean / RMS /
    * peak amplitude, duration, zero-crossing rate, and an 11-bin
    * amplitude histogram.
    */
  private def audioFeatures(rate: Int, samples: Array[Short]): Array[Float] = {
    val n = math.max(samples.length, 1)
    var sum = 0L; var sumSq = 0L; var peak = 0L; var zc = 0L
    val hist = new Array[Long](11)
    var t = 0
    while (t < samples.length) {
      val v = samples(t).toLong
      sum += v; sumSq += v * v
      if (math.abs(v) > peak) peak = math.abs(v)
      if (t > 0 && ((samples(t - 1) < 0) != (v < 0))) zc += 1
      hist(math.min((math.abs(v) * 11 / 32768).toInt, 10)) += 1
      t += 1
    }
    Array[Float](
      sum.toFloat / n / 32768f,
      math.sqrt(sumSq.toDouble / n).toFloat / 32768f,
      peak.toFloat / 32768f,
      samples.length.toFloat / rate,
      zc.toFloat / n) ++ hist.map(_.toFloat / n)
  }

  /** Decoded-sample statistics per audio asset — the REAL decode path,
    * exact long-sum means (numerator/denominator division is
    * bit-reproducible, so the oracle re-derives it arithmetically for
    * the closed-form synthetic fixtures). Undecodable blobs are
    * dropped — the quarantine path is `extractFeatures`' `decoded`
    * flag.
    */
  def audioStats(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("n_samples", IntegerType, nullable = false),
      StructField("mean_amp", DoubleType, nullable = false),
      StructField("max_amp", IntegerType, nullable = false),
      StructField("min_amp", IntegerType, nullable = false)))
    val idIx = assets.schema.fieldIndex("asset_id")
    val modIx = assets.schema.fieldIndex("modality")
    val bytesIx = assets.schema.fieldIndex("bytes")
    val rdd = assets.rdd.mapPartitions { it =>
      it.filter(_.getString(modIx) == "audio").flatMap { row =>
        decodeAudio(row.getAs[Array[Byte]](bytesIx)).map {
          case (rate, samples) =>
            var sum = 0L; var mx = Int.MinValue; var mn = Int.MaxValue
            var t = 0
            while (t < samples.length) {
              val v = samples(t).toInt
              sum += v
              if (v > mx) mx = v
              if (v < mn) mn = v
              t += 1
            }
            Row(row.getLong(idIx), rate, samples.length,
              sum / samples.length.toDouble, mx, mn)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Decoded-pixel statistics per image asset — the REAL decode path,
    * exact long-sum channel means (numerator/denominator division is
    * bit-reproducible, so an oracle can re-derive it arithmetically
    * for synthetic fixtures). Undecodable blobs are dropped — the
    * quarantine path is `extractFeatures`' `decoded` flag.
    */
  def imageStats(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("mean_r", DoubleType, nullable = false),
      StructField("mean_g", DoubleType, nullable = false),
      StructField("mean_b", DoubleType, nullable = false)))
    val idIx = assets.schema.fieldIndex("asset_id")
    val modIx = assets.schema.fieldIndex("modality")
    val bytesIx = assets.schema.fieldIndex("bytes")
    val rdd = assets.rdd.mapPartitions { it =>
      it.filter(_.getString(modIx) == "image").flatMap { row =>
        decodeImage(row.getAs[Array[Byte]](bytesIx)).map { img =>
          val w = img.getWidth
          val h = img.getHeight
          var sr, sg, sb = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          val n = (w.toLong * h).toDouble
          Row(row.getLong(idIx), w, h, sr / n, sg / n, sb / n)
        }
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
