package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Audio acoustic-fingerprint near-duplicate detection — the audio
  * sibling of [[ImageHash]]: a 64-bit energy-delta fingerprint
  * (Chromaprint's frame-energy-difference family, FFT-free so it runs
  * on the JDK decoder) plus the same banded-Hamming pair machinery.
  *
  * [[fingerprint]] decodes the WAV (real `javax.sound.sampled`),
  * splits the PCM into 65 proportional frames, and emits bit f = 1
  * iff energy(frame f+1) > energy(frame f). Re-encodes and small
  * edits preserve most deltas; unrelated audio flips ~half.
  *
  * Pair finding reuses [[ImageHash.nearDupPairs]] — one banded
  * equi-join, pigeonhole-exact recall, codegen'd bit_count verify —
  * so image and audio dedup share one scale-proven path.
  */
object AudioFingerprint {

  /** 64-bit fingerprint per audio asset: (asset_id, afp). Partition-
    * parallel mapPartitions, one decode per row; undecodable blobs are
    * dropped (quarantine is `Multimodal.extractFeatures`' flag).
    */
  def fingerprint(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("afp", LongType, nullable = false)))
    val idIx = assets.schema.fieldIndex("asset_id")
    val modIx = assets.schema.fieldIndex("modality")
    val bytesIx = assets.schema.fieldIndex("bytes")
    val rdd = assets.rdd.mapPartitions { it =>
      it.filter(_.getString(modIx) == "audio").flatMap { row =>
        Multimodal.decodeAudio(row.getAs[Array[Byte]](bytesIx)).map {
          case (_, samples) => Row(row.getLong(idIx), fingerprintOf(samples))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Fingerprint of one decoded PCM stream: 65 proportional frames
    * ([f*n/65, (f+1)*n/65) — exact when n is a multiple of 65, the
    * fixture shape), exact Long energy sums, 64 strict-increase bits.
    */
  private[multimodal] def fingerprintOf(samples: Array[Short]): Long = {
    val n = samples.length
    val energies = new Array[Long](65)
    var f = 0
    while (f < 65) {
      val t0 = f * n / 65
      val t1 = (f + 1) * n / 65
      var e = 0L
      var t = t0
      while (t < t1) {
        val v = samples(t).toLong
        e += v * v
        t += 1
      }
      energies(f) = e
      f += 1
    }
    var hash = 0L
    f = 0
    while (f < 64) {
      if (energies(f + 1) > energies(f)) hash |= 1L << f
      f += 1
    }
    hash
  }

  /** Pairs within a Hamming radius over the fingerprint column —
    * delegates to the image machinery (shared banded join).
    */
  def nearDupPairs(fingerprints: DataFrame, maxHamming: Int): DataFrame =
    ImageHash.nearDupPairs(fingerprints, maxHamming, hashCol = "afp")

  /** Deterministic REAL-WAV fixtures whose fingerprint is EXACTLY
    * [[ImageHash.patternHash]](i): 65 constant-amplitude frames of 32
    * samples; the amplitude walks +100/-100 per designed bit from
    * 7000 (staying positive, so frame energy is strictly monotone in
    * amplitude and the strict-increase bit reproduces the pattern).
    * Encoded executor-side through the real WAV writer.
    */
  def syntheticFingerprintAudio(spark: SparkSession, n: Int): DataFrame = {
    val rdd = spark.range(n.toLong).rdd.mapPartitions { it =>
      it.map { i =>
        val hash = ImageHash.patternHash(i.toInt)
        val samples = new Array[Short](65 * 32)
        var amp = 7000
        var f = 0
        while (f < 65) {
          var t = 0
          while (t < 32) {
            samples(f * 32 + t) = amp.toShort
            t += 1
          }
          if (f < 64) {
            val bit = (hash >>> f) & 1L
            amp = if (bit == 1L) amp + 100 else amp - 100
          }
          f += 1
        }
        Row(i, "audio", Multimodal.encodePcmWav(samples),
          Row("wav", 0, 0, 65 * 32 * 1000 / 8000))
      }
    }
    spark.createDataFrame(rdd, Multimodal.assetSchema)
  }
}
