package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}

/** Video perceptual near-duplicate detection — the video-dedup stage
  * of a multimodal training pipeline, composed from the round-12 REAL
  * AVI decode ([[Multimodal.decodeVideo]]) and the image dHash
  * ([[ImageHash]]): a video's signature is the SEQUENCE of its sampled
  * frames' 64-bit dHashes, and two videos are near-duplicates when
  * they have the same sampled length and EVERY aligned frame pair is
  * within the Hamming radius (re-encode/noise tolerant, reorder- and
  * cut-strict — a trimmed or re-edited video is a different asset; the
  * reference's packed-bit binary-vector surface applied per frame).
  *
  * 100 TB shape: candidates come from a banded equi-join keyed on
  * (frame_no, band_idx, band_val) — by pigeonhole an aligned frame
  * pair within the radius shares at least one whole band, so recall is
  * exact, shuffle keys are small fixed-width tuples, and nothing is
  * quadratic in the corpus. A frame pair ABSENT from the candidates
  * provably exceeds the radius, so the all-frames conjunction can be
  * evaluated from candidate counts alone.
  */
object VideoHash {

  /** Per-sampled-frame dHash rows of every decodable video asset:
    * real AVI decode inside partition-parallel `mapPartitions`, every
    * `everyN`-th frame dHashed. Undecodable blobs drop (quarantine is
    * [[Multimodal.extractFeatures]]' `decoded` flag). Output:
    * (asset_id, frame_no, dhash) with frame_no the SAMPLED index, so
    * equal-stride samplings align positionally.
    */
  def frameHashes(assets: DataFrame, everyN: Int = 1): DataFrame = {
    val spark = assets.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("dhash", LongType, nullable = false)))
    val idIx = assets.schema.fieldIndex("asset_id")
    val modIx = assets.schema.fieldIndex("modality")
    val bytesIx = assets.schema.fieldIndex("bytes")
    val rdd = assets.rdd.mapPartitions { it =>
      it.filter(_.getString(modIx) == "video").flatMap { row =>
        Multimodal.decodeVideo(row.getAs[Array[Byte]](bytesIx)).toSeq
          .flatMap { v =>
            v.frames.zipWithIndex.collect {
              case (img, i) if i % everyN == 0 =>
                Row(row.getLong(idIx), i / everyN, ImageHash.dHashOf(img))
            }
          }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** All (id_a < id_b) video pairs whose sampled-frame sequences have
    * equal length and EVERY aligned frame within `maxHamming`: banded
    * per-frame candidates → exact bit_count verify → per-pair
    * conjunction (matched frame count must equal BOTH assets' frame
    * counts). Output: (id_a, id_b, matched_frames).
    */
  def nearDupPairs(frameHashes: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      "maxHamming must be in [0, 64)")
    val bands = maxHamming + 1
    val baseW = 64 / bands
    val sizes =
      Array.tabulate(bands)(k => if (k < 64 % bands) baseW + 1 else baseW)
    val offsets = sizes.scanLeft(0)(_ + _).init
    val bandCols: Seq[Column] = offsets.zip(sizes).zipWithIndex.map {
      case ((off, sz), k) =>
        val mask = if (sz >= 64) -1L else (1L << sz) - 1L
        struct(lit(k).as("band_idx"),
          shiftrightunsigned(col("dhash"), off).bitwiseAND(lit(mask))
            .as("band_val"))
    }.toSeq
    val exploded = frameHashes
      .select(col("asset_id"), col("frame_no"), col("dhash"),
        explode(array(bandCols: _*)).as("band"))
      .select(col("asset_id"), col("frame_no"), col("dhash"),
        col("band.band_idx").as("band_idx"),
        col("band.band_val").as("band_val"))
    val a = exploded.as("a")
    val b = exploded.as("b")
    // Per-frame verified matches (distinct: a pair of frames can agree
    // on several bands).
    val frameMatches = a.join(b,
        col("a.frame_no") === col("b.frame_no") &&
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_val") === col("b.band_val") &&
        col("a.asset_id") < col("b.asset_id"))
      .select(col("a.asset_id").as("id_a"), col("b.asset_id").as("id_b"),
        col("a.frame_no").as("frame_no"),
        bit_count(col("a.dhash").bitwiseXOR(col("b.dhash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
    val counts = frameHashes.groupBy(col("asset_id"))
      .agg(count(lit(1)).as("nf"))
    frameMatches.groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("matched_frames"))
      .join(counts.select(col("asset_id").as("id_a"),
        col("nf").as("nf_a")), Seq("id_a"))
      .join(counts.select(col("asset_id").as("id_b"),
        col("nf").as("nf_b")), Seq("id_b"))
      .filter(col("matched_frames") === col("nf_a") &&
        col("nf_a") === col("nf_b"))
      .select(col("id_a"), col("id_b"), col("matched_frames"))
  }

  /** The closed-form 63-bit pattern of frame `f` of fixture video `i`
    * ([[ImageHash.patternHash]] extended with a frame term): group
    * g = i/4 and frame f set the base bits; variant v = i%4 flips a
    * frame-CONSTANT mask (v1: 2 bits, v2: 6, v3: 21) — and v2
    * additionally flips 7 more bits ON FRAME 2 ONLY, so within a group
    * (v0,v1) align within Hamming 8 on every frame while (v0,v2) and
    * (v1,v2) pass frames 0-1 but FAIL frame 2 — the pair must NOT
    * surface, pinning the all-frames conjunction, not just per-frame
    * matching.
    */
  def framePattern(i: Int, f: Int): Long = {
    val g = i / 4
    val v = i % 4
    var h = 0L
    var b = 0
    while (b < 63) {
      val base = (g * 13 + b * 7 + f * 3) % 17 < 8
      val flip = (v == 1 && b % 31 == 5) || (v == 2 && b % 10 == 7) ||
        (v == 3 && b % 3 == 1) || (v == 2 && f == 2 && b % 9 == 4)
      if (base ^ flip) h |= 1L << b
      b += 1
    }
    h
  }

  /** Deterministic 3-frame REAL-AVI fixtures whose frame dHashes are
    * EXACTLY [[framePattern]](i, f): each frame is the 9x8 gray-walk
    * image of its designed pattern (the [[ImageHash]] fixture
    * technique), carried losslessly by the DIB AVI container —
    * generated executor-side so the fixture scales like real ingest.
    */
  def syntheticNearDupVideos(spark: SparkSession, n: Int): DataFrame = {
    val rdd = spark.range(n.toLong).rdd.mapPartitions { it =>
      it.map { i =>
        val frames = (0 until 3).map(f => hashImage(framePattern(i.toInt, f)))
        Row(i, "video", Multimodal.encodeAviFromImages(frames),
          Row("avi", 9, 8, 300))
      }
    }
    spark.createDataFrame(rdd, Multimodal.assetSchema)
  }

  private def hashImage(hash: Long): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var rr = 0
    while (rr < 8) {
      var v = 128
      var c = 0
      while (c < 9) {
        img.setRGB(c, rr, (v << 16) | (v << 8) | v)
        if (c < 8) {
          val bit = (hash >>> (rr * 8 + c)) & 1L
          v = if (bit == 1L) v + 10 else v - 10
        }
        c += 1
      }
      rr += 1
    }
    img
  }
}
