package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}

/** Image perceptual-hash near-duplicate detection — the standard
  * image-dedup stage of a multimodal training pipeline (the reference's
  * binary-vector surface, 2.6/common.py:317-325 packed-bit shape,
  * applied to real decoded pixels).
  *
  * [[dHash]] computes the classic 64-bit difference hash: decode
  * (real `javax.imageio`), box-average down to a 9x8 grayscale grid,
  * emit bit (row*8+col) = 1 iff gray[row][col] < gray[row][col+1].
  * Near-identical images (re-encodes, small edits, minor crops) land
  * within a few bits of each other; unrelated images differ in ~32.
  *
  * [[nearDupPairs]] finds all pairs within a Hamming radius WITHOUT
  * enumerating pairs: the 64 bits are partitioned into `radius + 1`
  * bands, so by pigeonhole any pair within the radius agrees exactly
  * on at least one whole band — an equi-join on (band index, band
  * value) produces a candidate superset, and a codegen'd
  * `bit_count(xor)` filter keeps the true pairs. At 100 TB this is
  * the banded-LSH shape used everywhere else in the dedup family:
  * shuffle keys are 8-byte band values, candidates are join-local,
  * and nothing is quadratic in the corpus.
  */
object ImageHash {

  /** 64-bit dHash per image asset: real ImageIO decode inside
    * partition-parallel `mapPartitions` (iterator-to-iterator, one
    * decode per row), box-average to 9x8 luma, horizontal-gradient
    * bits. Undecodable blobs are dropped (the quarantine path is
    * `Multimodal.extractFeatures`' `decoded` flag).
    */
  def dHash(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("dhash", LongType, nullable = false)))
    val idIx = assets.schema.fieldIndex("asset_id")
    val modIx = assets.schema.fieldIndex("modality")
    val bytesIx = assets.schema.fieldIndex("bytes")
    val rdd = assets.rdd.mapPartitions { it =>
      it.filter(_.getString(modIx) == "image").flatMap { row =>
        Multimodal.decodeImage(row.getAs[Array[Byte]](bytesIx)).map { img =>
          Row(row.getLong(idIx), dHashOf(img))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** dHash of one decoded image: integer-exact box-average (sum /
    * count per cell) to a 9x8 luma grid, then the 64 horizontal
    * comparisons. For images already 9x8 the average is the identity,
    * so a closed-form fixture's hash is exactly its designed bit
    * pattern.
    */
  private[multimodal] def dHashOf(
      img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val grid = Array.ofDim[Double](8, 9)
    var rr = 0
    while (rr < 8) {
      val y0 = rr * h / 8
      val y1 = math.max((rr + 1) * h / 8, y0 + 1)
      var c = 0
      while (c < 9) {
        val x0 = c * w / 9
        val x1 = math.max((c + 1) * w / 9, x0 + 1)
        var sum = 0L
        var n = 0
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            val p = img.getRGB(x, y)
            val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
            sum += (r * 299 + g * 587 + b * 114) / 1000
            n += 1
            x += 1
          }
          y += 1
        }
        grid(rr)(c) = if (n == 0) 0.0 else sum.toDouble / n
        c += 1
      }
      rr += 1
    }
    var hash = 0L
    rr = 0
    while (rr < 8) {
      var c = 0
      while (c < 8) {
        if (grid(rr)(c) < grid(rr)(c + 1)) hash |= 1L << (rr * 8 + c)
        c += 1
      }
      rr += 1
    }
    hash
  }

  /** All (id_a < id_b) pairs with Hamming(dhash_a, dhash_b) <=
    * `maxHamming`, via banded equi-join + exact bit_count verify.
    * Input: (asset_id, dhash); output: (id_a, id_b, hamming).
    *
    * Bands partition all 64 bits into maxHamming+1 contiguous slices
    * (the first 64 % B bands one bit wider), so recall is exact by
    * pigeonhole — never an approximation. Everything below is
    * codegen'd `functions` (shifts, masks, bit_count); the only
    * shuffles are the band-bucket join and the pair distinct.
    */
  def nearDupPairs(hashes: DataFrame, maxHamming: Int,
      hashCol: String = "dhash"): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      "maxHamming must be in [0, 64)")
    // select (not rename): a frame already carrying BOTH `dhash` and
    // hashCol would otherwise end up with two `dhash` columns and the
    // downstream references would be ambiguous.
    nearDupPairsStd(
      hashes.select(col("asset_id"), col(hashCol).as("dhash")), maxHamming)
  }

  private def nearDupPairsStd(hashes: DataFrame, maxHamming: Int): DataFrame = {
    val bands = maxHamming + 1
    val baseW = 64 / bands
    val sizes = Array.tabulate(bands)(k => if (k < 64 % bands) baseW + 1 else baseW)
    val offsets = sizes.scanLeft(0)(_ + _).init
    val bandCols: Seq[Column] = offsets.zip(sizes).zipWithIndex.map {
      case ((off, sz), k) =>
        val mask = if (sz >= 64) -1L else (1L << sz) - 1L
        struct(lit(k).as("band_idx"),
          shiftrightunsigned(col("dhash"), off).bitwiseAND(lit(mask))
            .as("band_val"))
    }.toSeq
    val exploded = hashes
      .select(col("asset_id"), col("dhash"),
        explode(array(bandCols: _*)).as("band"))
      .select(col("asset_id"), col("dhash"),
        col("band.band_idx").as("band_idx"),
        col("band.band_val").as("band_val"))
    val a = exploded.as("a")
    val b = exploded.as("b")
    a.join(b,
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_val") === col("b.band_val") &&
        col("a.asset_id") < col("b.asset_id"))
      .select(col("a.asset_id").as("id_a"), col("b.asset_id").as("id_b"),
        bit_count(col("a.dhash").bitwiseXOR(col("b.dhash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** The closed-form 63-bit pattern of fixture image `i` (bit 63
    * always 0 so the value stays positive in every engine): group
    * g = i/4 sets a base pattern, variant v = i%4 flips 0 / 2 / 6 / 21
    * bits — so within a group, variants 0-1-2 are mutual near-dups at
    * Hamming 2/6/8 and variant 3 is far. The DuckDB oracle re-derives
    * the identical arithmetic, making the decode -> dHash -> banded
    * join pipeline end-to-end checkable.
    */
  def patternHash(i: Int): Long = {
    val g = i / 4
    val v = i % 4
    var h = 0L
    var b = 0
    while (b < 63) {
      val base = (g * 13 + b * 7) % 17 < 8
      val flip = (v == 1 && b % 31 == 5) || (v == 2 && b % 10 == 7) ||
        (v == 3 && b % 3 == 1)
      if (base ^ flip) h |= 1L << b
      b += 1
    }
    h
  }

  /** Deterministic 9x8 REAL-PNG fixtures whose dHash is EXACTLY
    * [[patternHash]](i): each row's 9 gray values are a walk that
    * rises 10 when the designed bit is 1 and falls 10 when it is 0,
    * so the horizontal comparison reproduces the bit. Generated
    * executor-side (`spark.range.mapPartitions`) so the fixture
    * scales like real ingest.
    */
  def syntheticHashImages(spark: SparkSession, n: Int): DataFrame = {
    val rdd = spark.range(n.toLong).rdd.mapPartitions { it =>
      it.map { i =>
        Row(i, "image", encodeHashPng(patternHash(i.toInt)),
          Row("png", 9, 8, 0))
      }
    }
    spark.createDataFrame(rdd, Multimodal.assetSchema)
  }

  private def encodeHashPng(hash: Long): Array[Byte] = {
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
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Larger bench-shape fixtures (`w x h` >> 9x8, so the box-average
    * downscale path is exercised for real): image `i` renders the
    * same closed-form pattern scaled up — each 9x8 cell becomes a
    * block of identical pixels, whose box average is exact.
    */
  def syntheticHashImagesScaled(spark: SparkSession, n: Int,
      blockW: Int = 4, blockH: Int = 4): DataFrame = {
    val rdd = spark.range(n.toLong).rdd.mapPartitions { it =>
      it.map { i =>
        Row(i, "image", encodeScaledPng(patternHash(i.toInt), blockW, blockH),
          Row("png", 9 * blockW, 8 * blockH, 0))
      }
    }
    spark.createDataFrame(rdd, Multimodal.assetSchema)
  }

  private def encodeScaledPng(hash: Long, bw: Int, bh: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(9 * bw, 8 * bh,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var rr = 0
    while (rr < 8) {
      var v = 128
      var c = 0
      while (c < 9) {
        var dy = 0
        while (dy < bh) {
          var dx = 0
          while (dx < bw) {
            img.setRGB(c * bw + dx, rr * bh + dy, (v << 16) | (v << 8) | v)
            dx += 1
          }
          dy += 1
        }
        if (c < 8) {
          val bit = (hash >>> (rr * 8 + c)) & 1L
          v = if (bit == 1L) v + 10 else v - 10
        }
        c += 1
      }
      rr += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }
}
