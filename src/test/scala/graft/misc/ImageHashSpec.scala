package graft.misc

import graft.SparkSpec
import graft.multimodal.ImageHash

class ImageHashSpec extends SparkSpec {

  test("dHash of closed-form 9x8 fixtures equals the designed pattern") {
    val assets = ImageHash.syntheticHashImages(spark, 24)
    val got = ImageHash.dHash(assets).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 24)
    (0 until 24).foreach { i =>
      assert(got(i.toLong) == ImageHash.patternHash(i),
        s"asset $i decoded-pixel dHash != closed form")
    }
  }

  test("scaled fixtures box-average back to the same dHash (real downscale)") {
    val scaled = ImageHash.syntheticHashImagesScaled(spark, 12, 4, 4)
    val got = ImageHash.dHash(scaled).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 12).foreach { i =>
      assert(got(i.toLong) == ImageHash.patternHash(i))
    }
  }

  test("banded nearDupPairs equals brute-force pairs at the radius") {
    import spark.implicits._
    // Adversarial hash set: clusters at small Hamming distances plus
    // far-apart fill — brute force over n=60 is the ground truth the
    // banding must reproduce exactly (pigeonhole recall, bit_count
    // precision).
    val hs = (0 until 60).map { i =>
      val base = 0x0f0f0f0f0f0f0f0fL * ((i / 5) % 7 + 1) ^ (0x9e37L << (i / 10))
      val flips = (0 until i % 5).foldLeft(0L)((a, k) => a | (1L << ((i * 7 + k * 13) % 64)))
      (i.toLong, base ^ flips)
    }
    val df = hs.toDF("asset_id", "dhash")
    for (r <- Seq(0, 3, 8)) {
      val got = ImageHash.nearDupPairs(df, r).collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
      val want = (for {
        (ia, ha) <- hs; (ib, hb) <- hs if ia < ib
        d = java.lang.Long.bitCount(ha ^ hb) if d <= r
      } yield (ia, ib, d)).toSet
      assert(got == want, s"radius $r: banded pairs != brute force")
    }
  }

  test("audio fingerprint of closed-form WAV fixtures equals the pattern") {
    val assets = graft.multimodal.AudioFingerprint
      .syntheticFingerprintAudio(spark, 16)
    val got = graft.multimodal.AudioFingerprint.fingerprint(assets)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 16)
    (0 until 16).foreach { i =>
      assert(got(i.toLong) == ImageHash.patternHash(i),
        s"asset $i decoded-PCM fingerprint != closed form")
    }
  }

  test("undecodable blobs are dropped, not crashed") {
    import org.apache.spark.sql.Row
    val junk = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "image", Array[Byte](1, 2, 3), Row("png", 1, 1, 0)),
        Row(2L, "audio", Array[Byte](9, 9), Row("wav", 0, 0, 1)))),
      graft.multimodal.Multimodal.assetSchema)
    assert(ImageHash.dHash(junk).count() == 0)
  }
}
