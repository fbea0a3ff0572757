package graft.misc

import graft.SparkSpec
import graft.datagen.StableGen
import graft.multimodal.Multimodal
import graft.sources.{JsonlExpressions, Npy}
import graft.store.{CollectionDef, FieldDef}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.{Files, Paths}

class MiscSpec extends SparkSpec {

  // ---- multimodal -------------------------------------------------------

  test("synthetic assets are deterministic and schema'd") {
    val a = Multimodal.syntheticAssets(spark, 30)
    val b = Multimodal.syntheticAssets(spark, 30)
    assert(a.schema == Multimodal.assetSchema)
    val (ca, cb) = (a.orderBy("asset_id").collect(), b.orderBy("asset_id").collect())
    assert(ca.zip(cb).forall { case (x, y) =>
      x.getAs[Array[Byte]]("bytes").sameElements(y.getAs[Array[Byte]]("bytes"))
    })
  }

  test("feature extraction produces normalized fixed-dim embeddings per asset") {
    val assets = Multimodal.syntheticAssets(spark, 12)
    val feats = Multimodal.extractFeatures(assets).collect()
    assert(feats.length == 12)
    feats.foreach { r =>
      val emb = r.getSeq[Float](2)
      assert(emb.length == 16)
      val norm = math.sqrt(emb.map(x => x * x.toDouble).sum)
      assert(math.abs(norm - 1.0) < 1e-5)
    }
  }

  test("real PNG decode: imageStats matches the closed-form pixel function") {
    val assets = Multimodal.syntheticImageAssets(spark, 12)
    val stats = Multimodal.imageStats(assets).orderBy("asset_id").collect()
    assert(stats.length == 12)
    stats.zipWithIndex.foreach { case (r, i) =>
      val w = 16 + i % 16
      val h = 16 + (i * 3) % 16
      assert(r.getInt(1) == w && r.getInt(2) == h)
      // encode -> PNG -> decode round-trips the exact pixels
      assert(r.getDouble(3) ==
        (i.toLong * w * h + h * (w / 2)).toDouble / (w.toLong * h))
      assert(r.getDouble(4) == 2.0 * i)
      assert(r.getDouble(5) == 3.0 * i)
    }
  }

  test("extractFeatures uses the real decode for PNGs and flags the path") {
    val real = Multimodal.extractFeatures(
      Multimodal.syntheticImageAssets(spark, 6)).collect()
    assert(real.length == 6)
    assert(real.forall(_.getBoolean(3)), "PNG assets must take the real path")
    // channel-mean features reflect actual pixels: mean_g/255 = 2i/255
    real.sortBy(_.getLong(0)).zipWithIndex.foreach { case (r, i) =>
      assert(math.abs(r.getSeq[Float](2)(1) - 2f * i / 255f) < 1e-6f)
    }
    // non-image / undecodable blobs quarantine to the stub, flagged
    val stub = Multimodal.extractFeatures(
      Multimodal.syntheticAssets(spark, 6)).collect()
    assert(stub.forall(!_.getBoolean(3)))
  }

  test("real WAV decode: audioStats matches the closed-form PCM function") {
    val assets = Multimodal.syntheticAudioAssets(spark, 12)
    val stats = Multimodal.audioStats(assets).orderBy("asset_id").collect()
    assert(stats.length == 12)
    stats.zipWithIndex.foreach { case (r, i) =>
      val ns = 64 + (i * 13) % 128
      val samples = (0 until ns).map(t => ((i * 37 + t * 29) % 2001) - 1000)
      assert(r.getInt(1) == 8000 && r.getInt(2) == ns)
      // encode -> WAV -> decode round-trips the exact samples
      assert(r.getDouble(3) == samples.map(_.toLong).sum / ns.toDouble)
      assert(r.getInt(4) == samples.max && r.getInt(5) == samples.min)
    }
  }

  test("extractFeatures uses the real decode for WAVs and flags the path") {
    val real = Multimodal.extractFeatures(
      Multimodal.syntheticAudioAssets(spark, 6)).collect()
    assert(real.length == 6)
    assert(real.forall(_.getBoolean(3)), "WAV assets must take the real path")
    // duration feature reflects actual decoded frame count: ns / 8000
    real.sortBy(_.getLong(0)).zipWithIndex.foreach { case (r, i) =>
      val ns = 64 + (i * 13) % 128
      assert(math.abs(r.getSeq[Float](2)(3) - ns / 8000f) < 1e-6f)
    }
  }

  test("decodeAudio quarantines non-WAV and rejects nothing it can parse") {
    assert(Multimodal.decodeAudio(Array[Byte](1, 2, 3, 4)).isEmpty)
    val (rate, samples) = Multimodal.decodeAudio(
      Multimodal.syntheticAudioAssets(spark, 1)
        .collect()(0).getAs[Array[Byte]]("bytes")).get
    assert(rate == 8000 && samples.length == 64)
    assert(samples(0) == -1000 && samples(1) == -971) // closed form at i=0
  }

  test("decodeVideo parses DIB AVIs exactly and MJPEG through the JPEG codec") {
    // DIB (lossless): decoded pixels must equal the closed form.
    val dib = Multimodal.decodeVideo(
      Multimodal.encodeAviDib(i = 5, w = 20, h = 15, nf = 4)).get
    assert(dib.width == 20 && dib.height == 15 && dib.frames.size == 4)
    assert(dib.usPerFrame == 100000)
    val f2 = dib.frames(2)
    val p = f2.getRGB(3, 7) // closed form at i=5, f=2, x=3 (odd)
    assert(((p >> 16) & 0xff) == 5 + 2, "r channel")
    assert(((p >> 8) & 0xff) == 10, "g channel")
    assert((p & 0xff) == 15 + 1, "b channel (odd x)")
    // MJPEG (lossy, REAL JDK JPEG codec): structure exact, pixels near.
    val mj = Multimodal.decodeVideo(
      Multimodal.encodeAviMjpeg(i = 5, w = 20, h = 16, nf = 3)).get
    assert(mj.width == 20 && mj.height == 16 && mj.frames.size == 3)
    val q = mj.frames(0).getRGB(4, 4)
    assert(math.abs(((q >> 16) & 0xff) - 5) < 24 &&
      math.abs(((q >> 8) & 0xff) - 10) < 24, "JPEG pixels off the source")
    // Quarantine: junk and truncated containers return None, not throw.
    assert(Multimodal.decodeVideo(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.decodeVideo(
      Multimodal.encodeAviDib(3, 16, 12, 2).take(40)).isEmpty)
  }

  test("extractFeatures uses the real AVI decode and flags the path") {
    val real = Multimodal.extractFeatures(
      Multimodal.syntheticVideoAssets(spark, 6)).collect()
    assert(real.forall(_.getAs[Boolean]("decoded")))
    // junk "video" blobs (the random-bytes fixture) take the stub
    val stub = Multimodal.extractFeatures(
      Multimodal.syntheticAssets(spark, 6))
      .filter(col("modality") === "video").collect()
    assert(stub.forall(!_.getAs[Boolean]("decoded")))
  }

  test("sampled frames are real decodable PNGs of the decoded frames") {
    val assets = Multimodal.syntheticVideoAssets(spark, 4)
    val frames = Multimodal.sampleFrames(assets, everyN = 2).collect()
    assert(frames.nonEmpty)
    frames.foreach { r =>
      val img = Multimodal.decodeImage(
        r.getAs[Array[Byte]]("frame_bytes")).get
      val i = r.getLong(0).toInt
      val f = r.getInt(1)
      assert(f % 2 == 0)
      val p = img.getRGB(0, 0)
      assert(((p >> 16) & 0xff) == (i % 32) + f, "sampled frame pixels")
    }
  }

  test("frame sampling explodes only video assets at the requested stride") {
    val assets = Multimodal.syntheticAssets(spark, 12)
    val frames = Multimodal.sampleFrames(assets, everyN = 2, frameSize = 32)
    val byAsset = frames.groupBy("asset_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // videos are asset_id % 3 == 2
    assert(byAsset.keySet.forall(_ % 3 == 2))
    assert(frames.select("frame_no").collect().forall(_.getInt(0) % 2 == 0))
  }

  test("modality stats and resize metadata") {
    val assets = Multimodal.syntheticAssets(spark, 30)
    val stats = Multimodal.modalityStats(assets).collect()
    assert(stats.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
    assert(stats.map(_.getLong(1)).sum == 30)
    val resized = Multimodal.resizeMeta(assets, maxSide = 16)
      .select(col("resized_meta.width"), col("resized_meta.height")).collect()
    assert(resized.forall(r => r.getInt(0) <= 16 && r.getInt(1) <= 16))
  }

  // ---- datagen ----------------------------------------------------------

  test("stable generators are pure functions of (seed, pk)") {
    val v1 = StableGen.floatVector(42, 7, 16)
    val v2 = StableGen.floatVector(42, 7, 16)
    assert(v1.sameElements(v2))
    assert(!StableGen.floatVector(42, 8, 16).sameElements(v1))
    val norm = math.sqrt(v1.map(x => x * x.toDouble).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    assert(StableGen.sparseVector(42, 7).size <= 16)
    assert(StableGen.binaryVector(42, 7, 64).length == 8)
  }

  test("generateRows is distributed, deterministic, nullable at pk%10==0") {
    val d = CollectionDef("gen", Seq(
      FieldDef("id", LongType, nullable = false, isPrimary = true),
      FieldDef("category", LongType),
      FieldDef("content", StringType),
      FieldDef("emb", ArrayType(FloatType), dim = Some(8))))
    val df1 = StableGen.generateRows(spark, d, seed = 42, startPk = 0, count = 40)
    val df2 = StableGen.generateRows(spark, d, seed = 42, startPk = 0, count = 40)
    assert(df1.count() == 40)
    val r1 = df1.orderBy("id").collect()
    assert(r1.sameElements(df2.orderBy("id").collect()))
    assert(r1.filter(_.getLong(0) % 10 == 0).forall(_.isNullAt(1)))
    assert(r1.filter(_.getLong(0) % 10 != 0).forall(!_.isNullAt(1)))
  }

  // ---- npy reader -------------------------------------------------------

  test("square polygon around a point contains it; corners at the right offsets") {
    val s = spark
    import s.implicits._
    import graft.Functions
    val df = Seq((-73.982102, 40.73629, 4.0)).toDF("lon", "lat", "area")
    val wkt = df.select(Functions.squarePolygonWkt(
      col("lon"), col("lat"), col("area")).as("p")).head().getString(0)
    assert(wkt.startsWith("POLYGON((") && wkt.endsWith("))"))
    // ring closes: first and last corner identical
    val corners = wkt.stripPrefix("POLYGON((").stripSuffix("))").split(", ")
    assert(corners.length == 5 && corners.head == corners.last)
    // the generating point is inside its own polygon
    val contained = df.select(Functions.stContains(
      Functions.squarePolygonWkt(col("lon"), col("lat"), col("area")),
      concat(lit("POINT ("), col("lon").cast("string"), lit(" "),
        col("lat").cast("string"), lit(")"))).as("c")).head().getBoolean(0)
    assert(contained)
    // side length: 2 km square -> lat span = 2 / 111.195 degrees
    val lats = corners.dropRight(1).map(_.split(" ")(1).toDouble)
    assert(math.abs((lats.max - lats.min) - 2.0 / 111.195) < 1e-9)
  }

  test("ST_EQUALS polygon equality up to closure, rotation, and direction") {
    import org.apache.spark.sql.graft.functions.Wkt
    val base = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    assert(Wkt.geomEquals(base, "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))"))
    // rotated start vertex, unclosed ring
    assert(Wkt.geomEquals(base, "POLYGON ((4 4, 0 4, 0 0, 4 0))"))
    // reversed winding
    assert(Wkt.geomEquals(base, "POLYGON ((0 0, 0 4, 4 4, 4 0, 0 0))"))
    // a genuinely different ring
    assert(!Wkt.geomEquals(base, "POLYGON ((0 0, 5 0, 4 4, 0 4, 0 0))"))
    // mixed types never compare equal
    assert(!Wkt.geomEquals(base, "POINT (0 0)"))
    assert(!Wkt.geomEquals("POINT (0 0)", base))
  }

  test("npy reader round-trips a float32 2-D array written by numpy") {
    // hand-write an npy v1.0 file: 3x4 float32, C order, little endian
    val dir = Files.createTempDirectory("graft-npy")
    val path = dir.resolve("t.npy").toString
    val header = "{'descr': '<f4', 'fortran_order': False, 'shape': (3, 4), }"
    val padLen = 64 - (10 + header.length + 1) % 64
    val fullHeader = header + " " * padLen + "\n"
    val buf = java.nio.ByteBuffer.allocate(10 + fullHeader.length + 3 * 4 * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(0x93.toByte).put("NUMPY".getBytes("ISO-8859-1"))
      .put(1.toByte).put(0.toByte)
      .putShort(fullHeader.length.toShort)
    buf.put(fullHeader.getBytes("ISO-8859-1"))
    val data = (0 until 12).map(i => i * 0.5f)
    data.foreach(buf.putFloat)
    Files.write(Paths.get(path), buf.array())

    val df = Npy.read(spark, path, parallelism = 2)
    val rows = df.orderBy("row_id").collect()
    assert(rows.length == 3)
    assert(rows(0).getSeq[Double](1) == Seq(0.0, 0.5, 1.0, 1.5))
    assert(rows(2).getSeq[Double](1) == Seq(4.0, 4.5, 5.0, 5.5))
    val h = Npy.readHeader(path)
    assert(h.dtype == "<f4" && h.shape == Seq(3, 4))
  }

  // ---- jsonl -> expression converter ------------------------------------

  test("jsonl query objects convert to the reference's expression forms") {
    assert(JsonlExpressions.convert(
      """{"timestamp": {"$gte": 1000, "$lte": 2000}}""")
      == "1000 <= timestamp <= 2000")
    assert(JsonlExpressions.convert(
      """{"device_id": {"$in": ["a", "b"]}}""")
      == """device_id in ["a", "b"]""")
    assert(JsonlExpressions.convert(
      """{"tag_id": {"$in": ["t1"]}}""", arrayFields = Set("tag_id"))
      == """ARRAY_CONTAINS_ANY(tag_id, ["t1"])""")
    assert(JsonlExpressions.convert(
      """{"tag_id": {"contains_all": ["t1", "t2"]}}""", arrayFields = Set("tag_id"))
      == """ARRAY_CONTAINS_ALL(tag_id, ["t1", "t2"])""")
    assert(JsonlExpressions.convert(
      """{"sensor": {"$not_in": ["x", "y"]}}""")
      == """sensor != "x" and sensor != "y"""")
    assert(JsonlExpressions.convert(
      """{"expert_collected": true, "type_model": "M5"}""")
      == """expert_collected == true and type_model == "M5"""")
    // the converted strings must themselves parse
    val s = spark
    import s.implicits._
    val df = Seq((1L, 1500L, "a")).toDF("id", "timestamp", "device_id")
    val expr = JsonlExpressions.convert(
      """{"timestamp": {"$gte": 1000, "$lte": 2000}, "device_id": {"$in": ["a"]}}""")
    assert(graft.expr.MilvusExpr.filter(df, expr).count() == 1)
  }
}
