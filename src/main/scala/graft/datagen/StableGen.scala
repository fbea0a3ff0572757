package graft.datagen

import graft.store.{CollectionDef, FieldDef}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Deterministic data generators mirroring the reference's stable-value
  * scheme (common/data.py:18-75,134-221): every field value is a pure
  * function of (seed, pk), so expected values are recomputable anywhere
  * — the foundation of the validator machinery.
  *
  * The RNG is SplittableRandom seeded with (seed + pk) — same *scheme*
  * as the reference's Random(seed + pk); values are self-consistent
  * within this engine (the reference's Mersenne-Twister bit stream is
  * not reproduced — there are no cross-engine golden values to match).
  */
object StableGen {

  private def rng(seed: Long, pk: Long) = new java.util.SplittableRandom(seed + pk)

  /** L2-normalized float vector (stable_float_vector). */
  def floatVector(seed: Long, pk: Long, dim: Int): Array[Float] = {
    val r = rng(seed, pk)
    val v = Array.fill(dim)(r.nextDouble())
    val norm = math.sqrt(v.map(x => x * x).sum)
    (if (norm == 0) v else v.map(_ / norm)).map(_.toFloat)
  }

  /** int8 vector (stable_int8_vector). */
  def int8Vector(seed: Long, pk: Long, dim: Int): Array[Byte] = {
    val r = rng(seed, pk)
    Array.fill(dim)((r.nextInt(256) - 128).toByte)
  }

  /** Packed-bit binary vector (stable_binary_vector). */
  def binaryVector(seed: Long, pk: Long, dim: Int): Array[Byte] = {
    val r = rng(seed, pk)
    Array.fill(math.max(1, dim / 8))(r.nextInt(256).toByte)
  }

  /** Sparse vector, <=16 nnz (stable_sparse_vector: 16 draws into a
    * dict, duplicate indices collapse).
    */
  def sparseVector(seed: Long, pk: Long, dim: Int = 1024): Map[Int, Double] = {
    val r = rng(seed, pk)
    (0 until 16).map(_ => r.nextInt(dim) -> r.nextDouble()).toMap
  }

  /** Scalar value patterns (common/data.py:140-192): modular categories,
    * token-prefixed text, nullable fields null at pk % 10 == 0.
    */
  def scalarValue(f: FieldDef, seed: Long, pk: Long): Any = {
    if (f.nullable && pk % 10 == 0) return null
    val r = rng(seed, pk)
    f.dataType match {
      case BooleanType => pk % 2 == 0
      case ByteType => (pk % 128).toByte
      case ShortType => (pk % 32768).toShort
      case IntegerType => (pk % 1000000).toInt
      case LongType => if (f.isPrimary) pk else pk % 1000000
      case FloatType => (pk % 100000) / 7.0f
      case DoubleType => (pk % 100000) / 7.0
      case StringType =>
        if (f.isPrimary) f"pk_$pk%020d"
        else s"token_${pk % 16} content_$pk"
      case TimestampType =>
        new java.sql.Timestamp(1704067200000L + pk * 1000) // 2024-01-01 + pk sec
      case ArrayType(LongType, _) => Seq.fill(4)(r.nextLong(1000))
      case ArrayType(StringType, _) => (0 until 4).map(i => s"e_${pk % 8}_$i")
      case ArrayType(FloatType, _) => floatVector(seed, pk, f.dim.getOrElse(8)).toSeq
      case MapType(IntegerType, _, _) => sparseVector(seed, pk)
      case BinaryType => binaryVector(seed, pk, f.dim.getOrElse(64))
      case other => throw new IllegalArgumentException(s"no generator for $other")
    }
  }

  /** Generate `count` rows for a collection starting at `startPk` —
    * distributed: pk ranges are generated inside partitions, so this
    * scales to any row count without a driver bottleneck.
    */
  def generateRows(spark: SparkSession, d: CollectionDef, seed: Long,
      startPk: Long, count: Int, parallelism: Int = 4): DataFrame = {
    val fields = d.fields
    val schema = StructType(fields.map(f =>
      StructField(f.name, f.dataType, f.nullable)))
    val rdd = spark.sparkContext
      .range(startPk, startPk + count, numSlices = parallelism)
      .map(pk => Row(fields.map(f => scalarValue(f, seed, pk)): _*))
    spark.createDataFrame(rdd, schema)
  }
}
