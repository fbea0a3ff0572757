package graft

import org.apache.spark.sql.graft.functions._
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.{Column, SparkSession}

/** Column-level API over the engine's custom Catalyst expressions, plus
  * SQL-registry registration so every function is also callable from SQL
  * text (`SELECT vec_cosine(a, b) ...`).
  */
object Functions {
  private def c2e(c: Column): Expression = Shims.expression(c)
  private def e2c(e: Expression): Column = Shims.column(e)

  def vecDot(a: Column, b: Column): Column = e2c(VectorDot(c2e(a), c2e(b)))
  def vecL2(a: Column, b: Column): Column = e2c(VectorL2(c2e(a), c2e(b)))
  def vecCosine(a: Column, b: Column): Column = e2c(VectorCosine(c2e(a), c2e(b)))
  def vecNorm(a: Column): Column = e2c(VectorNorm(c2e(a)))
  def hammingDistance(a: Column, b: Column): Column =
    e2c(HammingDistance(c2e(a), c2e(b)))
  def centeredSignBits(vec: Column, center: Column): Column =
    e2c(CenteredSignBits(c2e(vec), c2e(center)))
  def lshSignature(vec: Column, planes: Array[Array[Double]]): Column =
    e2c(LshSignature(c2e(vec), planes.flatten, planes.length))
  def sparseIp(a: Column, b: Column): Column =
    e2c(SparseInnerProduct(c2e(a), c2e(b)))
  def sq8Encode(vec: Column, mins: Array[Double],
      invScales: Array[Double]): Column =
    e2c(Sq8Encode(c2e(vec), mins, invScales))
  def sq8AdcL2(code: Column, qAdj: Column, scaleSq: Array[Double]): Column =
    e2c(Sq8AdcL2(c2e(code), c2e(qAdj), scaleSq))
  def sq8AdcDot(code: Column, weights: Column): Column =
    e2c(Sq8AdcDot(c2e(code), c2e(weights)))
  def pqEncode(vec: Column, center: Column, codebook: Array[Double],
      m: Int, ksub: Int): Column =
    e2c(PqEncode(c2e(vec), c2e(center), codebook, m, ksub))
  def pqAdcLut(code: Column, lut: Column, ksub: Int): Column =
    e2c(PqAdcLut(c2e(code), c2e(lut), ksub))
  def dictTokenize(text: Column, words: Seq[String]): Column =
    e2c(DictTokenize(c2e(text), words))
  /** Char-budget boundary chunking → array<struct> for `inline()`;
    * see [[graft.text.Chunker.boundaryChunks]].
    */
  def chunkByBudget(text: Column, budget: Int, delim: String): Column =
    e2c(ChunkByBudget(c2e(text), budget, delim))
  /** Unicode normalization (NFC default; NFD/NFKC/NFKD accepted) —
    * run before fingerprint/dedup so composed and decomposed encodings
    * of the same visible text hash identically.
    */
  def unicodeNormalize(text: Column, form: String = "NFC"): Column =
    e2c(UnicodeNormalize(c2e(text), form))
  /** WKT square polygon of `areaSqKm` centered at (lon, lat) — the
    * reference's geo helper (2.6/cal_polygon_by_point.py:20-56):
    * 111.195 km per degree of latitude, cos(lat)-scaled longitude,
    * corners SW→SE→NE→NW→SW. Pairs with ST_CONTAINS for
    * area-around-a-point filters.
    */
  def squarePolygonWkt(lon: Column, lat: Column, areaSqKm: Column): Column = {
    import org.apache.spark.sql.functions._
    val half = sqrt(areaSqKm) / 2.0
    val latOff = half / 111.195
    val lonOff = half / (cos(radians(lat)) * 111.195)
    def pt(x: Column, y: Column) =
      concat(x.cast("string"), lit(" "), y.cast("string"))
    concat(lit("POLYGON(("),
      pt(lon - lonOff, lat - latOff), lit(", "),
      pt(lon + lonOff, lat - latOff), lit(", "),
      pt(lon + lonOff, lat + latOff), lit(", "),
      pt(lon - lonOff, lat + latOff), lit(", "),
      pt(lon - lonOff, lat - latOff), lit("))"))
  }

  def stContains(geo: Column, other: Column): Column =
    e2c(StContains(c2e(geo), c2e(other)))

  def stEquals(a: Column, b: Column): Column =
    e2c(StEquals(c2e(a), c2e(b)))

  /** Distance/similarity column for a Milvus metric name. Also reports
    * whether larger values rank closer (similarity) or smaller do
    * (distance) — callers use it to orient ORDER BY.
    */
  def metric(name: String, a: Column, b: Column): (Column, Boolean) =
    name.toUpperCase match {
      case "L2"      => (vecL2(a, b), false)
      case "IP"      => (vecDot(a, b), true)
      case "COSINE"  => (vecCosine(a, b), true)
      case "HAMMING" => (hammingDistance(a, b), false)
      case other     => throw new IllegalArgumentException(s"unknown metric $other")
    }

  /** Type-aware metric routing: the Milvus metric name is resolved
    * against the vector column's storage type — SPARSE_FLOAT_VECTOR
    * (map<int,double>) under IP routes to the sparse dot product,
    * BINARY_VECTOR (binary) to Hamming — so hybrid sparse+dense
    * searches compose through the one entry point.
    */
  def metricFor(name: String, dt: org.apache.spark.sql.types.DataType,
      a: Column, b: Column): (Column, Boolean) = {
    import org.apache.spark.sql.types.{BinaryType, MapType}
    (dt, name.toUpperCase) match {
      case (_: MapType, "IP" | "SPARSE" | "SPARSE_IP") => (sparseIp(a, b), true)
      case (_: MapType, other) =>
        throw new IllegalArgumentException(s"sparse vectors support IP, not $other")
      case (BinaryType, "HAMMING" | "JACCARD") => (hammingDistance(a, b), false)
      case _ => metric(name, a, b)
    }
  }

  private val registryEntries: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> { args => VectorDot(args(0), args(1)) },
    "vec_l2" -> { args => VectorL2(args(0), args(1)) },
    "vec_cosine" -> { args => VectorCosine(args(0), args(1)) },
    "vec_norm" -> { args => VectorNorm(args(0)) },
    "hamming_distance" -> { args => HammingDistance(args(0), args(1)) },
    "centered_sign_bits" -> { args => CenteredSignBits(args(0), args(1)) },
    "sparse_ip" -> { args => SparseInnerProduct(args(0), args(1)) },
    "nfc_normalize" -> { args => UnicodeNormalize(args(0), "NFC") },
    "st_contains" -> { args => StContains(args(0), args(1)) },
    "st_equals" -> { args => StEquals(args(0), args(1)) },
  )

  def register(spark: SparkSession): Unit =
    registryEntries.foreach { case (name, builder) =>
      Shims.registerFunction(spark, name, builder)
    }
}
