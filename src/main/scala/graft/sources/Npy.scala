package graft.sources

import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Minimal NumPy `.npy` reader for vector data (reference S18 format
  * converters: tpuffer/npy_to_json.py). Supports 1-D and 2-D float32 /
  * float64 / int64 arrays in C order — the shapes vector benchmarks
  * ship.
  *
  * The header is parsed on the driver; row data is sliced into
  * `parallelism` contiguous row ranges that executors decode
  * independently, so large files don't bottleneck on the driver.
  */
object Npy {

  final case class Header(dtype: String, shape: Seq[Int], dataOffset: Long)

  def readHeader(path: String): Header = {
    val ch = java.nio.channels.FileChannel.open(Paths.get(path))
    try {
      val magic = ByteBuffer.allocate(10)
      ch.read(magic)
      magic.flip()
      val m = new Array[Byte](6)
      magic.get(m)
      require(m.sameElements("NUMPY".getBytes("ISO-8859-1")),
        s"$path is not an npy file")
      magic.get() // major
      magic.get() // minor
      val headerLen = (magic.get() & 0xff) | ((magic.get() & 0xff) << 8)
      val hdrBuf = ByteBuffer.allocate(headerLen)
      ch.read(hdrBuf)
      val header = new String(hdrBuf.array(), "ISO-8859-1")
      val dtype = "'descr':\\s*'([^']+)'".r.findFirstMatchIn(header)
        .map(_.group(1)).getOrElse(sys.error("no descr in npy header"))
      val fortran = "'fortran_order':\\s*(True|False)".r
        .findFirstMatchIn(header).map(_.group(1)).contains("True")
      require(!fortran, "fortran_order npy not supported")
      val shape = "'shape':\\s*\\(([^)]*)\\)".r.findFirstMatchIn(header)
        .map(_.group(1)).getOrElse(sys.error("no shape in npy header"))
        .split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
      Header(dtype, shape, 10L + headerLen)
    } finally ch.close()
  }

  private def elemSize(dtype: String): Int = dtype.takeRight(1) match {
    case "4" => 4
    case "8" => 8
    case other => sys.error(s"unsupported npy dtype $dtype")
  }

  /** Read a 2-D (or 1-D, treated as n×1) npy as (row_id, values). */
  def read(spark: SparkSession, path: String,
      parallelism: Int = 4): DataFrame = {
    val h = readHeader(path)
    require(h.shape.nonEmpty && h.shape.length <= 2,
      s"unsupported npy rank ${h.shape.length}")
    val rows = h.shape.head
    val cols = if (h.shape.length == 2) h.shape(1) else 1
    val esize = elemSize(h.dtype)
    val little = h.dtype.startsWith("<") || h.dtype.startsWith("|")
    val dtype = h.dtype
    val offset = h.dataOffset
    val schema = StructType(Seq(
      StructField("row_id", LongType, nullable = false),
      StructField("values", ArrayType(DoubleType), nullable = false)))
    val ranges = {
      val per = math.max(1, rows / parallelism)
      (0 until rows by per).map(s => (s, math.min(rows, s + per)))
    }
    val rdd = spark.sparkContext.parallelize(ranges, ranges.length)
      .flatMap { case (start, end) =>
        val ch = java.nio.channels.FileChannel.open(Paths.get(path))
        try {
          val buf = ByteBuffer.allocate((end - start) * cols * esize)
          ch.position(offset + start.toLong * cols * esize)
          var read = 0
          while (read < buf.capacity()) {
            val n = ch.read(buf)
            require(n > 0, s"truncated npy file $path")
            read += n
          }
          buf.flip()
          buf.order(if (little) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
          (start until end).map { r =>
            val vals = new Array[Double](cols)
            var c = 0
            while (c < cols) {
              vals(c) = dtype.drop(1) match {
                case "f4" => buf.getFloat(((r - start) * cols + c) * esize).toDouble
                case "f8" => buf.getDouble(((r - start) * cols + c) * esize)
                case "i8" => buf.getLong(((r - start) * cols + c) * esize).toDouble
                case "i4" => buf.getInt(((r - start) * cols + c) * esize).toDouble
                case other => sys.error(s"unsupported npy dtype <$other")
              }
              c += 1
            }
            Row(r.toLong, vals.toSeq)
          }
        } finally ch.close()
      }
    spark.createDataFrame(rdd, schema)
  }

  /** npy → parquet converter (S18). */
  def toParquet(spark: SparkSession, npyPath: String, outPath: String): Unit =
    read(spark, npyPath).write.mode("overwrite").parquet(outPath)
}

/** jsonl → Milvus-expression converter mirroring
  * horizonPoc/convert_jsonl_to_expressions.py:40-100: each JSON query
  * object becomes one filter-expression string ($gte/$lte ranges use
  * the combined `a <= x <= b` form, $in becomes IN lists or
  * ARRAY_CONTAINS_ANY for array fields, $not_in becomes per-value !=,
  * booleans compare against true/false).
  */
object JsonlExpressions {
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  def convert(jsonLine: String,
      arrayFields: Set[String] = Set.empty): String = {
    val j = JsonMethods.parse(jsonLine).asInstanceOf[JObject]
    val conditions = j.obj.flatMap { case (field, spec) =>
      spec match {
        case JObject(ops) =>
          val m = ops.toMap
          val range = (m.get("$gte"), m.get("$lte")) match {
            case (Some(lo), Some(hi)) =>
              Seq(s"${num(lo)} <= $field <= ${num(hi)}")
            case (Some(lo), None) => Seq(s"$field >= ${num(lo)}")
            case (None, Some(hi)) => Seq(s"$field <= ${num(hi)}")
            case _ => Seq.empty
          }
          val in = m.get("$in").toSeq.map {
            case JArray(vs) =>
              val list = vs.map(lit).mkString("[", ", ", "]")
              if (arrayFields.contains(field)) s"ARRAY_CONTAINS_ANY($field, $list)"
              else s"$field in $list"
            case other => sys.error(s"bad $$in: $other")
          }
          val all = m.get("contains_all").toSeq.map {
            case JArray(vs) =>
              s"ARRAY_CONTAINS_ALL($field, ${vs.map(lit).mkString("[", ", ", "]")})"
            case other => sys.error(s"bad contains_all: $other")
          }
          val notIn = m.get("$not_in").toSeq.flatMap {
            case JArray(vs) => vs.map(v => s"$field != ${lit(v)}")
            case other => sys.error(s"bad $$not_in: $other")
          }
          range ++ in ++ all ++ notIn
        case JBool(b) => Seq(s"$field == $b")
        case JString(sv) => Seq(s"""$field == "$sv"""")
        case JInt(i) => Seq(s"$field == $i")
        case JDouble(d) => Seq(s"$field == $d")
        case other => sys.error(s"unsupported query spec for $field: $other")
      }
    }
    conditions.mkString(" and ")
  }

  private def num(v: JValue): String = v match {
    case JInt(i) => i.toString
    case JDouble(d) => d.toString
    case JString(s) => s
    case other => sys.error(s"not a number: $other")
  }

  private def lit(v: JValue): String = v match {
    case JString(s) => "\"" + s + "\""
    case JInt(i) => i.toString
    case JDouble(d) => d.toString
    case JBool(b) => b.toString
    case other => sys.error(s"bad literal $other")
  }
}
