package graft.functions

/** fp16 / bf16 conversion utilities (reference FLOAT16_VECTOR /
  * BFLOAT16_VECTOR fidelity: generators store raw 2-byte lanes and
  * compute in float32 — common/data.py:32-42: bf16 = fp32 bits >> 16).
  * Storage keeps the exact bytes (BinaryType columns) so checksums are
  * stable; computation widens to float.
  */
object HalfFloat {

  /** bf16: top 16 bits of the fp32 pattern (truncation, matching the
    * reference's `view(uint32) >> 16`).
    */
  def floatToBf16(f: Float): Short =
    (java.lang.Float.floatToIntBits(f) >>> 16).toShort

  def bf16ToFloat(b: Short): Float =
    java.lang.Float.intBitsToFloat((b & 0xffff) << 16)

  /** IEEE 754 half precision (fp16), round-to-nearest-even.
    * (Java 17 lacks Float.floatToFloat16 — added in 20 — so this is the
    * standard bit-level conversion.)
    */
  def floatToFp16(f: Float): Short = {
    val bits = java.lang.Float.floatToIntBits(f)
    val sign = (bits >>> 16) & 0x8000
    val exp = ((bits >>> 23) & 0xff) - 127 + 15
    val mant = bits & 0x7fffff
    if (((bits >>> 23) & 0xff) == 0xff) {
      // Inf/NaN
      (sign | 0x7c00 | (if (mant != 0) 0x200 else 0)).toShort
    } else if (exp >= 0x1f) (sign | 0x7c00).toShort // overflow -> Inf
    else if (exp <= 0) {
      if (exp < -10) sign.toShort // underflow -> signed zero
      else {
        // subnormal: shift mantissa (with implicit 1) right
        val m = (mant | 0x800000) >>> (1 - exp + 13)
        val rem = (mant | 0x800000) & ((1 << (1 - exp + 13)) - 1)
        val half = 1 << (1 - exp + 12)
        val rounded =
          if (rem > half || (rem == half && (m & 1) == 1)) m + 1 else m
        (sign | rounded).toShort
      }
    } else {
      val m = mant >>> 13
      val rem = mant & 0x1fff
      val rounded =
        if (rem > 0x1000 || (rem == 0x1000 && (m & 1) == 1)) m + 1 else m
      val out = (exp << 10) + rounded // mantissa carry bumps the exponent
      (sign | out).toShort
    }
  }

  def fp16ToFloat(h: Short): Float = {
    val sign = (h & 0x8000) << 16
    val exp = (h >>> 10) & 0x1f
    val mant = h & 0x3ff
    val bits =
      if (exp == 0x1f) sign | 0x7f800000 | (mant << 13) // Inf/NaN
      else if (exp == 0) {
        if (mant == 0) sign
        else {
          // subnormal: normalize
          var m = mant
          var e = -1
          while ((m & 0x400) == 0) { m <<= 1; e += 1 }
          sign | ((127 - 15 - e) << 23) | ((m & 0x3ff) << 13)
        }
      } else sign | ((exp - 15 + 127) << 23) | (mant << 13)
    java.lang.Float.intBitsToFloat(bits)
  }

  /** Pack a float vector into little-endian bf16 bytes (the stored
    * representation) and back.
    */
  def packBf16(v: Array[Float]): Array[Byte] = {
    val out = new Array[Byte](v.length * 2)
    var i = 0
    while (i < v.length) {
      val s = floatToBf16(v(i))
      out(2 * i) = (s & 0xff).toByte
      out(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  def unpackBf16(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](bytes.length / 2)
    var i = 0
    while (i < out.length) {
      val s = ((bytes(2 * i) & 0xff) | ((bytes(2 * i + 1) & 0xff) << 8)).toShort
      out(i) = bf16ToFloat(s)
      i += 1
    }
    out
  }

  def packFp16(v: Array[Float]): Array[Byte] = {
    val out = new Array[Byte](v.length * 2)
    var i = 0
    while (i < v.length) {
      val s = floatToFp16(v(i))
      out(2 * i) = (s & 0xff).toByte
      out(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  def unpackFp16(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](bytes.length / 2)
    var i = 0
    while (i < out.length) {
      val s = ((bytes(2 * i) & 0xff) | ((bytes(2 * i + 1) & 0xff) << 8)).toShort
      out(i) = fp16ToFloat(s)
      i += 1
    }
    out
  }
}
