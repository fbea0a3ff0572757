package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.functions._
import org.apache.spark.sql.types._

/** Regression: every metric expression must COMPILE inside
  * GenerateUnsafeProjection, whose generated `apply` method names its
  * input-row parameter `i`. A kernel declaring a literal `int i` loop
  * variable shadows it, Janino rejects the shadowing, and the
  * projection silently falls back to interpreted eval — which is how
  * every aggregate result projection carrying a distance ran until
  * round 7. `GenerateUnsafeProjection.generate` (no fallback wrapper)
  * throws on a compile error, so these calls ARE the assertion.
  */
class CodegenCompileSpec extends SparkSpec {

  private val fvec = BoundReference(0, ArrayType(FloatType), nullable = true)
  private val dlit = Literal(
    ArrayData.toArrayData(Array(1.0, 2.0, 3.0, 4.0)), ArrayType(DoubleType))
  private val bin = BoundReference(1, BinaryType, nullable = true)

  test("metric expressions compile in an UnsafeProjection (row param `i`)") {
    GenerateUnsafeProjection.generate(Seq(VectorDot(fvec, dlit)))
    GenerateUnsafeProjection.generate(Seq(VectorL2(fvec, dlit)))
    GenerateUnsafeProjection.generate(Seq(VectorCosine(fvec, dlit)))
    GenerateUnsafeProjection.generate(Seq(VectorNorm(
      Cast(fvec, ArrayType(DoubleType)))))
    GenerateUnsafeProjection.generate(Seq(HammingDistance(bin, bin)))
    GenerateUnsafeProjection.generate(Seq(CenteredSignBits(fvec, dlit)))
    GenerateUnsafeProjection.generate(Seq(
      LshSignature(fvec, Array.fill(8)(0.5), 2)))
    // two instances in ONE projection: fresh names must not collide
    GenerateUnsafeProjection.generate(Seq(
      VectorCosine(fvec, dlit), VectorCosine(fvec, dlit),
      VectorL2(fvec, dlit), VectorDot(fvec, dlit)))
  }

  test("codegen'd cosine in an aggregate result projection is correct") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (2L, Seq(0f, 1f)))
      .toDF("id", "vec")
    // dropDuplicates -> SortAggregate result projection carries the score
    val got = df.dropDuplicates("id")
      .select(col("id"),
        graft.Functions.vecCosine(col("vec"), lit(Array(1.0, 0.0))).as("score"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(got == Seq((1L, 1.0), (2L, 0.0)))
  }
}
