package graft.plans

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.graft.Shims
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions is the `spark.sql.extensions=...` deployment path.
  * That conf is STATIC — a second session in the same test JVM cannot
  * apply it — so the extension object is exercised directly through
  * the registry it would install.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions installs the full SQL function surface") {
    val names = Shims.extensionFunctionNames(new GraftExtensions)
    assert(names.toSet == Set("vec_dot", "vec_l2", "vec_cosine", "vec_norm",
      "hamming_distance", "sparse_ip", "st_contains"))
  }

  test("registered builders resolve and evaluate") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    def arr(v: Double*) = Literal.create(ArrayData.toArrayData(v.toArray),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))
    val cos = Shims.evalRegistered(new GraftExtensions, "vec_cosine",
      Seq(arr(1.0, 0.0), arr(1.0, 0.0)))
    assert(cos == 1.0)
    val l2 = Shims.evalRegistered(new GraftExtensions, "vec_l2",
      Seq(arr(0.0, 0.0), arr(3.0, 4.0)))
    assert(l2 == 5.0)
  }
}
