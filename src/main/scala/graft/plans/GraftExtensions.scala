package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.functions._

/** SparkSessionExtensions entry point: registers every engine function
  * into the session's catalog at build time, so a cluster deployment
  * enables the engine with
  *
  *   spark.sql.extensions=graft.plans.GraftExtensions
  *
  * and `SELECT vec_cosine(a, b)` works in plain SQL with no
  * driver-side registration call. (The same registry entries are also
  * installed imperatively by `graft.Functions.register` for embedded
  * use.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private val entries: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> { args => VectorDot(args(0), args(1)) },
    "vec_l2" -> { args => VectorL2(args(0), args(1)) },
    "vec_cosine" -> { args => VectorCosine(args(0), args(1)) },
    "vec_norm" -> { args => VectorNorm(args(0)) },
    "hamming_distance" -> { args => HammingDistance(args(0), args(1)) },
    "sparse_ip" -> { args => SparseInnerProduct(args(0), args(1)) },
    "st_contains" -> { args => StContains(args(0), args(1)) },
  )

  override def apply(ext: SparkSessionExtensions): Unit =
    entries.foreach { case (name, builder) =>
      ext.injectFunction(
        (FunctionIdentifier(name), new ExpressionInfo("graft", name), builder))
    }
}
