package graft

import graft.operators.{Fusion, Knn, QueryOps}
import org.apache.spark.sql.functions._

/** Hand-run smoke driver: exercises the public API end-to-end against
  * the sf0.001 testdata. Not part of the driver contract; used for
  * manual verification (`sbt "runMain graft.Smoke"`).
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.get()
    import spark.implicits._

    val emb = Tables.load(spark, sfDir, "embeddings")
    // Query vector = embedding of vec_id 0; its own top-1 must be itself.
    val q0 = emb.filter($"vec_id" === 0).select($"embedding").head()
      .getSeq[Float](0)

    val one = Knn.searchOne(emb, q0, "embedding", "vec_id", "COSINE", 5,
      outputCols = Seq("label"))
    println("searchOne COSINE top5:")
    one.show(false)

    val queries = Seq((0L, q0.map(_.toDouble).toArray)).toDF("qid", "qvec")
    val batch = Knn.search(emb, queries, "embedding", "vec_id", "L2", 3)
    println("batched L2 top3:")
    batch.show(false)

    val li = Tables.load(spark, sfDir, "lineitem")
    println("countStar(l_quantity > 30):")
    QueryOps.countStar(li, Some($"l_quantity" > 30)).show()

    Functions.register(spark)
    Tables.registerAll(spark, sfDir)
    println("SQL-registered vec_cosine self-similarity (expect 1.0):")
    spark.sql(
      "SELECT vec_id, vec_cosine(embedding, embedding) AS self FROM embeddings LIMIT 3"
    ).show()

    val r1 = Knn.search(emb, queries, "embedding", "vec_id", "COSINE", 10)
    val r2 = Knn.search(emb, queries, "embedding", "vec_id", "L2", 10)
    println("RRF fusion of COSINE+L2 top5:")
    Fusion.rrf(Seq(r1, r2), Seq("vec_id"), limit = 5).show(false)

    spark.stop()
  }
}
