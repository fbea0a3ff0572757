package graft
import graft.operators.{Knn, QueryOps}
import graft.text.Bm25
import org.apache.spark.sql.functions._
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.01"
    val spark = GraftSession.get()
    import spark.implicits._
    val li = Tables.load(spark, dir, "lineitem")
    println("=== Q1 filter+projection (expect PushedFilters + pruned ReadSchema) ===")
    QueryOps.query(li, Some($"l_returnflag" === "A" && $"l_quantity" > 25),
      Seq("l_orderkey", "l_quantity")).explain("formatted")
    val emb = Tables.load(spark, dir, "embeddings")
    val q0 = emb.filter($"vec_id" === 0).select($"embedding").head().getSeq[Float](0)
    println("=== searchOne (expect TakeOrderedAndProject) ===")
    Knn.searchOne(emb, q0, "embedding", "vec_id", "COSINE", 10).explain("formatted")
    println("=== batched search small k (expect BroadcastNestedLoopJoin + WindowGroupLimit) ===")
    val q = emb.filter($"vec_id".isin(0,1)).select($"vec_id".as("qid"), $"embedding".as("qvec"))
    Knn.search(emb, q, "embedding", "vec_id", "L2", 10).explain("formatted")
    println("=== BM25 score (expect broadcast hash join on term) ===")
    val ix = Bm25.buildIndex(Tables.load(spark, dir, "documents"), "text", "doc_id")
    Bm25.score(ix, "vector stream").explain("formatted")
    spark.stop()
  }
}
