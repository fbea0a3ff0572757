package graft

import graft.ann.Ivf
import graft.operators.Knn
import org.apache.spark.sql.functions._

/** Reproducible operating-point sweep for `bench_knn_selfjoin_ivf`:
  * measures exact all-pairs wall time, then (nlist, nprobe) grid cells
  * with train/join time and recall@5. The pinned bench point
  * (nlist=64, nprobe=40 at sf0.1: recall 0.96, ~2.5x under exact)
  * came from this sweep.
  */
object TuneIvf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Functions.register(spark)
    val emb = Tables.load(spark, dir, "embeddings").cache()
    val n = emb.count()
    val k = 5

    val t0 = System.nanoTime()
    val exact = Knn.search(emb,
      emb.select(col("vec_id").as("qid"), col("embedding").as("qvec")),
      "embedding", "vec_id", "COSINE", k)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(f"exact all-pairs: ${(System.nanoTime() - t0) / 1e9}%.2fs")

    for ((nlist, nprobe) <- Seq((64, 40), (64, 40), (128, 64), (128, 64))) {
      val t1 = System.nanoTime()
      val model = Ivf.train(emb, "embedding", k = nlist, metric = "COSINE")
      val tTrain = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val ann = Ivf.selfJoin(emb, model, "embedding", "vec_id", k, nprobe)
        .select("qid", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val tJoin = (System.nanoTime() - t2) / 1e9
      val recall = (ann intersect exact).size.toDouble / exact.size
      println(f"nlist=$nlist%3d nprobe=$nprobe%3d train=$tTrain%.2fs " +
        f"join=$tJoin%.2fs recall@$k=$recall%.4f n=$n")
    }
    spark.stop()
  }
}
