package graft

import graft.ann.{Ivf, RaBitQ}
import org.apache.spark.sql.functions._

/** Reproducible operating-point sweep for `v15_rabitq_recall`:
  * recall@10 over candidate operating points (nlist ∈ {16, 32},
  * sampleSize=2000, query ids 0/7/42) across an (nprobe, refine)
  * grid, from which the entry's pinned point
  * (nlist=32, nprobe=24, refine=16) was chosen as a measured ≥0.9
  * result rather than a guess.
  */
object TuneRabitq {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Functions.register(spark)
    val emb = Tables.load(spark, dir, "embeddings").cache()
    emb.count()
    val qids = Seq(0L, 7L, 42L)
    val queries = qids.map { id =>
      id -> emb.filter(col("vec_id") === id)
        .select("embedding").head().getSeq[Float](0)
    }
    for (nlist <- Seq(16, 32)) {
      val model = Ivf.train(emb, "embedding", k = nlist, sampleSize = 2000)
      val enc = RaBitQ.encode(emb, "embedding", model).cache()
      enc.count()
      for (nprobe <- Seq(nlist / 4, nlist / 2, 3 * nlist / 4); refine <- Seq(8, 16, 32)) {
        val t = System.nanoTime()
        val recall = RaBitQ.recallAtK(emb, enc, model, queries,
          "embedding", "vec_id", k = 10, nprobe = nprobe, refine = refine)
        println(f"nlist=$nlist nprobe=$nprobe refine=$refine recall@10=$recall%.4f " +
          f"(${(System.nanoTime() - t) / 1e9}%.2fs)")
      }
      enc.unpersist()
    }
    spark.stop()
  }
}
