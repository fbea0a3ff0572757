package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Link-authority scoring over a directed graph — the link-based
  * quality prior of large-corpus pipelines (crawl-graph authority used
  * to weight or select training documents, the role page rank plays in
  * Common-Crawl-derived corpora).
  *
  * Classic PageRank sums floating-point contributions whose addition
  * order is partition- and engine-dependent — two runs over 100 TB
  * would not reproduce bit-for-bit, and a DuckDB/Spark cross-check
  * could flap on the last ulp. This variant propagates INTEGER rank
  * mass with floor division, so every value is exact in Long and the
  * result is identical on every engine, partition layout, and retry:
  *
  *   contrib(u→v) = (mass(u) · dampNum) div (dampDen · outdeg(u))
  *   mass'(v)     = base + Σ contrib(u→v)   over in-edges of v
  *   base         = (initMass · (dampDen − dampNum)) div dampDen
  *
  * With dampNum/dampDen = 85/100 this is damped PageRank up to the
  * floor truncation (≤ outdeg rounding units per node per iteration —
  * ~1e-6 relative at the default initMass); dangling mass is absorbed
  * rather than redistributed (documented variant: the scores are a
  * quality PRIOR, not a probability distribution).
  *
  * Scale shape: per iteration, one equi-join of the edge relation with
  * the current mass vector and one map-side-combined groupBy(dst) sum —
  * both shuffle on the node key; no driver-side state beyond the loop
  * counter. The edge-dedup and outdeg exchanges appear once per
  * iteration in the LOGICAL plan but execute ONCE: AQE's runtime stage
  * reuse dedupes the identical shuffle stages (ReusedExchange,
  * plan-asserted in LinkRankSpec), so the upstream edge derivation — a
  * potentially huge join — is not re-run per round. The logical plan
  * still grows linearly with `iters`; past ~10 iterations callers
  * should `localCheckpoint()` intermediate masses to keep planning
  * cost flat — at the typical 3-5 iterations of a quality prior it is
  * irrelevant.
  *
  * Overflow: total mass never exceeds nodes · initMass (folding only
  * moves or destroys mass), so contributions stay below
  * nodes · initMass · dampNum — with the defaults, safe in Long up to
  * ~10^11 nodes.
  */
object LinkRank {

  /** Ranks after `iters` mass-propagation rounds.
    * @return columns: id (node), mass (LongType authority score)
    */
  def linkRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int = 3,
      initMass: Long = 1000000L,
      dampNum: Long = 85,
      dampDen: Long = 100): DataFrame = {
    require(iters >= 0, s"iters must be non-negative, got $iters")
    require(dampDen > 0 && dampNum >= 0 && dampNum <= dampDen,
      s"damping $dampNum/$dampDen must be a fraction in [0,1]")
    require(initMass > 0, s"initMass must be positive, got $initMass")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val base = initMass * (dampDen - dampNum) / dampDen
    var mass = nodes.withColumn("mass", lit(initMass))
    for (_ <- 0 until iters) {
      // `div` = exact integral division (the SQL operator); a
      // floor(double /) here could disagree with an integer engine by
      // one unit when the true quotient is integral.
      val contrib = e
        .join(mass.withColumnRenamed("id", "src"), "src")
        .join(outdeg, "src")
        .selectExpr("dst",
          s"(mass * ${dampNum}L) div (${dampDen}L * outdeg) as _c")
        .groupBy("dst").agg(sum("_c").as("_in"))
      mass = nodes
        .join(contrib.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          (lit(base) + coalesce(col("_in"), lit(0L))).as("mass"))
    }
    mass
  }
}
