package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.Exchange

/** Scale-adaptive fan-out for CPU-heavy per-row work fused above tiny
  * scans.
  *
  * Spark sizes scan tasks by bytes (`spark.sql.files.maxPartitionBytes`),
  * so a small single-row-group parquet file plans as ONE task — and
  * everything whole-stage-codegen fuses above that scan (cross-join kNN
  * scoring, tokenize + explode, shingle hashing) executes serially no
  * matter how many cores the session has. That is invisible at the
  * 100 TB design point (scans there carry thousands of splits) but
  * serializes exactly the operators whose per-row work is heaviest.
  *
  * `spread` round-robins the rows across the session's default
  * parallelism ONLY when the planned parallelism is below it: at scale
  * the condition is false and the plan is untouched; locally the extra
  * exchange moves a few MB once and unlocks every core for the work
  * above it. Callers should project to the needed columns first so the
  * exchange carries keys + payload actually used (guide §2.3).
  */
object Par {

  /** Row count of a driver-local frame, read off the analyzed plan for
    * free (LocalRelation under nothing but Project / SubqueryAlias /
    * Filter) — None for anything scan- or shuffle-backed. Lets batch
    * operators size their fan-out decision by nq without running a job.
    */
  def localRows(df: DataFrame): Option[Int] = {
    import org.apache.spark.sql.catalyst.plans.logical._
    val plan = df.queryExecution.analyzed
    val shapeSafe = plan.collect { case n => n }.forall {
      case _: Project | _: SubqueryAlias | _: LocalRelation | _: Filter =>
        true
      case _ => false
    }
    plan.collectLeaves() match {
      case Seq(lr: LocalRelation) if shapeSafe => Some(lr.data.length)
      case _ => None
    }
  }

  def spread(df: DataFrame): DataFrame = {
    // Plans that already carry an Exchange end at shuffle parallelism —
    // nothing to fix, and probing THEIR partition count via .rdd would
    // let adaptive execution materialize the shuffle eagerly (a wasted
    // double execution). Inspect the pre-adaptive physical plan: only
    // exchange-free frames (scans, local relations, projections above
    // them) are candidates, and for those .rdd is a pure planning step.
    val hasExchange =
      df.queryExecution.sparkPlan.collectFirst { case e: Exchange => e }
        .isDefined
    if (hasExchange) df
    else {
      val target = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < target) df.repartition(target) else df
    }
  }
}
