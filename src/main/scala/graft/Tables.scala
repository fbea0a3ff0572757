package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided deterministic parquet tables
  * (see TESTDATA.md). All engine queries take a scale-factor directory
  * and read through here so the scan always carries pushed filters and
  * pruned columns from the caller's plan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view so `spark.sql` text queries and
    * the DuckDB oracle see the same relation names.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
