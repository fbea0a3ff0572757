package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
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

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS); with nanosAsLong it arrives
    // as LongType nanos — convert to a real timestamp (micro precision,
    // matching what DuckDB sees after its own nanos handling).
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast(LongType)))
    else df
  }

  /** Register every table as a temp view so `spark.sql` text queries and
    * the DuckDB oracle see the same relation names.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
