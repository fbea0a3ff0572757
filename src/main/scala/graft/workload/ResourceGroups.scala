package graft.workload

import org.apache.spark.sql.SparkSession

/** Resource groups (reference S14, create_n_load_rg.py:46-64) mapped
  * to Spark fair-scheduler pools: a "resource group" is a named pool;
  * loading a collection "into" a group runs its jobs under that pool's
  * share. This is the Spark-native isolation primitive — per-pool
  * weights/minShare substitute for Milvus query-node grouping.
  */
object ResourceGroups {
  private val groups = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def create(name: String): Unit = groups.add(name)

  def drop(name: String): Unit = groups.remove(name)

  def list(): Seq[String] = {
    import scala.collection.JavaConverters._
    groups.asScala.toSeq.sorted
  }

  /** Run `body` with jobs attributed to the group's scheduler pool. */
  def withGroup[T](spark: SparkSession, name: String)(body: => T): T = {
    require(groups.contains(name), s"no resource group $name")
    val sc = spark.sparkContext
    sc.setLocalProperty("spark.scheduler.pool", name)
    try body
    finally sc.setLocalProperty("spark.scheduler.pool", null)
  }
}
