package graft.workload

import graft.store.{Collection, QuotaExceededException}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.util.concurrent.{ConcurrentLinkedDeque, Executors, TimeUnit}
import java.util.concurrent.atomic.{AtomicLong, AtomicBoolean}
import scala.collection.JavaConverters._
import scala.util.Random

/** Client-side workload machinery (§2.9 + A6): sliding-window latency
  * stats and the deterministic mixed-RW pressure runner
  * (common/workload.py:310-454, search_permanently.py:36-96).
  *
  * The runner drives Spark ACTIONS from a driver-side thread pool —
  * exactly the reference's shape (its thread pool drives gRPC calls;
  * ours drives job submissions, which Spark schedules concurrently
  * across the cluster).
  */
object Workload {

  /** Sliding-window stats: deque(maxlen=1000) of latencies, QPS over
    * actual elapsed time, p50/p95/p99 (search_permanently.py:36-96).
    */
  final class SimpleStats(windowSize: Int = 1000) {
    private val latencies = new ConcurrentLinkedDeque[Double]()
    private val total = new AtomicLong(0)
    private val failures = new AtomicLong(0)
    private val startNs = System.nanoTime()

    def record(latencySec: Double, ok: Boolean = true): Unit = {
      total.incrementAndGet()
      if (!ok) failures.incrementAndGet()
      latencies.addLast(latencySec)
      while (latencies.size > windowSize) latencies.pollFirst()
    }

    def snapshot(): Map[String, Double] = {
      val lats = latencies.asScala.toArray.sorted
      val elapsed = (System.nanoTime() - startNs) / 1e9
      def pct(p: Double): Double =
        if (lats.isEmpty) 0.0
        else lats(math.min(lats.length - 1, (p * lats.length).toInt))
      Map(
        "total" -> total.get().toDouble,
        "failed" -> failures.get().toDouble,
        "success_rate" ->
          (if (total.get() == 0) 1.0 else 1.0 - failures.get().toDouble / total.get()),
        "elapsed_sec" -> elapsed,
        "qps" -> (if (elapsed > 0) total.get() / elapsed else 0.0),
        "avg_latency" -> (if (lats.isEmpty) 0.0 else lats.sum / lats.length),
        "min_latency" -> (if (lats.isEmpty) 0.0 else lats.head),
        "max_latency" -> (if (lats.isEmpty) 0.0 else lats.last),
        "p50_latency" -> pct(0.50),
        "p95_latency" -> pct(0.95),
        "p99_latency" -> pct(0.99))
    }
  }

  /** Failure taxonomy (validators.py:17-23 transient patterns). */
  def isTransient(e: Throwable): Boolean = {
    val msg = Option(e.getMessage).getOrElse("").toLowerCase
    Seq("unavailable", "deadline", "connection", "timeout", "broken pipe")
      .exists(msg.contains)
  }

  final case class PressureResult(
      stats: Map[String, Double],
      perOp: Map[String, Long],
      errors: Seq[String])

  /** Deterministic mixed-RW pressure: `numOps` operations drawn from
    * `ops` with Random(seed), executed on `concurrency` driver threads
    * against a store Collection. Disjoint id spaces per op kind mirror
    * workload.py:29-31 (insert 10M / upsert 20M / delete 30M bases).
    */
  def runPressure(
      spark: SparkSession,
      coll: Collection,
      ops: Seq[String],
      numOps: Int,
      concurrency: Int = 4,
      seed: Long = 42L): PressureResult = {
    val stats = new SimpleStats()
    val perOp = new java.util.concurrent.ConcurrentHashMap[String, AtomicLong]()
    val errors = new ConcurrentLinkedDeque[String]()
    val rng = new Random(seed)
    val plan = (0 until numOps).map(i => (ops(rng.nextInt(ops.length)), rng.nextLong()))
    val pool = Executors.newFixedThreadPool(concurrency)
    val failed = new AtomicBoolean(false)
    plan.foreach { case (op, opSeed) =>
      pool.submit(new Runnable {
        def run(): Unit = {
          val t0 = System.nanoTime()
          // One retry: every op is idempotent under merge-on-read
          // (re-inserted PKs collapse in last-writer-wins), so a retry
          // masks only environment blips; a genuinely broken op fails
          // twice and still counts.
          val ok =
            try { runOp(spark, coll, op, opSeed); true }
            catch {
              case e1: Throwable =>
                errors.addLast(
                  s"$op (attempt 1): ${e1.getClass.getSimpleName}: ${e1.getMessage}")
                try { runOp(spark, coll, op, opSeed); true }
                catch {
                  case e2: Throwable =>
                    errors.addLast(
                      s"$op (attempt 2): ${e2.getClass.getSimpleName}: ${e2.getMessage}")
                    if (!isTransient(e2)) failed.set(true)
                    false
                }
            }
          stats.record((System.nanoTime() - t0) / 1e9, ok)
          perOp.computeIfAbsent(op, _ => new AtomicLong()).incrementAndGet()
        }
      })
    }
    pool.shutdown()
    pool.awaitTermination(30, TimeUnit.MINUTES)
    PressureResult(stats.snapshot(),
      perOp.asScala.map { case (k, v) => k -> v.get() }.toMap,
      errors.asScala.toSeq)
  }

  final case class DenyLoopResult(
      batchesInserted: Int, denyTimes: Int, entities: Long)

  /** Insert batches until the collection's write quota denies the DML
    * `maxDenyTimes` times (create_n_insert_until_denied.py:119-147: the
    * reference string-matches "memory quota exceeded", waits, retries,
    * and stops after max denies; here the typed QuotaExceededException
    * carries the same message and `backoffMillis` replaces the 15-min
    * sleep). Any non-quota failure aborts the loop, like the
    * reference's `else: break`.
    */
  def insertUntilDenied(
      spark: SparkSession,
      coll: Collection,
      batchFor: Int => DataFrame,
      maxDenyTimes: Int = 1,
      maxBatches: Int = 1000,
      backoffMillis: Long = 0L): DenyLoopResult = {
    val denies = math.max(maxDenyTimes, 1)
    var denyTimes = 0
    var r = 0
    var inserted = 0
    while (denyTimes < denies && r < maxBatches) {
      try {
        coll.insert(spark, batchFor(r))
        inserted += 1
      } catch {
        case e: QuotaExceededException =>
          require(e.getMessage.contains("memory quota exceeded"))
          denyTimes += 1
          if (denyTimes < denies && backoffMillis > 0)
            Thread.sleep(backoffMillis)
      }
      r += 1
    }
    DenyLoopResult(inserted, denyTimes, coll.numEntities(spark))
  }

  private val INSERT_BASE = 10_000_000L
  private val UPSERT_BASE = 20_000_000L

  private def runOp(spark: SparkSession, coll: Collection, op: String,
      opSeed: Long): Unit = {
    import spark.implicits._
    val r = new Random(opSeed)
    op match {
      case "insert" =>
        val base = INSERT_BASE + math.abs(opSeed % 1_000_000L) * 100
        coll.insert(spark, (0 until 10).map(i =>
          (base + i, r.nextLong(1000), s"w_${opSeed}_$i", 0L))
          .toDF("id", "category", "content", "version"))
      case "upsert" =>
        val base = UPSERT_BASE + math.abs(opSeed % 1_000L) * 10
        coll.upsert(spark, (0 until 5).map(i =>
          (base + i, r.nextLong(1000), s"u_${opSeed}_$i", 1L))
          .toDF("id", "category", "content", "version"))
      case "delete" =>
        coll.delete(spark, s"id == ${INSERT_BASE + math.abs(opSeed % 1_000_000L) * 100}")
      case "query" =>
        coll.query(spark, s"category >= ${math.abs(opSeed % 500)}",
          limit = Some(10)).collect()
      case "count" =>
        coll.numEntities(spark)
      case "query_iterator" =>
        coll.query(spark, "", limit = Some(100)).collect()
      case other => throw new IllegalArgumentException(s"unknown op $other")
    }
  }
}
