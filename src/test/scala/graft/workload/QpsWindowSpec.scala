package graft.workload

import graft.{SparkEntry, SparkSpec}

/** Pins the accounting contract of the shared QPS-window harness
  * (SparkEntry.runQpsWindow) that every bench_qps_* row depends on:
  * a `false` return from searchOnce counts a shape violation, a throw
  * counts a failed search (and keeps the worker looping), the
  * optional writer thread runs against the same deadline, the window
  * terminates cleanly, and the common extras land under the window's
  * name in benchExtras. The search closure here does no Spark work —
  * the harness's own thread/stats discipline is what's under test
  * (the Spark-job side is exercised by the bench rows themselves and
  * the HammerSpec completeness-band test).
  */
class QpsWindowSpec extends SparkSpec {

  test("runQpsWindow counts violations and failures; writer shares the deadline") {
    val s = spark
    val calls = new java.util.concurrent.atomic.AtomicLong(0)
    val writerTicks = new java.util.concurrent.atomic.AtomicLong(0)
    val (snap, violations, terminated) = SparkEntry.runQpsWindow(
      s, "spec-window", secs = 1, searchWorkers = 2,
      searchOnce = { _ =>
        Thread.sleep(10)
        val n = calls.incrementAndGet()
        if (n == 1) throw new RuntimeException("boom")
        n % 3 != 0 // every 3rd completed call reports out-of-shape
      },
      writerLoop = Some { stop =>
        while (System.nanoTime() < stop) {
          writerTicks.incrementAndGet(): Unit
          Thread.sleep(20)
        }
      })
    assert(terminated, "1s window with sleeping workers must terminate")
    assert(writerTicks.get() > 0, "writer loop never ran")
    assert(snap("total") >= 2.0, "both workers must record searches")
    assert(snap("failed") >= 1.0, "the thrown search must count as failed")
    assert(violations >= 1, "false returns must count as shape violations")
    val extras = SparkEntry.benchExtras.get("spec-window")
    assert(extras("workers") == 2.0)
    assert(extras("shape_violations") == violations.toDouble)
    assert(extras("timed_out") == 0.0)
    assert(extras("searches") == snap("total"))
  }

  test("runQpsWindow without a writer publishes the same extras shape") {
    val s = spark
    val (snap, violations, terminated) = SparkEntry.runQpsWindow(
      s, "spec-window-nw", secs = 1, searchWorkers = 1,
      searchOnce = { _ => Thread.sleep(10); true })
    assert(terminated && violations == 0L && snap("failed") == 0.0)
    val extras = SparkEntry.benchExtras.get("spec-window-nw")
    assert(extras.keySet == Set("qps", "searches", "avg_latency",
      "p50_latency", "p95_latency", "p99_latency", "workers",
      "duration_s", "shape_violations", "timed_out"))
  }
}
