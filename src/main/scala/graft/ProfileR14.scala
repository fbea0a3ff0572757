package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Round-14 optimization profiler: runs named bench/declared entries
  * once and prints per-stage task counts and executor run time, so a
  * stage whose work is serialized into one task (the single-row-group
  * local parquet shape) is visible without the Spark UI. Optionally
  * dumps the entry's formatted plan to a file (the plans/r14 evidence
  * the optimization round commits).
  *
  * Usage: runMain graft.ProfileR14 [--explain <dir>] <entry> [<entry>...]
  */
object ProfileR14 {
  def main(args: Array[String]): Unit = {
    val (flags, names) = args.partition(_.startsWith("--"))
    val explainDir = flags.find(_.startsWith("--explain"))
      .map(_ => names.headOption.getOrElse(""))
    val explainOut = {
      val i = args.indexOf("--explain")
      if (i >= 0 && i + 1 < args.length) Some(args(i + 1)) else None
    }
    val entryNames =
      explainOut.map(d => names.filterNot(_ == d)).getOrElse(names)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Functions.register(spark)
    val stages =
      new scala.collection.mutable.ArrayBuffer[(Int, String, Int, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(
          sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages.synchronized {
          stages += ((si.stageId, si.name.takeWhile(_ != '\n'), si.numTasks,
            si.taskMetrics.executorRunTime,
            si.completionTime.getOrElse(0L) -
              si.submissionTime.getOrElse(0L)))
        }
      }
    })
    val all = SparkEntry.queries ++ SparkEntry.benchQueries
    // Warmup (same as Bench): JVM/codegen/parquet first-touch.
    try {
      all.get("a4_agg_events").foreach(_(spark, sfDir).count())
      all.get("v1_knn_l2_one").foreach(_(spark, sfDir).count())
    } catch { case _: Throwable => () }
    entryNames.foreach { n =>
      val fn = all.getOrElse(n,
        throw new IllegalArgumentException(s"unknown entry $n"))
      Thread.sleep(300)
      stages.synchronized(stages.clear())
      val df = fn(spark, sfDir)
      val t0 = System.nanoTime()
      df.count(): Unit
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400)
      println(f"== $n wall=$wall%.2fs")
      val snap = stages.synchronized(stages.toSeq)
      snap.sortBy(-_._5).take(30).foreach { case (id, nm, nt, rt, w) =>
        println(f"  stage $id%5d tasks=$nt%4d run=${rt / 1000.0}%8.2fs " +
          f"wall=${w / 1000.0}%7.2fs  $nm")
      }
      println(f"  [stages=${snap.size} totalTaskRun=" +
        f"${snap.map(_._4).sum / 1000.0}%.2fs]")
      explainOut.foreach { dir =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, s"$n.txt"),
          fn(spark, sfDir).queryExecution
            .explainString(org.apache.spark.sql.execution.FormattedMode)
            .getBytes)
      }
    }
    spark.stop()
  }
}
