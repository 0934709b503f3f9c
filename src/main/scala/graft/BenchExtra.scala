package graft

import org.apache.spark.sql.SparkSession

/** Extra per-query benchmark (round-6 measurement harness; graft.Bench is
  * frozen by the driver contract). Times SparkEntry queries under EXACTLY
  * Bench's query-session configuration (local[$SPARK_GRAFT_CPUS], shuffle
  * partitions max(32, cores), maxPartitionBytes=16m, AQE off, UTC, no UI)
  * with min-of-N INTERLEAVED reps and clearCache between queries — the same
  * discipline Bench applies, with a configurable rep count for tighter
  * minima during optimization work.
  *
  * Usage: runMain graft.BenchExtra <sfDir> <reps> [count|noop] [query ...]
  *   count  times fn(spark, sfDir).count() — Bench's exact action
  *   noop   times a noop-sink write (guide §1.4: computes EVERY column,
  *          isolating computation from count's column pruning)
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val action = if (args.length > 2) args(2) else "count"
    val names =
      if (args.length > 3) args.drop(3).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", math.max(32, cores).toString)
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional per-stage attribution (SPARK_GRAFT_BX_STAGES=1): prints each
    // completed stage's wall, task count and shuffle bytes under the query
    // label — the guide §1 empirical loop without the UI
    if (sys.env.get("SPARK_GRAFT_BX_STAGES").contains("1"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            val wall = for {
              s <- si.submissionTime; e <- si.completionTime
            } yield (e - s) / 1e3
            val m = si.taskMetrics
            println(f"[bx-stage] ${si.stageId}%4d ${wall.getOrElse(-1.0)}%7.3f s " +
              f"tasks=${si.numTasks}%3d shR=${m.shuffleReadMetrics.totalBytesRead}%9d " +
              f"shW=${m.shuffleWriteMetrics.bytesWritten}%9d  ${si.name.takeWhile(_ != '\n').take(90)}")
          }
        })
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
    for (rep <- 1 to reps; name <- names) {
      spark.catalog.clearCache()
      spark.sparkContext.setJobDescription(s"$name rep $rep")
      val t0 = System.nanoTime()
      val ok =
        try {
          val df = SparkEntry.queries(name)(spark, sfDir)
          if (action == "noop")
            df.write.format("noop").mode("overwrite").save()
          else df.count()
          true
        } catch {
          case e: Throwable =>
            println(s"[bx] $name FAILED: ${e.getMessage}"); false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      times(name) = (if (ok) sec else -1.0) :: times.getOrElse(name, Nil)
    }
    names.foreach { n =>
      val reps = times(n).reverse
      // failed reps (-1 sentinel) are excluded from the min — folding a
      // negative time in would mask the valid measurements
      val ok = reps.filter(_ >= 0)
      val minStr = if (ok.isEmpty) "   FAILED" else f"${ok.min}%8.3f"
      println(f"[bx] $n%-24s min $minStr s  (reps ${reps.map(s => f"$s%.3f").mkString(", ")})")
    }
    spark.stop()
  }
}
