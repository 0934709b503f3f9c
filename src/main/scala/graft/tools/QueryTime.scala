package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Time individual driver queries at a given SF (hot-spot hunting).
  * Usage: runMain graft.tools.QueryTime <sfDir> [queryName ...]
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-querytime")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val t0 = System.nanoTime()
      val n = try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case e: Throwable => println(s"[qt] $name FAILED: ${e.getMessage}"); -1L }
      println(f"[qt] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
    }
    spark.stop()
  }
}
