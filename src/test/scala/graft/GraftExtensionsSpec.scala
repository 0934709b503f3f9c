package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions wires the native functions into SQL") {
    // a live session from another suite would make getOrCreate ignore the
    // extensions conf — start clean, and leave no stopped default behind
    SparkSession.getDefaultSession.foreach(_.stop())
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions-spec")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val got = spark.sql("SELECT simhash64('the quick brown fox') AS h").first().getLong(0)
      assert(got == graft.functions.SimHashImpl.hashString("the quick brown fox"))
      val md = spark.sql("SELECT md_to_text('# Title\nSome **bold** text') AS t")
        .first().getString(0)
      assert(md == graft.sources.Markdown.toText("# Title\nSome **bold** text"))
      val html = spark.sql("SELECT md_to_html('# T') AS t").first().getString(0)
      assert(html.contains("<h1>T</h1>"))
      val back = spark.sql("SELECT html_to_md('<h1>T</h1>') AS t").first().getString(0)
      assert(back.trim == "# T")
    } finally {
      spark.stop()
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
    }
  }
}
