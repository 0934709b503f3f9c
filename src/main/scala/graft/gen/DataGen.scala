package graft.gen

import graft.model.SourceFile
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic source-code table per BASELINE.json `input_hint`
  * and FIXTURES.md §1: (repo, path, commit, lang, content), all strings,
  * Zipfian repo-size skew, valid-UTF-8 templated source text, plus edge rows
  * (empty / 1-char / unicode). Pure function of (rowId, seed) — independent
  * of partitioning, so re-runs and resumed runs see identical data.
  */
object DataGen {

  final case class GenConfig(
      rows: Long,
      repos: Int = 100,
      seed: Long = 42L,
      parts: Int = 32,
      zipfS: Double = 1.1,
      contentTargetMin: Int = 200,
      contentTargetMax: Int = 2400)

  def table(spark: SparkSession, cfg: GenConfig): Dataset[SourceFile] = {
    import spark.implicits._
    spark.range(0L, cfg.rows, 1L, cfg.parts).map(i => row(i, cfg))
  }

  // ---- deterministic row synthesis ---------------------------------------

  private def splitmix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val zipfCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, java.lang.Double), Array[Double]]()

  private def zipfCdf(n: Int, s: Double): Array[Double] =
    zipfCache.computeIfAbsent((n, s), _ => {
      val w = Array.tabulate(n)(k => 1.0 / math.pow(k + 1.0, s))
      val total = w.sum
      val cdf = new Array[Double](n)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += w(i) / total; cdf(i) = acc; i += 1 }
      cdf(n - 1) = 1.0
      cdf
    })

  private def zipfSample(u: Double, n: Int, s: Double): Int = {
    val cdf = zipfCdf(n, s)
    val idx = java.util.Arrays.binarySearch(cdf, u)
    val k = if (idx >= 0) idx else -idx - 1
    math.min(k, n - 1)
  }

  private val langs: Array[(String, String)] = Array(
    "scala" -> ".scala", "java" -> ".java", "python" -> ".py", "go" -> ".go",
    "rust" -> ".rs", "c" -> ".c", "cpp" -> ".cc", "javascript" -> ".js",
    "typescript" -> ".ts", "ruby" -> ".rb", "kotlin" -> ".kt", "swift" -> ".swift",
    "php" -> ".php", "csharp" -> ".cs", "haskell" -> ".hs", "lua" -> ".lua",
    "shell" -> ".sh", "perl" -> ".pl", "r" -> ".r", "sql" -> ".sql")

  private val pkgs = Array("core", "util", "net", "io", "api", "engine", "model",
    "codec", "plan", "exec", "fs", "auth", "db", "ui", "test")

  private val fileStems = Array("Main", "Utils", "Server", "Client", "Parser",
    "Writer", "Reader", "Config", "Handler", "Worker", "Scheduler", "Cache",
    "Index", "Store", "Router")

  private val keywords = Array("def", "val", "var", "class", "object", "trait",
    "return", "if", "else", "while", "for", "match", "case", "import", "package",
    "private", "final", "override", "new", "try", "catch", "throw", "extends")

  private val idents = Array("buffer", "offset", "length", "result", "input",
    "output", "stream", "record", "schema", "partition", "encoder", "decoder",
    "context", "session", "handler", "payload", "metrics", "manifest", "config",
    "builder", "iterator", "counter", "index", "value", "table")

  private def hex40(repoId: Int, commitIdx: Int): String = {
    val a = splitmix64(repoId.toLong * 31L + commitIdx)
    val b = splitmix64(a ^ 0x5dee_c66d_2545_7a11L)
    val c = splitmix64(b + commitIdx)
    f"$a%016x$b%016x" + f"$c%016x".substring(0, 8)
  }

  private def genContent(rng: java.util.SplittableRandom, lang: String, target: Int): String = {
    val sb = new java.lang.StringBuilder(target + 128)
    sb.append("// lang: ").append(lang).append('\n')
    sb.append("package com.example.").append(pkgs(rng.nextInt(pkgs.length))).append('\n')
    // the loop below appends whole lines, overshooting `target` by up to a
    // line — the truncation at the end makes `target` EXACT, so the
    // near-max edge row stays inside the documented 64 KiB content cap
    // (line bodies are ASCII: cutting mid-line can never split a surrogate)
    while (sb.length < target) {
      val indent = "  " * rng.nextInt(3)
      sb.append(indent)
      val kind = rng.nextInt(5)
      if (kind == 0) {
        sb.append("// TODO(").append(idents(rng.nextInt(idents.length)))
          .append("): revisit ").append(idents(rng.nextInt(idents.length))).append('\n')
      } else if (kind == 1) {
        sb.append(keywords(rng.nextInt(keywords.length))).append(' ')
          .append(idents(rng.nextInt(idents.length))).append(rng.nextInt(100))
          .append(" = ").append(idents(rng.nextInt(idents.length)))
          .append('(').append(idents(rng.nextInt(idents.length))).append(", ")
          .append(rng.nextInt(10000)).append(")\n")
      } else if (kind == 2) {
        sb.append("def ").append(idents(rng.nextInt(idents.length)))
          .append(rng.nextInt(50)).append('(')
          .append(idents(rng.nextInt(idents.length))).append(": Int): Long = ")
          .append(idents(rng.nextInt(idents.length))).append(" * ")
          .append(rng.nextInt(1000)).append('\n')
      } else if (kind == 3) {
        sb.append("if (").append(idents(rng.nextInt(idents.length)))
          .append(" > ").append(rng.nextInt(256)).append(") { ")
          .append(idents(rng.nextInt(idents.length))).append(" += 1 }\n")
      } else {
        sb.append(keywords(rng.nextInt(keywords.length))).append(' ')
          .append(keywords(rng.nextInt(keywords.length))).append(' ')
          .append(idents(rng.nextInt(idents.length))).append('\n')
      }
    }
    if (sb.length > target) sb.setLength(target)
    sb.toString
  }

  def row(i: Long, cfg: GenConfig): SourceFile = {
    val rng = new java.util.SplittableRandom(splitmix64(cfg.seed ^ (i * 0x9e3779b97f4a7c15L)))
    val repoId = zipfSample(rng.nextDouble(), cfg.repos, cfg.zipfS)
    val repo = s"org${repoId % 17}/repo$repoId"
    val (lang, ext) = langs(rng.nextInt(langs.length))
    // rowId in the path guarantees (repo, path, commit) uniqueness
    val path = s"src/${pkgs(rng.nextInt(pkgs.length))}/${fileStems(rng.nextInt(fileStems.length))}_$i$ext"
    val commit = hex40(repoId, rng.nextInt(8))
    val content = (i % 10007L) match {
      case 0L => ""
      case 1L => "x"
      case 2L => "// 多语言注释 🚀 café déjà-vu\nval π = 314159\n"
      case 3L => genContent(rng, lang, 64 * 1024) // near-max-length row (FIXTURES §1)
      case _ =>
        val target = cfg.contentTargetMin +
          rng.nextInt(math.max(1, cfg.contentTargetMax - cfg.contentTargetMin))
        genContent(rng, lang, target)
    }
    SourceFile(repo, path, commit, lang, content)
  }
}
