package graft.tools

/** Writes BENCH_KEYS.md — the committed short-key legend for the bench
  * line's name-compression tier. The driver persists only the stdout
  * tail, so the stderr legend alone would leave a compressed artifact
  * undecodable; the committed file closes that gap. Re-run after
  * adding queries (BenchLineSpec fails until the file is regenerated).
  */
object GenBenchKeys {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("BENCH_KEYS.md")
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      graft.Bench.legendMarkdown(graft.Bench.legendNames)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[genbenchkeys] wrote $path")
  }
}
