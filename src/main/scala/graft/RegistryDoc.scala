package graft

/** Canonical renderer for `SURVEY_REGISTRY.md` — the committed,
  * machine-generated operator→query inventory (r9 verdict #7).
  *
  * SURVEY.md §8's prose inventory is hand-maintained and was twice caught
  * drifting from the live registry; its COUNTS are test-pinned, but a
  * stale NAME could still hide. This artifact closes that: the table is
  * rendered from `SparkEntry.queries`/`oracleSql` themselves, committed,
  * and `EntrySpec` fails the build whenever the committed file differs
  * from a fresh render — so adding, renaming, or dropping a query without
  * regenerating (`tools/run.sh graft.RegistryDump`) is a compile-adjacent
  * error, not a doc drift.
  */
object RegistryDoc {
  def render: String = {
    val oracles = SparkEntry.oracleSql.keySet
    val rows = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val status = if (oracles(name)) "oracle" else "rows-only"
      s"| `$name` | $status |"
    }
    // table rows are appended AFTER stripMargin — their leading pipes are
    // content, not margin markers
    s"""# Query registry (generated — do not edit)
       |
       |Generated from `SparkEntry.queries` / `SparkEntry.oracleSql` by
       |`graft.RegistryDump`; `EntrySpec` pins this file to the live
       |registry per NAME, not just per count. Regenerate with
       |`tools/run.sh graft.RegistryDump` after registry changes.
       |
       |${SparkEntry.queries.size} registered queries,
       |${SparkEntry.oracleSql.size} DuckDB-oracle-checked,
       |${SparkEntry.queries.size - SparkEntry.oracleSql.size} rows-only.
       |
       || query | correctness |
       ||---|---|
       |""".stripMargin + rows.mkString("\n") + "\n"
  }
}

/** Writes `SURVEY_REGISTRY.md` in the repo root (or argv(0)). */
object RegistryDump {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("SURVEY_REGISTRY.md")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      RegistryDoc.render)
    println(s"wrote $path")
  }
}
