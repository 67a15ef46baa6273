package graft

import java.time.LocalDate

/** The backfill path must be idempotent (rerun replaces, never duplicates
  * — the reference's append-mode job duplicates a re-run day) and
  * partition-scoped (a sub-range rerun leaves other days untouched). */
class BackfillSpec extends SparkSpec {

  test("backfill is idempotent and sub-range reruns replace, not append") {
    val out = java.nio.file.Files.createTempDirectory("graft_backfill").toString + "/t"
    val d = (s: String) => LocalDate.parse(s)
    JobRunner.backfillDaily(spark, sfDir, out, d("2024-01-15"), d("2024-01-19"))
    val first = spark.read.parquet(out)
      .collect().map(r => (r.getAs[java.sql.Date]("transaction_date").toString,
        r.getAs[Long]("total_transactions"))).toMap
    assert(first.keySet == Set("2024-01-15", "2024-01-16", "2024-01-17", "2024-01-18"))

    // overlapping sub-range rerun: 16–18 replaced, 15 untouched, no dupes
    JobRunner.backfillDaily(spark, sfDir, out, d("2024-01-16"), d("2024-01-19"))
    val second = spark.read.parquet(out)
      .collect().map(r => (r.getAs[java.sql.Date]("transaction_date").toString,
        r.getAs[Long]("total_transactions"))).toMap
    assert(second == first, "idempotent rerun must reproduce identical data")
    assert(spark.read.parquet(out).count() == 4, "no duplicated partitions")
  }

  test("range backfill equals per-day counts, including zero-count days") {
    val range = Queries.all("q_backfill_range")(spark, sfDir).collect()
      .map(r => (r.getAs[java.sql.Date](0).toString, r.getLong(1))).toMap
    assert(range.size == 7)
    // cross-check one day against the single-day parity operator
    val single = operators.DailyTransactions.dayCount(
      Tables.load(spark, sfDir, "events"), "ts", LocalDate.parse("2024-01-15"))
      .collect().head.getLong(1)
    assert(range("2024-01-15") == single)
    assert(range.values.forall(_ >= 0L))
  }
}
