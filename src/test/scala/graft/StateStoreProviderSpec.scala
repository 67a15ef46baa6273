package graft

import org.apache.spark.sql.Row

import graft.streaming.Streams

/** The streaming queries must produce identical results under both
  * state-store providers: the default heap-backed store (test scale) and
  * RocksDB (the 100 TB answer — state bounded by executor disk, not heap).
  * A provider is pure infrastructure; any result difference would mean
  * state corruption. */
class StateStoreProviderSpec extends SparkSpec {

  private def run(name: String): Seq[Row] =
    Queries.all(name)(spark, sfDir).collect().toSeq

  test("q_stream_dedup and q_stream_user_counts match under RocksDB") {
    for (name <- Seq("q_stream_dedup", "q_stream_user_counts")) {
      val heap = run(name)
      val rocks = Streams.withStateStoreProvider(spark, Streams.RocksDbProvider)(run(name))
      assert(heap.nonEmpty, s"$name returned no rows")
      assert(heap == rocks, s"$name diverges between state-store providers")
    }
  }

  test("provider conf is restored after withStateStoreProvider") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    Streams.withStateStoreProvider(spark, Streams.RocksDbProvider) {
      assert(spark.conf.get(key) == Streams.RocksDbProvider)
    }
    assert(spark.conf.getOption(key) == before)
  }
}
