package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Streaming per-domain admission cap (`q_stream_domain_caps`): the
  * rate-limit form of the RefinedWeb cap. Laws pinned here:
  *  - arrival-order semantics: with an id-ordered feed the admitted set is
  *    exactly rank-by-id ≤ k per domain (the oracle's closed form);
  *  - state carries across micro-batches: a two-slice feed (one file per
  *    trigger) produces the identical admitted set — a domain's count is
  *    never reset at a batch boundary;
  *  - per-domain admitted SIZE equals the batch `q_domain_caps` keep-size
  *    (min(k, |domain|)) even though the members differ by contract
  *    (arrival order vs md5 rerun-stable order).
  */
class DomainCapStreamSpec extends SparkSpec {

  private def closedForm(k: Int): DataFrame = {
    val d = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        concat(lower(col("source")), col("doc_id") % 3,
          lit(".example.com")).as("domain"))
    d.withColumn("rk",
        row_number().over(Window.partitionBy("domain").orderBy("doc_id")))
      .select(col("doc_id"), col("domain"), (col("rk") <= k).as("admitted"))
  }

  private def asSet(df: DataFrame): Set[(Long, String, Boolean)] =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet

  test("q_stream_domain_caps equals the rank-by-id closed form") {
    val got = asSet(streaming.Streams.domainCapStream(spark, sfDir))
    val expected = asSet(closedForm(5))
    assert(got.nonEmpty && got == expected,
      s"missing=${(expected -- got).take(5)} spurious=${(got -- expected).take(5)}")
    assert(got.exists(!_._3), "cap never binds — fixture too small to test")
  }

  test("admission state carries across micro-batches (two-slice feed)") {
    // two id-ordered slices as separate files, one file per trigger ⇒ the
    // second batch must CONTINUE each domain's count, not restart it
    val base = TestFeeds.slicedDocs(spark, sfDir, 2)
    val docs = Tables.load(spark, sfDir, "documents")
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(base)
    val flagged = streaming.Streams.domainCapFlags(spark, stream, 5)
    val q = flagged.writeStream
      .format("memory").queryName("graft_domcap_sliced")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val progress = q.recentProgress.filter(_.numInputRows > 0)
    assert(progress.length > 1, s"feed did not span micro-batches: ${progress.length}")
    val got = asSet(spark.table("graft_domcap_sliced"))
    assert(got == asSet(closedForm(5)))
  }

  test("per-domain admitted size equals the batch q_domain_caps keep size") {
    val streamSizes = streaming.Streams.domainCapStream(spark, sfDir)
      .filter(col("admitted")).groupBy(col("domain")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batchSizes = Queries.all("q_domain_caps")(spark, sfDir)
      .groupBy(col("domain")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamSizes == batchSizes)
  }
}
