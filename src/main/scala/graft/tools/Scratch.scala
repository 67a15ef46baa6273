package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Sketches

/** Scratch diagnostics (dev only). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[t] $label: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = Tables.load(spark, sfDir, "documents")
    val sig = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), array_distinct(expr(
        "transform(sequence(0, size(w)-3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"))
        .as("sh"))
      .select(col("doc_id"), Sketches.simhash64(col("sh")).as("sig"))
    val bands = sig.select(col("doc_id"), col("sig"),
      posexplode(array((0 until 8).map(i =>
        shiftrightunsigned(col("sig"), i * 8).bitwiseAND(lit(0xFFL))): _*))
        .as(Seq("band_idx", "band_val")))
    timed("bands")(bands.count())
    val joined = bands.as("a").join(bands.as("b"),
      col("a.band_idx") === col("b.band_idx") &&
      col("a.band_val") === col("b.band_val") &&
      col("a.doc_id") < col("b.doc_id"))
    timed("join")(joined.count())
    val sel = joined.select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
      bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).cast("long").as("hamming"))
      .filter(col("hamming") <= 12)
    timed("join+filter")(sel.count())
    timed("full distinct")(sel.distinct().count())
    // cache the signatures to avoid recomputing the custom expression on
    // both join sides
    val bandsC = bands.cache()
    bandsC.count()
    val joined2 = bandsC.as("a").join(bandsC.as("b"),
      col("a.band_idx") === col("b.band_idx") &&
      col("a.band_val") === col("b.band_val") &&
      col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).cast("long").as("hamming"))
      .filter(col("hamming") <= 12)
    timed("cached join+filter")(joined2.distinct().count())
    bandsC.unpersist()
    // shuffle-hash join: both sides shuffle on identical band keys →
    // ReuseExchange materializes the sketch projection once
    val joined3 = bands.as("a").hint("shuffle_hash").join(bands.as("b"),
      col("a.band_idx") === col("b.band_idx") &&
      col("a.band_val") === col("b.band_val") &&
      col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).cast("long").as("hamming"))
      .filter(col("hamming") <= 12)
    timed("shuffle-hash join+filter+distinct")(joined3.distinct().count())
    // groupBy-bucket + in-bucket pair expansion: one exchange, sig
    // materialized once, no self-join
    val pairs = bands
      .groupBy(col("band_idx"), col("band_val"))
      .agg(collect_list(struct(col("doc_id"), col("sig"))).as("xs"))
      .filter(size(col("xs")) >= 2)
      .select(explode(expr(
        """flatten(transform(xs, (x, i) ->
             transform(slice(xs, i + 2, size(xs) - i - 1), y ->
               struct(least(x.doc_id, y.doc_id) as doc_a,
                      greatest(x.doc_id, y.doc_id) as doc_b,
                      bit_count(x.sig ^ y.sig) as hamming))))""")).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"), col("p.hamming").cast("long").as("hamming"))
      .filter(col("hamming") <= 12)
      .distinct()
    timed("bucket-pairs")(pairs.count())
    spark.stop()
  }
}
