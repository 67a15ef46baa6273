package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r15): bucket-size distribution of q_dedup_prefix's prefix
  * index — the stage attribution showed one 4.4 s straggler task (≈55% of
  * the query's wall) in the pair-expansion stage, and in-bucket expansion
  * is quadratic in bucket size, so the histogram says whether it is one
  * hot token (salt/split it) or many medium ones (spread buckets).
  *
  * Usage: tools/run.sh graft.ProbePrefixSkew [sfDir]
  */
object ProbePrefixSkew {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = 0.8
    val d = Tables.load(spark, sfDir, "documents")
    val allToks = d.select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), array_distinct(expr(
        """transform(sequence(0, size(w)-3),
          |  i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))""".stripMargin)).as("g"))
    val clusters = allToks.groupBy(col("g"))
      .agg(sort_array(collect_list(col("doc_id"))).as("members"))
      .localCheckpoint()
    val toks = clusters.select(col("members")(0).as("doc_id"), col("g"))
    val ex = toks.select(col("doc_id"), explode(col("g")).as("token"))
    val dfreq = ex.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val sorted = ex.join(dfreq, "token")
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("df"), col("token")))).as("st"))
      .select(col("doc_id"), expr("transform(st, x -> x.token)").as("w"))
    val pref = sorted.select(col("doc_id"),
      explode(slice(col("w"), lit(1),
        size(col("w")) - ceil(lit(t) * size(col("w"))).cast("int") + 1))
        .as("token"))
    val hist = pref.groupBy(col("token")).agg(count(lit(1)).as("b"))
      .select(col("b"), (col("b") * (col("b") - 1) / 2).as("pairs"))
    println("[prefix-skew] reps=" + toks.count() +
      " prefix_rows=" + pref.count())
    hist.orderBy(col("b").desc).limit(20).collect()
      .foreach(r => println(s"[prefix-skew] bucket=${r.get(0)} pairs=${r.get(1)}"))
    val agg = hist.agg(sum(col("pairs")).as("total_pairs"),
      count(lit(1)).as("n_buckets")).collect()(0)
    println(s"[prefix-skew] total_pairs=${agg.get(0)} n_buckets=${agg.get(1)}")
    spark.stop()
  }
}
