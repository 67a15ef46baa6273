package graft

import org.apache.spark.sql.functions._

import graft.operators.DataQuality

/** Quarantine split and keyed snapshot diff semantics. */
class DataOpsSpec extends SparkSpec {
  import spark.implicits._

  test("quarantine: clean+bad partition the input; reasons name the rules") {
    val df = Seq((1L, 10.0, "x"), (2L, -1.0, "y"), (3L, 5.0, null),
      (4L, -2.0, null)).toDF("id", "price", "tag")
    val (clean, bad) = DataQuality.quarantine(df, Seq(
      "neg_price" -> (col("price") < 0),
      "null_tag" -> col("tag").isNull))
    assert(clean.collect().map(_.getLong(0)).toSet == Set(1L))
    assert(clean.columns.toSeq == df.columns.toSeq, "clean keeps the schema")
    val reasons = bad.collect()
      .map(r => r.getLong(0) -> r.getSeq[String](r.fieldIndex("dq_failed")).toSet)
      .toMap
    assert(reasons == Map(
      2L -> Set("neg_price"), 3L -> Set("null_tag"),
      4L -> Set("neg_price", "null_tag")))
    assert(clean.count() + bad.count() == df.count())
  }

  test("q_corpus_card: metrics agree with directly computed corpus facts") {
    import org.apache.spark.sql.functions._
    val card = Queries.all("q_corpus_card")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val d = Tables.load(spark, sfDir, "documents")
    val n = d.count().toDouble
    assert(card("n_docs") == n)
    assert(card("n_distinct_texts") ==
      d.select(col("text")).distinct().count().toDouble,
      "md5 fingerprint distinct must equal true distinct texts")
    assert(card("n_sources") ==
      d.select(col("source")).distinct().count().toDouble)
    assert(card("dup_ratio") >= 0.0 && card("dup_ratio") < 1.0)
    assert(math.abs(card("dup_ratio") -
      (1.0 - card("n_distinct_texts") / card("n_docs"))) < 1e-6)
    assert(card("mean_tokens") > 0 && card("total_tokens") >= n)
    assert(card("top_lang_share") > 0 && card("top_lang_share") <= 1.0)
    assert(card.size == 10)
  }

  test("q_snapshot_diff: statuses match the version construction exactly") {
    val out = Queries.all("q_snapshot_diff")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val n = Tables.load(spark, sfDir, "documents").count()
    (0L until n).foreach { id =>
      val expect =
        if (id % 10 == 7 && id % 10 != 3) Some("added")    // only in v2
        else if (id % 10 == 3) Some("removed")             // only in v1
        else if (id % 5 == 0) Some("changed")              // text rewritten
        else None                                          // unchanged: absent
      assert(out.get(id) == expect, s"doc $id: ${out.get(id)} != $expect")
    }
    assert(out.size == out.count(_ => true) &&
      out.values.toSet.subsetOf(Set("added", "removed", "changed")))
  }

  test("q_mix_weights: weights normalize, allocation within budget, monotone") {
    val rows = Queries.all("q_mix_weights")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4, "weights sum to ~1")
    assert(rows.map(_._4).sum <= 1000000L, "floor allocation never overshoots")
    // α-power monotonicity: more tokens ⇒ weight no smaller
    rows.sortBy(_._2).sliding(2).foreach {
      case Array((_, _, w1, _), (_, _, w2, _)) => assert(w2 >= w1 - 1e-9)
      case _ =>
    }
  }

  test("q_time_split: splits partition events; embargo gap separates train/test") {
    val rows = Queries.all("q_time_split")(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getTimestamp(3), r.getTimestamp(4)))
      .toMap
    assert(rows.keySet == Set("train", "embargo", "test"))
    val total = Tables.load(spark, sfDir, "events").count()
    assert(rows.values.map(_._1).sum == total, "splits partition the corpus")
    rows.values.foreach { case (n, d, _, _) => assert(d == n, "event_id unique") }
    // the whole point: train and test are separated by ≥ 2 days of embargo
    val gapMs = rows("test")._3.getTime - rows("train")._4.getTime
    assert(gapMs >= 2L * 24 * 3600 * 1000 - 1,
      s"train→test gap only ${gapMs / 3600000.0} h")
    assert(rows("train")._4.before(rows("embargo")._3) &&
      rows("embargo")._4.before(rows("test")._3), "boundaries strictly ordered")
  }

  test("q_classifier_pr_curve: recall falls, tp+fn constant as threshold rises") {
    val rows = Queries.all("q_classifier_pr_curve")(spark, sfDir).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 5)
    assert(rows.map { case (_, tp, _, fn) => tp + fn }.toSet.size == 1,
      "tp+fn = total positives at every threshold")
    rows.sortBy(_._1).map(_._2).sliding(2).foreach {
      case Array(a, b) => assert(b <= a, "tp monotone non-increasing")
      case _ =>
    }
  }

  test("diffKeyed: added/removed/changed only; unchanged keys absent") {
    val before = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("k", "name", "v")
    val after = Seq((2L, "b", 20), (3L, "c", 31), (4L, "d", 40))
      .toDF("k", "name", "v")
    val diff = DataQuality.diffKeyed(before, after, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(diff == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
    // column order must not matter for the fingerprint
    val shuffled = after.select("v", "k", "name")
    val diff2 = DataQuality.diffKeyed(before, shuffled, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(diff2 == diff)
  }
}
