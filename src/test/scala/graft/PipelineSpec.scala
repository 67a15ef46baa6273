package graft

import org.apache.spark.sql.functions._

import graft.operators.{Similarity, TextAnalysis}

/** Behavior tests for the queries that have no SQL oracle: language ID on
  * known-language text, ANN recall vs the brute-force baseline, and the
  * winnowing fingerprint query shape. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("langPred: classifies stopword-bearing texts") {
    val df = Seq(
      "the cat sat of a mat and it is fine",
      "der hund und die katze das ist gut",
      "el perro y la casa los gatos es asi",
      "le chien et les chats la maison est belle",
    ).toDF("text")
    val got = df.select(TextAnalysis.langPred($"text")).as[String].collect().toSeq
    assert(got == Seq("en", "de", "es", "fr"))
  }

  test("ANN LSH top-5 equals the brute-force top-5 (recall-1 band config)") {
    val bf = Queries.all("q_similarity_topk")(spark, sfDir)
      .select($"qid", $"vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Queries.all("q_similarity_lsh")(spark, sfDir)
      .select($"qid", $"vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bf.nonEmpty && lsh == bf,
      s"missed ${(bf -- lsh).size} slots, spurious ${(lsh -- bf).size}")
  }

  test("IVF ANN recall ≥ 0.9 of brute-force top-5 on the test corpus") {
    val bf = Queries.all("q_similarity_topk")(spark, sfDir)
      .select($"qid", $"vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Queries.all("q_similarity_ivf")(spark, sfDir)
      .select($"qid", $"vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf & ivf).size.toDouble / bf.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("embedding LSH pairs equal the exact pairs (recall-1 band config)") {
    val exact = Queries.all("q_dedup_embedding")(spark, sfDir)
      .select($"vec_a", $"vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Queries.all("q_dedup_embedding_lsh")(spark, sfDir)
      .select($"vec_a", $"vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty && lsh == exact,
      s"missed ${(exact -- lsh).size} pairs, spurious ${(lsh -- exact).size}")
  }

  test("minhash LSH near-dup pairs match simhash near-dup pairs on corpus") {
    val mh = Queries.all("q_dedup_minhash_lsh")(spark, sfDir)
      .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = Queries.all("q_dedup_simhash")(spark, sfDir)
      .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.nonEmpty, "corpus has planted near-duplicates")
    assert(mh == sh, "two independent sketches agree on the dup set")
  }
}
