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

  test("PQ ANN recall ≥ 0.8 of brute-force top-5 on the test corpus") {
    // ADC over 4-bit-style codebooks is a lossy approximation; the exact
    // cosine re-rank of the 8×k shortlist recovers most of the loss
    val bf = Queries.all("q_similarity_topk")(spark, sfDir)
      .select($"qid", $"vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Queries.all("q_similarity_pq")(spark, sfDir)
      .select($"qid", $"vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf & pq).size.toDouble / bf.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("int8 quantization error stays within the round-to-nearest bound") {
    // |x/s·127 − round(x/s·127)| ≤ 0.5 ⟹ |x − q·s/127| ≤ s/254 — every
    // vector must satisfy the bound (tiny fp slack for the re-scaling)
    val bad = Queries.all("q_embed_quantize")(spark, sfDir)
      .filter($"max_err" > $"scale" / 254 * 1.0000001).count()
    assert(bad == 0, s"$bad vectors exceed the s/254 dequantization bound")
  }

  test("PqEncode picks the L2-argmin sub-centroid, ties to the lower index") {
    import graft.functions.Pq
    // 2 subspaces of dim 2; centroids chosen so expected codes are obvious
    val cb = Seq(
      Seq(Seq(0f, 0f), Seq(10f, 10f)),
      Seq(Seq(5f, 5f), Seq(5f, 5f), Seq(-5f, -5f)))
    val df = Seq((1L, Seq(1f, 1f, 4f, 6f)), (2L, Seq(9f, 9f, -4f, -6f)))
      .toDF("id", "v")
    val got = df.select($"id", Pq.pqEncode($"v", cb).as("code"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    assert(got(1L) == Seq(0, 0), "tie between equal centroids must pick index 0")
    assert(got(2L) == Seq(1, 2))
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
