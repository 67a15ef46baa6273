package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow

/** Pins the properties the q_multimodal_features oracle depends on:
  * the javax.imageio PNG round-trip is sample-exact (lossless 8-bit gray),
  * and the decoded-feature closed forms hold for concrete doc_ids. */
class MultimodalSpec extends SparkSpec {

  test("PNG encode → decode round-trips every sample exactly") {
    for (docId <- Seq(0L, 1L, 5L, 23L, 64L, 1234L)) {
      val bytes = Multimodal.encodePng(docId)
      // a real PNG, not a stub: magic bytes
      assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P'.toByte
        && bytes(2) == 'N'.toByte && bytes(3) == 'G'.toByte)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val (w, h) = (2 * ((docId % 6) + 2).toInt, 2 * ((docId % 4) + 2).toInt)
      val base = (docId % 32).toInt
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w)
        assert(img.getRaster.getSample(x, y, 0) == base + 7 * x + 13 * y,
          s"pixel ($x,$y) of doc $docId corrupted by the codec round-trip")
    }
  }

  test("decoded features match the oracle's closed forms") {
    for (docId <- Seq(0L, 3L, 17L, 100L)) {
      val f = Multimodal.decodeImages(
        Iterator(MediaRow(docId, "image", Multimodal.encodePng(docId)))).next()
      val (w, h) = (2 * ((docId % 6) + 2).toInt, 2 * ((docId % 4) + 2).toInt)
      val base = (docId % 32).toInt
      assert(f.width == w && f.height == h)
      assert(f.mean_gray == base + 7 * (w - 1) / 2.0 + 13 * (h - 1) / 2.0)
      assert(f.min_gray == base)
      assert(f.max_gray == base + 7 * (w - 1) + 13 * (h - 1))
      assert(f.resized_w == w / 2 && f.resized_h == h / 2)
      assert(f.resized_mean ==
        base + 10.0 + 7 * (w / 2 - 1) + 13 * (h / 2 - 1))
    }
  }

  test("undecodable payload fails loudly, not silently") {
    val junk = MediaRow(9L, "image", Array[Byte](1, 2, 3, 4))
    val e = intercept[IllegalArgumentException](
      Multimodal.decodeImages(Iterator(junk)).next())
    assert(e.getMessage.contains("undecodable payload"))
  }

  test("PNG encoding is byte-deterministic; fp classes = generator classes") {
    // q_multimodal_dedup's md5 grouping is only sound if the SAME raster
    // always encodes to the SAME bytes (across calls — and by extension
    // across partitions/executors, which run this same JVM codec path)
    (0L until 200L).foreach { id =>
      assert(java.util.Arrays.equals(
        Multimodal.encodePng(id), Multimodal.encodePng(id)), s"doc $id")
    }
    // distinct payloads correspond 1:1 with the generator's (id mod 96)
    // equivalence classes: same class -> identical bytes, different class
    // -> different bytes (the oracle's GROUP BY relies on both directions)
    val byClass = (0L until 200L).groupBy(_ % 96)
    byClass.values.foreach { ids =>
      val fps = ids.map(id =>
        java.util.Base64.getEncoder.encodeToString(Multimodal.encodePng(id))).toSet
      assert(fps.size == 1, s"class split: $ids")
    }
    val reps = byClass.values.map(ids =>
      java.util.Base64.getEncoder.encodeToString(Multimodal.encodePng(ids.head))).toSet
    assert(reps.size == byClass.size, "distinct classes must differ in bytes")
  }
}
