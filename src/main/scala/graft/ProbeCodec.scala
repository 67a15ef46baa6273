package graft

/** Dev microbench for the image codec paths (single-threaded): compares
  * `ImageIO.read`/`ImageIO.write` (per-call SPI registry lookup) against
  * the registry-free `Multimodal` paths on a representative tiny PNG.
  * Usage: tools/run.sh graft.ProbeCodec [nOps]
  */
object ProbeCodec {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val payload = operators.Multimodal.encodePng(5L)
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      val dt = System.nanoTime() - t0
      println(f"$label: ${dt / 1e9}%.2f s  (${dt / 1e3 / n}%.2f us/op)")
    }
    // warm-up both paths
    (0 until 20000).foreach { _ =>
      operators.Multimodal.decodeImageBytes(payload)
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    }
    (0 until 2).foreach { _ =>
      time("ImageIO.read    ") { (0 until n).foreach { _ =>
        javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)) } }
      time("decodeImageBytes") { (0 until n).foreach { _ =>
        operators.Multimodal.decodeImageBytes(payload) } }
    }
  }
}
