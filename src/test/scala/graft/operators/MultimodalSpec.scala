package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("media features are deterministic and shaped correctly") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1, "image", "png", "abcd".getBytes("UTF-8")),
      Multimodal.MediaRow(2, "audio", "wav", Array[Byte]())).toDS()
    val f = Multimodal.extractFeatures(media).collect().sortBy(_.id)
    val first = f(0)
    // stride-2 sampling of [97,98,99,100] -> [97,99]
    assert(first.n_bytes == 4)
    assert(first.mean_level == 98.0)
    assert(first.checksum == 97L * 31 + 99)
    assert(math.abs(first.histogram.sum - 1.0) < 1e-9)
    assert(first.histogram(6) == 1.0) // 97/16 = 6, 99/16 = 6
    val empty = f(1)
    assert(empty.n_bytes == 0 && empty.mean_level == 0.0)
  }

  test("PNG payloads take the REAL ImageIO decode path, end to end") {
    import spark.implicits._
    // deterministic in-test PNG: a 4x2 gradient rendered via BufferedImage
    def png(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    val bytes = png(4, 2)((x, y) => (x * 60 << 16) | (y * 100 << 8) | 40)
    assert(Multimodal.isPng(bytes))
    assert(!Multimodal.isPng("plain text".getBytes("UTF-8")))
    // expected row-major integer BT.601 luma of the generated gradient
    val luma = for (y <- 0 until 2; x <- 0 until 4)
      yield (x * 60 * 299 + y * 100 * 587 + 40 * 114) / 1000
    assert(Multimodal.decode(bytes).toSeq == luma)
    // end to end through the typed mapPartitions pipeline: stride-2
    // samples of the REAL pixels, not of the payload bytes
    val f = Multimodal.extractFeatures(
      Seq(Multimodal.MediaRow(7, "image", "png", bytes)).toDS()).collect()(0)
    val samples = luma.grouped(2).map(_.head).toSeq
    assert(f.n_bytes == bytes.length)
    assert(f.mean_level == samples.sum.toDouble / samples.length)
    // a non-PNG payload still routes through the stub arm unchanged
    val txt = "abcd".getBytes("UTF-8")
    assert(Multimodal.decode(txt).toSeq == txt.map(_ & 0xFF).toSeq)
  }

  test("resize stub average-pools deterministically and handles edges") {
    assert(Multimodal.resizeStub(Array(10, 20, 30, 40), 2).toSeq == Seq(15, 35))
    assert(Multimodal.resizeStub(Array(10, 20), 4).toSeq == Seq(10, 20)) // no upsample
    assert(Multimodal.resizeStub(Array.empty[Int], 4).isEmpty)
    assert(Multimodal.resizeStub(Array(1, 2, 3), 0).isEmpty)
  }

  test("gate query runs over documents with one feature row per doc") {
    val sf = "/root/testdata/sf0.001"
    val out = Multimodal.mm01.fn(spark, sf)
    val n = graft.Tables.documents(spark, sf).count()
    assert(out.count() == n)
  }

  test("checksum/histogram (the non-oracle-able features) are deterministic") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    def features = Multimodal.extractFeatures(
      Multimodal.mediaFromDocuments(graft.Tables.documents(spark, sf))
        .as[Multimodal.MediaRow])
    val a = features.collect().map(f => (f.id, f.checksum, f.histogram.toSeq)).sortBy(_._1).toSeq
    val b = features.collect().map(f => (f.id, f.checksum, f.histogram.toSeq)).sortBy(_._1).toSeq
    assert(a == b && a.nonEmpty)
    // histogram buckets are a probability mass: non-negative, sum ~1
    a.foreach { case (id, _, h) =>
      assert(h.forall(_ >= 0.0) && math.abs(h.sum - 1.0) < 1e-9, s"doc $id") }
  }
}
