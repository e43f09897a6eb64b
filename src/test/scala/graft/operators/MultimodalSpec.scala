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
