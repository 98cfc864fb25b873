package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  test("decode pipeline preserves every record and derives features from payload bytes") {
    val docs = Tables.documents(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val out = Multimodal.decodePipeline(spark, sf0001).collect()
    assert(out.length === docs.size)
    out.foreach { r =>
      val n = docs(r.getAs[Long]("doc_id")).getBytes("UTF-8").length
      assert(r.getAs[Long]("n_bytes") === n.toLong)
      assert(r.getAs[Int]("width") === n % 256)
      assert(r.getAs[Int]("height") === (n / 256) % 256)
      assert(r.getAs[Int]("frames") === 1 + n % 4)
    }
  }
}
