package graft

import graft.Graft._

class GraftFacadeSpec extends SparkTestBase {
  import spark.implicits._

  test("facade: as-of + sessionize + dedup + topk compose on DataFrames") {
    val trades = Seq((1L, 100L, 9.0), (1L, 200L, 11.0))
      .toDF("sym", "ts", "px")
    val quotes = Seq((1L, 90L, 8.5), (1L, 150L, 10.5))
      .toDF("sym", "qts", "bid")
    val enriched = trades.asofBackward(quotes, Seq("sym" -> "sym"),
      "ts", "qts", carry = Seq("bid" -> "bid"))
    assert(enriched.orderBy("ts").select("bid").as[Double]
      .collect().toSeq == Seq(8.5, 10.5))

    val sess = Seq((1L, 0L), (1L, 100L), (1L, 5000L)).toDF("u", "ms")
      .sessionized(Seq("u"), "ms", gapMs = 1000L)
    assert(sess.select("session_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 1L, 2L))

    val docs = Seq((1L, "the quick brown fox jumps high"),
      (2L, "the quick brown fox jumps high"),
      (3L, "entirely different words here now")).toDF("id", "text")
    assert(docs.exactDedup("id", "text").count() == 2)
    val pairs = docs.nearDupPairs("id", "text", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))

    val vecs = Seq((1L, Array(1f, 0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0f, 1f))).toDF("id", "vec")
    val nn = vecs.cosineTopK(vecs.filter($"id" === 1), "id", "vec", k = 1)
      .select("neighbor_id").as[Long].collect()
    assert(nn.toSeq == Seq(2L)) // 2 is nearest to 1
  }
}
