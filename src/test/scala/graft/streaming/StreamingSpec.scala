package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.model.FrontierEntry
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def fe(url: String, host: String, prio: Long): FrontierEntry =
    FrontierEntry(url, graft.url.UrlCanon.urlHash(url), host, "", "detail", 0,
      prio, new Timestamp(1704067200000L))

  test("streaming token buckets: per-host cumulative cap, priority order") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FrontierEntry]
    val decisions = StreamingBudget(input.toDS(),
      budgets = Map("a.example" -> 3, "b.example" -> 1), defaultTokens = 2)
    val q = decisions.writeStream.format("memory").queryName("budget_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // batch 1: 4 urls for host a (cap 3), 2 for b (cap 1), 3 for c (default 2)
      input.addData(
        fe("https://a.example/1", "a.example", 1), fe("https://a.example/2", "a.example", 2),
        fe("https://a.example/3", "a.example", 3), fe("https://a.example/4", "a.example", 4),
        fe("https://b.example/1", "b.example", 1), fe("https://b.example/2", "b.example", 2),
        fe("https://c.example/1", "c.example", 1), fe("https://c.example/2", "c.example", 2),
        fe("https://c.example/3", "c.example", 3))
      q.processAllAvailable()
      val b1 = spark.table("budget_out").as[graft.model.FetchDecision].collect()
      def fetched(host: String) = b1.filter(d => d.host == host && d.fetched)
      assert(fetched("a.example").length === 3)
      assert(fetched("b.example").length === 1)
      assert(fetched("c.example").length === 2)
      // highest-priority (lowest value) urls win within each host
      assert(fetched("a.example").map(_.priority).sorted.toSeq === Seq(1L, 2L, 3L))
      assert(b1.count(!_.fetched) === 3)

      // batch 2: tokens persist across batches — host a exhausted
      input.addData(fe("https://a.example/5", "a.example", 1))
      q.processAllAvailable()
      val b2 = spark.table("budget_out").as[graft.model.FetchDecision].collect()
      assert(b2.count(d => d.host == "a.example" && d.fetched) === 3,
        "cumulative budget must hold across micro-batches")
    } finally q.stop()
  }
}
