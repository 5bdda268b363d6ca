package graft

import graft.SparkSpec

class EntrySpec extends SparkSpec {

  test("flagship entry returns extracted articles (rows > 0, full schema)") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.toSeq === Seq("url", "url_hash", "biz", "title", "body",
      "publish_ts", "read_count", "like_count", "comments_json", "wave"))
    val n = df.count()
    assert(n > 0)
  }

  test("every oracle key has a matching query and aliases line up") {
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(SparkEntry.queries.contains(k), s"oracle $k has no query")
    }
    // smoke: every registered query runs on sf0.001 without throwing
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, "/root/testdata/sf0.001")
      assert(df.columns.nonEmpty, name)
    }
  }
}
