package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct within 5% of exact (HLL++ metrics path)") {
    val approx = RelationalQueries.queries("q_approx_distinct")(spark, sf)
    val exact = RelationalQueries.queries("q_distinct_orders")(spark, sf)
    val j = approx.join(exact, Seq("l_returnflag")).collect()
    assert(j.nonEmpty)
    j.foreach { r =>
      val (a, e) = (r.getAs[Long]("approx_orders").toDouble, r.getAs[Long]("n_orders").toDouble)
      assert(math.abs(a - e) / e < 0.05, s"approx $a vs exact $e")
      val (ap, ep) = (r.getAs[Long]("approx_parts").toDouble, r.getAs[Long]("n_parts").toDouble)
      assert(math.abs(ap - ep) / ep < 0.05)
    }
  }

  test("upsert merge marks updated rows and preserves old-only rows") {
    val df = RelationalQueries.queries("q_upsert_merge")(spark, sf)
    val updated = df.filter(col("was_updated")).count()
    val kept = df.filter(!col("was_updated")).count()
    assert(updated > 0 && kept > 0)
  }
}
