package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("cosineCol matches hand computation") {
    val df = Seq(
      (vec(1, 0, 0), vec(1, 0, 0)),
      (vec(1, 0, 0), vec(0, 1, 0)),
      (vec(1, 2, 3), vec(4, 5, 6))).toDF("a", "b")
    val got = df.select(round(TextQueries.cosineCol($"a", $"b"), 6)).as[Double].collect()
    assert(got(0) === 1.0)
    assert(got(1) === 0.0)
    val expect = (4.0 + 10 + 18) / (math.sqrt(14) * math.sqrt(77))
    assert(math.abs(got(2) - expect) < 1e-5)
  }

  test("brute-force top-k returns nearest first") {
    val dir = java.nio.file.Files.createTempDirectory("sim").toString
    val rows = Seq(
      (0L, vec(1, 0, 0, 0), 0),
      (1L, vec(0.95, 0.05, 0, 0), 0),  // nearest
      (2L, vec(0.5, 0.5, 0, 0), 0),
      (3L, vec(0, 1, 0, 0), 0),        // orthogonal
      (4L, vec(-1, 0, 0, 0), 0))       // opposite
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val topk = TextQueries.queries("q_embed_topk")(spark, dir).collect()
    assert(topk.map(_.getLong(0)).take(2).toSeq === Seq(1L, 2L))
    assert(topk.last.getLong(0) === 4L) // opposite ranks last
  }

  test("ANN LSH buckets: identical vectors collide, opposite vectors differ") {
    val dir = java.nio.file.Files.createTempDirectory("ann").toString
    // powers of two: no ±1-weighted subset sums to exactly 0, so every
    // hyperplane sign genuinely flips for the negated vector
    Seq(
      (0L, vec(1, 2, 4, 8), 0),
      (1L, vec(1, 2, 4, 8), 0),
      (2L, vec(-1, -2, -4, -8), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val b = TextQueries.queries("q_ann_lsh_bucket")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(b(0L) === b(1L))
    assert(b(0L) === (~b(2L) & 0xff), "opposite vector flips every hyperplane sign")
  }

  test("lang-id heuristic on multilingual strings") {
    val df = Seq(
      (1L, "微信 公众号 data pipeline"),
      (2L, "der hund und die katze nicht"),
      (3L, "el gato los perros pero"),
      (4L, "le chat les chiens avec"),
      (5L, "the plain english sentence")).toDF("doc_id", "text")
    val got = df.select($"doc_id", TextQueries.langIdCol($"text")).as[(Long, String)]
      .collect().toMap
    assert(got === Map(1L -> "zh", 2L -> "de", 3L -> "es", 4L -> "fr", 5L -> "en"))
  }
}
