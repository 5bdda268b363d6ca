package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the semantics of the hash-signature dedup operators (no DuckDB
  * oracle possible) on planted near-duplicates. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  val base = "the quick brown fox jumps over the lazy dog while spark shuffles " +
    "partitions across the cluster and counts tokens in every document batch"
  // near-dup: one token changed (shingle Jaccard ≈ 0.8); unrelated: disjoint vocabulary
  val nearDup = base.replace("quick", "fast")
  val unrelated = "completely different words about cooking pasta with garlic " +
    "butter sauce and parmesan cheese on sunday evening dinner plates tonight"

  lazy val docs = Seq(
    (1L, base), (2L, nearDup), (3L, unrelated), (4L, base) // 4 = exact dup of 1
  ).toDF("doc_id", "text")

  test("minhash LSH: near-dups collide in >=1 band, unrelated docs in none") {
    val b = TextQueries.minhashBands(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    def buckets(id: Long) = b.filter(_._1 == id).map(x => (x._2, x._3)).toSet
    assert(buckets(1L) === buckets(4L), "exact dup must share all bands")
    assert(buckets(1L).intersect(buckets(2L)).nonEmpty, "near-dup must collide")
    assert(buckets(1L).intersect(buckets(3L)).isEmpty, "unrelated must not collide")
  }

  test("minhash pairs: planted dups surface as pairs, unrelated never") {
    val pairs = TextQueries.minhashPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)), "exact dup pair must surface")
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 4L)),
      "near-dup pairs must surface")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "unrelated doc must pair with nothing")
    // bucket cap drops degenerate buckets entirely
    val capped = TextQueries.minhashPairs(docs, cap = 1L).collect()
    assert(capped.isEmpty)
  }

  test("simhash: hamming distance separates near-dups from unrelated") {
    val s = TextQueries.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(s(1L), s(4L)) === 0)
    assert(hamming(s(1L), s(2L)) < hamming(s(1L), s(3L)))
    assert(hamming(s(1L), s(2L)) <= 16, "near-dup simhash should be close")
  }

  test("winnowing fingerprints: overlap ranks near-dup above unrelated") {
    val fp = TextQueries.winnow(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def fps(id: Long) = fp.filter(_._1 == id).map(_._2).toSet
    assert(fps(1L) === fps(4L))
    val near = fps(1L).intersect(fps(2L)).size
    val far = fps(1L).intersect(fps(3L)).size
    assert(near > far && far === 0)
  }

  test("winnowMd5: fingerprints equal an independent plain-Scala winnow, incl. short docs") {
    // the oracle-checkable winnow twin (md5 signature family): pin its
    // exact output against an independent reimplementation — 5-gram md5
    // hex, lexicographic min over each 4-window (trailing windows
    // clipped), distinct per doc. A <8-token doc exercises the
    // greatest(n-4, 0) single-clipped-window edge.
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def expected(text: String): Set[String] = {
      val toks = text.split("\\s+")
      if (toks.length < 5) return Set.empty
      val grams = toks.sliding(5).map(_.mkString(" ")).map(md5hex).toVector
      (0 to math.max(grams.length - 4, 0))
        .map(i => grams.slice(i, math.min(i + 4, grams.length)).min).toSet
    }
    val shortDoc = "six little tokens right here now" // 6 toks → 2 grams
    val tiny = "just four tokens here"                // < 5 toks → no grams
    val all = docs.unionByName(Seq((5L, shortDoc), (6L, tiny)).toDF("doc_id", "text"))
    val got = TextQueries.winnowMd5(all).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got.getOrElse(1L, Set.empty) === expected(base))
    assert(got.getOrElse(3L, Set.empty) === expected(unrelated))
    assert(got.getOrElse(5L, Set.empty) === expected(shortDoc))
    assert(got(5L).size === 1, "a <4-gram doc yields exactly one clipped-window min")
    assert(!got.contains(6L), "a <5-token doc yields no fingerprints")
    // same separation property as the production integer-hash winnow
    assert(got(1L) === got(4L))
    assert(got(1L).intersect(got(3L)).isEmpty)
  }

  private def md5hexOf(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Independent plain-Scala replay of [[TextQueries.minhashBandsMd5]]:
    * 3-token shingles (distinct), 16 sigs = lexicographic min of
    * md5(sh + "#i"), bucket b = md5(m_{2b} + "," + m_{2b+1} + "," + b). */
  private def expectedMd5Bands(text: String): Set[(Long, String)] = {
    val toks = text.split("\\s+")
    if (toks.length < 3) return Set.empty
    val shingles = toks.sliding(3).map(_.mkString(" ")).toVector.distinct
    val sigs = (0 until 16).map(i => shingles.map(sh => md5hexOf(sh + s"#$i")).min)
    (0 until 8).map(b =>
      (b.toLong, md5hexOf(sigs(2 * b) + "," + sigs(2 * b + 1) + "," + b))).toSet
  }

  test("minhashBandsMd5: buckets equal an independent plain-Scala replay") {
    val got = TextQueries.minhashBandsMd5(docs).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getString(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got(1L) === expectedMd5Bands(base))
    assert(got(3L) === expectedMd5Bands(unrelated))
    assert(got(1L) === got(4L), "exact dup shares every band bucket")
    assert(got(1L).intersect(got(2L)).nonEmpty, "near-dup shares >=1 band bucket")
    assert(got(1L).intersect(got(3L)).isEmpty, "unrelated shares none")
  }

  test("lsh_pairs_md5: pairs equal the replay's bucket collisions; cap drops degenerate buckets") {
    val q = TextQueries.queries
    val dir = java.nio.file.Files.createTempDirectory("lshmd5").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = q("q_lsh_pairs_md5")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bands = Seq(1L -> base, 2L -> nearDup, 3L -> unrelated, 4L -> base)
      .map { case (id, txt) => id -> expectedMd5Bands(txt) }
    val want = (for {
      (a, ba) <- bands; (b, bb) <- bands
      if a < b && ba.intersect(bb).nonEmpty
    } yield (a, b)).toSet
    assert(got === want)
    assert(got.contains((1L, 4L)) && !got.exists(p => p._1 == 3L || p._2 == 3L))
    // capped at 1: every bucket holding both of a pair exceeds the cap
    val capped = TextQueries.annCandidatePairs(
      TextQueries.minhashBandsMd5(docs).withColumnRenamed("doc_id", "vec_id"),
      cap = 1L).collect()
    assert(capped.isEmpty)
  }

  test("simhashMd5: value equals an independent plain-Scala replay") {
    // bit b of the 60-bit simhash = sign of the ±1 vote sum over tokens,
    // where a token votes +1 iff bit (b%4) of hex digit 15-floor(b/4)
    // (1-based from the left) of md5(token) is set
    def expectedSim(text: String): Long = {
      val toks = text.split("\\s+")
      val votes = Array.fill(60)(0)
      toks.foreach { tok =>
        val hx = md5hexOf(tok).take(15)
        for (p <- 1 to 15; k <- 0 until 4) {
          val v = Integer.parseInt(hx.charAt(p - 1).toString, 16)
          val b = (15 - p) * 4 + k
          votes(b) += (if (((v >> k) & 1) == 1) 1 else -1)
        }
      }
      (0 until 60).map(b => if (votes(b) > 0) 1L << b else 0L).sum
    }
    val s = TextQueries.simhashMd5(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s(1L) === expectedSim(base))
    assert(s(2L) === expectedSim(nearDup))
    assert(s(3L) === expectedSim(unrelated))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(s(1L), s(4L)) === 0)
    assert(hamming(s(1L), s(2L)) < hamming(s(1L), s(3L)))
  }

  test("exact + normalized dedup collapse planted dupes") {
    val q = TextQueries.queries
    val dir = java.nio.file.Files.createTempDirectory("dedup").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val exact = q("q_dedup_exact")(spark, dir).collect()
    assert(exact.length === 3)
    assert(exact.find(_.getLong(0) == 1L).get.getLong(1) === 2L) // copies of base
    // normalized dedup also collapses case/punct variants
    val varied = docs.unionByName(Seq((5L, base.toUpperCase + "!!")).toDF("doc_id", "text"))
    varied.withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val norm = q("q_dedup_norm")(spark, dir).collect()
    assert(norm.length === 3, "case/punct variant must collapse under norm dedup")
    assert(norm.find(_.getLong(0) == 1L).get.getLong(1) === 3L)
  }
}
