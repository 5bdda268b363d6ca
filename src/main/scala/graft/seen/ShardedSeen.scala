package graft.seen

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BooleanType
import org.apache.spark.util.sketch.BloomFilter

/** One shard's sketch state: a bloom + a cuckoo filter over the shard's
  * url_hash keys (SURVEY.md §3 U3/U4/G5). Bloom answers the bulk of
  * probes from a bitset scan; the cuckoo adds DELETE (frontier
  * retraction for re-crawl). `mightContain` is the AND of both, so a
  * cuckoo delete makes a key "definitely new" again even though bloom
  * bits are sticky. Zero false negatives for inserted-and-not-deleted
  * keys — the invariant the two-stage seen filter rests on.
  */
final class ShardSketch(val bloom: BloomFilter, val cuckoo: CuckooFilter) {

  def insert(h: Long): Unit = { bloom.putLong(h); cuckoo.insert(h) }

  /** Only for keys known inserted (see [[CuckooFilter.delete]]). */
  def delete(h: Long): Unit = cuckoo.delete(h)

  def mightContain(h: Long): Boolean =
    bloom.mightContain(h) && cuckoo.mightContain(h)

  /** Merge a sibling shard built at the same capacity. */
  def merge(other: ShardSketch): ShardSketch = {
    bloom.mergeInPlace(other.bloom)
    cuckoo.mergeInPlace(other.cuckoo)
    this
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    val bloomBytes = { val b = new ByteArrayOutputStream(); bloom.writeTo(b); b.toByteArray }
    out.writeInt(bloomBytes.length); out.write(bloomBytes)
    val ck = cuckoo.serialize()
    out.writeInt(ck.length); out.write(ck)
    out.flush(); bos.toByteArray
  }
}

object ShardSketch {
  def empty(perShardCapacity: Long, fpp: Double = 0.01): ShardSketch =
    new ShardSketch(
      BloomFilter.create(math.max(perShardCapacity, 256L), fpp),
      new CuckooFilter(math.max(perShardCapacity, 256L)))

  def deserialize(bytes: Array[Byte]): ShardSketch = {
    val in = new java.io.DataInputStream(new ByteArrayInputStream(bytes))
    val bloomBytes = new Array[Byte](in.readInt()); in.readFully(bloomBytes)
    val bloom = BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))
    val ck = new Array[Byte](in.readInt()); in.readFully(ck)
    new ShardSketch(bloom, CuckooFilter.deserialize(ck))
  }
}

/** One row of the `seen_sketch` snapshot table. */
final case class SketchShard(shard: Int, bytes: Array[Byte])

/** Sharded URL-seen set — the 10^10-scale design (SURVEY.md §3 J2/G5).
  *
  * The run-level sketch state lives as a TABLE of shards keyed by
  * pmod(url_hash, nShards), never as one driver-side blob: at 10^10 URLs
  * a 1%-fpp bloom alone is ~12 GB — unbroadcastable, and any driver-side
  * merge is a serial stall. Instead:
  *
  *   - PROBE: the frontier is cogrouped with the shards table on the
  *     shard key — each task sees exactly its shards' rows plus those
  *     shards' (small) sketch bytes. No broadcast, no driver; the only
  *     data movement is one linear shuffle of the frontier slice plus
  *     sketch bytes ≈ state/nShards per task. At cluster scale the seen
  *     table and frontier are bucketed on the same key, so this aligns
  *     with the exact join's partitioning.
  *   - ROUTE: rows whose shard sketch says "definitely new" skip the
  *     exact join entirely; only the maybe-slice (true dupes + a few %
  *     false positives) joins the exact seen table.
  *   - UPDATE: per-wave inserts/deletes are applied by cogrouping the
  *     previous shards with the wave's delta keys — built, merged and
  *     written entirely on executors.
  *
  * Correctness does not depend on sketch internals: sketches only ROUTE
  * rows toward or away from the exact join (no false negatives for live
  * keys), so probe results — and therefore crawl ordering — are
  * independent of fingerprint layout, merge order and parallelism.
  * Property-tested equal to a plain left_anti join.
  */
object ShardedSeen {

  /** Per-task buffer ceiling for the fused dedupe+probe cogroup: ~16M
    * slim frontier Rows ≈ a few GB — comfortably inside a normal
    * executor; a wave bigger than nShards × this is a sizing bug the
    * guard reports instead of OOM-ing. */
  val DefaultMaxShardBufferRows: Long = 16000000L

  def shardOf(urlHash: Long, nShards: Int): Int =
    ((urlHash % nShards) + nShards).toInt % nShards

  /** Row + one boolean column with ONE array copy — `fromSeq(toSeq :+ x)`
    * copies the row twice per frontier row on the probe hot path. */
  private def appendFlag(r: org.apache.spark.sql.Row, flag: Boolean): org.apache.spark.sql.Row = {
    val n = r.length
    val arr = new Array[Any](n + 1)
    var i = 0
    while (i < n) { arr(i) = r.get(i); i += 1 }
    arr(n) = flag
    new org.apache.spark.sql.catalyst.expressions.GenericRow(arr)
  }

  def emptyShards(spark: SparkSession): Dataset[SketchShard] = {
    import spark.implicits._
    spark.emptyDataset[SketchShard]
  }

  /** Stage 1: tag every frontier row with `__maybe` via the shard-
    * aligned sketch probe (cogroup — no broadcast, no driver). Callers
    * that branch on the result should persist it (the cogroup would
    * otherwise re-run per consumer). */
  def probeShards(
      frontier: DataFrame,
      shards: Dataset[SketchShard],
      nShards: Int): DataFrame = {
    val spark = frontier.sparkSession
    import spark.implicits._
    val hashIdx = frontier.schema.fieldIndex("url_hash")
    val outEnc = Encoders.row(frontier.schema.add("__maybe", BooleanType))
    frontier
      .groupByKey(r => shardOf(r.getLong(hashIdx), nShards))
      .cogroup(shards.groupByKey(_.shard)) { (_, rows, sks) =>
        val sketch = sks.map(s => ShardSketch.deserialize(s.bytes))
          .reduceOption(_.merge(_))
        sketch match {
          case None => rows.map(r => appendFlag(r, false))
          case Some(sk) => rows.map(r =>
            appendFlag(r, sk.mightContain(r.getLong(hashIdx))))
        }
      }(outEnc)
  }

  /** [[probeShards]] FUSED with first-wins in-batch dedupe (W3): both
    * key on url_hash (a url_hash's duplicates land in one shard), so one
    * cogroup replaces the window-shuffle + probe-shuffle pair — one less
    * barrier on every wave's critical path. Winner per url_hash is the
    * (priority, kind, url) minimum, exactly [[graft.frontier.Wave
    * .dedupeInBatch]]'s ordering. Buffers one shard's frontier slice per
    * task (wave/nShards rows — pick nShards so that fits, same bound as
    * the sketch update); `maxBufferRows` turns a mis-sized nShards into
    * a fail-fast with an actionable message instead of an opaque
    * executor OOM mid-wave. */
  def probeDedupe(
      frontier: DataFrame,
      shards: Dataset[SketchShard],
      nShards: Int,
      prioIdx: Int,
      kindIdx: Int,
      urlIdx: Int,
      maxBufferRows: Long = DefaultMaxShardBufferRows): DataFrame = {
    val spark = frontier.sparkSession
    import spark.implicits._
    val hashIdx = frontier.schema.fieldIndex("url_hash")
    val outEnc = Encoders.row(frontier.schema.add("__maybe", BooleanType))
    // direct field comparator — Ordering.by would allocate a Tuple4 (+
    // 2 boxed longs) per comparison: ~n log n tuples per shard slice,
    // hundreds of MB of garbage per fat wave
    implicit val rowOrd: Ordering[org.apache.spark.sql.Row] =
      new Ordering[org.apache.spark.sql.Row] {
        def compare(a: org.apache.spark.sql.Row, b: org.apache.spark.sql.Row): Int = {
          val h = java.lang.Long.compare(a.getLong(hashIdx), b.getLong(hashIdx))
          if (h != 0) return h
          val p = java.lang.Long.compare(a.getLong(prioIdx), b.getLong(prioIdx))
          if (p != 0) return p
          val k = a.getString(kindIdx).compareTo(b.getString(kindIdx))
          if (k != 0) return k
          a.getString(urlIdx).compareTo(b.getString(urlIdx))
        }
      }
    frontier
      .groupByKey(r => shardOf(r.getLong(hashIdx), nShards))
      .cogroup(shards.groupByKey(_.shard)) { (shard, rows, sks) =>
        val sketch = sks.map(s => ShardSketch.deserialize(s.bytes))
          .reduceOption(_.merge(_))
        val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
        rows.foreach { r =>
          require(buf.size < maxBufferRows,
            s"shard $shard frontier slice exceeds maxBufferRows=$maxBufferRows " +
              s"— raise nShards so wave/nShards fits in task memory")
          buf += r
        }
        val sorted = buf.toArray.sorted
        var lastHash = 0L
        var first = true
        sorted.iterator.filter { r =>
          val h = r.getLong(hashIdx)
          val keep = first || h != lastHash
          lastHash = h; first = false
          keep
        }.map(r =>
          appendFlag(r, sketch.exists(_.mightContain(r.getLong(hashIdx)))))
      }(outEnc)
  }

  /** Stage 2: turn `__maybe` into `__dup` (true = already seen) by
    * confirming sketch-positive rows against the exact seen table — the
    * exact join only ever sees the maybe-slice. `seenExact` MUST hold
    * one row per url_hash (a dup would multiply frontier rows through
    * the left join): the crawl's seen view is unique by construction —
    * never-fetch-twice — and [[graft.CrawlDriver.seenKeys]] dedupes the
    * (small) re-crawl branch explicitly. */
  def confirmFlag(probed: DataFrame, seenExact: DataFrame): DataFrame = {
    val definitelyNew = probed.filter(!col("__maybe")).withColumn("__dup", lit(false))
    // shuffle_hash, not broadcast: the seen table is the BIG side at
    // scale (bucketed SMJ on a cluster)
    val confirmed = probed.filter(col("__maybe"))
      .join(seenExact.select(col("url_hash"))
          .withColumn("__dup", lit(true)).hint("shuffle_hash"),
        Seq("url_hash"), "left")
      .withColumn("__dup", coalesce(col("__dup"), lit(false)))
    definitelyNew.unionByName(confirmed.select(definitelyNew.columns.map(col): _*))
      .drop("__maybe")
  }

  /** Rows of `frontier` whose url_hash is NOT in the seen set. */
  def notSeen(
      frontier: DataFrame,
      seenExact: DataFrame,
      shards: Dataset[SketchShard],
      nShards: Int): DataFrame =
    confirmFlag(probeShards(frontier, shards, nShards), seenExact)
      .filter(!col("__dup")).drop("__dup")

  /** Apply a wave's delta to the shard table: deletes first (frontier
    * retraction), then inserts (the wave's fetched keys). Runs entirely
    * on executors — prev state and deltas are cogrouped per shard; keys
    * are sorted in-memory per shard so snapshot bytes are byte-stable
    * across parallelism (each shard's delta is wave-sized/nShards).
    *
    * `capacity` is the RUN-level expected key count: sketches only merge
    * at identical sizes, so shards are allocated at capacity/nShards from
    * the first wave (≈ the shard's final size — per-shard, not per-run,
    * memory). */
  def updatedShards(
      prev: Dataset[SketchShard],
      inserts: DataFrame,
      deletes: DataFrame,
      capacity: Long,
      nShards: Int,
      fpp: Double = 0.01): Dataset[SketchShard] = {
    val spark = prev.sparkSession
    import spark.implicits._
    val perShard = math.max(capacity / nShards, 256L)
    val ops = inserts.select(col("url_hash"), lit(false).as("del"))
      .unionByName(deletes.select(col("url_hash"), lit(true).as("del")))
      .as[(Long, Boolean)]
    prev.groupByKey(_.shard)
      .cogroup(ops.groupByKey(o => shardOf(o._1, nShards))) { (shard, sks, opIt) =>
        val opsList = opIt.toArray
        val prevSketch = sks.map(s => ShardSketch.deserialize(s.bytes))
          .reduceOption(_.merge(_))
        if (opsList.isEmpty) {
          prevSketch.map(s => SketchShard(shard, s.serialize())).iterator
        } else {
          val sk = prevSketch.getOrElse(ShardSketch.empty(perShard, fpp))
          opsList.filter(_._2).map(_._1).sorted.foreach(sk.delete)
          opsList.filterNot(_._2).map(_._1).sorted.foreach(sk.insert)
          Iterator.single(SketchShard(shard, sk.serialize()))
        }
      }
  }
}
