package graft.seen

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** URL-seen set: broadcast Bloom + per-shard cuckoo prefilters over the
  * exact `seen(url_hash)` table (SURVEY.md §3 J2/U3/U4/G5).
  *
  * Scale story (10^10 URLs): the exact seen table is huge, so the
  * frontier⟕seen anti-join must NOT shuffle the whole frontier against
  * it every wave. Both sketches have zero false negatives, so:
  *
  *   stage 1  bloom.mightContain == false        → definitely new, keep
  *   stage 2  cuckoo shard mightContain == false → definitely new, keep
  *   stage 3  survivors (a few % false positives + true dupes) take the
  *            exact left_anti join — the shuffle touches only that sliver.
  *
  * Cuckoo shards are keyed by pmod(url_hash, nShards) — a pure function
  * of the key, stable across partitioning — and support delete for
  * frontier retractions. Sketches are rebuilt incrementally per wave via
  * a distributed Aggregator and merged driver-side; both serialize into
  * the snapshot (SURVEY.md §2.2).
  */
final class SeenState(
    val bloom: BloomFilter,
    val shards: Array[CuckooFilter]) extends Serializable {

  def nShards: Int = shards.length

  def mightContain(urlHash: Long): Boolean =
    bloom.mightContain(urlHash) &&
      shards(SeenState.shardOf(urlHash, nShards)).mightContain(urlHash)

  /** Merge a wave's freshly-built sketches (disjoint key sets). */
  def mergeInPlace(other: SeenState): SeenState = {
    require(other.nShards == nShards, "seen-state shard count mismatch")
    bloom.mergeInPlace(other.bloom)
    shards.indices.foreach(i => shards(i).mergeInPlace(other.shards(i)))
    this
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    val bloomBytes = { val b = new ByteArrayOutputStream(); bloom.writeTo(b); b.toByteArray }
    out.writeInt(bloomBytes.length); out.write(bloomBytes)
    out.writeInt(shards.length)
    shards.foreach { s => val b = s.serialize(); out.writeInt(b.length); out.write(b) }
    out.flush(); bos.toByteArray
  }
}

object SeenState {
  def shardOf(urlHash: Long, nShards: Int): Int =
    ((urlHash % nShards) + nShards).toInt % nShards

  /** `capacity` is the RUN-LEVEL expected total key count (not per-wave):
    * sketches can only merge when sized identically, so every per-wave
    * build must use the same capacity as the run state it merges into. */
  def empty(capacity: Long, nShards: Int, fpp: Double = 0.01): SeenState =
    new SeenState(
      BloomFilter.create(math.max(capacity, 1000L), fpp),
      Array.fill(nShards)(new CuckooFilter(math.max(capacity / nShards, 256L))))

  def deserialize(bytes: Array[Byte]): SeenState = {
    val in = new java.io.DataInputStream(new ByteArrayInputStream(bytes))
    val bloomBytes = new Array[Byte](in.readInt()); in.readFully(bloomBytes)
    val bloom = BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))
    val n = in.readInt()
    val shards = Array.fill(n) {
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      CuckooFilter.deserialize(b)
    }
    new SeenState(bloom, shards)
  }

  /** Distributed sketch build over a wave's new url_hash column:
    * bloom via spark-sketch, cuckoo shards via a typed Aggregator
    * grouped on shardOf(url_hash) (map-side partial aggregation). */
  def build(hashes: DataFrame, hashCol: String, capacity: Long,
      nShards: Int, fpp: Double = 0.01): SeenState = {
    val spark = hashes.sparkSession
    import spark.implicits._
    if (hashes.isEmpty) return empty(capacity, nShards, fpp) // bloomFilter NPEs on 0 rows
    val bloom = hashes.stat.bloomFilter(hashCol, math.max(capacity, 1000L), fpp)
    val perShard = math.max(capacity / nShards, 256L)
    val agg = new CuckooAgg(perShard)
    val built = hashes.select(col(hashCol).as("h"))
      .as[Long]
      .groupByKey(h => shardOf(h, nShards))
      .agg(agg.toColumn.name("cf"))
      .collect()
      .toMap
    val shards = Array.tabulate(nShards) { i =>
      built.get(i).map(CuckooFilter.deserialize)
        .getOrElse(new CuckooFilter(perShard))
    }
    new SeenState(bloom, shards)
  }
}

/** Typed distributed cuckoo-shard builder (SURVEY.md §3 G5). */
final class CuckooAgg(expectedPerShard: Long)
    extends Aggregator[Long, CuckooFilter, Array[Byte]] {
  override def zero: CuckooFilter = new CuckooFilter(expectedPerShard)
  override def reduce(b: CuckooFilter, a: Long): CuckooFilter = { b.insert(a); b }
  override def merge(b1: CuckooFilter, b2: CuckooFilter): CuckooFilter =
    b1.mergeInPlace(b2)
  override def finish(r: CuckooFilter): Array[Byte] = r.serialize()
  override def bufferEncoder: Encoder[CuckooFilter] = Encoders.kryo[CuckooFilter]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object SeenSet {

  /** Two-stage frontier∖seen (J2). `seenExact` must contain a `url_hash`
    * column holding exactly the keys the sketches were built over.
    * Returns rows of `frontier` whose `url_hash` is NOT in seen.
    *
    * Correctness does not depend on the sketches (they only route rows
    * away from the exact join); property-tested equal to a plain
    * left_anti.
    */
  def notSeen(frontier: DataFrame, seenExact: DataFrame, state: SeenState): DataFrame = {
    val spark = frontier.sparkSession
    val stateB: Broadcast[SeenState] = spark.sparkContext.broadcast(state)
    val maybeSeen = udf((h: Long) => stateB.value.mightContain(h))
    val tagged = frontier.withColumn("__maybe", maybeSeen(col("url_hash")))
    val definitelyNew = tagged.filter(!col("__maybe")).drop("__maybe")
    val survivors = tagged.filter(col("__maybe")).drop("__maybe")
      .join(seenExact.select(col("url_hash")).hint("shuffle_hash"),
        Seq("url_hash"), "left_anti")
    definitelyNew.unionByName(survivors)
  }
}
