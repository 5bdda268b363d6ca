package graft.seen

/** Serializable cuckoo filter over 64-bit keys (SURVEY.md §3 U4).
  *
  * Partial-key cuckoo hashing (Fan et al., "Cuckoo Filter: Practically
  * Better Than Bloom", CoNEXT'14 — public paper): 16-bit fingerprints,
  * 4 slots per bucket, power-of-two bucket count, alternate bucket
  * i2 = i1 XOR hash(fp). Unlike Bloom it supports DELETE, which the
  * frontier needs for retractions.
  *
  * Guarantee relied on by the two-stage seen-set anti-join: NO false
  * negatives for inserted keys. If an insert cannot place a fingerprint
  * after MaxKicks evictions the filter marks itself saturated and
  * `mightContain` returns true for everything — it degrades to "always
  * maybe", never to a wrong "definitely new".
  *
  * Eviction choice is derived deterministically from the kicked
  * fingerprint and kick counter (no Random), so identical op sequences
  * yield identical state.
  */
final class CuckooFilter private (
    val numBuckets: Int, // power of two
    private val table: Array[Short],
    private var count: Long,
    private var saturated: Boolean) extends Serializable {

  import CuckooFilter._

  def this(expectedItems: Long) = this(
    CuckooFilter.bucketsFor(expectedItems),
    new Array[Short](CuckooFilter.bucketsFor(expectedItems) * CuckooFilter.SlotsPerBucket),
    0L, false)

  def size: Long = count
  def isSaturated: Boolean = saturated

  private def mask: Int = numBuckets - 1

  private def slot(b: Int, s: Int): Short = table(b * SlotsPerBucket + s)
  private def setSlot(b: Int, s: Int, v: Short): Unit = table(b * SlotsPerBucket + s) = v

  def insert(key: Long): Boolean = {
    // count tracks logically-inserted keys on EVERY path (a saturated
    // filter answers "maybe" for them, so they are in) — insertFp and
    // the saturation fall-through below count the same way
    if (saturated) { count += 1; return true }
    val fp = fingerprint(key)
    val i1 = bucket1(key, mask)
    val i2 = altBucket(i1, fp, mask)
    if (placeIn(i1, fp) || placeIn(i2, fp)) { count += 1; return true }
    // evict loop
    var b = if (((fp & 1) ^ (i1 & 1)) == 0) i1 else i2
    var f = fp
    var kick = 0
    while (kick < MaxKicks) {
      val s = (f & 0xffff) % SlotsPerBucket // deterministic victim slot
      val victim = slot(b, s)
      setSlot(b, s, f)
      f = victim
      b = altBucket(b, f, mask)
      if (placeIn(b, f)) { count += 1; return true }
      kick += 1
    }
    saturated = true
    count += 1
    true
  }

  def mightContain(key: Long): Boolean = {
    if (saturated) return true
    val fp = fingerprint(key)
    val i1 = bucket1(key, mask)
    if (bucketHas(i1, fp)) return true
    bucketHas(altBucket(i1, fp, mask), fp)
  }

  /** Removes one copy of the key's fingerprint; true if found.
    *
    * ONLY safe for keys known to have been inserted (the cuckoo-filter
    * contract, Fan et al. §3.3): deleting a never-inserted key can evict
    * another key's colliding fingerprint and create a false negative.
    * The crawl honors this — retraction only ever targets url_hashes read
    * back from the committed `fetched` deltas. When saturated the filter
    * no longer tracks fingerprints, so delete degrades to a no-op (the
    * filter stays "always maybe"; counts never drift negative). */
  def delete(key: Long): Boolean = {
    if (saturated) return false
    val fp = fingerprint(key)
    val i1 = bucket1(key, mask)
    if (removeFrom(i1, fp) || removeFrom(altBucket(i1, fp, mask), fp)) {
      count -= 1; true
    } else false
  }

  private def placeIn(b: Int, fp: Short): Boolean = {
    var s = 0
    while (s < SlotsPerBucket) {
      if (slot(b, s) == Empty) { setSlot(b, s, fp); return true }
      s += 1
    }
    false
  }

  private def bucketHas(b: Int, fp: Short): Boolean = {
    var s = 0
    while (s < SlotsPerBucket) {
      if (slot(b, s) == fp) return true
      s += 1
    }
    false
  }

  private def removeFrom(b: Int, fp: Short): Boolean = {
    var s = 0
    while (s < SlotsPerBucket) {
      if (slot(b, s) == fp) { setSlot(b, s, Empty); return true }
      s += 1
    }
    false
  }

  /** Merge another filter built over a disjoint key set (shard union).
    * Re-inserts its fingerprints; may saturate. */
  def mergeInPlace(other: CuckooFilter): CuckooFilter = {
    require(other.numBuckets == numBuckets, "cuckoo shard size mismatch")
    if (other.saturated) { saturated = true; count += other.count; return this }
    var b = 0
    while (b < other.numBuckets) {
      var s = 0
      while (s < SlotsPerBucket) {
        val fp = other.slot(b, s)
        if (fp != Empty) insertFp(b, fp)
        s += 1
      }
      b += 1
    }
    this
  }

  /** Re-insert a fingerprint that belongs to bucket pair {origin, alt}. */
  private def insertFp(origin: Int, fp: Short): Unit = {
    if (saturated) { count += 1; return }
    if (placeIn(origin, fp) || placeIn(altBucket(origin, fp, mask), fp)) {
      count += 1; return
    }
    var b = origin
    var f = fp
    var kick = 0
    while (kick < MaxKicks) {
      val s = (f & 0xffff) % SlotsPerBucket
      val victim = slot(b, s)
      setSlot(b, s, f)
      f = victim
      b = altBucket(b, f, mask)
      if (placeIn(b, f)) { count += 1; return }
      kick += 1
    }
    saturated = true
    count += 1
  }

  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 + 1 + table.length * 2)
    bb.putInt(numBuckets).putLong(count).put(if (saturated) 1.toByte else 0.toByte)
    table.foreach(bb.putShort)
    bb.array()
  }
}

object CuckooFilter {
  val SlotsPerBucket = 4
  val MaxKicks = 500
  val Empty: Short = 0

  /** 95% target load factor headroom.
    *
    * Bucket cap 2^27: the 2-byte-per-slot table is then 2^29 slots =
    * 1 GiB, the ceiling an Int-indexed byte array (serialize()) can
    * hold — 2^28 buckets would need a 2^31-byte buffer and overflow.
    * A 2^27-bucket shard holds ~450M keys before saturating to
    * "always maybe" (correct, slower), so past ~450M expected keys PER
    * SHARD the shard count, not the shard size, is the scale dimension
    * (nShards is a [[graft.CrawlDriver.RunConfig]] knob persisted in
    * snapshot meta). */
  def bucketsFor(expectedItems: Long): Int = {
    val needed = math.max(1L, math.ceil(expectedItems / (SlotsPerBucket * 0.84)).toLong)
    Integer.highestOneBit(math.min(needed * 2 - 1, 1 << 27).toInt)
  }

  def deserialize(bytes: Array[Byte]): CuckooFilter = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val nb = bb.getInt
    val count = bb.getLong
    val sat = bb.get() == 1
    val table = new Array[Short](nb * SlotsPerBucket)
    var i = 0
    while (i < table.length) { table(i) = bb.getShort; i += 1 }
    new CuckooFilter(nb, table, count, sat)
  }

  // splitmix64 finalizer — strong 64-bit mixing, public-domain constant set
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def fingerprint(key: Long): Short = {
    val h = (mix(key) >>> 48).toShort
    if (h == Empty) 1.toShort else h
  }

  def bucket1(key: Long, mask: Int): Int = (mix(key * 0xc2b2ae3d27d4eb4fL) & mask).toInt

  def altBucket(b: Int, fp: Short, mask: Int): Int =
    (b ^ (mix(fp & 0xffffL) & mask)).toInt & mask
}
