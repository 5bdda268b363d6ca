package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Training-data pipeline operators over `documents` / `embeddings`
  * (builder-prompt first-class components): dedup (exact, normalized,
  * MinHash-LSH, SimHash, n-gram Jaccard), similarity search (brute-force
  * cosine + LSH buckets), text analysis (lang-ID, quality, tokens,
  * fingerprints), multimodal metadata plumbing.
  *
  * Oracle-checked where DuckDB can express the same computation; the
  * hash-based signatures (MinHash/SimHash/LSH — xxhash64 is Spark-
  * specific) are registered without oracles → driver rows-only check,
  * with semantics pinned by ScalaTest on planted near-duplicates.
  */
object TextQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Cosine similarity of two float-array columns via higher-order
    * functions — codegen-friendly, no UDF (SURVEY prompt: similarity
    * search baseline). */
  def cosineCol(a: Column, b: Column): Column = {
    def dd(c: Column): Column = c.cast("double")
    val dot = aggregate(zip_with(a, b, (x, y) => dd(x) * dd(y)), lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => dd(x) * dd(x)), lit(0.0), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x => dd(x) * dd(x)), lit(0.0), (acc, v) => acc + v))
    dot / (na * nb)
  }

  /** ‖a‖₂ with [[cosineCol]]'s exact arithmetic (f32→f64 widening,
    * index-order left-fold) — hoisted out so a side's norm is computed
    * once instead of once per pair (r6 guide §1.2 step 2). */
  def normCol(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  /** cos(embedding, q) for a DRIVER-KNOWN query vector q: the dot rides
    * the fused [[graft.functions.DotMatrix]] codegen kernel (1-row
    * matrix) and ‖q‖ is a literal computed with the same left-fold —
    * value-identical to `cosineCol(emb, lit(q))` (EquivCheck + spec),
    * ~10× cheaper than the interpreted per-row zip_with/aggregate
    * lambdas (r6: q_embed_topk, IVF probe). */
  def cosineToQueryCol(emb: Column, q: Seq[Float]): Column = {
    val qd = q.map(_.toDouble)
    var s = 0.0
    qd.foreach(x => s += x * x)
    val nq = math.sqrt(s)
    val dot = element_at(graft.functions.DotMatrix(emb, Seq(qd)), 1)
    dot / (normCol(emb) * lit(nq))
  }

  /** As [[cosineToQueryCol]] but in the ORACLE's single-precision
    * arithmetic ([[graft.functions.CosineF32]] — DuckDB's
    * list_cosine_similarity replicated bitwise). Used by every
    * oracle-CHECKED cosine query (q_embed_threshold / q_embed_topk_r4 /
    * q_embed_neardup_exact / q_ann_ivf_assign_r4) so the round(.,4)
    * values match the oracle structurally instead of data-luckily; the
    * rows-only production paths (q_embed_topk, IVF, LSH) keep the f64
    * kernels their specs pin. */
  def cosineToQueryF32Col(emb: Column, q: Seq[Float]): Column =
    element_at(graft.functions.CosineF32.toMatrix(emb, Seq(q)), 1)

  private val Stopwords = Seq("the", "a", "of", "and", "to", "in")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- dedup -----------------------------------------------------
    // Group by xxhash64(text), NOT text: at 100 TB the grouping key is
    // what shuffles, and hashing first means shuffle bytes ≈ 16/row
    // instead of the whole corpus body. Results are identical barring a
    // 64-bit collision (the keeper/copies/len aggregates never need the
    // text itself).
    "q_dedup_exact" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"), xxhash64(col("text")).as("__h"),
          length(col("text")).as("__len"))
        .groupBy(col("__h"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("copies"),
          min(col("__len")).as("text_len"))
        .select(col("keeper"), col("copies"), col("text_len"))
    }),

    // r6: the two regex passes ([^a-z0-9 ]→' ', ' +'→' ') + trim are one
    // fused byte scan over the lowered string (NormalizeAscii — byte-
    // identical, TextKernelsSpec); the grouping/shuffle shape is unchanged
    "q_dedup_norm" -> ((s, d) => {
      val norm = graft.functions.TextKernels2.normalizeAscii(lower(col("text")))
      t(s, d, "documents")
        .select(col("doc_id"), xxhash64(norm).as("__h"), length(norm).as("__len"))
        .groupBy(col("__h"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("copies"),
          min(col("__len")).as("norm_len"))
        .select(col("keeper"), col("copies"), col("norm_len"))
    }),

    // MinHash + LSH banding: shingle → 16 minhashes → 4 bands of 4 →
    // bucket id per band (near-dup candidates share a bucket). Spark-only
    // (xxhash64 signatures) → rows-only oracle; pair semantics pinned in
    // DedupSpec on planted near-dups.
    "q_minhash_lsh" -> ((s, d) => minhashBands(t(s, d, "documents"))),

    // the product a dedup user actually consumes: distinct candidate
    // PAIRS sharing ≥1 minhash band bucket (bucket→pair join, oversized
    // buckets capped — same machinery as the ANN path). Rows-only
    // (xxhash64 buckets are Spark-specific); recall on planted near-dups
    // pinned in DedupSpec.
    "q_minhash_pairs" -> ((s, d) => minhashPairs(t(s, d, "documents"))),

    // 64-bit SimHash per document from token hashes
    "q_simhash64" -> ((s, d) => simhash(t(s, d, "documents"))),

    // SimHash over an MD5 token-hash family (portable twin of
    // q_simhash64): the bit-vote algorithm itself carries a full DuckDB
    // oracle check while q_simhash64 stays the cheap xxhash64 production
    // variant (round-4 verdict stretch, same split as q_winnow_md5)
    "q_simhash_md5" -> ((s, d) => simhashMd5(t(s, d, "documents"))),

    // minhash banding over an MD5 signature family (portable twin of
    // q_minhash_lsh, same shingle / 16-sig / 8x2 banding): lexicographic
    // min over md5 hex strings — every step ANSI-SQL-expressible, so the
    // signature+banding pipeline is oracle-checked, not just rows-only
    "q_minhash_md5" -> ((s, d) => minhashBandsMd5(t(s, d, "documents"))),

    // candidate PAIRS from the md5 banding incl. the oversized-bucket
    // cap — oracle-checks the bucket→pair join machinery that
    // q_minhash_pairs / q_embed_neardup run under Spark-only hashes
    "q_lsh_pairs_md5" -> ((s, d) =>
      annCandidatePairs(minhashBandsMd5(t(s, d, "documents"))
        .withColumnRenamed("doc_id", "vec_id"))),

    // token-set Jaccard for deterministic candidate pairs (doc, doc+1).
    // r6: the pair key is doc_id — unique, no skew — so join the two
    // DISTINCT-TOKEN-SET rows directly and intersect in-row
    // (array_intersect, codegen) instead of exploding every token into
    // the union+groupBy counting pipeline: same rows, one doc_id-keyed
    // exchange instead of three token-keyed ones, and a hot token never
    // becomes a join key at all (the old design's skew concern is moot
    // when the join key is the unique doc id).
    "q_ngram_jaccard" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val sets = docs.select(col("doc_id"),
        array_distinct(split(col("text"), "\\s+")).as("__tk"))
      sets.as("s1")
        .join(sets.as("s2"), col("s2.doc_id") === col("s1.doc_id") + 1)
        .select(col("s1.doc_id").as("doc_id"),
          size(col("s1.__tk")).cast("long").as("sz1"),
          size(col("s2.__tk")).cast("long").as("sz2"),
          size(array_intersect(col("s1.__tk"), col("s2.__tk")))
            .cast("long").as("n_common"))
        .select(col("doc_id"), col("n_common"),
          round(col("n_common").cast("double") /
            (col("sz1") + col("sz2") - col("n_common")), 4).as("jaccard"))
    }),

    // ---- similarity search -----------------------------------------
    // brute-force cosine vs query vector, thresholded (oracle-checked).
    // r6: the query vector is read once (a pushed-down point lookup) and
    // the per-row cosine runs through a fused codegen kernel instead of
    // interpreted zip_with/aggregate lambdas; oracle-checked, so the
    // kernel is the f32 oracle replica (see cosineToQueryF32Col).
    "q_embed_threshold" -> ((s, d) => {
      brutCosF32(t(s, d, "embeddings"))
        .select(col("vec_id"), round(col("cos_raw"), 4).as("cos_sim"))
        .filter(col("cos_sim") >= 0.25)
    }),

    // brute-force top-k (rows-only: k-boundary float ties are not
    // oracle-stable; correctness pinned in SimilaritySpec)
    "q_embed_topk" -> ((s, d) => {
      brutCos(t(s, d, "embeddings"))
        .orderBy(col("cos_raw").desc, col("vec_id").asc)
        .limit(10)
        .select(col("vec_id"), round(col("cos_raw"), 4).as("cos_sim"))
    }),

    // oracle-checkable TWIN of q_embed_topk (round-4 verdict #7 family,
    // same split as q_winnow_md5): rank by the ROUNDED score with a
    // vec_id tiebreak — a total order both engines agree on (the
    // passing q_embed_threshold oracle already proves the round-4
    // scores match), unlike the raw-float k-boundary ties above
    "q_embed_topk_r4" -> ((s, d) => {
      brutCosF32(t(s, d, "embeddings"))
        .select(col("vec_id"), round(col("cos_raw"), 4).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id").asc)
        .limit(10)
    }),

    // banded random-hyperplane LSH (the ANN scale path): b bands × r
    // bits, candidates share ANY band's bucket — mirrors the minhash
    // banding. At N=10^10 a single 8-bit band meant ~N/256 vectors per
    // bucket (quadratic within-bucket join); 16-bit bands keep buckets
    // ~N/65536 per band and the cap below bounds the worst case.
    "q_ann_lsh_bucket" -> ((s, d) => annBuckets(t(s, d, "embeddings"))),

    // IVF coarse-quantizer ANN (the data-adaptive scale path next to
    // the data-independent LSH above; see [[Ivf]]). Rows-only: the
    // centroid sample is xxhash64-seeded (Spark-specific); assignment
    // determinism + recall vs brute force are pinned in IvfSpec.
    "q_ann_ivf_assign" -> ((s, d) => Ivf.assign(t(s, d, "embeddings"))),
    // oracle-checkable TWIN of q_ann_ivf_assign: same coarse-quantizer
    // semantics (cell = argmax cosine over K centroids, lowest cell id
    // on ties — [[Ivf]] normalizes its centroids, so its argmax-DOT is
    // exactly argmax-cosine) but with SQL-expressible centroids (the
    // first K=16 vectors by vec_id instead of the xxhash64-seeded
    // sample) and the rounded-score total order the other twins use.
    // DuckDB replays the full assignment end-to-end.
    // r6: the 16 centroids are collected once (16 rows — same pattern as
    // Ivf.centroids) and the per-vector argmax computes all 16 rounded
    // cosines in ONE codegen projection — replaces the crossJoin-explode
    // (N×16 rows) + window shuffle with a linear pass;
    // array_position(array_max) keeps the exact (cs desc, cid asc)
    // tie-break because the cs array is ordered by ascending cid.
    // Oracle-checked, so the cosines come from the f32 oracle replica
    // ([[graft.functions.CosineF32.toMatrix]]) and each round(.,4)
    // equals the oracle's bitwise.
    "q_ann_ivf_assign_r4" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val cRows = e.filter(col("vec_id").between(1, 16))
        .select(col("vec_id").cast("int").as("cid"), col("embedding"))
        .collect().sortBy(_.getInt(0))
      if (cRows.isEmpty) {
        // empty-corpus fallback: the original plan shape (yields empty)
        val c = e.filter(col("vec_id").between(1, 16))
          .select(col("vec_id").cast("int").as("cid"), col("embedding").as("ce"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("vec_id")).orderBy(col("cs").desc, col("cid").asc)
        e.crossJoin(broadcast(c))
          .select(col("vec_id"), col("cid"),
            round(cosineCol(col("embedding"), col("ce")), 4).as("cs"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("vec_id"), col("cid").as("cell"))
      } else {
        val mat: Seq[Seq[Float]] =
          cRows.toSeq.map(_.getSeq[Float](1).toSeq)
        val cids: Seq[Int] = cRows.toSeq.map(_.getInt(0))
        val cidArr = typedLit(cids)
        e.select(col("vec_id"),
            transform(graft.functions.CosineF32.toMatrix(col("embedding"), mat),
              c => round(c, 4)).as("__cs"))
          .select(col("vec_id"),
            element_at(cidArr,
              array_position(col("__cs"), array_max(col("__cs"))).cast("int"))
              .as("cell"))
      }
    }),
    // the REGISTERED top-k executes the indexed read path: build/reuse
    // the cell-partitioned inverted file, then a partition-PRUNED probe
    // scan of nprobe cells (round-3 verdict: the registered plan must
    // be the scale path, not a per-query corpus-wide reassignment)
    "q_ann_ivf_topk" -> ((s, d) =>
      Ivf.indexedTopK(s, t(s, d, "embeddings"), cacheKey = s"$d/embeddings.parquet")),

    // embedding-cosine near-dup pairs: candidates from the banded-bucket
    // self-join, deduped across bands, oversized buckets capped, then
    // verified with exact cosine. Rows-only: hash buckets are Spark-
    // specific; recall pinned in SimilaritySpec on planted near-dups.
    "q_embed_neardup" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val pairs = annCandidatePairs(annBuckets(e))
      // r6: each side's norm is computed once at the (small) join input
      // instead of once per candidate pair — same arithmetic as
      // cosineCol (dot / (na * nb)), value-identical
      def dot(a: Column, b: Column): Column =
        aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, v) => acc + v)
      pairs
        .join(e.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"),
          normCol(col("embedding")).as("__na")), Seq("id_a"))
        .join(e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"),
          normCol(col("embedding")).as("__nb")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          round(dot(col("emb_a"), col("emb_b")) / (col("__na") * col("__nb")), 4)
            .as("cos_sim"))
        .filter(col("cos_sim") >= 0.1)
    }),

    // oracle-checkable TWIN of q_embed_neardup (same split as the md5
    // signature twins): the SAME exact-verify kernel (pairwise rounded
    // cosine >= tau, id_a < id_b canonical order) run over a
    // deterministic audit block (vec_id % 10 == 0) instead of the
    // recall-based LSH candidate set — every step ANSI-SQL-expressible,
    // so DuckDB replays it end-to-end. The block keeps the twin's pair
    // count quadratic only in the block size (N/10 choose 2 per run),
    // which is the same boundedness contract the production path gets
    // from its per-bucket cap.
    "q_embed_neardup_exact" -> ((s, d) => {
      val e = t(s, d, "embeddings").filter(col("vec_id") % 10 === 0)
      // oracle-checked → the pair cosine is the f32 oracle replica
      // ([[graft.functions.CosineF32]]), one fused codegen kernel per
      // pair. The f64 formulation (and its r6 norm hoist) rounded to a
      // DIFFERENT 4th decimal whenever a score hit a half-boundary —
      // the production twin q_embed_neardup keeps the f64 kernel its
      // recall spec pins.
      e.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
        .crossJoin(broadcast(
          e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(graft.functions.CosineF32(col("emb_a"), col("emb_b")), 4)
            .as("cos_sim"))
        .filter(col("cos_sim") >= 0.1)
    }),

    // ---- text analysis ---------------------------------------------
    "q_lang_id" -> ((s, d) => {
      t(s, d, "documents").select(col("doc_id"), langIdCol(col("text")).as("lang_pred"))
    }),

    "q_text_quality" -> ((s, d) => {
      val toks = split(col("text"), "\\s+")
      val nTok = size(toks)
      val nStop = size(filter(toks, x => x.isin(Stopwords: _*)))
      val alnum = length(regexp_replace(col("text"), "[^a-zA-Z0-9]", ""))
      t(s, d, "documents").select(
        col("doc_id"),
        nTok.as("n_tokens"),
        round(alnum.cast("double") / greatest(nTok, lit(1)), 4).as("avg_tok_len"),
        round(nStop.cast("double") / greatest(nTok, lit(1)), 4).as("stop_ratio"),
        round((length(col("text")) - alnum -
          (nTok - lit(1))).cast("double") / greatest(length(col("text")), lit(1)), 4)
          .as("punct_ratio"))
    }),

    "q_token_count" -> ((s, d) => {
      t(s, d, "documents").select(
        col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("n_ws_tokens"),
        ceil(length(col("text")).cast("double") / 4.0).cast(LongType).as("n_bpeish"))
    }),

    "q_fingerprint_md5" -> ((s, d) => {
      t(s, d, "documents").select(col("doc_id"), md5(col("text")).as("fp"))
    }),

    // rolling Karp-Rabin winnowing fingerprints — Spark-only (integer
    // rolling hash not SQL-portable), rows-only + TextSpec
    "q_fingerprint_winnow" -> ((s, d) => winnow(t(s, d, "documents"))),

    // winnowing over an MD5 signature family: identical window/min
    // semantics, but the gram hash is md5 (portable) instead of the
    // Karp-Rabin long — so DuckDB replays the EXACT fingerprints and the
    // winnowing algorithm itself is oracle-checked, not just rows-only
    // (round-4 verdict stretch: pin a signature family SQL can express)
    "q_winnow_md5" -> ((s, d) => winnowMd5(t(s, d, "documents"))),

    // ---- multimodal plumbing ----------------------------------------
    "q_multimodal_meta" -> ((s, d) => {
      t(s, d, "documents").select(
        col("doc_id"),
        octet_length(col("text")).as("n_bytes"),
        substring(col("text"), 1, 8).as("header"),
        ceil(octet_length(col("text")).cast("double") / 256.0).cast(LongType)
          .as("n_chunks"))
    }))

  /** CJK-presence → zh, else distinctive-stopword cascade, default en.
    * Deterministic and expressible identically in DuckDB. */
  def langIdCol(text: Column): Column =
    when(text.rlike("[\\x{4e00}-\\x{9fff}]"), "zh")
      .when(text.rlike("(^| )(der|und|nicht)( |$)"), "de")
      .when(text.rlike("(^| )(el|los|pero)( |$)"), "es")
      .when(text.rlike("(^| )(le|les|avec)( |$)"), "fr")
      .otherwise("en")

  /** Brute-force cosine vs the `vec_id = 0` query vector, as
    * `(vec_id, cos_raw)` over every other vector — r6 shared plan for
    * the three q_embed_* queries: the query vector comes from ONE
    * pushed-down point lookup (the Ivf.indexedTopK pattern) and the
    * cosine is the fused [[cosineToQueryCol]] codegen kernel. Falls
    * back to the r5 crossJoin shape when the corpus has no query row
    * (yields the same empty result with the same schema). */
  private def brutCos(e: DataFrame): DataFrame = {
    val qRow = e.filter(col("vec_id") === 0).select(col("embedding")).head(1)
    if (qRow.isEmpty) {
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
      e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), cosineCol(col("embedding"), col("qe")).as("cos_raw"))
    } else {
      e.filter(col("vec_id") =!= 0)
        .select(col("vec_id"),
          cosineToQueryCol(col("embedding"), qRow(0).getSeq[Float](0)).as("cos_raw"))
    }
  }

  /** [[brutCos]] in the oracle's f32 arithmetic — the shared plan of the
    * two oracle-CHECKED brute-cosine queries (threshold / topk_r4); the
    * rows-only q_embed_topk stays on the f64 [[brutCos]] its spec and
    * the IVF exactness proofs compare against. */
  private def brutCosF32(e: DataFrame): DataFrame = {
    val qRow = e.filter(col("vec_id") === 0).select(col("embedding")).head(1)
    if (qRow.isEmpty) {
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
      e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          graft.functions.CosineF32(col("embedding"), col("qe")).as("cos_raw"))
    } else {
      e.filter(col("vec_id") =!= 0)
        .select(col("vec_id"),
          cosineToQueryF32Col(col("embedding"), qRow(0).getSeq[Float](0)).as("cos_raw"))
    }
  }

  /** 16 minhashes over 3-token shingles, banded 8×2 (S-curve threshold
    * (1/8)^(1/2) ≈ 0.35 Jaccard — catches training-data near-dups).
    *
    * r6: the 16 signatures come from the fused [[graft.functions
    * .MinHashSigsXx]] kernel — one codegen pass per document — instead
    * of exploding every shingle into a 16-min groupBy (one full shuffle
    * of the shingle set + interpreted HOF shingling, gone); the band
    * bucket hashing on top is unchanged builtins, so buckets are
    * bit-identical (TextKernelsSpec + EquivCheck). */
  def minhashBands(docs: DataFrame): DataFrame = {
    val sigs = docs
      .select(col("doc_id"), split(col("text"), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        graft.functions.TextKernels2.minhashSigsXx(col("toks")).as("__m"))
    val bands = (0 until 8).map { b =>
      struct(lit(b).as("band"),
        xxhash64(concat_ws(",",
          (0 until 2).map(j => element_at(col("__m"), b * 2 + j + 1).cast("string")): _*),
          lit(b)).as("bucket"))
    }
    sigs.select(col("doc_id"), explode(array(bands: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** Classic 64-bit SimHash: sign of per-bit vote sums over token hashes.
    * r6: per-document fused vote kernel ([[graft.functions.SimhashXx]])
    * — the explode→64-sum groupBy shuffle is gone; values identical. */
  def simhash(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), "\\s+").as("toks"))
      .filter(col("toks").isNotNull) // explode(null) emitted no row
      .select(col("doc_id"),
        graft.functions.TextKernels2.simhashXx(col("toks")).as("simhash"))

  /** LSH banding parameters: 4 bands × 16 hyperplanes. Per band the
    * bucket space is 2^16 — at N=10^10 that's ~150k vectors per bucket
    * per band BEFORE the similarity structure concentrates near-dups;
    * [[AnnBucketCap]] bounds the pathological buckets regardless. */
  val AnnBands = 4
  val AnnBitsPerBand = 16

  /** Deterministic pseudo-random hyperplanes, banded: one row per
    * (vec_id, band) with bucket = the band's 16-bit sign pattern.
    * Hyperplane j, dim i weight = ±1 from xxhash64("hp<j>_<i>") —
    * PRECOMPUTED into one literal (nPlanes × dim) weight matrix: the
    * weights depend only on (plane, dim), so hashing them per row would
    * burn 64×dim hashes/vector for constants (at 10^10 vectors that's
    * the whole job). The matrix ships once in the plan (broadcast-sized:
    * 64×dim doubles); dots are zip_with/aggregate — no UDF. */
  def annBuckets(embeddings: DataFrame,
      nBands: Int = AnnBands, bitsPerBand: Int = AnnBitsPerBand): DataFrame = {
    val nPlanes = nBands * bitsPerBand
    val first = embeddings.select(size(col("embedding")).as("d")).take(1)
    if (first.isEmpty)
      return embeddings.sparkSession.emptyDataFrame
        .withColumn("vec_id", lit(0L)).withColumn("band", lit(0))
        .withColumn("bucket", lit(0L)).limit(0)
    val dim = first.head.getInt(0)
    val weights: Seq[Seq[Double]] = (0 until nPlanes).map { j =>
      (0 until dim).map { i =>
        val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(org.apache.spark.unsafe.types.UTF8String.fromString(s"hp${j}_$i"),
            org.apache.spark.sql.types.StringType, 42L).asInstanceOf[Long]
        (((h % 2) + 2) % 2).toDouble * 2.0 - 1.0
      }
    }
    // fused constant-matrix kernel (graft.functions.DotMatrix): the
    // higher-order lambdas are CodegenFallback — one interpreted closure
    // call per element per plane; the custom expression is a primitive
    // loop inside whole-stage codegen with identical arithmetic
    // (GraftFunctionsSpec pins ≡ the higher-order twin)
    val dots = graft.functions.DotMatrix(col("embedding"), weights)
    val withDots = embeddings.select(col("vec_id"), dots.as("__dots"))
    val bands = (0 until nBands).map { b =>
      val bits = (0 until bitsPerBand).map { k =>
        when(element_at(col("__dots"), b * bitsPerBand + k + 1) >= 0,
          lit(1L << k)).otherwise(lit(0L))
      }.reduce(_ + _)
      struct(lit(b).as("band"), bits.as("bucket"))
    }
    withDots.select(col("vec_id"), explode(array(bands: _*)).as("bb"))
      .select(col("vec_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** Per-(band,bucket) candidate cap: a bucket holding more than this
    * many vectors is dropped from pair generation (its members still
    * appear via their other bands). Bounds the within-bucket join at
    * cap² instead of (N/2^bits)² on degenerate data. */
  val AnnBucketCap = 4096L

  /** Distinct candidate pairs (id_a < id_b) sharing ≥1 band bucket,
    * oversized buckets capped.
    *
    * r6 (guide §2.4): the cap used to be a groupBy-count + re-join,
    * which evaluated the whole upstream signature pipeline once per
    * occurrence of `buckets` — the executed plan scanned the corpus and
    * recomputed the signatures 4× (counts side, join side, and both
    * self-join sides; 8 parquet scans in the r5 q_minhash_pairs plan).
    * A COUNT WINDOW over (band, bucket) needs the same single exchange
    * the self-join needs anyway, so the signature pipeline runs ONCE
    * below one Exchange that the self-join's two sides then share via
    * ReusedExchange, already partitioned AND sorted on the join key
    * (zero additional exchanges). Same counts, same cap verdicts, same
    * pairs. */
  def annCandidatePairs(buckets: DataFrame, cap: Long = AnnBucketCap): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("bucket"))
    val sized = buckets
      .withColumn("__n", count(lit(1)).over(w))
      .filter(col("__n") <= cap).drop("__n")
    // merge hint: without it the planner broadcast-builds one side of
    // the self-join, which duplicates the whole signature pipeline (the
    // r5 plan scanned the corpus 8×); as a sort-merge join both sides
    // are the SAME exchange+sort the count window already needs, so the
    // second side becomes a ReusedExchange and the signatures compute
    // exactly once
    sized.as("x").hint("merge").join(sized.as("y").hint("merge"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"))
      .distinct()
  }

  /** MinHash-LSH candidate pairs: distinct (id_a < id_b) sharing ≥1
    * minhash band bucket, oversized buckets capped — [[minhashBands]]
    * composed with the same capped bucket→pair join as the ANN path. */
  def minhashPairs(docs: DataFrame, cap: Long = AnnBucketCap): DataFrame =
    annCandidatePairs(
      minhashBands(docs).withColumnRenamed("doc_id", "vec_id"), cap)

  /** Karp-Rabin-style hashes over token 5-grams, winnowed to the
    * per-window minimum (document fingerprinting for near-dup at scale;
    * Schleimer et al. "Winnowing", SIGMOD'03 — public paper).
    *
    * r6: gram hashing + window minima + first-occurrence distinct are
    * one fused codegen pass ([[graft.functions.WinnowFpsXx]]) — the
    * interpreted transform/slice/array_min lambdas (O(grams × window)
    * interpreted evals + an array copy per window) are gone; the
    * fingerprint SET per document is identical (TextKernelsSpec +
    * EquivCheck pin it). */
  def winnow(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 5)
      .select(col("doc_id"),
        explode(graft.functions.TextKernels2.winnowFpsXx(col("toks"))).as("fp"))

  /** Winnowing with an MD5 gram hash (lexicographic min over the hex
    * strings): same 5-gram / 4-window scheme as [[winnow]], but every
    * step is ANSI-SQL-portable, so the DuckDB oracle replays the exact
    * fingerprints — the winnowing semantics carries a full oracle check
    * while [[winnow]] stays the cheap integer-hash production variant.
    * (r6: fused kernel, same fingerprints — see [[winnow]].) */
  def winnowMd5(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 5)
      .select(col("doc_id"),
        explode(graft.functions.TextKernels2.winnowFpsMd5(col("toks"))).as("fp"))

  /** [[minhashBands]] over an MD5 signature family: identical shingle /
    * 16-sig / 8×2 banding scheme, but sig i = lexicographic min of
    * md5(shingle + "#i") hex strings and bucket = md5 of the band's sig
    * pair — fully ANSI-portable, so the DuckDB oracle replays the exact
    * buckets ([[minhashBands]] stays the production xxhash64 variant).
    * (r6: fused signature kernel, same buckets — see [[minhashBands]].) */
  def minhashBandsMd5(docs: DataFrame): DataFrame = {
    val sigs = docs
      .select(col("doc_id"), split(col("text"), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        graft.functions.TextKernels2.minhashSigsMd5(col("toks")).as("__m"))
    val bands = (0 until 8).map { b =>
      struct(lit(b.toLong).as("band"),
        md5(concat_ws(",", element_at(col("__m"), b * 2 + 1),
          element_at(col("__m"), b * 2 + 2), lit(b.toString))).as("bucket"))
    }
    sigs.select(col("doc_id"), explode(array(bands: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** [[simhash]] over an MD5 token-hash family: 60 bits from the first
    * 15 hex chars of md5(token) — 15×4 bits fits a signed long in both
    * engines without unsigned-hex gymnastics — per-bit ±1 votes, sign of
    * the vote sum sets the bit. Bit b = bit (b%4) of hex digit 15-b/4
    * (digit 1 = most significant), so simhash60 = Σ 2^b over winning
    * bits < 2^60. DuckDB replays the exact value from the same digits.
    * (r6: fused vote kernel, same values — see [[simhash]].) */
  def simhashMd5(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), "\\s+").as("toks"))
      .filter(col("toks").isNotNull) // explode(null) emitted no row
      .select(col("doc_id"),
        graft.functions.TextKernels2.simhashMd5(col("toks")).as("simhash60"))

  /** The md5-banding CTE shared by the q_minhash_md5 / q_lsh_pairs_md5
    * oracles (16 min-sigs, 8 bands, bucket = md5 of the sig pair). */
  private val Md5BandsCte: String = {
    val sigCols = (0 until 16).map(i => s"min(md5(sh || '#$i')) AS m$i").mkString(",\n             ")
    val cases = (0 until 8).map(b =>
      s"WHEN $b THEN md5(m${2 * b} || ',' || m${2 * b + 1} || ',' || '$b')").mkString("\n             ")
    s"""toks AS (
           SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents
           WHERE len(string_split_regex(text, '\\s+')) >= 3),
         sh AS (
           SELECT DISTINCT doc_id, toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] AS sh
           FROM (SELECT doc_id, toks, unnest(range(0, len(toks) - 2)) AS i FROM toks)),
         sigs AS (
           SELECT doc_id,
             $sigCols
           FROM sh GROUP BY doc_id),
         bands AS (
           SELECT doc_id, CAST(b AS BIGINT) AS band,
             CASE b
             $cases
             END AS bucket
           FROM sigs, (SELECT unnest(range(0, 8)) AS b))"""
  }

  val oracles: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT min(doc_id) AS keeper, count(*) AS copies, length(text) AS text_len
         FROM documents GROUP BY text""",
    "q_dedup_norm" ->
      """WITH n AS (SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text
         FROM documents)
         SELECT min(doc_id) AS keeper, count(*) AS copies, length(norm_text) AS norm_len
         FROM n GROUP BY norm_text""",
    "q_ngram_jaccard" ->
      """WITH toks AS (
           SELECT DISTINCT doc_id, unnest(string_split_regex(text, '\s+')) AS tok FROM documents),
         sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY 1),
         inter AS (
           SELECT x.doc_id, count(*) AS n FROM toks x
           JOIN toks y ON y.tok = x.tok AND y.doc_id = x.doc_id + 1 GROUP BY 1)
         SELECT s1.doc_id AS doc_id, coalesce(inter.n, 0) AS n_common,
           round(coalesce(inter.n, 0)::DOUBLE / (s1.sz + s2.sz - coalesce(inter.n, 0)), 4) AS jaccard
         FROM sizes s1
         JOIN sizes s2 ON s2.doc_id = s1.doc_id + 1
         LEFT JOIN inter ON inter.doc_id = s1.doc_id""",
    "q_embed_threshold" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         SELECT vec_id, cos_sim FROM (
           SELECT e.vec_id,
             round(list_cosine_similarity(e.embedding, q.qe)::DOUBLE, 4) AS cos_sim
           FROM embeddings e, q WHERE e.vec_id <> 0)
         WHERE cos_sim >= 0.25""",
    "q_embed_topk_r4" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         SELECT vec_id, cos_sim FROM (
           SELECT e.vec_id,
             round(list_cosine_similarity(e.embedding, q.qe)::DOUBLE, 4) AS cos_sim
           FROM embeddings e, q WHERE e.vec_id <> 0)
         ORDER BY cos_sim DESC, vec_id ASC LIMIT 10""",
    "q_embed_neardup_exact" ->
      """SELECT id_a, id_b, cos_sim FROM (
           SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round(list_cosine_similarity(a.embedding, b.embedding)::DOUBLE, 4)
               AS cos_sim
           FROM embeddings a, embeddings b
           WHERE a.vec_id % 10 = 0 AND b.vec_id % 10 = 0
             AND a.vec_id < b.vec_id)
         WHERE cos_sim >= 0.1""",
    "q_ann_ivf_assign_r4" ->
      """WITH c AS (SELECT vec_id::INT AS cid, embedding AS ce
                    FROM embeddings WHERE vec_id BETWEEN 1 AND 16)
         SELECT vec_id, cell FROM (
           SELECT e.vec_id, c.cid AS cell,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               round(list_cosine_similarity(e.embedding, c.ce)::DOUBLE, 4) DESC,
               c.cid ASC) AS rn
           FROM embeddings e, c)
         WHERE rn = 1""",
    "q_lang_id" ->
      """SELECT doc_id, CASE
           WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
           WHEN regexp_matches(text, '(^| )(der|und|nicht)( |$)') THEN 'de'
           WHEN regexp_matches(text, '(^| )(el|los|pero)( |$)') THEN 'es'
           WHEN regexp_matches(text, '(^| )(le|les|avec)( |$)') THEN 'fr'
           ELSE 'en' END AS lang_pred
         FROM documents""",
    "q_text_quality" ->
      """SELECT doc_id,
           len(string_split_regex(text, '\s+')) AS n_tokens,
           round(length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g'))::DOUBLE
             / greatest(len(string_split_regex(text, '\s+')), 1), 4) AS avg_tok_len,
           round(len(list_filter(string_split_regex(text, '\s+'),
             x -> x IN ('the','a','of','and','to','in')))::DOUBLE
             / greatest(len(string_split_regex(text, '\s+')), 1), 4) AS stop_ratio,
           round((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g'))
             - (len(string_split_regex(text, '\s+')) - 1))::DOUBLE
             / greatest(length(text), 1), 4) AS punct_ratio
         FROM documents""",
    "q_token_count" ->
      """SELECT doc_id,
           len(string_split_regex(trim(text), '\s+')) AS n_ws_tokens,
           CAST(ceil(length(text)::DOUBLE / 4.0) AS BIGINT) AS n_bpeish
         FROM documents""",
    "q_fingerprint_md5" ->
      "SELECT doc_id, md5(text) AS fp FROM documents",
    // simhash over the md5 token-hash family: replay the exact 60-bit
    // value — bit b = bit (b%4) of hex digit 15-floor(b/4) of md5(tok),
    // vote ±1 per token, sum>0 sets the bit; pow(2,k) is exact in double
    // for k<=59 so the BIGINT casts are lossless
    "q_simhash_md5" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok FROM documents),
         hx AS (SELECT doc_id, substr(md5(tok), 1, 15) AS hx FROM tok),
         bits AS (
           SELECT doc_id, (15 - p) * 4 + k AS b,
             CASE WHEN (CAST(floor((strpos('0123456789abcdef', substr(hx, CAST(p AS INT), 1)) - 1)
                 / pow(2, k)) AS BIGINT) % 2) = 1
               THEN 1 ELSE -1 END AS vote
           FROM hx, (SELECT unnest(range(1, 16)) AS p), (SELECT unnest(range(0, 4)) AS k)),
         votes AS (SELECT doc_id, b, sum(vote) AS s FROM bits GROUP BY doc_id, b)
         SELECT doc_id,
           CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, b) AS BIGINT) ELSE 0 END)
             AS BIGINT) AS simhash60
         FROM votes GROUP BY doc_id""",
    // md5 minhash banding: the shared CTE builds 16 lexicographic-min
    // md5 sigs per doc and 8 band buckets (md5 of each sig pair)
    "q_minhash_md5" ->
      s"""WITH $Md5BandsCte
         SELECT doc_id, band, bucket FROM bands""",
    // bucket→pair join over the md5 bands, oversized buckets (> 4096
    // members) dropped — the same cap semantics as annCandidatePairs
    "q_lsh_pairs_md5" ->
      s"""WITH $Md5BandsCte,
         ok AS (SELECT band, bucket FROM bands
                GROUP BY band, bucket HAVING count(*) <= 4096),
         sized AS (SELECT bands.* FROM bands JOIN ok USING (band, bucket))
         SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         FROM sized x JOIN sized y
           ON y.band = x.band AND y.bucket = x.bucket AND x.doc_id < y.doc_id""",
    // winnowing (5-gram md5, min over each 4-window, distinct per doc):
    // grams at i use toks[i..i+4] (0-based) = toks[i+1..i+5] (1-based);
    // windows at i in 0..greatest(n_grams-4, 0) — the trailing truncated
    // windows are excluded exactly as slice() clips them in Spark.
    // unnest(range(...)) rather than a lateral generate_series — DuckDB
    // rejects lateral column parameters to table functions.
    "q_winnow_md5" ->
      """WITH toks AS (
           SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents
           WHERE len(string_split_regex(text, '\s+')) >= 5),
         grams AS (
           SELECT doc_id, i,
             md5(toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' ||
                 toks[i+4] || ' ' || toks[i+5]) AS g
           FROM (SELECT doc_id, toks, unnest(range(0, len(toks) - 4)) AS i
                 FROM toks)),
         wins AS (
           SELECT doc_id, i,
             min(g) OVER (PARTITION BY doc_id ORDER BY i
               ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS w,
             count(*) OVER (PARTITION BY doc_id) AS n
           FROM grams)
         SELECT DISTINCT doc_id, w AS fp FROM wins
         WHERE i <= greatest(n - 4, 0)""",
    "q_multimodal_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
           substring(text, 1, 8) AS header,
           CAST(ceil(octet_length(encode(text))::DOUBLE / 256.0) AS BIGINT) AS n_chunks
         FROM documents""")
}
