package graft.checkpoint

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iceberg-style snapshot layer over Parquet (SURVEY.md §2.2).
  *
  * The sandbox has no Iceberg runtime, so snapshot semantics are
  * implemented directly: each crawl wave commits an append-only
  * `snapshots/<n>/` directory holding that wave's tables plus a JSON
  * manifest recording (snapshot_id, parent_id, wave, per-table file list
  * + row counts) — per-partition lineage as mandated by BASELINE.json.
  *
  * Commit protocol: tables are written in place under `snapshots/<n>/`,
  * then `manifest.json` is moved in ATOMICALLY as the commit marker —
  * [[latest]] only counts directories that carry a manifest, so a killed
  * run leaves at most an invisible manifest-less turd (cleaned on the
  * next commit of the same id) and resume replays from the last COMPLETE
  * wave with identical ordering. Manifest-last-in-place (the Iceberg
  * pattern: data files first, metadata pointer swap last) keeps paths
  * stable while a commit is in flight, which is what lets the crawl loop
  * pipeline: wave k+1 may read the already-durable loop tables of
  * snapshot k+1 while the same snapshot's bulk outputs are still being
  * written (see [[commitAsync]]) — a resume would replay wave k and
  * rewrite identical content, so the early read changes nothing.
  *
  * Kept behind this small class so a real Iceberg catalog can be dropped
  * in outside the sandbox without touching the pipeline.
  */
final class SnapshotCatalog(rootDir: String, spark: SparkSession) {

  private val root: Path = Paths.get(rootDir)
  private val snapsDir: Path = root.resolve("snapshots")

  def snapshotPath(id: Int): Path = snapsDir.resolve(f"$id%06d")

  /** Glob over every snapshot's copy of `name` — the path a file-based
    * streaming source reads (e.g. telemetry over the `fetched` deltas).
    * Manifest-less turds are rare and short-lived (cleaned on the next
    * commit of the same id); a streaming consumer that must exclude
    * them filters on committed snapshot ids instead. */
  def snapshotsGlob(name: String): String =
    snapsDir.resolve("*").resolve(name).toString

  def latest: Option[Int] = {
    if (!Files.isDirectory(snapsDir)) return None
    val ids = listDir(snapsDir)
      .filter(p => p.getFileName.toString.forall(_.isDigit) &&
        Files.exists(p.resolve("manifest.json")))
      .map(_.getFileName.toString.toInt)
    if (ids.isEmpty) None else Some(ids.max)
  }

  /** Eagerly-drained directory listing (Files.list streams hold an open
    * fd until closed — a multi-thousand-wave crawl would leak them). */
  private def listDir(p: Path): Seq[Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toSeq finally s.close()
  }

  /** Atomically commit snapshot `id`: tables → parquet in place, then
    * the manifest moved in last as the commit marker. Returns per-table
    * row counts (exact, from the committed parquet footers —
    * accumulator-free, so task retries or speculative execution can
    * never inflate them).
    *
    * `warmFirst` names a table whose write job is run ALONE before the
    * rest: a write that scans the wave's shared cache chain materializes
    * every cache block in one pass, so the remaining writes read warm
    * blocks instead of racing on uncomputed-partition locks (measured as
    * tasks idling in lock waits). */
  def commit(
      id: Int,
      wave: Int,
      tables: Map[String, DataFrame],
      meta: Map[String, String] = Map.empty,
      warmFirst: Option[String] = None): Map[String, Long] = {
    import scala.concurrent.Await
    import scala.concurrent.duration.Duration
    val warm = warmFirst.filter(tables.contains).toSeq
    val (ready, done) = commitAsync(id, wave,
      loopTables = warm.map(n => n -> tables(n)).toMap,
      bulkTables = tables -- warm, meta)
    Await.result(ready, Duration.Inf)
    Await.result(done, Duration.Inf)
  }

  /** Pipelined commit (the loop's fast path). Writes proceed in two
    * phases, each a set of concurrent write jobs:
    *
    *   1. `loopTables` — the tables the NEXT wave reads (frontier,
    *      fetched, seen_sketch). The returned `ready` future completes
    *      when these are durable: the next wave's planning and cache
    *      warm-up may start immediately, overlapping phase 2.
    *   2. `bulkTables` — outputs nothing downstream in the loop reads
    *      (articles_delta, metrics, denied), then the manifest, moved in
    *      atomically. `done` completes with all counts.
    *
    * Crash safety is unchanged: until the manifest lands the snapshot is
    * invisible to [[latest]], so a kill anywhere in either phase resumes
    * from snapshot id−1 and deterministically rewrites the same content.
    * The caller must await `done` before committing id+1 (snapshot order)
    * and must not unpersist plan inputs until `done`. */
  def commitAsync(
      id: Int,
      wave: Int,
      loopTables: Map[String, DataFrame],
      bulkTables: Map[String, DataFrame],
      meta: Map[String, String] = Map.empty):
      (scala.concurrent.Future[Map[String, Long]], scala.concurrent.Future[Map[String, Long]]) = {
    require(latest.forall(_ < id), s"snapshot $id already committed")
    val dest = snapshotPath(id)
    deleteRecursively(dest) // manifest-less turd from a killed run
    Files.createDirectories(dest)

    def writeOne(name: String, df: DataFrame): (String, Long, String) = {
      val dir = dest.resolve(name)
      val tw0 = System.nanoTime()
      spark.sparkContext.setJobDescription(s"commit-$id/$name")
      df.write.mode("overwrite").parquet(dir.toString)
      spark.sparkContext.setJobDescription(null)
      if (sys.env.contains("GRAFT_PHASE_TRACE"))
        System.err.println(s"[commit $id] $name write=${(System.nanoTime() - tw0) / 1000000L}ms")
      val files = listDir(dir)
        .map(_.getFileName.toString)
        .filter(f => f.endsWith(".parquet"))
        .sorted
      // exact counts from the committed footers (retry/speculation-proof);
      // past a few files the footer opens run as one executor-parallel
      // metadata job instead of a driver-serial loop (a 10^5-file
      // snapshot's commit must not serialize on the driver — round-4
      // verdict #6)
      val rows =
        if (files.size <= SnapshotCatalog.DriverFooterMax)
          files.map(f => footerRowCount(dir.resolve(f))).sum
        else
          org.apache.spark.graft.FooterCounts.rowCounts(
            spark.sparkContext, spark.sessionState.newHadoopConf(),
            files.map(f => dir.resolve(f).toUri.toString)).values.sum
      (name, rows,
        s""""${esc(name)}":{"rows":$rows,"files":[${files.map(f => s""""${esc(f)}"""").mkString(",")}]}""")
    }

    // tables are independent → CONCURRENT Spark jobs (driver-side
    // futures); the scheduler interleaves their stages, so each phase's
    // wall ≈ its largest table, not the sum of job latencies
    import scala.concurrent.Future
    import scala.concurrent.ExecutionContext.Implicits.global
    def writeAll(ts: Map[String, DataFrame]) =
      Future.traverse(ts.toSeq.sortBy(_._1)) { case (n, df) => Future(writeOne(n, df)) }

    val ready = writeAll(loopTables)
    val done = for {
      loopWritten <- ready
      bulkWritten <- writeAll(bulkTables)
    } yield {
      val written = (loopWritten ++ bulkWritten).sortBy(_._1)
      val parent = (0 until id).filter(i =>
        Files.exists(snapshotPath(i).resolve("manifest.json")))
        .lastOption.map(_.toString).getOrElse("null")
      val metaJson = meta.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString(",")
      val manifest =
        s"""{"snapshot_id":$id,"parent_id":$parent,"wave":$wave,""" +
          s""""tables":{${written.map(_._3).mkString(",")}}""" +
          (if (metaJson.nonEmpty) s""","meta":{$metaJson}}""" else "}")
      val tmpManifest = dest.resolve("manifest.json.tmp")
      Files.write(tmpManifest, manifest.getBytes(UTF_8))
      Files.move(tmpManifest, dest.resolve("manifest.json"),
        StandardCopyOption.ATOMIC_MOVE)
      written.map(w => w._1 -> w._2).toMap
    }
    (ready.map(_.map(w => w._1 -> w._2).toMap), done)
  }

  /** Exact row count from a parquet footer — a driver-side metadata read
    * (no Spark job, no accumulators; immune to task-retry inflation). */
  private def footerRowCount(file: Path): Long = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file.toUri),
      spark.sessionState.newHadoopConf())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }

  def manifest(id: Int): String =
    new String(Files.readAllBytes(snapshotPath(id).resolve("manifest.json")), UTF_8)

  /** Snapshot reads impose the fixed table schema when the registry
    * knows it (plan-only — no footer read, no inference job on the
    * wave's critical path); unknown tables fall back to inference. */
  private def reader(name: String) =
    graft.model.Tables.forRead(name) match {
      case Some(s) => spark.read.schema(s)
      case None => spark.read
    }

  def readTable(id: Int, name: String): DataFrame =
    reader(name).parquet(snapshotPath(id).resolve(name).toString)

  def hasTable(id: Int, name: String): Boolean =
    Files.isDirectory(snapshotPath(id).resolve(name))

  /** Union of a delta table across snapshots 0..id (append-only reads —
    * the Iceberg pattern: one multi-path parquet scan, no N unions). */
  def readDeltasUpTo(id: Int, name: String): DataFrame =
    readDeltasUpToOpt(id, name).getOrElse(
      sys.error(s"no '$name' deltas up to snapshot $id"))

  /** As [[readDeltasUpTo]], None when no snapshot carries the table
    * (sparse deltas — e.g. `retracted` exists only in refresh snapshots). */
  def readDeltasUpToOpt(id: Int, name: String): Option[DataFrame] =
    readDeltasInRange(0, id, name)

  /** Union of a delta table across snapshots from..to (inclusive);
    * None when no snapshot in the range carries it. */
  def readDeltasInRange(from: Int, to: Int, name: String): Option[DataFrame] = {
    val paths = (math.max(from, 0) to to).map(snapshotPath(_).resolve(name))
      .filter(Files.isDirectory(_)).map(_.toString)
    if (paths.isEmpty) None else Some(reader(name).parquet(paths: _*))
  }

  /** Newest snapshot ≤ `upTo` that carries `name` (e.g. the latest
    * compaction base). Filesystem-only — no Spark job. */
  def latestWithTable(upTo: Int, name: String): Option[Int] =
    (upTo to 0 by -1).find(hasTable(_, name))

  /** As [[latestWithTable]], but only snapshots whose manifest has
    * landed (commit complete). The pipelined loop reads a snapshot's
    * durable LOOP tables while its BULK phase — where compaction bases
    * are written — may still be in flight, so a base directory must not
    * be trusted until its snapshot's manifest marks the commit done. */
  def latestCommittedWithTable(upTo: Int, name: String): Option[Int] =
    (upTo to 0 by -1).find(i => hasTable(i, name) &&
      Files.exists(snapshotPath(i).resolve("manifest.json")))

  /** Base-aware delta view: the newest COMMITTED `baseName` ≤ k
    * (committed into snapshot b, covering deltas 0..b-1) unioned with
    * the delta TAIL b..k; a plain 0..k delta union when no base exists.
    * The read contract [[graft.checkpoint.Expiry]] relies on: once a
    * committed base at b exists, deltas < b are never opened — which is
    * what makes them physically deletable. */
  def readWithBase(k: Int, deltaName: String, baseName: String): DataFrame =
    latestCommittedWithTable(k, baseName) match {
      case Some(b) =>
        val base = readTable(b, baseName)
        readDeltasInRange(b, k, deltaName).map(base.unionByName(_)).getOrElse(base)
      case None => readDeltasUpTo(k, deltaName)
    }

  /** Physically delete table `name`'s data directory inside snapshot
    * `id` (the primitive [[graft.checkpoint.Expiry]] builds on — the
    * Iceberg expire-snapshots/delete-orphan-files analogue). The
    * snapshot's manifest is NOT touched: per-partition lineage and the
    * committed row counts stay readable forever; only the superseded
    * bytes go. Returns bytes freed (0 when the table is absent). */
  def dropTableData(id: Int, name: String): Long =
    sizeThenDelete(snapshotPath(id).resolve(name))

  /** Snapshot ids present on disk WITHOUT a landed manifest — the
    * leftovers of killed commits. Invisible to [[latest]] and every
    * read path; they are reclaimed automatically only if the same id is
    * re-committed, so a resumed run that stops earlier strands them
    * forever (and a glob-based streaming source still lists their
    * files). [[graft.checkpoint.Expiry.removeOrphans]] deletes them. */
  def uncommittedSnapshotIds: Seq[Int] = {
    if (!Files.isDirectory(snapsDir)) return Seq.empty
    listDir(snapsDir)
      .filter(p => p.getFileName.toString.forall(_.isDigit) &&
        !Files.exists(p.resolve("manifest.json")))
      .map(_.getFileName.toString.toInt).sorted
  }

  /** Delete an entire manifest-less snapshot dir (a killed commit's
    * leftover). Refuses committed snapshots — lineage is never dropped
    * this way. Returns bytes freed. */
  def dropUncommittedSnapshot(id: Int): Long = {
    val dir = snapshotPath(id)
    require(!Files.exists(dir.resolve("manifest.json")),
      s"snapshot $id is committed — refusing to drop it as an orphan")
    sizeThenDelete(dir)
  }

  private def sizeThenDelete(dir: Path): Long = {
    if (!Files.isDirectory(dir)) return 0L
    val s = Files.walk(dir)
    val bytes =
      try s.iterator().asScala.filter(Files.isRegularFile(_)).map(Files.size).sum
      finally s.close()
    deleteRecursively(dir)
    bytes
  }

  /** A meta value recorded at commit time (e.g. run_id, n_shards).
    * Matches escaped characters and undoes [[esc]]'s write-time
    * escaping — a value containing `"` or `\` must round-trip, not come
    * back truncated at the first escaped quote. */
  def metaValue(id: Int, key: String): Option[String] =
    ("\"" + java.util.regex.Pattern.quote(key) + "\":\"((?:[^\"\\\\]|\\\\.)*)\"").r
      .findFirstMatchIn(manifest(id)).map(m => unesc(m.group(1)))

  /** Inverse of [[esc]] for the escapes it emits. */
  private def unesc(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'u' if i + 5 < s.length =>
            b += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
          case e => b += e; i += 2
        }
      } else { b += c; i += 1 }
    }
    b.result()
  }

  /** Minimal JSON string escaping — table names / meta values are
    * caller-supplied (a run_id containing `"` or `\` must not produce a
    * malformed manifest). */
  private def esc(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case c if c < ' ' => "\\u%04x".format(c.toInt)
      case c => c.toString
    }

  private def deleteRecursively(p: Path): Unit =
    SnapshotCatalog.deleteRecursively(p)
}

object SnapshotCatalog {
  /** Above this many files per table, commit-time footer counts run as an
    * executor-parallel job instead of a driver-serial loop (kept small so
    * sandbox-scale commits exercise the distributed path too, while the
    * common 1–4-file loop tables skip the job-launch latency). */
  val DriverFooterMax = 4

  /** Shared recursive delete (stream closed eagerly). */
  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      finally s.close()
    }
}
