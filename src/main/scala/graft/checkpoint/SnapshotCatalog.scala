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
  * Commit protocol: everything is written into `tmp-<n>/`, the manifest
  * last, then the directory is atomically renamed to `snapshots/<n>/`.
  * A killed run leaves at most a `tmp-*` turd; [[latest]] only ever sees
  * fully-committed snapshots, so resume replays from the last complete
  * wave with identical ordering.
  *
  * Kept behind this small class so a real Iceberg catalog can be dropped
  * in outside the sandbox without touching the pipeline.
  */
final class SnapshotCatalog(rootDir: String, spark: SparkSession) {

  private val root: Path = Paths.get(rootDir)
  private val snapsDir: Path = root.resolve("snapshots")

  def snapshotPath(id: Int): Path = snapsDir.resolve(f"$id%06d")

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

  /** Atomically commit snapshot `id`: tables → parquet, manifest last,
    * then rename. Returns per-table row counts. */
  def commit(
      id: Int,
      wave: Int,
      tables: Map[String, DataFrame],
      meta: Map[String, String] = Map.empty): Map[String, Long] = {
    require(latest.forall(_ < id), s"snapshot $id already committed")
    val tmp = root.resolve(s"tmp-$id")
    deleteRecursively(tmp)
    Files.createDirectories(tmp)

    // tables are independent → write them as CONCURRENT Spark jobs
    // (driver-side futures); the scheduler interleaves their stages, so
    // commit wall ≈ the largest table, not the sum of 2×N job latencies
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val written = Await.result(
      Future.traverse(tables.toSeq.sortBy(_._1)) { case (name, df) =>
        Future {
          val dir = tmp.resolve(name)
          // observe() piggybacks the row count onto the write job itself —
          // never re-read what was just written. Caveat for cluster runs:
          // CollectMetrics accumulators can over-report under speculative
          // execution / stage retries; exact here (local, no speculation)
          // and consumers only test counts for == 0 (drain) where
          // inflation is harmless. A cluster deployment would source
          // counts from the committer's write-task stats instead.
          val obs = org.apache.spark.sql.Observation(s"commit-$id-$name")
          df.observe(obs, org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("rows"))
            .write.mode("overwrite").parquet(dir.toString)
          val files = listDir(dir)
            .map(_.getFileName.toString)
            .filter(f => f.endsWith(".parquet"))
            .sorted
          val rows = obs.get("rows").asInstanceOf[Long]
          (name, rows,
            s""""${esc(name)}":{"rows":$rows,"files":[${files.map(f => s""""${esc(f)}"""").mkString(",")}]}""")
        }
      }, Duration.Inf)
    val tableEntries = written.map(_._3)
    val parent = latest.map(_.toString).getOrElse("null")
    val metaJson = meta.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString(",")
    val manifest =
      s"""{"snapshot_id":$id,"parent_id":$parent,"wave":$wave,""" +
        s""""tables":{${tableEntries.mkString(",")}}""" +
        (if (metaJson.nonEmpty) s""","meta":{$metaJson}}""" else "}")
    Files.write(tmp.resolve("manifest.json"), manifest.getBytes(UTF_8))

    Files.createDirectories(snapsDir)
    val dest = snapshotPath(id)
    deleteRecursively(dest)
    Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE)
    written.map(w => w._1 -> w._2).toMap
  }

  def manifest(id: Int): String =
    new String(Files.readAllBytes(snapshotPath(id).resolve("manifest.json")), UTF_8)

  def readTable(id: Int, name: String): DataFrame =
    spark.read.parquet(snapshotPath(id).resolve(name).toString)

  def hasTable(id: Int, name: String): Boolean =
    Files.isDirectory(snapshotPath(id).resolve(name))

  /** Union of a delta table across snapshots 0..id (append-only reads —
    * the Iceberg pattern: one multi-path parquet scan, no N unions). */
  def readDeltasUpTo(id: Int, name: String): DataFrame =
    readDeltasUpToOpt(id, name).getOrElse(
      sys.error(s"no '$name' deltas up to snapshot $id"))

  /** As [[readDeltasUpTo]], None when no snapshot carries the table
    * (sparse deltas — e.g. `retracted` exists only in refresh snapshots). */
  def readDeltasUpToOpt(id: Int, name: String): Option[DataFrame] = {
    val paths = (0 to id).map(snapshotPath(_).resolve(name))
      .filter(Files.isDirectory(_)).map(_.toString)
    if (paths.isEmpty) None else Some(spark.read.parquet(paths: _*))
  }

  /** A meta value recorded at commit time (e.g. run_id, n_shards). */
  def metaValue(id: Int, key: String): Option[String] =
    ("\"" + java.util.regex.Pattern.quote(key) + "\":\"([^\"]*)\"").r
      .findFirstMatchIn(manifest(id)).map(_.group(1))

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
  /** Shared recursive delete (stream closed eagerly). */
  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      finally s.close()
    }
}
