package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Executor-parallel parquet footer row counts.
  *
  * The snapshot catalog's commit records exact per-table row counts from
  * the committed parquet footers (accumulator-free — task retries and
  * speculative execution can never inflate them). Reading those footers
  * one-by-one on the driver is fine at sandbox file counts but becomes a
  * per-commit driver-serial cost at 10^5-file snapshots (round-4 verdict
  * #6), so past a small threshold the reads run as ONE tiny Spark job over
  * the file list — a metadata-only task per footer, no data scanned.
  *
  * Lives under org.apache.spark because shipping the Hadoop configuration
  * to tasks uses the private[spark] [[org.apache.spark.util.SerializableConfiguration]]
  * (the same class Spark's own datasources use for exactly this purpose).
  */
object FooterCounts {

  def rowCounts(sc: SparkContext,
      conf: org.apache.hadoop.conf.Configuration,
      files: Seq[String]): Map[String, Long] = {
    if (files.isEmpty) return Map.empty
    val ser = new org.apache.spark.util.SerializableConfiguration(conf)
    sc.parallelize(files, math.max(1, math.min(files.size, sc.defaultParallelism)))
      .map { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f), ser.value)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try (f, r.getRecordCount) finally r.close()
      }
      .collect().toMap
  }
}
