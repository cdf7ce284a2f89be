package graft.ext

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Table maintenance the reference inherits from Delta and we provide
  * as library ops over plain parquet: small-file compaction (Delta
  * `OPTIMIZE`'s role). A month of streaming upserts or incremental
  * loads leaves a table as thousands of kilobyte files; at 100 TB the
  * resulting task/open-file overhead dominates scans, so compaction is
  * a first-class lifecycle op, not an afterthought.
  *
  * File listing goes through the Hadoop FileSystem API (not java.nio),
  * so the size accounting works on any supported storage; the rewrite
  * itself reuses [[graft.gold.Upsert.atomicRewrite]]'s crash-safe swap
  * (local-FS moves — object stores need their own committer, same
  * caveat as upsert).
  */
object Maintenance {

  case class CompactStats(filesBefore: Int, filesAfter: Int, totalBytes: Long)

  private def parquetFiles(spark: SparkSession, path: String): Seq[(String, Long)] = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(hPath), s"no table at $path")
    val it = fs.listFiles(hPath, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) buf += ((f.getPath.toString, f.getLen))
    }
    buf.toSeq
  }

  /** Compact an UNPARTITIONED parquet table to
    * ceil(totalBytes / targetFileBytes) files. Row content is
    * preserved exactly (one repartition, no ordering contract —
    * parquet tables carry none). */
  def compact(spark: SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024): CompactStats = {
    val before = parquetFiles(spark, path)
    val totalBytes = before.map(_._2).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    graft.gold.Upsert.atomicRewrite(path) { tmp =>
      spark.read.parquet(path).repartition(nOut)
        .write.mode(SaveMode.Overwrite).parquet(tmp)
    }
    CompactStats(before.length, parquetFiles(spark, path).length, totalBytes)
  }

  /** Compact a PARTITIONED table to one file per partition directory:
    * repartitioning on the partition columns routes each directory's
    * rows to a single task, so each dir is rewritten as one file (the
    * right grain for month-partitioned gold facts). The partition
    * column layout is preserved. */
  def compactPartitioned(spark: SparkSession, path: String,
                         partitionCols: Seq[String]): CompactStats = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    val before = parquetFiles(spark, path)
    val totalBytes = before.map(_._2).sum
    graft.gold.Upsert.atomicRewrite(path) { tmp =>
      spark.read.parquet(path)
        .repartition(partitionCols.map(col): _*)
        .write.partitionBy(partitionCols: _*).mode(SaveMode.Overwrite).parquet(tmp)
    }
    CompactStats(before.length, parquetFiles(spark, path).length, totalBytes)
  }
}
