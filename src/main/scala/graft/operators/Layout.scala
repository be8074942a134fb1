package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) interleaving for
  * multi-dimensional clustering of written files — the lakehouse trick
  * that makes range predicates on EITHER dimension prune file-level
  * min/max zones. Pure bit arithmetic (no UDF, codegen-friendly), and the
  * identical shift/mask pipeline is expressible in the DuckDB oracle.
  */
object Layout {

  /** Spread the low 16 bits of `x` across the even bit positions
    * (0b1111 → 0b01010101) — the standard mask-shift Morton ladder. */
  private def spread16(x: Column): Column = {
    var v = x.cast("bigint").bitwiseAND(lit(0xFFFFL))
    v = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x00FF00FFL))
    v = v.bitwiseOR(shiftleft(v, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    v = v.bitwiseOR(shiftleft(v, 2)).bitwiseAND(lit(0x33333333L))
    v = v.bitwiseOR(shiftleft(v, 1)).bitwiseAND(lit(0x55555555L))
    v
  }

  /** 32-bit Z-value interleaving the low 16 bits of `a` (even positions)
    * and `b` (odd positions). Callers map raw values into 16-bit rank
    * space first (modulo for uniform keys, bucketed rank otherwise). */
  def zValue(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Cluster `df` for writing: range-partition by z-value (file-level
    * min/max zones become hyperrectangles in (a, b) space) and sort within
    * partitions so column chunks stay tight. `zval` is kept in the output
    * for zone auditing. */
  def zOrdered(df: DataFrame, a: Column, b: Column, partitions: Int)
      : DataFrame =
    df.withColumn("zval", zValue(a, b))
      .repartitionByRange(partitions, col("zval"))
      .sortWithinPartitions(col("zval"))

  /** Small-files compaction: rewrite a parquet directory into
    * `ceil(inputBytes / targetFileBytes)` files. The maintenance job every
    * long-lived 100 TB dataset needs — streaming sinks and fine-grained
    * ingests leave thousands of KB-sized files whose per-file open/footer
    * overhead dominates scan time. Sizing comes from the filesystem
    * listing (compressed bytes), not a row count guess; the rewrite is one
    * round-robin repartition (no skew risk, no key assumptions). */
  def compact(spark: org.apache.spark.sql.SparkSession, inDir: String,
      outDir: String, targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val inputBytes = fs.getContentSummary(path).getLength
    val nFiles = math.max(1L,
      (inputBytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(inDir)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(outDir)
  }
}
