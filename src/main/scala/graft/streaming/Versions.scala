package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Listing for `root/v<N>` versioned-parquet layouts — the shared
  * convention of the streaming maintenance loops ([[CorpusMaintenance]]'s
  * full-corpus versions, [[PassageStream]]'s index deltas): versions are
  * named by streaming batch id, which is what makes redelivered batches
  * idempotent (each rebase reads only versions `<= batchId`). */
private[streaming] object Versions {

  def list(spark: SparkSession, root: String): Seq[(Long, Path)] = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("v\\d+"))
      .map(s => (s.getPath.getName.drop(1).toLong, s.getPath))
      .sortBy(_._1)
  }
}
