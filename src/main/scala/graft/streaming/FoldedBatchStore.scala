package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StructType}

/** The shared store discipline of the streaming sketch family
  * ([[StreamingTopK]], [[StreamingQuantiles]]): replay-idempotent
  * per-batch directories (`summaries/batch_id=N`, `meta/batch_id=N`), a
  * single `folded/` directory holding the compacted sketch behind a
  * build-complete-then-rename swap, crash recovery for the swap window,
  * and a per-store in-process lock that serializes folds against reads.
  * The SKETCH semantics (how summaries merge, what the meta row carries)
  * stay with each store; only the directory mechanics live here — so the
  * next sketch type (quantiles was the second) starts from a proven
  * crash/replay matrix instead of re-deriving it.
  */
private[streaming] object FoldedBatchStore {

  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  def lockFor(dir: String): Object =
    locks.computeIfAbsent(dir.stripSuffix("/"), _ => new Object)

  def fsFor(spark: SparkSession, dir: String) =
    graft.ingest.HadoopFs.forPath(spark, dir)

  def foldedDir(storeDir: String) = s"$storeDir/folded"

  /** Repair the swap's crash windows, under the store lock, before any
    * read: folded absent + `.folded_old` present = crash between the two
    * renames (the trash holds the ONLY folded copy — restore it); both
    * present = finished trash (drop); a `.folded_tmp` is an incomplete
    * build (live untouched — drop). The [[graft.ingest.DirSwap]] recovery
    * rules, specialized to the one swapped dir these stores have.
    */
  def recoverFold(spark: SparkSession, storeDir: String): Unit = {
    val (fs, _) = fsFor(spark, storeDir)
    val live = new Path(foldedDir(storeDir))
    val trash = new Path(s"$storeDir/.folded_old")
    val tmp = new Path(s"$storeDir/.folded_tmp")
    if (fs.exists(trash)) {
      if (!fs.exists(live))
        require(fs.rename(trash, live), s"fold recovery failed: $trash -> $live")
      else fs.delete(trash, true)
    }
    if (fs.exists(tmp)) fs.delete(tmp, true)
    ()
  }

  /** Build the replacement folded state complete in `.folded_tmp` (the
    * callback writes `summaries/` and `meta/` under the given path), then
    * rename it into place; a crash between the two renames parks the only
    * folded copy in `.folded_old`, which [[recoverFold]] restores before
    * the next read or fold.
    */
  def swapInFolded(spark: SparkSession, storeDir: String)(build: String => Unit): Unit = {
    val (fs, _) = fsFor(spark, storeDir)
    val live = new Path(foldedDir(storeDir))
    val tmp = new Path(s"$storeDir/.folded_tmp")
    val trash = new Path(s"$storeDir/.folded_old")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    if (fs.exists(trash)) fs.delete(trash, true)
    build(tmp.toString)
    if (fs.exists(live))
      require(fs.rename(live, trash), s"fold swap step 1 failed: $live")
    require(fs.rename(tmp, live), s"fold swap step 2 failed: $tmp -> $live")
    fs.delete(trash, true)
    ()
  }

  def batchIds(spark: SparkSession, dir: String): Seq[Long] = {
    val (fs, p) = fsFor(spark, dir)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
      .flatMap(_.getPath.getName.stripPrefix("batch_id=").toLongOption)
  }

  /** Empty frames read cleanly because the schema is explicit — a fresh
    * store (or one whose batch dirs were all folded away) is a normal
    * state, not a PATH_NOT_FOUND crash for whoever polls the board.
    */
  def batchFrame(spark: SparkSession, dir: String, schema: StructType,
      pred: Column): DataFrame = {
    val (fs, p) = fsFor(spark, dir)
    if (!fs.exists(p))
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        schema.add("batch_id", LongType))
    else spark.read.schema(schema.add("batch_id", LongType))
      .option("basePath", dir).parquet(dir).filter(pred)
  }

  def dropBatchDirs(spark: SparkSession, storeDir: String, ids: Seq[Long]): Unit = {
    val (fs, _) = fsFor(spark, storeDir)
    ids.foreach { id =>
      fs.delete(new Path(s"$storeDir/summaries/batch_id=$id"), true)
      fs.delete(new Path(s"$storeDir/meta/batch_id=$id"), true)
    }
  }
}
