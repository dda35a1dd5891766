package graft.ingest

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The one way engine code resolves a path to its filesystem: every store
  * (warehouse, journal, fingerprint buckets, arrival inbox, sinks) may
  * live behind a different scheme, so each resolves through ITS OWN
  * FileSystem with the session's Hadoop conf, qualified. Shared so the
  * next scheme-handling fix lands in one place.
  */
object HadoopFs {
  def forPath(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    (fs, fs.makeQualified(p))
  }
}

/** The crash-safe directory-replacement protocol, factored out of the
  * warehouse compaction so every partitioned store (date partitions,
  * fingerprint buckets) maintains itself the same way:
  *
  *  1. build the replacement COMPLETE in `<live>.__new`;
  *  2. verify it against the live contents (caller-supplied check —
  *     a short write must never replace good data);
  *  3. swap: rename live → `<live>.__old`, rename `.__new` → live;
  *  4. drop the `.__old` trash.
  *
  * A crash between the two renames leaves the directory absent but its
  * data intact in `.__old`; [[recover]] — run at startup, before anything
  * reads — restores it. Readers never observe a partial mix of old and
  * new files. The swap relies on the Hadoop `FileSystem.rename` contract
  * (atomic on HDFS/POSIX; object stores need the pointer-flip variant —
  * SCALE.md §7b).
  */
object DirSwap {

  /** Replace `live` with contents built by `build` (given the `.__new`
    * path). `verify` runs after the build and must THROW to abort — at
    * that point nothing public has been touched. Any pre-existing
    * `.__new`/`.__old` is a previous attempt's leftover and is swept
    * first (an `.__old` beside a live dir is a completed swap's
    * unfinished trash delete).
    */
  def replace(fs: FileSystem, live: Path)(build: Path => Unit)(verify: Path => Unit): Unit = {
    val newDir = live.suffix(".__new")
    val oldDir = live.suffix(".__old")
    // the stale-trash sweep below is only safe when `live` really exists:
    // after a crash between the two renames, `.__old` holds the ONLY copy
    // and deleting it here would destroy the data. Callers reach replace()
    // via live-dir listings after startup recovery, but the shared utility
    // must not rely on that discipline.
    require(fs.exists(live),
      s"DirSwap.replace: $live is absent — run DirSwap.recover first " +
        s"(a crashed swap may have left the only copy in $oldDir)")
    if (fs.exists(newDir)) fs.delete(newDir, true) // abandoned previous attempt
    if (fs.exists(oldDir)) fs.delete(oldDir, true) // stale trash (live exists)
    build(newDir)
    verify(newDir)
    require(fs.rename(live, oldDir), s"swap step 1 failed: $live -> $oldDir")
    if (!fs.rename(newDir, live)) {
      // NON-CRASH step-2 failure (permissions, open handle, NFS): roll the
      // live dir back IMMEDIATELY — leaving it absent would let a
      // subsequent writer recreate it with partial contents, after which
      // recover() would read ".__old beside live" as finished trash and
      // delete the only full copy.
      require(fs.rename(oldDir, live), s"swap rollback ALSO failed: $oldDir -> $live " +
        "(directory offline until recover() at restart)")
      throw new java.io.IOException(s"swap step 2 failed: $newDir -> $live (rolled back)")
    }
    fs.delete(oldDir, true)
    ()
  }

  /** Startup repair for [[replace]]'s crash windows, over every entry
    * under `root`: a `.__old` WITHOUT its live dir is a crash between the
    * renames — restore it; a `.__old` WITH a live dir is finished trash —
    * drop it; a `.__new` is an incomplete build — drop it (live was never
    * touched). Returns the number of directories restored.
    */
  def recover(fs: FileSystem, root: Path): Int = {
    if (!fs.exists(root)) return 0
    val entries = fs.listStatus(root)
    var restored = 0
    entries.filter(_.getPath.getName.endsWith(".__new"))
      .foreach(s => fs.delete(s.getPath, true))
    entries.filter(_.getPath.getName.endsWith(".__old")).foreach { s =>
      val oldDir = s.getPath
      val live = new Path(oldDir.getParent, oldDir.getName.stripSuffix(".__old"))
      if (!fs.exists(live)) {
        require(fs.rename(oldDir, live), s"restore failed: $oldDir -> $live")
        restored += 1
      } else { fs.delete(oldDir, true); () }
    }
    restored
  }
}
