package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}

/** The shared write-and-swap publish discipline behind every durable
  * artifact this engine republishes in place — the streaming upsert table
  * ([[graft.streaming.Streams.toUpsertSink]]), the rolling drift ledger,
  * and the IVF index rebuild
  * ([[graft.operators.Similarity.ivfRebuildSwap]]). One implementation so
  * the crash-recovery contract is identical everywhere:
  *
  *   1. `restoreStaged` (call BEFORE reading the artifact): a previous
  *      attempt that renamed the live dir aside (`dir` -> `dir.old`) and
  *      died before publishing leaves `.old` as the ONLY copy — rename it
  *      back. Never delete `.old` while `dir` is absent.
  *   2. Write the replacement to a staging path (`dir.tmp` / `dir.next`).
  *   3. `publishSwap`: delete `.old` residue left by a crash BETWEEN a
  *      previous publish and its cleanup (a `.old` alongside a live `dir`
  *      is always post-publish residue — without this, the stage-aside
  *      rename fails against the existing dir forever and the sink wedges),
  *      stage `dir` aside, rename the staging dir into place; on a failed
  *      publish roll `.old` back and CHECK the rollback's result, so the
  *      thrown error says whether the live path is currently empty.
  *
  * Runs on the Hadoop [[FileSystem]] API, not `java.io.File`, so the same
  * discipline works on any HDFS-compatible store. The rename pair is atomic
  * on local disk and HDFS; plain object stores (S3A) implement rename as
  * copy+delete — there, use a transactional table format's commit instead,
  * as each call site's scaladoc notes. Callers guarantee the destination of
  * every rename is absent first (the Hadoop quirk where renaming onto an
  * existing directory nests the source inside it never arises).
  */
object Publish {

  /** Resolve `dir` against its Hadoop filesystem (the default FS for
    * scheme-less local paths).
    */
  def fsFor(spark: org.apache.spark.sql.SparkSession, dir: String)
  : (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** The stage-aside path for `dir` (`dir.old`). */
  def stagedOf(dir: Path): Path = dir.suffix(".old")

  /** Recover a crashed previous publish: if `dir.old` exists and `dir`
    * does not, the crash hit between stage-aside and publish and `.old`
    * is the only live copy — rename it back. No-op otherwise.
    */
  def restoreStaged(fs: FileSystem, dir: Path): Unit = {
    val staged = stagedOf(dir)
    if (fs.exists(staged) && !fs.exists(dir) && !fs.rename(staged, dir))
      throw new java.io.IOException(
        s"cannot restore staged copy $staged -> $dir")
  }

  /** Atomically replace `dir` with the fully-written `tmp`: clear
    * post-publish `.old` residue, stage the live dir aside, publish, then
    * delete the staged copy. On a failed publish the staged copy is rolled
    * back and the rollback's own result is part of the thrown message.
    */
  def publishSwap(fs: FileSystem, tmp: Path, dir: Path): Unit = {
    val staged = stagedOf(dir)
    // a staged dir ALONGSIDE a live dir is always residue from a crash
    // between a previous publish and its cleanup — the live dir already
    // holds the newer copy, so the residue is safe to drop (and renaming
    // onto it would fail, wedging every subsequent publish)
    if (fs.exists(staged) && fs.exists(dir)) fs.delete(staged, true)
    if (fs.exists(dir) && !fs.rename(dir, staged))
      throw new java.io.IOException(s"cannot stage $dir aside to $staged")
    // some FileSystem impls THROW on a bad rename source rather than
    // returning false — the rollback must run on either failure shape,
    // or the live path is left staged aside with nothing published
    val published = scala.util.Try(fs.rename(tmp, dir))
    if (published != scala.util.Success(true)) {
      val cause = published.failed.toOption.map(e => s": ${e.getMessage}")
        .getOrElse("")
      // the rollback rename needs the same Try guard as the publish: on a
      // throwing FileSystem the raw exception would otherwise replace
      // this composed message — losing exactly the recover-from-.old
      // guidance it exists to carry
      val detail =
        if (!fs.exists(staged)) "first publish - nothing to roll back"
        else if (scala.util.Try(fs.rename(staged, dir)) == scala.util.Success(true))
          "rolled back - prior copy stays live"
        else s"ROLLBACK FAILED - $dir is currently ABSENT; recover manually from $staged"
      throw new java.io.IOException(s"cannot publish $tmp -> $dir$cause ($detail)")
    }
    if (fs.exists(staged)) fs.delete(staged, true)
  }
}
