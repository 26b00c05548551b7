package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.Publish

/** The shared write-and-swap publish contract ([[graft.sinks.Publish]]) —
  * exercised directly against a Hadoop filesystem resolved from a local
  * path (RawLocalFileSystem under the LocalFileSystem wrapper), the same
  * resolution every sink call site uses.
  */
class PublishSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def write(dir: String, marker: String): Unit = {
    val d = new java.io.File(dir)
    assert(d.mkdirs() || d.isDirectory)
    java.nio.file.Files.write(
      new java.io.File(d, "marker").toPath, marker.getBytes("UTF-8"))
    ()
  }

  private def readMarker(dir: String): String =
    new String(java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "marker").toPath), "UTF-8")

  test("publishSwap replaces the live dir and clears the staged copy") {
    val base = Files.createTempDirectory("pub1").toString
    val live = s"$base/t"
    val (fs, dir) = Publish.fsFor(spark, live)
    write(live, "v1"); write(s"$live.tmp", "v2")
    Publish.publishSwap(fs, new Path(s"$live.tmp"), dir)
    assert(readMarker(live) == "v2")
    assert(!fs.exists(new Path(s"$live.old")), ".old must be cleaned up")
    assert(!fs.exists(new Path(s"$live.tmp")))
  }

  test("publishSwap survives post-publish .old residue (r13 ADVICE: wedge)") {
    // crash window: a previous publish completed (live dir is current)
    // but died before deleting .old. Renaming the live dir onto the
    // existing .old fails on POSIX — before the fix, every subsequent
    // publish threw 'cannot stage aside' until manual cleanup.
    val base = Files.createTempDirectory("pub2").toString
    val live = s"$base/t"
    val (fs, dir) = Publish.fsFor(spark, live)
    write(live, "v2"); write(s"$live.old", "v1-residue")
    write(s"$live.tmp", "v3")
    Publish.publishSwap(fs, new Path(s"$live.tmp"), dir)
    assert(readMarker(live) == "v3", "publish must proceed past the residue")
    assert(!fs.exists(new Path(s"$live.old")))
  }

  test("restoreStaged brings back the only copy after a mid-swap crash") {
    // crash window: live dir staged aside, publish never happened — .old
    // is the ONLY copy and must be restored, never deleted.
    val base = Files.createTempDirectory("pub3").toString
    val live = s"$base/t"
    val (fs, dir) = Publish.fsFor(spark, live)
    write(s"$live.old", "only-copy")
    Publish.restoreStaged(fs, dir)
    assert(readMarker(live) == "only-copy")
    assert(!fs.exists(new Path(s"$live.old")))
    // and it is a no-op when the live dir exists (does NOT clobber it)
    write(s"$live.old", "stale")
    Publish.restoreStaged(fs, dir)
    assert(readMarker(live) == "only-copy")
  }

  test("first publish (no live dir) and a failed publish's error detail") {
    val base = Files.createTempDirectory("pub4").toString
    val live = s"$base/t"
    val (fs, dir) = Publish.fsFor(spark, live)
    write(s"$live.tmp", "v1")
    Publish.publishSwap(fs, new Path(s"$live.tmp"), dir) // no dir to stage
    assert(readMarker(live) == "v1")
    // a publish whose tmp is missing throws and ROLLS BACK the staged
    // copy — the prior version stays live (rollback result is checked)
    val err = intercept[java.io.IOException] {
      Publish.publishSwap(fs, new Path(s"$live.gone"), dir)
    }
    assert(err.getMessage.contains("rolled back"), err.getMessage)
    assert(readMarker(live) == "v1", "prior copy must stay live")
  }
}
