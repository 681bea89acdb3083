package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract of the dead-process scratch reclamation: dirs whose owning
  * pid is gone are deleted; live owners — including this JVM — and
  * unrelated names are never touched while fresh; junk that defeats the
  * pid parse is ignored rather than fatal. Two age-based escape hatches:
  * a dir older than the staleness grace is reclaimed even if its pid
  * reads as live (pid recycling), and legacy fixed names are reclaimed
  * only after that same grace (never raced while fresh). */
class ScratchSweepSpec extends AnyFunSuite {

  private def deadPid: Long = {
    // walk down from a high pid until one is not alive (Linux default
    // pid_max is 4194304, so this terminates almost immediately)
    var p = 4000000L
    while (ProcessHandle.of(p).isPresent) p -= 1
    p
  }

  test("sweep deletes dead-pid and stale dirs only; junk names are non-fatal") {
    val parent = java.nio.file.Files.createTempDirectory("graft-sweep-spec").toFile
    def mk(name: String): java.io.File = {
      val d = new java.io.File(parent, name)
      assert(d.mkdir()); d
    }
    def age(d: java.io.File, hours: Long): Unit =
      assert(d.setLastModified(System.currentTimeMillis() - hours * 3600 * 1000))
    val mine = ProcessHandle.current().pid()
    val dead = mk(s"graft_scratch_x_p$deadPid")
    val live = mk(s"graft_scratch_x_p$mine")
    val legacyFresh = mk("graft_scratch")
    val legacyOld = mk("graft_scratch_old_name")
    age(legacyOld, 48)
    // pid 1 is init — alive in any Linux container, but not OUR pid, so
    // the stale fallback (recycled-pid case) applies once the dir ages out
    val recycledFresh = mk("graft_scratch_y_p1")
    val recycledStale = mk("graft_scratch_z_p1")
    age(recycledStale, 48)
    val mineStale = mk(s"graft_scratch_w_p$mine")
    age(mineStale, 48)
    val unrelated = mk("someone_elses_dir_p1")
    age(unrelated, 48)
    val noPid = mk("graft_scratch_nopid")
    val overflow = mk("graft_scratch_y_p99999999999999999999") // > Long.MaxValue

    SparkEntry.sweepDeadScratch(parent, Seq("graft_scratch_"),
      legacy = Seq("graft_scratch", "graft_scratch_old_name"))

    assert(!dead.exists(), "dead-pid dir must be reclaimed")
    assert(!legacyOld.exists(), "legacy dir past the grace period must be reclaimed")
    assert(legacyFresh.exists(), "fresh legacy dir must survive (still-running pre-suffix JVM)")
    assert(live.exists(), "live-pid dir must survive")
    assert(mineStale.exists(), "our own pid is exempt from the stale fallback")
    assert(recycledFresh.exists(), "fresh dir with a live foreign pid must survive")
    assert(!recycledStale.exists(), "stale dir with a live foreign pid must be reclaimed (pid recycling)")
    assert(unrelated.exists(), "non-matching prefix must survive regardless of age")
    assert(noPid.exists(), "prefix match without a pid suffix must survive")
    assert(overflow.exists(), "unparseable pid must be skipped, not fatal")
    org.apache.commons.io.FileUtils.deleteQuietly(parent)
  }
}
