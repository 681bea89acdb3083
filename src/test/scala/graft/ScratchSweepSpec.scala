package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract of the dead-process scratch reclamation: only dirs whose
  * owning pid is gone (or whose name is a known legacy fixed name) are
  * deleted; live owners — including this JVM — and unrelated names are
  * never touched, and junk that defeats the pid parse is ignored rather
  * than fatal. */
class ScratchSweepSpec extends AnyFunSuite {

  private def deadPid: Long = {
    // walk down from a high pid until one is not alive (Linux default
    // pid_max is 4194304, so this terminates almost immediately)
    var p = 4000000L
    while (ProcessHandle.of(p).isPresent) p -= 1
    p
  }

  test("sweep deletes dead-pid and legacy dirs only; junk names are non-fatal") {
    val parent = java.nio.file.Files.createTempDirectory("graft-sweep-spec").toFile
    def mk(name: String): java.io.File = {
      val d = new java.io.File(parent, name)
      assert(d.mkdir()); d
    }
    val mine = ProcessHandle.current().pid()
    val dead = mk(s"graft_scratch_x_p$deadPid")
    val live = mk(s"graft_scratch_x_p$mine")
    val legacy = mk("graft_scratch")
    val unrelated = mk("someone_elses_dir_p1")
    val noPid = mk("graft_scratch_nopid")
    val overflow = mk("graft_scratch_y_p99999999999999999999") // > Long.MaxValue

    SparkEntry.sweepDeadScratch(parent, Seq("graft_scratch_"),
      legacy = Seq("graft_scratch"))

    assert(!dead.exists(), "dead-pid dir must be reclaimed")
    assert(!legacy.exists(), "legacy fixed-name dir must be reclaimed")
    assert(live.exists(), "live-pid dir must survive")
    assert(unrelated.exists(), "non-matching prefix must survive")
    assert(noPid.exists(), "prefix match without a pid suffix must survive")
    assert(overflow.exists(), "unparseable pid must be skipped, not fatal")
    org.apache.commons.io.FileUtils.deleteQuietly(parent)
  }
}
