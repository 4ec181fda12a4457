package graft.cube

import org.scalatest.funsuite.AnyFunSuite

/** The bench-fixture creation discipline (r12 verdict item 1): a
  * fixture directory must appear at its final name ATOMICALLY, so a
  * writer that crashes mid-write can never leave a half-written
  * directory that the `isDirectory` skip-guard mistakes for a complete
  * fixture. BENCH_r12 caught exactly this: one bench pass crashed in
  * geotiffLzw after a torn fixture write, and min-of-2 hid it.
  */
class FixtureAtomicitySpec extends AnyFunSuite {

  private def tmpTarget(tag: String): java.io.File = {
    val f = java.io.File.createTempFile(s"graft-fixspec-$tag", "")
    f.delete() // we want the NAME, not the file
    f
  }

  private def writeMarker(dir: java.io.File, name: String): Unit = {
    val w = new java.io.FileWriter(new java.io.File(dir, name))
    w.write("ok"); w.close()
  }

  test("a crash mid-write leaves NO directory at the final name") {
    val target = tmpTarget("crash")
    val thrown = intercept[RuntimeException] {
      SkopeQueries.atomicFixtureDir(target) { dir =>
        writeMarker(dir, "half.tif") // the torn write
        sys.error("simulated writer death mid-fixture")
      }
    }
    assert(thrown.getMessage.contains("simulated"))
    // the old guard's failure mode: dir.isDirectory true with partial
    // content → every later caller served the truncated fixture
    assert(!target.isDirectory,
      "half-written fixture visible at the final name — guard is torn-write-unsafe")
  }

  test("a retry after the crash regenerates a complete fixture") {
    val target = tmpTarget("retry")
    intercept[RuntimeException] {
      SkopeQueries.atomicFixtureDir(target) { dir =>
        writeMarker(dir, "half.tif")
        sys.error("simulated writer death mid-fixture")
      }
    }
    // the lazy-val retry path: Scala re-enters a failed init; the
    // second attempt must run the writer again and publish atomically
    val path = SkopeQueries.atomicFixtureDir(target) { dir =>
      writeMarker(dir, "a.tif")
      writeMarker(dir, "b.tif")
    }
    assert(path === target.toString)
    assert(new java.io.File(target, "a.tif").isFile)
    assert(new java.io.File(target, "b.tif").isFile)
  }

  test("an existing complete directory is reused, writer not re-run") {
    val target = tmpTarget("reuse")
    SkopeQueries.atomicFixtureDir(target)(writeMarker(_, "a.tif"))
    var ran = false
    SkopeQueries.atomicFixtureDir(target) { _ => ran = true }
    assert(!ran, "writer re-ran over a complete fixture")
    assert(new java.io.File(target, "a.tif").isFile)
  }

  test("a rename-loser discards its staging copy and uses the winner's") {
    val target = tmpTarget("race")
    // simulate the race: the "other writer" completes while this one
    // is still staging (renameTo onto an existing dir fails on POSIX)
    val path = SkopeQueries.atomicFixtureDir(target) { dir =>
      writeMarker(dir, "mine.tif")
      target.mkdirs()
      writeMarker(target, "winner.tif")
    }
    assert(path === target.toString)
    assert(new java.io.File(target, "winner.tif").isFile)
    // no .stage-* siblings left behind
    val leftovers = target.getParentFile.listFiles()
      .filter(_.getName.startsWith(target.getName + ".stage-"))
    assert(leftovers.isEmpty, s"staging leftovers: ${leftovers.mkString(",")}")
  }
}
