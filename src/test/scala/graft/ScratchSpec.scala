package graft

import org.scalatest.funsuite.AnyFunSuite

/** Orphan reaping for the tmpfs scratch dir: an entry is deleted only when
  * the NEWEST mtime in its whole subtree is stale — a live run with an old
  * top-level dir but fresh nested shuffle files must be spared. */
class ScratchSpec extends AnyFunSuite {

  test("reapOrphans removes stale trees, spares trees with any fresh file") {
    val root = java.nio.file.Files.createTempDirectory("scratch_spec").toFile
    val old = 3L * 3600 * 1000

    // orphan: everything stale
    val orphan = new java.io.File(root, "blockmgr-dead")
    val orphanSub = new java.io.File(orphan, "0a")
    orphanSub.mkdirs()
    val of = new java.io.File(orphanSub, "shuffle_0_0_0.data")
    of.createNewFile()
    Seq(of, orphanSub, orphan).foreach(f =>
      f.setLastModified(System.currentTimeMillis() - old))

    // live: top dir stale, one nested file fresh
    val live = new java.io.File(root, "blockmgr-live")
    val liveSub = new java.io.File(live, "0b")
    liveSub.mkdirs()
    val stale = new java.io.File(liveSub, "shuffle_1_0_0.data")
    stale.createNewFile()
    stale.setLastModified(System.currentTimeMillis() - old)
    val fresh = new java.io.File(liveSub, "shuffle_1_0_1.data")
    fresh.createNewFile() // mtime = now
    Seq(liveSub, live).foreach(f =>
      f.setLastModified(System.currentTimeMillis() - old))

    Scratch.reapOrphans(root)

    assert(!orphan.exists(), "stale tree must be reaped")
    assert(live.exists() && fresh.exists() && stale.exists(),
      "tree with any fresh file must be spared whole")
  }

  test("reapOrphans never touches entries without a Spark/graft prefix") {
    val root = java.nio.file.Files.createTempDirectory("scratch_spec2").toFile
    val old = 3L * 3600 * 1000

    // stale but NOT ours: a user file in a shared dir pointed at by the
    // SPARK_GRAFT_LOCAL_DIR override must survive
    val userFile = new java.io.File(root, "important-notes.txt")
    userFile.createNewFile()
    userFile.setLastModified(System.currentTimeMillis() - old)
    val userDir = new java.io.File(root, "project-data")
    userDir.mkdirs()
    userDir.setLastModified(System.currentTimeMillis() - old)

    // stale AND ours: reaped
    val ours = new java.io.File(root, "spark-abc123")
    ours.mkdirs()
    ours.setLastModified(System.currentTimeMillis() - old)

    Scratch.reapOrphans(root)

    assert(userFile.exists() && userDir.exists(),
      "non-Spark-prefixed entries are not ours to delete")
    assert(!ours.exists(), "stale spark-* entry must still be reaped")
  }

  test("override resolve scratches in a graft-owned subdir and reaps inside it") {
    val root = java.nio.file.Files.createTempDirectory("scratch_spec4").toFile
    val old = 3L * 3600 * 1000

    // a prior killed run's blockmgr orphan INSIDE our graft-local subdir:
    // provably ours (we name the subdir), so it must be reaped even though
    // blockmgr- is a generic prefix never touched at the top level
    val own = new java.io.File(root, "graft-local")
    val orphan = new java.io.File(own, "blockmgr-killed")
    orphan.mkdirs()
    Seq(orphan, own).foreach(f =>
      f.setLastModified(System.currentTimeMillis() - old))
    // a foreign process's stale blockmgr at the top level: untouched
    val foreign = new java.io.File(root, "blockmgr-foreign")
    foreign.mkdirs()
    foreign.setLastModified(System.currentTimeMillis() - old)

    // resolve() reads the env only via sys.env — exercise the same logic
    // directly: top-level graft- reap, then the inner full-prefix reap
    Scratch.reapOrphans(root, prefixes = Seq("graft-"))
    own.mkdirs()
    Scratch.reapOrphans(own)

    assert(foreign.exists(), "foreign top-level blockmgr must survive")
    assert(own.exists() && !orphan.exists(),
      "orphans inside the graft-owned subdir must be reaped")
  }

  test("override-dir prefix set spares foreign Spark processes' scratch") {
    val root = java.nio.file.Files.createTempDirectory("scratch_spec3").toFile
    val old = 3L * 3600 * 1000

    // a FOREIGN Spark app's block-manager dir in a shared override dir
    // (e.g. /tmp): written >2 h ago but possibly still being READ (reads
    // don't update mtime) — the override-mode reap must not touch it
    val foreign = new java.io.File(root, "blockmgr-foreign")
    foreign.mkdirs()
    foreign.setLastModified(System.currentTimeMillis() - old)
    val foreignSpark = new java.io.File(root, "spark-foreign")
    foreignSpark.mkdirs()
    foreignSpark.setLastModified(System.currentTimeMillis() - old)

    // our own stale scratch: still reaped in override mode
    val ours = new java.io.File(root, "graft-scratch-old")
    ours.mkdirs()
    ours.setLastModified(System.currentTimeMillis() - old)

    Scratch.reapOrphans(root, prefixes = Seq("graft-"))

    assert(foreign.exists() && foreignSpark.exists(),
      "blockmgr-/spark- entries in a shared override dir may belong to a " +
        "live foreign process — only graft- is ours there")
    assert(!ours.exists(), "stale graft-* entry must still be reaped")
  }
}
