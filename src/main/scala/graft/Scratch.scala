package graft

/** Scratch-dir (spark.local.dir) selection for the bench/tool mains.
  *
  * Memory-backed scratch (tmpfs) is the cluster-standard fast path for
  * shuffle files + persist spill — this host's disk sustains ~0.5 GB/s vs
  * ~2.6 GB/s tmpfs. But tmpfs defaults to RAM/2: on a small-memory host a
  * large build's shuffle spill can exhaust /dev/shm (failing runs that
  * would merely have been slower on disk) and competes with the page
  * cache. So tmpfs is used only when its CURRENT free space clears the
  * caller's expected shuffle footprint; otherwise scratch falls back to
  * the disk temp dir. `SPARK_GRAFT_LOCAL_DIR` overrides unconditionally —
  * scratch then lives in a graft-owned `graft-local/` subdir of it, so
  * orphan reaping stays safe in shared dirs (see resolve).
  */
object Scratch {

  /** Pick the scratch dir and create it. `minFreeBytes` = the caller's
    * expected peak shuffle/spill footprint; tmpfs is only chosen when its
    * usable space clears it. */
  def resolve(minFreeBytes: Long): String = {
    sys.env.get("SPARK_GRAFT_LOCAL_DIR") match {
      case Some(dir) =>
        // User-chosen dir may be SHARED (e.g. /tmp): `blockmgr-`/`spark-`
        // prefixes are generic to every Spark process on the host, and
        // mtime is not updated by reads — so reaping them there could
        // delete a live foreign app's block-manager dirs (its shuffle
        // blocks written >2 h ago but still being READ), causing
        // FetchFailed storms in another process. So the override resolves
        // to a GRAFT-OWNED `graft-local` subdir of the user's dir:
        // everything Spark creates under it (blockmgr-/spark-) is this
        // framework's by construction, making killed-JVM orphans fully
        // reapable again (they pin RAM forever when the override is a
        // tmpfs — r11 advice) without ever touching a foreign process's
        // scratch. At the top of the user's dir only `graft-` entries
        // (ours by name) are reaped.
        val top = new java.io.File(dir)
        top.mkdirs()
        reapOrphans(top, prefixes = Seq("graft-"))
        val own = new java.io.File(top, "graft-local")
        own.mkdirs()
        reapOrphans(own)
        own.getPath
      case None =>
        // Reap OUR stale tmpfs dir first — orphans there consume RAM and
        // would otherwise both never be reclaimed and permanently fail
        // the free-space check below (pinning every run to slow disk).
        val shmScratch = new java.io.File("/dev/shm/graft-scratch")
        if (shmScratch.isDirectory) reapOrphans(shmScratch)
        val shm = new java.io.File("/dev/shm")
        val dir =
          if (shm.isDirectory && shm.getUsableSpace >= minFreeBytes)
            shmScratch.getPath
          else {
            System.err.println(
              s"[scratch] /dev/shm free ${if (shm.isDirectory) shm.getUsableSpace else 0L} " +
                s"< required $minFreeBytes — spilling to disk temp instead")
            sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-scratch"
          }
        val f = new java.io.File(dir)
        f.mkdirs()
        reapOrphans(f)
        dir
    }
  }

  /** Reap scratch left by killed JVMs: tmpfs files count against RAM — a
    * 57 GB orphan from a kernel-OOM-killed run measurably OOM'd a later
    * 64g-heap run (PERF_NOTES_r8). An entry is an orphan only when NOTHING
    * under it was touched for 2 hours (the NEWEST mtime in the subtree, so
    * a live run whose top-level blockmgr dir is old but whose shuffle
    * files are fresh is never touched). Fresh orphans are instead handled
    * by the free-space fallback above. Only entries with the given
    * scratch prefixes are touched — anything else in the dir is not ours
    * to delete (and in user-override dirs only `graft-` is, see resolve).
    * Best-effort: IO errors skip. */
  private[graft] def reapOrphans(root: java.io.File,
      prefixes: Seq[String] = Seq("blockmgr-", "spark-", "graft-")): Unit = {
    val cutoff = System.currentTimeMillis() - 2L * 3600 * 1000
    val ours = prefixes
    def newestMtime(f: java.io.File): Long = {
      val own = f.lastModified()
      val kids = Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
      kids.foldLeft(own)((m, k) => math.max(m, newestMtime(k)))
    }
    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rmTree)
      f.delete(); ()
    }
    try
      Option(root.listFiles()).getOrElse(Array.empty[java.io.File]).foreach { e =>
        if (ours.exists(e.getName.startsWith) && newestMtime(e) < cutoff) {
          System.err.println(s"[scratch] reaping orphaned ${e.getName}")
          rmTree(e)
        }
      }
    catch { case _: Exception => () }
  }

  /** Footprint for a full at-scale build (BenchScale): SF10 observed
    * hundreds of GB of shuffle traffic, reference-cleaned in ~2-minute
    * windows — 64 GiB of headroom keeps the peak safely inside tmpfs. */
  val BuildFootprint: Long = 64L << 30

  /** Footprint for the sf0.1 query sweep and the probe tools. */
  val SweepFootprint: Long = 16L << 30
}
