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
  * the disk temp dir. `SPARK_GRAFT_LOCAL_DIR` overrides unconditionally.
  */
object Scratch {

  /** Pick the scratch dir and create it. `minFreeBytes` = the caller's
    * expected peak shuffle/spill footprint; tmpfs is only chosen when its
    * usable space clears it. */
  def resolve(minFreeBytes: Long): String = {
    val dir = sys.env.get("SPARK_GRAFT_LOCAL_DIR").getOrElse {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.getUsableSpace >= minFreeBytes)
        "/dev/shm/graft-scratch"
      else {
        System.err.println(
          s"[scratch] /dev/shm free ${if (shm.isDirectory) shm.getUsableSpace else 0L} " +
            s"< required $minFreeBytes — spilling to disk temp instead")
        sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-scratch"
      }
    }
    new java.io.File(dir).mkdirs()
    dir
  }

  /** Footprint for a full at-scale build (BenchScale): SF10 observed
    * hundreds of GB of shuffle traffic, reference-cleaned in ~2-minute
    * windows — 64 GiB of headroom keeps the peak safely inside tmpfs. */
  val BuildFootprint: Long = 64L << 30

  /** Footprint for the sf0.1 query sweep and the probe tools. */
  val SweepFootprint: Long = 16L << 30
}
