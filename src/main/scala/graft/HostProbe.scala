package graft

/** One-number host-health probe emitted with every bench record.
  *
  * This host's dominant noise source is the kernel page path: first-touch
  * page allocation has measured anywhere from ~4.4 GB/s (healthy epoch) to
  * ~0.1 GB/s (degraded epoch) across sessions with zero code change —
  * enough to move a full-build wall time 2-3x on its own (PERF_NOTES_r6.md).
  * Embedding the probe value in the bench JSON makes every committed number
  * interpretable: compare engine records at like-for-like `host_page_mbps`,
  * not across epochs.
  *
  * Method: write 256 MB of fresh pages through the page cache to a temp
  * file (each 4K page is first-touched in the kernel), fsync, report MB/s,
  * delete. ~0.1-2 s of probe time against multi-minute benches.
  */
object HostProbe {

  def pageMBps(): Double = {
    val mb = 256
    val f = java.io.File.createTempFile("graft_probe", ".bin")
    try {
      val ch = java.nio.channels.FileChannel.open(f.toPath,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val buf = java.nio.ByteBuffer.allocate(1 << 20)
        while (buf.hasRemaining) buf.put(0x5a.toByte)
        val t0 = System.nanoTime()
        var i = 0
        while (i < mb) { buf.rewind(); ch.write(buf); i += 1 }
        ch.force(false)
        val sec = (System.nanoTime() - t0) / 1e9
        math.round(mb / sec * 10.0) / 10.0
      } finally ch.close()
    } finally { f.delete(); () }
  }
}
