package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression gate over the committed pipe-sweep artifacts: every
  * LLM-pipeline leg measured at BOTH SF10 and SF100 must scale sublinearly
  * enough that its SF10→SF100 ratio stays under 8× on 10× data (the r8
  * worst case was 6.8×). A leg that goes super-linear at scale now fails
  * `sbt test` instead of waiting for a judge round to notice.
  *
  * Reads the JSONs the sweep mains committed (BenchScale pipeSweep) — the
  * gate checks the recorded evidence, it does not re-run the sweeps.
  * Host-epoch variance (PERF_NOTES_r6) swings totals ±80% BETWEEN runs,
  * but both artifacts carry their host_page_mbps probe; the 8× bar leaves
  * room for one healthy + one degraded epoch before it trips.
  *
  * Protocol symmetry (r10): BOTH artifacts must be the same statistic —
  * per-leg minimum over 3 same-code draws, stated in each artifact's
  * `protocol` field. r9 compared a 3-draw SF100 minimum against a
  * single SF10 draw, which biases ratios downward (the r9 advice
  * finding); a refresh that regresses one side's protocol shows up here
  * as an unexplained ratio shift. */
class SweepRatioGateSpec extends AnyFunSuite {

  private val MaxRatio = 8.0

  private def readArtifact(path: String): String = {
    val f = new java.io.File(path)
    assert(f.isFile, s"sweep artifact missing: $path — rerun BenchScale " +
      "with SPARK_GRAFT_PIPE_SF and commit the JSON line")
    new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
  }

  private def legSeconds(txt: String, path: String): Map[String, Double] = {
    // our own single-line format: "queries" is a flat name->seconds object
    val qObj = """"queries"\s*:\s*\{([^}]*)\}""".r
      .findFirstMatchIn(txt).map(_.group(1))
      .getOrElse(fail(s"no queries object in $path"))
    """"([^"]+)"\s*:\s*([0-9.eE+-]+)""".r.findAllMatchIn(qObj)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  /** The artifact's per-draw host probes — the epoch evidence. Every draw
    * MUST carry one: the gate compares two single-epoch snapshots, the
    * documented epoch swing (±80%, PERF_NOTES_r6) exceeds the worst leg's
    * headroom, and a probe-less refresh would make a drag-epoch artifact
    * indistinguishable from an engine regression. */
  private def drawProbes(txt: String, path: String): Seq[Double] = {
    val draws = """"draws"\s*:\s*\[(.*?)\]""".r
      .findFirstMatchIn(txt).map(_.group(1))
      .getOrElse(fail(s"no draws array in $path — refresh with the 3-draw " +
        "protocol (BenchScale pipeSweep x3 or tools/DrawSweep) and keep " +
        "per-draw host_page_mbps"))
    val entries = """\{[^}]*\}""".r.findAllIn(draws).toSeq
    assert(entries.nonEmpty, s"empty draws array in $path")
    entries.map { e =>
      """"host_page_mbps"\s*:\s*([0-9.eE+-]+)""".r.findFirstMatchIn(e)
        .map(_.group(1).toDouble)
        .getOrElse(fail(s"a draw in $path lacks host_page_mbps — every " +
          "draw must carry its epoch probe"))
    }
  }

  test("every shared pipe leg scales < 8x from SF10 to SF100 (10x data)") {
    val txt10 = readArtifact("BENCH_PIPE_SF10.json")
    val txt100 = readArtifact("BENCH_PIPE_SF100.json")
    val sf10 = legSeconds(txt10, "BENCH_PIPE_SF10.json")
    val sf100 = legSeconds(txt100, "BENCH_PIPE_SF100.json")
    val p10 = drawProbes(txt10, "BENCH_PIPE_SF10.json")
    val p100 = drawProbes(txt100, "BENCH_PIPE_SF100.json")
    val probePair = s"probes sf10=[${p10.mkString(",")}] " +
      s"sf100=[${p100.mkString(",")}] MB/s"
    info(probePair)
    val shared = sf10.keySet.intersect(sf100.keySet)
    assert(shared.size >= 10,
      s"suspiciously few shared legs (${shared.size}): " +
        s"sf10=${sf10.keySet.toSeq.sorted} sf100=${sf100.keySet.toSeq.sorted}")
    val ratios = shared.toSeq.sorted.map { leg =>
      val r = sf100(leg) / math.max(sf10(leg), 0.001)
      info(f"$leg%-24s sf10=${sf10(leg)}%8.1fs sf100=${sf100(leg)}%8.1fs ratio=$r%5.2fx")
      leg -> r
    }
    val bad = ratios.filter(_._2 >= MaxRatio)
    assert(bad.isEmpty,
      s"super-linear legs (>= ${MaxRatio}x on 10x data): " +
        bad.map { case (l, r) => f"$l=$r%.1fx" }.mkString(", ") +
        s" — BEFORE reading this as an engine regression, compare the " +
        s"epochs: $probePair (epoch-first rule, PERF_NOTES_r6; a " +
        s"drag-epoch SF100 refresh against a healthy SF10 artifact " +
        s"inflates every ratio — refresh the degraded side on a " +
        s"like-for-like epoch and re-run)")
  }
}
