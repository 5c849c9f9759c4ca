package graft

import graft.operators.Components
import org.apache.spark.sql.functions._

import scala.util.Random

/** Connected components (operators.Components): the iterative loop behind
  * dedup_clusters, exercised on graphs the parquet testdata cannot produce —
  * a long chain (multi-round pointer-jumping convergence; the testdata
  * near-dup clusters have tiny diameters) and a seeded random graph checked
  * against a driver-side union-find. */
class ComponentsSpec extends SparkSpec {

  private def labelMap(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Components.labels(pairs.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("long chain collapses to the minimum node id") {
    // diameter 127: plain O(diameter) propagation would grind through 127
    // shuffle rounds; pointer jumping converges in a handful
    val chain = (0L until 127L).map(i => (i, i + 1))
    val got = labelMap(chain)
    assert(got.size == 128)
    assert(got.values.forall(_ == 0L), "every chain node must label to 0")
  }

  test("disjoint components keep distinct minimum labels") {
    val pairs = Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L), (31L, 30L))
    val got = labelMap(pairs)
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 30L -> 30L, 31L -> 30L))
  }

  test("reliable-checkpoint mode converges to the same labels and writes " +
      "its cuts to the checkpoint dir") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cc_ckpt").toString
    val chain = (0L until 63L).map(i => (i, i + 1))
    val got = Components.labels(chain.toDF("a", "b"), "a", "b",
        checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 64 && got.values.forall(_ == 0L))
    // the cuts must actually live on durable storage, not executor blocks
    def files(f: java.io.File): Seq[java.io.File] =
      Option(f.listFiles()).toSeq.flatten.flatMap(c =>
        if (c.isDirectory) files(c) else Seq(c))
    assert(files(new java.io.File(dir)).nonEmpty,
      s"no checkpoint files written under $dir")
  }

  test("random graph matches a driver-side union-find") {
    val rnd = new Random(42)
    val pairs = Seq.fill(300)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
    // reference: plain union-find over the same edges
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(n => n -> find(n)).toMap
    val got = labelMap(pairs)
    assert(got == expected)
  }
}
