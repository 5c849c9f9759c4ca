package graft

import org.apache.spark.sql.functions._

/** Incremental (insert_overwrite) materialization: a snapshot build plus an
  * incremental run lands byte-identical rows to a full rebuild, closed
  * partitions are never rewritten, and only the delta's partitions are
  * touched. */
class IncrementalSpec extends SparkSpec {

  private def fileState(target: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(target))
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath -> f.lastModified()).toMap
  }

  test("snapshot + incremental == full rebuild; closed partitions untouched") {
    val target = java.nio.file.Files
      .createTempDirectory("graft_incr").toString + "/fct_orders"
    val full = Incremental.fctOrdersMonthly(ctx)
    val months = full.select("order_month").distinct()
      .orderBy("order_month").collect().map(_.getString(0))
    assert(months.length > 4, "need several months to exercise partitions")
    val cut = months(months.length - 3)   // snapshot missing the last 2 months

    // run 1: the world as of the cutoff — full refresh
    val r1 = Incremental.run(spark, target, "order_month",
      full.filter(col("order_month") < cut))
    assert(r1.fullRefresh && r1.highWaterMark.isEmpty)
    val stateBefore = fileState(target)

    // run 2: full source visible — only hwm-and-later partitions recomputed
    val r2 = Incremental.run(spark, target, "order_month", full)
    assert(!r2.fullRefresh)
    assert(r2.highWaterMark.contains(months(months.length - 4)),
      s"hwm ${r2.highWaterMark} vs expected ${months(months.length - 4)}")
    assert(r2.partitionsWritten == months.filter(_ >= months(months.length - 4)).toSeq)

    // closed partitions: identical files, untouched mtimes
    val after = fileState(target)
    val closedAfter = after.filter { case (p, _) =>
      r2.partitionsWritten.forall(m => !p.contains(s"order_month=$m"))
    }
    val closedExpected = stateBefore.filter { case (p, _) =>
      r2.partitionsWritten.forall(m => !p.contains(s"order_month=$m"))
    }
    assert(closedAfter == closedExpected, "closed partitions were rewritten")

    // final content == a from-scratch full rebuild (column order differs
    // through partitionBy; compare as sets of projected rows)
    val rebuilt = spark.read.parquet(target)
      .select(full.columns.map(col).toIndexedSeq: _*)
    assert(rebuilt.count() == full.count())
    assert(rebuilt.except(full).isEmpty && full.except(rebuilt).isEmpty)
  }
}
