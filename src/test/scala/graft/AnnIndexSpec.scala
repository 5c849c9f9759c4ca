package graft

import org.apache.spark.sql.functions._

/** The persisted IVFADC index (extensions.AnnIndex) must serve results
  * row-identical to the unpersisted composition (Similarity.annIvfPq) —
  * the build-once/query-many production shape cannot change answers. Also
  * pins the index lifecycle: a rebuild publishes new Versioned snapshots
  * while the prior version stays readable (time travel). */
class AnnIndexSpec extends SparkSpec {

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
  }

  test("persisted-index query is row-identical to annIvfPq") {
    val dir = "/tmp/graft-ann-index-spec"
    rm(new java.io.File(dir))
    val versions = extensions.AnnIndex.build(ctx, dir)
    assert(versions.keySet == Set("seeds", "codebooks", "coded", "vectors"))

    val queries = ctx.tbl("embeddings")
      .filter(col("vec_id") >= 10 && col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val served = extensions.AnnIndex.query(spark, dir, queries)
    val direct = extensions.Similarity.annIvfPq(ctx)

    assert(served.columns.toSeq == direct.columns.toSeq,
      s"schema drift: ${served.columns.toSeq} vs ${direct.columns.toSeq}")
    val s = served.collect().map(_.toString).sorted.toSeq
    val d = direct.collect().map(_.toString).sorted.toSeq
    assert(s.nonEmpty, "served result is empty")
    assert(s == d, s"served != direct; first delta: ${
      s.zipAll(d, "<missing>", "<missing>").find(p => p._1 != p._2)}")
  }

  test("rebuild publishes a new snapshot; the old index stays readable") {
    val dir = "/tmp/graft-ann-index-spec" // built by the test above
    val v0 = Versioned.latestVersion(spark, s"$dir/coded").get
    val v1 = extensions.AnnIndex.build(ctx, dir)("coded")
    assert(v1 == v0 + 1)
    // time travel: the superseded snapshot still serves the same rows
    val oldCoded = Versioned.read(spark, s"$dir/coded", Some(v0))
    val newCoded = Versioned.read(spark, s"$dir/coded", Some(v1))
    assert(oldCoded.count() == newCoded.count())
  }
}
