package graft

/** The lazy/eager heavy-hitters split (r11 verdict item 2): the DEFAULT
  * builder must run no job at construction time — a consumer that builds
  * plans outside its timed window must not silently pay (or miss) the
  * full-corpus sketch pass — while the eager InSet variant stays available
  * under its own name and both produce identical rows. */
class HeavyHittersLazySpec extends SparkSpec {

  // any job launched during `f` runs synchronously in this thread's job
  // group (actions block), so after f returns the group's job list is the
  // construction-time job count — modulo the status store's async update,
  // absorbed by a grace poll
  private def jobsDuring(group: String)(f: => Unit): Int = {
    spark.sparkContext.setJobGroup(group, group, interruptOnCancel = false)
    try f finally spark.sparkContext.clearJobGroup()
    val deadline = System.currentTimeMillis() + 5000
    var n = spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
    while (n == 0 && System.currentTimeMillis() < deadline) {
      Thread.sleep(100)
      n = spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
    }
    n
  }

  test("heavyHitters construction runs no job beyond the source's metadata read") {
    // control: constructing the bare token source costs spark.read.parquet's
    // schema-inference metadata job (1 footer task) and nothing else — the
    // unavoidable floor for ANY builder over this table. The lazy variant
    // must not exceed it (i.e. no sketch pass, no corpus scan), while the
    // eager variant must (its pass 1 is a full-corpus action).
    val controlJobs = jobsDuring("hh-control") {
      extensions.Text.docsTok(ctx); ()
    }
    var df: org.apache.spark.sql.DataFrame = null
    spark.sparkContext.setJobGroup("hh-lazy", "hh-lazy", interruptOnCancel = false)
    try df = extensions.Text.heavyHitters(ctx)
    finally spark.sparkContext.clearJobGroup()
    Thread.sleep(500) // async status-store grace
    val lazyJobs =
      spark.sparkContext.statusTracker.getJobIdsForGroup("hh-lazy").length
    assert(lazyJobs <= controlJobs,
      s"lazy heavyHitters ran $lazyJobs job(s) at construction vs the " +
        s"bare-source control's $controlJobs — it executed work beyond the " +
        "parquet metadata read")

    val atAction = jobsDuring("hh-lazy-act") { df.count(); () }
    assert(atAction > 0, "the action should have run jobs")

    val eagerJobs = jobsDuring("hh-eager") {
      extensions.Text.heavyHittersEager(ctx); ()
    }
    assert(eagerJobs > controlJobs,
      "eager variant should run pass 1 (the sketch action) at construction")
  }

  test("lazy and eager variants produce identical rows") {
    val lazyRows = extensions.Text.heavyHitters(ctx)
      .collect().map(_.toString).sorted.toSeq
    val eagerRows = extensions.Text.heavyHittersEager(ctx)
      .collect().map(_.toString).sorted.toSeq
    assert(lazyRows.nonEmpty, "heavy hitters should be non-empty at sf0.001")
    assert(lazyRows == eagerRows)
  }
}
