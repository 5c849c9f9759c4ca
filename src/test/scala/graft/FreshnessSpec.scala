package graft

/** dbt `source freshness` twin ([[Freshness]]): one row per declared
  * source, watermark columns sane, grading deterministic. */
class FreshnessSpec extends SparkSpec {

  test("report emits one graded row per declared source") {
    val rows = Freshness.report(ctx).collect()
    assert(rows.length == Freshness.eventTimeFields.length)
    assert(rows.map(_.getAs[String]("source_table")).toSeq ==
      Freshness.eventTimeFields.map(_._1).sorted)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") > 0L)
      assert(r.getAs[Long]("max_event_s") >= r.getAs[Long]("min_event_s"))
      assert(r.getAs[Long]("span_days") >= 0L)
      assert(r.getAs[Long]("lag_days") >= 0L)
      assert(Set("fresh", "warn", "error")(r.getAs[String]("freshness_status")))
    }
  }

  test("the corpus-watermark source grades fresh with zero lag") {
    val rows = Freshness.report(ctx).collect()
    val freshest = rows.minBy(r => r.getAs[Long]("lag_days"))
    assert(freshest.getAs[Long]("lag_days") == 0L)
    assert(freshest.getAs[String]("freshness_status") == "fresh")
  }

  test("grade thresholds follow warn_after/error_after") {
    val rows = Freshness.report(ctx).collect()
    rows.foreach { r =>
      val lag = r.getAs[Long]("lag_days")
      val expected =
        if (lag <= Freshness.WarnAfterDays) "fresh"
        else if (lag <= Freshness.ErrorAfterDays) "warn"
        else "error"
      assert(r.getAs[String]("freshness_status") == expected)
    }
  }
}
