package graft

import graft.layers._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The `dbt build` lifecycle twin (SURVEY §3): materializes every
  * table-layer model in topological order with per-run housekeeping
  * constants, then runs the schema-test gate.
  *
  * dbt semantics reproduced:
  *  - ephemeral base models are never materialized (they're plain defs);
  *  - `table` models are written (parquet here; bucketed via Lake at
  *    cluster scale) in dependency order;
  *  - wh-layer models carry dbt_batch_id/dbt_batch_ts audit columns with
  *    constants fixed once per invocation (macros/dbt_housekeeping.sql:1-4);
  *  - schema tests (unique/not_null/relationships) gate the build: a
  *    failure aborts before downstream layers, like `dbt build`.
  */
object Runner {

  final case class BuildResult(table: String, rows: Long, path: String,
      seconds: Double = 0.0, skipped: Boolean = false)

  // per-model build trace to stderr (timeline offsets make the concurrent
  // phases readable); SPARK_GRAFT_BUILD_LOG=0 silences it
  private def buildLog(msg: => String): Unit =
    if (sys.env.get("SPARK_GRAFT_BUILD_LOG").forall(_ != "0"))
      System.err.println(msg)

  /** Alternate front/back of a cost-sorted list: heavy models start
    * early (no straggler tail) but never ALL at once — strict
    * heaviest-first was measured WORSE at SF10 (the 8 heaviest are all
    * memory-hungry two-phase rankings; co-running the full set thrashes
    * the block manager). Interleaving caps concurrent heavies at
    * ~threads/2 with light scan-aggregate models filling the other
    * slots. */
  private def interleave[A](sorted: Seq[A]): Seq[A] = {
    val (front, back) = (sorted.iterator, sorted.reverseIterator)
    (0 until sorted.size).map(i =>
      if (i % 2 == 0) front.next() else back.next())
      .take(sorted.size)
  }

  /** Which rollups each report model READS (from the Rollups.* call sites
    * in layers.Reports / layers.Metrics) — its build-DAG dependencies
    * beyond the schema gate. Models absent here are fact-direct. */
  private val reportRollupDeps: Map[String, Seq[String]] = Map(
    "customer_concentration_risk" -> Seq("rollup_customer_orders"),
    "customer_cohort_retention" -> Seq("rollup_customer_orders", "rollup_customer_month"),
    "customer_churn_risk" -> Seq("rollup_customer_orders"),
    "customer_geographic_summary" -> Seq("rollup_customer_orders"),
    "customer_purchase_frequency_bands" -> Seq("rollup_customer_orders"),
    "customer_rfm_segments" -> Seq("rollup_customer_orders"),
    "monthly_order_trends" -> Seq("rollup_customer_orders", "rollup_customer_month"),
    "monthly_revenue_kpis" -> Seq("rollup_customer_month"),
    "metrics_customer_retention" -> Seq("rollup_customer_orders", "rollup_customer_month"),
    "metrics_monthly_orders" -> Seq("rollup_customer_month"),
    "metrics_regional_revenue" -> Seq("rollup_customer_month"),
    "part_abc_classification" -> Seq("rollup_part_month"),
    "part_sales_velocity" -> Seq("rollup_part_month"),
    "metrics_profit_margin_trend" -> Seq("rollup_part_month"),
    "metrics_inventory_coverage" -> Seq("rollup_part_month"),
    "metrics_top_parts_trending" -> Seq("rollup_part_month"),
    "supplier_revenue_ranking" -> Seq("rollup_supplier_sales"),
    "supplier_scorecard" -> Seq("rollup_supplier_sales"),
    "regional_trade_balance" -> Seq("rollup_nation_flows"))

  /** Relative cost rank for the report phase's interleaved submission —
    * from the measured per-model wall times of the SF10 replica build
    * (heaviest ≈ 300 s, lightest ≈ 30 s; the ranking, not the absolute
    * numbers, is what scheduling needs, and it is stable across scale
    * factors because it tracks each model's input grain). Models not
    * listed are light and sort last. */
  private val reportWeight: Map[String, Int] = Seq(
    "supplier_revenue_ranking", "customer_rfm_segments",
    "part_abc_classification", "part_sales_velocity",
    "supply_chain_network", "inventory_turnover",
    "supplier_lead_time_distribution", "supplier_concentration_risk",
    "part_type_performance", "metrics_supplier_reliability",
    "supplier_scorecard", "customer_concentration_risk",
    "metrics_profit_margin_trend", "metrics_inventory_coverage",
    "regional_trade_balance", "metrics_shipping_efficiency",
    "metrics_top_parts_trending", "tax_and_discount_leakage",
    "repeat_purchase_analysis", "discount_effectiveness",
    "fulfillment_priority_analysis").reverse.zipWithIndex
    .map { case (n, i) => n -> (i + 1) }.toMap

  /** Full dbt-build twin. `threads` mirrors the reference's `dbt build`
    * concurrency (profiles threads: 8): models WITHIN a phase have no
    * dependencies on each other, so each phase materializes its models as
    * concurrent Spark actions — the scheduler interleaves their stages and
    * keeps all cores busy even while one model sits in a narrow stage.
    * Dependencies ACROSS phases (ods -> wh -> gate -> reports) stay strictly
    * ordered, exactly like dbt's DAG-ordered, intra-level-parallel run.
    *
    * `resume = true` is the `dbt retry` twin: a model whose output
    * directory already holds a complete write (its _SUCCESS marker) is
    * NOT recomputed — it is swapped into the Store straight from parquet
    * and reported with `skipped = true` — so a build that died mid-run
    * redoes only the missing/incomplete models. Parquet writes are
    * atomic-by-marker (a killed write leaves no _SUCCESS), which makes
    * the marker a sound completeness signal.
    *
    * `cacheParents = true` keeps each materialized parent PERSISTED in the
    * block manager for its downstream consumers instead of re-reading the
    * written parquet at every phase boundary (the write still happens — the
    * table contract is unchanged — but children consume the in-memory copy,
    * which is bit-identical to the file: it is the exact relation the writer
    * materialized). On a host whose scratch volume is slow relative to
    * memory this removes ~15 full re-scans of the two 60M-row facts from
    * the critical path; on a cluster the same role is played by the
    * bucketed-parquet page cache. Default stays write-through (the dbt
    * execution-model twin, and the bounded-memory path). */
  def buildAll(ctx: Ctx, outDir: String, threads: Int = 8,
      resume: Boolean = false, cacheParents: Boolean = false): Seq[BuildResult] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val runId = java.util.UUID.randomUUID().toString
    val runTs = new java.sql.Timestamp(System.currentTimeMillis())
    val hk = Macros.housekeeping(runId, runTs)
    val buildT0 = System.nanoTime()
    def rel: Double = (System.nanoTime() - buildT0) / 1e9

    def write(name: String, df: DataFrame, housekeeping: Boolean): BuildResult = {
      val t0 = System.nanoTime()
      val out = if (housekeeping) df.select(col("*") +: hk: _*) else df
      val path = s"$outDir/$name"
      val successMarker = new org.apache.hadoop.fs.Path(s"$path/_SUCCESS")
      def markerExists: Boolean = successMarker
        .getFileSystem(ctx.spark.sparkContext.hadoopConfiguration)
        .exists(successMarker) // Hadoop FS, not java.io: outDir may be hdfs://s3a://
      if (resume && markerExists) {
        // complete prior write: count from parquet row-group metadata (the
        // reader short-circuits a bare count), no recompute
        return BuildResult(name, ctx.spark.read.parquet(path).count(), path,
          (System.nanoTime() - t0) / 1e9, skipped = true)
      }
      // Row count rides the write action as an observed metric instead of a
      // post-write `read.parquet(path).count()`: at SF10 that re-count
      // re-scanned all ~487M output rows across 50 tables purely for the
      // audit number. Observation piggybacks on the rows already flowing
      // through the writer — zero extra scan, same exact count.
      val obs = org.apache.spark.sql.Observation(s"build_${name}_$runId")
      out.observe(obs, org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("rows"))
        .write.mode("overwrite").parquet(path)
      val rows = obs.get("rows") match {
        case n: java.lang.Long => n.longValue()
        case other             => other.toString.toLong
      }
      val sec = (System.nanoTime() - t0) / 1e9
      buildLog(f"[build] +$rel%7.1f  $name%-32s $sec%7.1f s $rows%12d rows")
      BuildResult(name, rows, path, sec)
    }

    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)

    // ---- model-level dependency DAG (dbt's actual scheduler shape) ----
    // dbt runs the DAG with node-level readiness, not layer barriers: a dim
    // starts the moment its sources land, rollups/tests start the moment
    // their fact lands. Phase barriers left cores idle at every phase tail
    // (measured at SF10: only orders_items+parts_suppliers run for the last
    // ~55 s of the "ods phase" while six finished dims' consumers wait).
    // Nodes chain through Future.flatMap — a waiting node occupies NO pool
    // thread, so the fixed pool cannot deadlock on dependencies.
    val nodes = scala.collection.mutable.Map.empty[String, Future[Any]]
    val modelOrder = scala.collection.mutable.ArrayBuffer.empty[String]
    def after[A](deps: Seq[String])(body: => A): Future[A] =
      Future.sequence(deps.map(nodes)).flatMap(_ => Future {
        // every node body tags its Spark jobs with this build's run id so a
        // failing build can cancel the in-flight siblings (fail fast, and
        // no job is left writing into outDir after buildAll returns)
        ctx.spark.sparkContext.setJobGroup(runId, s"graft buildAll $runId",
          interruptOnCancel = true)
        try body finally ctx.spark.sparkContext.clearJobGroup()
      })
    // plan CONSTRUCTION happens inside the node body (after deps), so a
    // child's plan always embeds the parent's post-write Store state —
    // the write-through swap (or cacheParents persist) its deps published
    def model(name: String, deps: Seq[String], housekeeping: Boolean)
        (df: => DataFrame): Unit = {
      modelOrder += name
      nodes(name) = after(deps) {
        val r = write(name, df, housekeeping)
        // per-model write-through: children read the WRITTEN parquet (dbt's
        // execution model — select from the parent's materialized table)
        // and the in-build persisted copy is freed; without it a cold SF10
        // build holds every table twice and overruns local disk.
        // cacheParents keeps the persist instead (children read memory) —
        // except resumed skips, whose persist was never filled.
        if (!cacheParents || r.skipped) Store.swap(ctx, name, {
          val pq = ctx.spark.read.parquet(r.path)
          if (housekeeping) pq.drop("dbt_batch_id", "dbt_batch_ts") else pq
        })
        r
      }
    }
    // demotion: in cacheParents mode a table whose hot consumers have all
    // completed is swapped down to a parquet read, freeing block-manager
    // memory for the relations the report fan-out actually re-reads.
    // Keeping everything persisted measured SLOWER at SF10 (the report
    // phase evict-thrashed ~45 GB of cached relations in a 38 GB store).
    def demote(name: String, deps: Seq[String], housekeeping: Boolean): Seq[String] =
      if (!cacheParents) Nil
      else {
        val node = s"__demote_$name"
        nodes(node) = after(deps) {
          Store.swap(ctx, name, {
            val pq = ctx.spark.read.parquet(s"$outDir/$name")
            if (housekeeping) pq.drop("dbt_batch_id", "dbt_batch_ts") else pq
          })
        }
        Seq(node)
      }

    try {
      // ods layer (dbt `table`, no housekeeping — dbt_project.yml:31-32);
      // sources only, so no deps
      model("customers", Nil, false)(Ods.customers(ctx))
      model("nations", Nil, false)(Ods.nations(ctx))
      model("regions", Nil, false)(Ods.regions(ctx))
      model("parts", Nil, false)(Ods.parts(ctx))
      model("suppliers", Nil, false)(Ods.suppliers(ctx))
      model("orders", Nil, false)(Ods.orders(ctx))
      model("orders_items", Nil, false)(Ods.ordersItems(ctx))
      model("parts_suppliers", Nil, false)(Ods.partsSuppliers(ctx))

      // wh layer (dbt `table` with housekeeping — dbt_project.yml:33-34);
      // each starts the moment ITS parents land, not the whole ods layer
      model("dim_customer", Seq("customers", "nations", "regions"), true)(
        Wh.dimCustomer(ctx))
      model("dim_supplier", Seq("suppliers", "nations", "regions"), true)(
        Wh.dimSupplier(ctx))
      model("dim_part", Seq("parts"), true)(Wh.dimPart(ctx))
      model("dim_part_supplier_xrf", Seq("parts_suppliers", "suppliers"), true)(
        Wh.dimPartSupplierXrf(ctx))
      model("fct_orders", Seq("orders", "orders_items"), true)(Wh.fctOrders(ctx))
      model("fct_orders_items", Seq("orders_items", "parts_suppliers"), true)(
        Wh.fctOrdersItems(ctx))
      model("rpt_pricing_summary", Seq("fct_orders_items"), true)(
        Wh.rptPricingSummary(ctx))
      model("rpt_minimum_cost_suppliers", Seq("dim_part_supplier_xrf"), true)(
        Wh.rptMinimumCostSuppliers(ctx))

      val demotions =
        demote("orders_items", Seq("fct_orders", "fct_orders_items"), false) ++
        demote("parts_suppliers",
          Seq("fct_orders_items", "dim_part_supplier_xrf"), false) ++
        demote("dim_part_supplier_xrf", Seq("rpt_minimum_cost_suppliers"), true)

      // schema-test gate (reference fct_orders.yml / fct_orders_items.yml):
      // starts the moment the facts + dims land; report models depend on it,
      // so a violation aborts before any report materializes — `dbt build`
      // semantics with dbt's actual scheduling
      nodes("__gate") = after(Seq(
        "fct_orders", "fct_orders_items", "dim_customer", "dim_supplier",
        "parts")) {
        schemaGate(ctx)
        buildLog(f"[build] +$rel%7.1f  === schema gate passed")
      }

      // shared rollup boundary (layers.Rollups — the dbt table-layer reuse
      // twin): each rollup starts the moment its fact lands and serves the
      // report fan-out grain-reduced relations. Written under _rollups/
      // (a bucketed write at cluster scale); not part of the public
      // 50-table contract — kept out of the returned list.
      def rollup(name: String, deps: Seq[String])(df: => DataFrame): Unit =
        nodes(name) = after(deps) {
          val path = s"$outDir/_rollups/$name"
          df.write.mode("overwrite").parquet(path)
          if (!cacheParents) Store.swap(ctx, name, ctx.spark.read.parquet(path))
          buildLog(f"[build] +$rel%7.1f  $name (rollup)")
        }
      rollup("rollup_customer_orders", Seq("fct_orders"))(Rollups.customerOrders(ctx))
      rollup("rollup_customer_month", Seq("fct_orders"))(Rollups.customerMonth(ctx))
      rollup("rollup_part_month", Seq("fct_orders_items"))(Rollups.partMonth(ctx))
      rollup("rollup_supplier_sales", Seq("fct_orders_items"))(Rollups.supplierSales(ctx))
      rollup("rollup_nation_flows",
        Seq("fct_orders_items", "dim_supplier", "dim_customer"))(
        Rollups.nationFlows(ctx))
      val rollups = Seq("rollup_customer_orders", "rollup_customer_month",
        "rollup_part_month", "rollup_supplier_sales", "rollup_nation_flows")

      // metrics + reports layers (dbt `table`, no housekeeping);
      // intermediate models stay views (dbt_project.yml:35-36) and
      // extension operators are not dbt models — selected via the Registry
      // materialization tag. Every report gates on the schema tests (dbt
      // semantics) but waits only for the rollups IT reads — a fact-direct
      // report starts the moment the gate passes instead of idling behind
      // the 50M-row part-month rollup. (A missing entry here is a perf
      // slip, never a correctness one: an undeclared rollup would simply
      // be computed by its first consumer through the Store boundary.)
      // Submission order interleaves heavy and light models (cost-ranked
      // ends of the list) so heavies start early without co-running as a
      // memory-hungry block.
      val baseDeps = Seq("__gate") ++ demotions
      interleave(Registry.all.iterator
        .collect { case (n, en) if en.mat == Registry.Mat.Table => n -> en }
        .toSeq
        .sortBy { case (n, _) => -reportWeight.getOrElse(n, 0) })
        .foreach { case (n, en) =>
          model(n, baseDeps ++ reportRollupDeps.getOrElse(n, Nil), false)(en.fn(ctx))
        }
      // (the final await below also covers rollup nodes nothing depends on)

      scala.util.Try(
        Await.result(Future.sequence(nodes.values.toSeq), Duration.Inf)) match {
        case scala.util.Failure(e) =>
          // a gate/model failed: Future.sequence fails fast while sibling
          // nodes are still running. Cancel this build's in-flight jobs,
          // then wait for EVERY node future to settle before rethrowing —
          // otherwise the finally's Store.clear races live jobs and a
          // background write can land in outDir after buildAll returned
          // (callers delete outDir on failure).
          scala.util.Try(ctx.spark.sparkContext.cancelJobGroup(runId))
          Await.ready(Future.sequence(
            nodes.values.toSeq.map(_.transform(scala.util.Success(_)))),
            Duration.Inf)
          throw e
        case scala.util.Success(_) => ()
      }
      buildLog(f"[build] +$rel%7.1f  === build complete (${modelOrder.size} models)")
      modelOrder.toSeq.map(n =>
        Await.result(nodes(n), Duration.Inf).asInstanceOf[BuildResult])
    } finally {
      pool.shutdown()
      // A build is a batch job: the write-through swaps above left the
      // session's Store pointing into outDir (which the caller may delete).
      // Leave the session as we found it — later plans rebuild from source
      // rather than dangling on this build's files.
      Store.clear(ctx.spark)
    }
  }

  /** Per-table result of [[diff]]: row-multiset deltas between two builds. */
  final case class TableDiff(
      table: String,
      onlyInA: Long,        // rows (with multiplicity) present only in build A
      onlyInB: Long,        // rows present only in build B
      rowsA: Long,
      rowsB: Long,
      schemaChanged: Boolean,
      changedKeys: Option[Long]) { // keys present in both with differing rows
    def identical: Boolean = onlyInA == 0 && onlyInB == 0 && !schemaChanged
  }

  /** Data diff between two build directories — the twin of the reference's
    * recce regression mechanism (reference pyproject.toml:10 `recce>=1.35.0`;
    * Makefile:54-58 builds a base and a current variant and row-diffs them).
    *
    * Fully distributed: each side is reduced to md5(to_json(row)) multiset
    * counts (one shuffle per side at the hash grain), full-outer joined on
    * the hash, and the count deltas summed — no collected row sets, no
    * driver-side comparison, so a 100 TB table diffs at the cost of two
    * scans + one hash-grain shuffle. When `keys` declares a unique key for
    * a table, rows are additionally compared per key to report CHANGED keys
    * (a key present in both builds whose row content differs) — recce's
    * primary-key diff mode. Schema changes (column name/type set) are
    * reported and the row diff is skipped for that table (recce reports the
    * schema delta the same way).
    */
  def diff(spark: org.apache.spark.sql.SparkSession, dirA: String, dirB: String,
      keys: Map[String, Seq[String]] = Map.empty): Seq[TableDiff] = {
    import org.apache.spark.sql.functions.{coalesce, greatest, lit, md5, struct, sum, to_json}
    def tables(dir: String): Set[String] =
      Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
        .filter(_.isDirectory).map(_.getName)
        .filterNot(_.startsWith("_")) // _rollups etc: internal, not models
        .toSet
    val all = (tables(dirA) ++ tables(dirB)).toSeq.sorted
    all.map { t =>
      val inA = tables(dirA)(t)
      val inB = tables(dirB)(t)
      def read(dir: String) = spark.read.parquet(s"$dir/$t")
      if (!inA || !inB) {
        val rows = read(if (inA) dirA else dirB).count()
        TableDiff(t, if (inA) rows else 0L, if (inB) rows else 0L,
          if (inA) rows else 0L, if (inB) rows else 0L,
          schemaChanged = true, changedKeys = None)
      } else {
        val a = read(dirA)
        val b = read(dirB)
        val schemaA = a.schema.fields.map(f => (f.name, f.dataType)).toSet
        val schemaB = b.schema.fields.map(f => (f.name, f.dataType)).toSet
        if (schemaA != schemaB)
          TableDiff(t, a.count(), b.count(), a.count(), b.count(),
            schemaChanged = true, changedKeys = None)
        else {
          val cols = a.columns.sorted.toSeq
          def hashed(df: DataFrame) = df
            .select(md5(to_json(struct(cols.map(df.apply): _*))).as("__h"))
            .groupBy("__h").count()
          val j = hashed(a).withColumnRenamed("count", "__ca")
            .join(hashed(b).withColumnRenamed("count", "__cb"), Seq("__h"), "full_outer")
            .select(
              coalesce(col("__ca"), lit(0L)).as("ca"),
              coalesce(col("__cb"), lit(0L)).as("cb"))
            .agg(
              sum(greatest(col("ca") - col("cb"), lit(0L))).as("onlyA"),
              sum(greatest(col("cb") - col("ca"), lit(0L))).as("onlyB"),
              sum(col("ca")).as("rowsA"), sum(col("cb")).as("rowsB"))
            .head()
          val changed = keys.get(t).map { kc =>
            def keyed(df: DataFrame) = df.select(
              md5(to_json(struct(kc.map(df.apply): _*))).as("__k"),
              md5(to_json(struct(cols.map(df.apply): _*))).as("__h"))
            keyed(a)
              .join(keyed(b).withColumnRenamed("__h", "__h2"), Seq("__k"))
              .filter(col("__h") =!= col("__h2")).count()
          }
          TableDiff(t,
            Option(j.getLong(0)).getOrElse(0L), Option(j.getLong(1)).getOrElse(0L),
            Option(j.getLong(2)).getOrElse(0L), Option(j.getLong(3)).getOrElse(0L),
            schemaChanged = false, changedKeys = changed)
        }
      }
    }
  }

  /** The FULL declared test set of reference fct_orders.yml /
    * fct_orders_items.yml: every unique/not_null in one aggregate scan per
    * fact (count + count-distinct fused — dbt would run one SELECT per
    * test), plus all four declared `relationships` tests. Throws on the
    * first violating table, aborting the build before the report layers —
    * the `dbt build` gate shape.
    *
    * Omitted (and the only omissions): not_null(order_clerk_name) and
    * not_null(shipping_priority) on fct_orders — the driver's source
    * parquet has no o_clerk/o_shippriority columns (SURVEY §1), so the
    * model columns they test don't exist here, like the Postgres ingest
    * path.
    *
    * Each relationships test grain-reduces the fact side FIRST
    * (`select(fk).distinct()` — a map-side-combining shuffle whose output
    * is bounded by the DIM's cardinality, not the fact's) and anti-joins
    * two dim-sized relations — at 100 TB the fact never shuffles at row
    * grain for an FK check. The six gate jobs are independent and run
    * concurrently. */
  def schemaGate(ctx: Ctx): Unit = {
    import Expectations._
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val fo = Wh.fctOrders(ctx)
    val foi = Wh.fctOrdersItems(ctx)
    def notNulls(cols: String*): Seq[Expectation] = cols.map(NotNull)

    def orphans(fact: DataFrame, fk: String, dim: DataFrame, pk: String,
        label: String): Unit = {
      val n = fact.select(col(fk)).distinct()
        .join(dim.select(col(pk).as(fk)), Seq(fk), "left_anti").count()
      require(n == 0L, s"$label: $n orphan value(s) of $fk")
    }

    val gates: Seq[() => Unit] = Seq(
      () => enforce(fo, "fct_orders", Unique("order_key") +: notNulls(
        "order_key", "order_date", "customer_key", "order_status_code",
        "order_priority_code", "gross_item_sales_amount",
        "item_discount_amount", "item_tax_amount", "net_item_sales_amount")),
      // unhex: the md5 surrogate's distinctness over 16-byte binary is the
      // same test as over the 32-char hex (hex decode is injective) at half
      // the distinct-shuffle bytes — this check sits on the build's
      // critical path (every report gates on it)
      () => enforce(foi, "fct_orders_items", Unique("unhex(order_item_key)") +: notNulls(
        "order_item_key", "order_key", "order_date", "customer_key",
        "order_status_code", "part_key", "supplier_key", "return_status_code",
        "order_line_number", "order_line_status_code", "ship_date",
        "commit_date", "receipt_date", "ship_mode_name",
        "supplier_cost_amount", "base_price", "discount_percentage",
        "discounted_price", "tax_rate", "order_item_count", "quantity",
        "gross_item_sales_amount", "discounted_item_sales_amount",
        "item_discount_amount", "item_tax_amount", "net_item_sales_amount")),
      () => orphans(fo, "customer_key", Wh.dimCustomer(ctx), "customer_key",
        "fct_orders->dim_customer"),
      () => orphans(foi, "customer_key", Wh.dimCustomer(ctx), "customer_key",
        "fct_orders_items->dim_customer"),
      () => orphans(foi, "part_key", Wh.dimPart(ctx), "part_key",
        "fct_orders_items->dim_part"),
      () => orphans(foi, "supplier_key", Wh.dimSupplier(ctx), "supplier_key",
        "fct_orders_items->dim_supplier"))

    val pool = java.util.concurrent.Executors.newFixedThreadPool(gates.size)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try Await.result(Future.sequence(gates.map(g => Future(g()))), Duration.Inf)
    finally pool.shutdown()
    ()
  }

  /** `dbt docs generate` twin — the model catalog: every dbt-surface model
    * (the Extension operators are a library, not dbt models) with its
    * materialization and fully resolved output schema. Schemas come from
    * Catalyst ANALYSIS only — nothing beyond per-source parquet footer
    * reads (1-task metadata jobs) runs — so the catalog is metadata-cheap
    * at any scale, exactly like dbt compiling models to learn their shapes
    * (ManifestSpec asserts no multi-task job runs). Inter-model dependency
    * structure is carried by
    * the materialization phases (base→ods→wh→gate→views/reports/metrics),
    * the same coarse DAG `buildAll` executes. */
  def manifest(ctx: Ctx): DataFrame = {
    import ctx.spark.implicits._
    Registry.all.toSeq.collect {
      case (name, en) if en.mat != Registry.Mat.Extension =>
        val mat = en.mat match {
          case Registry.Mat.OdsTable => "table(ods)"
          case Registry.Mat.WhTable => "table(wh)"
          case Registry.Mat.View => "view"
          case _ => "table"
        }
        val cols = en.fn(ctx).schema.fields
          .map(f => s"${f.name}:${f.dataType.simpleString}").toSeq
        (name, mat, cols)
    }.toDF("model", "materialization", "columns")
  }

  /** Write the catalog as one JSON file (the manifest.json moral twin). */
  def writeManifest(ctx: Ctx, path: String): Unit =
    manifest(ctx).coalesce(1).write.mode("overwrite").json(path)
}
