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

  /** Relative cost rank for LPT submission order in the report phase —
    * from the measured per-model wall times of the SF10 replica build
    * (heaviest ≈ 300 s, lightest ≈ 30 s; the ranking, not the absolute
    * numbers, is what scheduling needs, and it is stable across scale
    * factors because it tracks each model's input grain). Models not
    * listed are light and run last in registry order. */
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
    def phase(label: String, models: Seq[(String, DataFrame)],
        housekeeping: Boolean): Seq[BuildResult] = {
      val results = Await.result(
        Future.sequence(models.map { case (n, df) =>
          Future(write(n, df, housekeeping))
        }),
        Duration.Inf)
      // Write-through at the phase barrier: later phases read each model's
      // WRITTEN parquet (dbt's execution model — children select from the
      // parent's materialized table), and the in-build persisted copy is
      // freed. Without this a cold SF10 build holds every table twice
      // (output parquet + block-manager blocks) and overruns local disk.
      // Housekeeping columns are dropped from the swapped relation so
      // downstream consumers see the exact pre-write schema.
      // With cacheParents the swap is skipped: the Store keeps the persisted
      // relation the writer just materialized, and children read memory.
      if (!cacheParents) results.foreach { r =>
        Store.swap(ctx, r.table, {
          val pq = ctx.spark.read.parquet(r.path)
          if (housekeeping) pq.drop("dbt_batch_id", "dbt_batch_ts") else pq
        })
      }
      buildLog(f"[build] +$rel%7.1f  === phase $label done (${results.size} models)")
      results
    }

    try {
      // ods layer (dbt `table`, no housekeeping — dbt_project.yml:31-32)
      val ods = phase("ods", Seq(
        "customers" -> Ods.customers(ctx), "nations" -> Ods.nations(ctx),
        "regions" -> Ods.regions(ctx), "parts" -> Ods.parts(ctx),
        "suppliers" -> Ods.suppliers(ctx), "orders" -> Ods.orders(ctx),
        "orders_items" -> Ods.ordersItems(ctx),
        "parts_suppliers" -> Ods.partsSuppliers(ctx)), housekeeping = false)

      // wh layer (dbt `table` with housekeeping — dbt_project.yml:33-34)
      val wh = phase("wh", Seq(
        "dim_customer" -> Wh.dimCustomer(ctx),
        "dim_supplier" -> Wh.dimSupplier(ctx),
        "dim_part" -> Wh.dimPart(ctx),
        "dim_part_supplier_xrf" -> Wh.dimPartSupplierXrf(ctx),
        "fct_orders" -> Wh.fctOrders(ctx),
        "fct_orders_items" -> Wh.fctOrdersItems(ctx),
        "rpt_pricing_summary" -> Wh.rptPricingSummary(ctx),
        "rpt_minimum_cost_suppliers" -> Wh.rptMinimumCostSuppliers(ctx)),
        housekeeping = true)

      // schema-test gate (reference fct_orders.yml / fct_orders_items.yml):
      // violations abort the build before the reporting layers. The gate
      // runs CONCURRENTLY with the rollup precomputation below — rollups
      // are internal (not public models; nothing outside the build reads
      // _rollups/), so starting them under a still-running gate publishes
      // nothing; the await before the report phase preserves the dbt
      // semantics (no report materializes until the tests pass).
      val gateF = Future(schemaGate(ctx))

      // shared rollup boundary (layers.Rollups — the dbt table-layer reuse
      // twin): materialize each fact-grain rollup once, concurrently, so
      // the report fan-out below aggregates grain-reduced relations instead
      // of ~20 independent fact scans. Written under _rollups/ (a bucketed
      // write at cluster scale) and write-through-swapped like every other
      // phase, so the ~20 consumers scan compressed columnar parquet with
      // column pruning instead of a second block-manager copy. Not part of
      // the public 50-table build contract — kept out of the returned list.
      Await.result(
        Future.sequence(Rollups.all(ctx).map { case (n, df) =>
          Future {
            val path = s"$outDir/_rollups/$n"
            df.write.mode("overwrite").parquet(path)
            if (!cacheParents) Store.swap(ctx, n, ctx.spark.read.parquet(path))
            ()
          }
        }),
        Duration.Inf)
      Await.result(gateF, Duration.Inf)
      buildLog(f"[build] +$rel%7.1f  === schema gate + rollups done")

      // metrics + reports layers (dbt `table`, no housekeeping); intermediate
      // models stay views (dbt_project.yml:35-36) and extension operators are
      // not dbt models — selected via the Registry materialization tag.
      // LPT order: models within a phase are independent, so submission
      // order is free — heaviest first minimizes the makespan (classic
      // longest-processing-time scheduling). Without it the SF10 build's
      // report phase ended on a tail of 300s models that had queued behind
      // 30s ones.
      val reports = phase("reports",
        Registry.all.iterator
          .collect { case (n, en) if en.mat == Registry.Mat.Table =>
            n -> en.fn(ctx)
          }.toSeq
          .sortBy { case (n, _) => -reportWeight.getOrElse(n, 0) },
        housekeeping = false)

      ods ++ wh ++ reports
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
      () => enforce(foi, "fct_orders_items", Unique("order_item_key") +: notNulls(
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
