package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic synthetic-table source (DataSource V2) — the §2.1 custom
  * SOURCE counterpart to the custom operators: benchmark data at ANY scale
  * factor without writing a byte to storage.
  *
  *   spark.read.format("graft-synth")
  *     .option("table", "lineitem").option("sf", "10")
  *     .option("partitions", "64").load()
  *
  * Design for the 100 TB case:
  *  - one InputPartition per row range, generated independently — scan
  *    parallelism is the `partitions` option, no driver-side materialization
  *    and no storage at all (a SF10k bench needs zero disk);
  *  - row content is a pure function of the global row id (splitmix64
  *    mixing), so the SAME rows appear whatever the partition count — a
  *    re-run, a different cluster width, or a retried task always sees
  *    identical data (the property object stores have and Random does not);
  *  - column pruning is pushed INTO the generator
  *    (SupportsPushDownRequiredColumns): unprojected columns are never even
  *    computed — the source-side twin of parquet ReadSchema pruning;
  *  - LIMIT is pushed down (SupportsPushDownLimit): `.load().limit(1000)`
  *    generates at most `limit` rows per partition instead of the full SF
  *    (Spark still applies the final exact limit).
  *
  * The row distributions are TPC-H-flavored (uniform keys, money in cents,
  * dates over 1995–2001) — shaped for engine benchmarking, not a dbgen
  * replacement (reference scripts/generate_data.py:38-46 uses DuckDB's
  * dbgen; this source exists so scale tests need no pre-generated data).
  */
class Synth extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-synth"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Synth.schemaFor(options.getOrDefault("table", "lineitem"))
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new SynthTable(
      opts.getOrDefault("table", "lineitem"),
      opts.getDouble("sf", 0.01),
      opts.getInt("partitions", 32))
  }
}

object Synth {
  /** Lines per order is FIXED at 4 (6M lineitem / 1.5M orders at SF1), so
    * (l_orderkey, l_linenumber) = (rowId / 4 + 1, rowId % 4 + 1) is unique —
    * the property the ods surrogate key and the build's schema gate require
    * (TPC-H lineitem is unique on that pair). */
  val LinesPerOrder = 4L

  /** SF1 row counts (reference scripts/generate_data.py:24: SF1 ≈ 6M
    * lineitem); other tables in TPC-H proportion. nation/region are fixed
    * dimensions at every scale factor, exactly like TPC-H. */
  def rowsFor(table: String, sf: Double): Long = table match {
    case "lineitem" => (6000000L * sf).toLong.max(1L)
    case "orders"   => (1500000L * sf).toLong.max(1L)
    case "customer" => (150000L * sf).toLong.max(1L)
    case "part"     => (200000L * sf).toLong.max(1L)
    case "supplier" => (10000L * sf).toLong.max(1L)
    case "nation"   => 25L
    case "region"   => 5L
    // extension tables in testdata proportion (TESTDATA.md: sf0.1 ships
    // 100k events / 5k documents / 2k embeddings) — the at-scale bench
    // path for the LLM-pipeline operators (dedup, ANN, sessionize)
    case "events"     => (1000000L * sf).toLong.max(1L)
    case "documents"  => (50000L * sf).toLong.max(1L)
    // same corpus size/schema as documents, production-shaped vocabulary —
    // see the colValue comment
    case "documents_zipf" => (50000L * sf).toLong.max(1L)
    case "embeddings" => (20000L * sf).toLong.max(1L)
    // same corpus size/schema as embeddings, different planted geometry —
    // see the colValue comment
    case "embeddings_manifold" => (20000L * sf).toLong.max(1L)
    case _ => throw new IllegalArgumentException(s"unknown synth table: $table")
  }

  def schemaFor(table: String): StructType = table match {
    case "lineitem" => StructType(Seq(
      StructField("l_orderkey", LongType, nullable = false),
      StructField("l_partkey", LongType, nullable = false),
      StructField("l_suppkey", LongType, nullable = false),
      StructField("l_linenumber", IntegerType, nullable = false),
      StructField("l_quantity", DoubleType, nullable = false),
      StructField("l_extendedprice", DoubleType, nullable = false),
      StructField("l_discount", DoubleType, nullable = false),
      StructField("l_tax", DoubleType, nullable = false),
      StructField("l_returnflag", StringType, nullable = false),
      StructField("l_linestatus", StringType, nullable = false),
      StructField("l_shipdate", DateType, nullable = false)))
    case "orders" => StructType(Seq(
      StructField("o_orderkey", LongType, nullable = false),
      StructField("o_custkey", LongType, nullable = false),
      StructField("o_orderstatus", StringType, nullable = false),
      StructField("o_totalprice", DoubleType, nullable = false),
      StructField("o_orderdate", DateType, nullable = false),
      StructField("o_orderpriority", StringType, nullable = false)))
    case "customer" => StructType(Seq(
      StructField("c_custkey", LongType, nullable = false),
      StructField("c_name", StringType, nullable = false),
      StructField("c_nationkey", LongType, nullable = false),
      StructField("c_acctbal", DoubleType, nullable = false),
      StructField("c_mktsegment", StringType, nullable = false)))
    case "supplier" => StructType(Seq(
      StructField("s_suppkey", LongType, nullable = false),
      StructField("s_name", StringType, nullable = false),
      StructField("s_nationkey", LongType, nullable = false),
      StructField("s_acctbal", DoubleType, nullable = false)))
    case "part" => StructType(Seq(
      StructField("p_partkey", LongType, nullable = false),
      StructField("p_name", StringType, nullable = false),
      StructField("p_brand", StringType, nullable = false),
      StructField("p_type", StringType, nullable = false),
      StructField("p_size", IntegerType, nullable = false),
      StructField("p_retailprice", DoubleType, nullable = false)))
    case "nation" => StructType(Seq(
      StructField("n_nationkey", LongType, nullable = false),
      StructField("n_name", StringType, nullable = false),
      StructField("n_regionkey", LongType, nullable = false)))
    case "region" => StructType(Seq(
      StructField("r_regionkey", LongType, nullable = false),
      StructField("r_name", StringType, nullable = false)))
    // `ts` is ALREADY the engine-normalized epoch-nanos BIGINT: the synth
    // path bypasses Ctx.normalizedEvents (that chokepoint decodes parquet
    // encodings; there is no parquet here), so the generator emits the
    // post-normalization shape every events_* plan consumes directly.
    case "events" => StructType(Seq(
      StructField("event_id", LongType, nullable = false),
      StructField("ts", LongType, nullable = false),
      StructField("user_id", LongType, nullable = false),
      StructField("event_type", StringType, nullable = false),
      StructField("value", DoubleType, nullable = false),
      StructField("props", StringType, nullable = false)))
    case "documents" | "documents_zipf" => StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = false),
      StructField("lang", StringType, nullable = false),
      StructField("source", StringType, nullable = false),
      StructField("n_chars", LongType, nullable = false)))
    case "embeddings" | "embeddings_manifold" => StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false),
        nullable = false),
      StructField("label", IntegerType, nullable = false)))
    case _ => throw new IllegalArgumentException(s"unknown synth table: $table")
  }

  /** splitmix64: full-period mixer; (rowId, column ordinal) -> iid uniform
    * 64-bit stream. Pure, so any partition regenerates any row. */
  def mix(rowId: Long, salt: Long): Long = {
    var z = rowId * 0x9E3779B97F4A7C15L + salt * 0xBF58476D1CE4E5B9L + 0x94D049BB133111EBL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def u(rowId: Long, salt: Long, n: Long): Long =
    java.lang.Long.remainderUnsigned(mix(rowId, salt), n)

  /** 1995-01-01 .. 2001-08-01 in days-since-epoch (matches testdata span). */
  private val dateLo = java.time.LocalDate.of(1995, 1, 1).toEpochDay.toInt
  private val dateHi = java.time.LocalDate.of(2001, 8, 1).toEpochDay.toInt

  private val flags = Array("A", "N", "R").map(UTF8String.fromString)
  private val priorities = Array("1-URGENT", "2-HIGH", "3-MEDIUM",
    "4-NOT SPECIFIED", "5-LOW").map(UTF8String.fromString)
  private val lineStatuses = Array("F", "O").map(UTF8String.fromString)
  private val orderStatuses = Array("F", "O", "P").map(UTF8String.fromString)
  private val segments = Array("AUTOMOBILE", "BUILDING", "FURNITURE",
    "HOUSEHOLD", "MACHINERY").map(UTF8String.fromString)
  // public TPC-H spec dimension rows (spec 4.2.3: fixed nation → region map)
  private val regions = Array("AFRICA", "AMERICA", "ASIA", "EUROPE",
    "MIDDLE EAST").map(UTF8String.fromString)
  private val nations: Array[(UTF8String, Long)] = Array(
    "ALGERIA" -> 0L, "ARGENTINA" -> 1L, "BRAZIL" -> 1L, "CANADA" -> 1L,
    "EGYPT" -> 4L, "ETHIOPIA" -> 0L, "FRANCE" -> 3L, "GERMANY" -> 3L,
    "INDIA" -> 2L, "INDONESIA" -> 2L, "IRAN" -> 4L, "IRAQ" -> 4L,
    "JAPAN" -> 2L, "JORDAN" -> 4L, "KENYA" -> 0L, "MOROCCO" -> 0L,
    "MOZAMBIQUE" -> 0L, "PERU" -> 1L, "CHINA" -> 2L, "ROMANIA" -> 3L,
    "RUSSIA" -> 3L, "SAUDI ARABIA" -> 4L, "UNITED KINGDOM" -> 3L,
    "UNITED STATES" -> 1L, "VIETNAM" -> 2L)
    .map { case (n, r) => (UTF8String.fromString(n), r) }
  // TPC-H p_type syllable grid (spec 4.2.2.13): 6 × 5 × 5 = 150 types
  private val typeS1 = Array("STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO")
  private val typeS2 = Array("ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED")
  private val typeS3 = Array("TIN", "NICKEL", "BRASS", "STEEL", "COPPER")
  private val partTypes: Array[UTF8String] =
    (for (a <- typeS1; b <- typeS2; c <- typeS3)
      yield UTF8String.fromString(s"$a $b $c")).toArray
  private val partColors = Array("almond", "antique", "aquamarine", "azure",
    "beige", "bisque", "black", "blanched", "blue", "blush", "brown",
    "burlywood", "burnished", "chartreuse", "chiffon", "chocolate", "coral",
    "cornflower", "cornsilk", "cream", "cyan", "dark", "deep", "dim",
    "dodger", "drab", "firebrick", "floral", "forest", "frosted", "gainsboro",
    "ghost", "goldenrod", "green", "grey", "honeydew", "hot", "indian",
    "ivory", "khaki")

  /** Value of column `name` for global row `rowId` — money lands on cent
    * values (up to IEEE representation) so a decimal(16,4) cast recovers
    * the intended amount losslessly. */
  def colValue(table: String, name: String, rowId: Long, sf: Double): Any =
    (table, name) match {
      // unique (orderkey, linenumber): 4 consecutive rows form one order
      case ("lineitem", "l_orderkey")   => rowId / LinesPerOrder + 1L
      case ("lineitem", "l_linenumber") => (rowId % LinesPerOrder + 1L).toInt
      case ("lineitem", "l_partkey")    => u(rowId, 2, rowsFor("part", sf)) + 1L
      // TPC-H 4.2.3: each part is supplied by exactly 4 suppliers,
      // ps_suppkey = (partkey + i*(S/4)) % S + 1 for i in 0..3. An
      // independent uniform draw here made DISTINCT (l_partkey, l_suppkey)
      // — the synthesized partsupp grain — balloon to ~|lineitem| (60M at
      // SF10 vs TPC-H's 4x|part| = 8M), inflating every partsupp-derived
      // model ~7.5x over the reference workload the bench claims to twin.
      case ("lineitem", "l_suppkey") =>
        val part = u(rowId, 2, rowsFor("part", sf)) + 1L
        val s = rowsFor("supplier", sf)
        val i = u(rowId, 3, 4L)
        (part + i * (s / 4).max(1L)) % s + 1L
      case ("lineitem", "l_quantity")   => (u(rowId, 5, 50L) + 1L).toDouble
      case ("lineitem", "l_extendedprice") => (u(rowId, 6, 9999900L) + 100L) / 100.0
      case ("lineitem", "l_discount")   => u(rowId, 7, 11L) / 100.0
      case ("lineitem", "l_tax")        => u(rowId, 15, 9L) / 100.0
      case ("lineitem", "l_returnflag") => flags(u(rowId, 8, 3L).toInt)
      case ("lineitem", "l_linestatus") => lineStatuses(u(rowId, 16, 2L).toInt)
      // shipdate = this line's order date + 1..121 days, the TPC-H dbgen
      // relationship — derived by recomputing o_orderdate's formula at the
      // order's rowId (l_orderkey - 1), so lineitem needs no join to stay
      // date-coherent; keep the salt-13 formula in lockstep with o_orderdate
      case ("lineitem", "l_shipdate") =>
        val orderDate = dateLo + u(rowId / LinesPerOrder, 13, (dateHi - dateLo).toLong)
        (orderDate + 1L + u(rowId, 9, 121L)).toInt
      case ("orders", "o_orderkey")     => rowId + 1L
      case ("orders", "o_custkey")      => u(rowId, 11, rowsFor("customer", sf)) + 1L
      case ("orders", "o_orderstatus")  => orderStatuses(u(rowId, 17, 3L).toInt)
      case ("orders", "o_totalprice")   => (u(rowId, 12, 49999900L) + 100L) / 100.0
      case ("orders", "o_orderdate")    => (dateLo + u(rowId, 13, (dateHi - dateLo).toLong)).toInt
      case ("orders", "o_orderpriority") => priorities(u(rowId, 14, 5L).toInt)
      case ("customer", "c_custkey")    => rowId + 1L
      case ("customer", "c_name") =>
        UTF8String.fromString(f"Customer#${rowId + 1}%09d")
      case ("customer", "c_nationkey")  => u(rowId, 18, 25L)
      case ("customer", "c_acctbal")    => (u(rowId, 19, 1099999L) - 99999L) / 100.0
      case ("customer", "c_mktsegment") => segments(u(rowId, 20, 5L).toInt)
      case ("supplier", "s_suppkey")    => rowId + 1L
      case ("supplier", "s_name") =>
        UTF8String.fromString(f"Supplier#${rowId + 1}%09d")
      case ("supplier", "s_nationkey")  => u(rowId, 21, 25L)
      case ("supplier", "s_acctbal")    => (u(rowId, 22, 1099999L) - 99999L) / 100.0
      case ("part", "p_partkey")        => rowId + 1L
      case ("part", "p_name") =>
        val a = partColors(u(rowId, 23, partColors.length.toLong).toInt)
        val b = partColors(u(rowId, 24, partColors.length.toLong).toInt)
        UTF8String.fromString(s"$a $b")
      case ("part", "p_brand") =>
        UTF8String.fromString(
          s"Brand#${u(rowId, 25, 5L) + 1}${u(rowId, 26, 5L) + 1}")
      case ("part", "p_type")           => partTypes(u(rowId, 27, partTypes.length.toLong).toInt)
      case ("part", "p_size")           => (u(rowId, 28, 50L) + 1L).toInt
      case ("part", "p_retailprice")    => (90000L + u(rowId, 29, 110000L)) / 100.0
      case ("nation", "n_nationkey")    => rowId
      case ("nation", "n_name")         => nations(rowId.toInt)._1
      case ("nation", "n_regionkey")    => nations(rowId.toInt)._2
      case ("region", "r_regionkey")    => rowId
      case ("region", "r_name")         => regions(rowId.toInt)

      case ("events", "event_id")   => rowId + 1L
      // epoch-nanos over the testdata's 30-day window (2024-01); second
      // resolution plus a sub-second jitter so ordering ties are rare
      case ("events", "ts") =>
        (eventsEpochLo + u(rowId, 40, 30L * 86400) * 1000000000L
          + u(rowId, 41, 1000000000L))
      case ("events", "user_id")    => u(rowId, 42, (15000 * sf).toLong.max(1L))
      case ("events", "event_type") => eventTypes(u(rowId, 43, 5L).toInt)
      case ("events", "value")      => (u(rowId, 44, 49000L) + 1L) / 100.0
      case ("events", "props") =>
        UTF8String.fromString(s"""{"k": ${u(rowId, 45, 100L)}}""")

      case ("documents", "doc_id")  => rowId + 1L
      case ("documents", "text")    => UTF8String.fromString(docText(rowId))
      // lang labels the TEXT, so a near-duplicate inherits its leader's
      // language along with its word sequence
      case ("documents", "lang")    => docLangs(docLangIx(docSeed(rowId)))
      case ("documents", "source") =>
        UTF8String.fromString(s"src${u(rowId, 51, 20L)}")
      case ("documents", "n_chars") => docText(rowId).length.toLong

      // documents_zipf: the PRODUCTION-vocabulary text corpus. The plain
      // `documents` table draws from a ~66-word fixed vocabulary, which is
      // right for langid/dedup semantics but degenerate for frequency
      // operators: every token is a heavy hitter, so a candidate filter
      // prunes nothing (PERF_NOTES_r10.md §2 finding 1 — the committed
      // heavy-hitters ratio characterized exactly that corpus). Here each
      // word is drawn Zipf(s≈1) from a 1M-token vocabulary (inverse-CDF of
      // the continuous approximation: rank = exp(u·ln(V+1)) - 1), the
      // shape real corpora have: ~36 tokens clear the 0.2% heavy-hitter
      // threshold, a cap-8192 sketch's candidates cover ~65% of token
      // mass, and the long tail is genuinely high-cardinality.
      case ("documents_zipf", "doc_id")  => rowId + 1L
      case ("documents_zipf", "text")    => UTF8String.fromString(zipfText(rowId))
      case ("documents_zipf", "lang")    => docLangs(0)
      case ("documents_zipf", "source") =>
        UTF8String.fromString(s"src${u(rowId, 51, 20L)}")
      case ("documents_zipf", "n_chars") => zipfText(rowId).length.toLong

      case ("embeddings", "vec_id") => rowId + 1L
      case ("embeddings", "label")  => u(rowId, 60, 10L).toInt
      // label-centered cluster + per-row noise: gives IVF/LSH/kNN benches
      // real cluster structure instead of isotropic noise
      case ("embeddings", "embedding") =>
        val label = u(rowId, 60, 10L)
        val arr = new Array[Any](64)
        var d = 0
        while (d < 64) {
          val center = (mix(label * 64L + d, 61) % 2000L) / 1000.0f
          val noise = (mix(rowId, 200L + d) % 1000L) / 5000.0f
          arr(d) = center + noise
          d += 1
        }
        new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)

      case ("embeddings_manifold", "vec_id") => rowId + 1L
      case ("embeddings_manifold", "label")  => u(rowId, 60, 10L).toInt
      // cluster center + LOW-RANK local structure + small noise: x_d =
      // center(label,d) + Σ_{j<4} t_j(row)·U(label,j,d) + ε_d. Real
      // embedding models place points near a low-dimensional manifold
      // inside each cluster; the plain `embeddings` corpus is center + iid
      // noise, where intra-cluster rank is pure noise alignment and NO
      // quantized index can learn it (BENCH_ANN r9: cell_recall 0.994,
      // end recall 0.307 — all loss in the unlearnable ADC stage). Here
      // the within-cluster variance is dominated by 4 per-cluster basis
      // directions (|manifold| ~0.5 vs |ε| <0.05), so residual-PQ books
      // CAN code it — the regime a production IVFADC actually serves.
      case ("embeddings_manifold", "embedding") =>
        val label = u(rowId, 60, 10L)
        val arr = new Array[Any](64)
        val t = new Array[Double](4)
        var j = 0
        while (j < 4) { t(j) = (mix(rowId, 300L + j) % 1000L) / 1000.0; j += 1 }
        var d = 0
        while (d < 64) {
          val center = (mix(label * 64L + d, 61) % 2000L) / 1000.0
          var manifold = 0.0
          j = 0
          while (j < 4) {
            manifold += t(j) * ((mix(label * 256L + j * 64L + d, 62) % 1000L) / 2000.0)
            j += 1
          }
          val noise = (mix(rowId, 400L + d) % 1000L) / 20000.0
          arr(d) = (center + manifold + noise).toFloat
          d += 1
        }
        new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)

      case other => throw new IllegalArgumentException(s"unknown column: $other")
    }

  private val eventsEpochLo: Long =
    java.time.LocalDate.of(2024, 1, 1).toEpochDay * 86400L * 1000000000L
  private val eventTypes = Array("click", "signup", "error", "view",
    "purchase").map(UTF8String.fromString)

  private val docLangs = Array("en", "de", "fr").map(UTF8String.fromString)
  // 80% en, 10% de, 10% fr — testdata-like dominance
  private def docLangIx(rowId: Long): Int = {
    val r = u(rowId, 50, 10L); if (r < 8) 0 else if (r < 9) 1 else 2
  }
  // per-language vocab: the engine's language-ID stopwords (Text.languageId)
  // plus shared content words, so langid/quality/token ops behave like they
  // do on the real corpus
  private val docVocabs: Array[Array[String]] = Array(
    Array("the", "and", "of", "to", "in", "is", "that", "it", "for",
      "table", "query", "scan", "join", "window", "batch", "stream",
      "row", "column", "value", "key", "hash", "sort", "merge", "filter"),
    Array("der", "die", "und", "das", "ist", "nicht", "mit", "ein",
      "tabelle", "abfrage", "scan", "join", "fenster", "stapel", "strom",
      "zeile", "spalte", "wert", "sort", "filter", "auf", "sie", "gross", "klein"),
    Array("le", "la", "les", "et", "un", "une", "est", "pour",
      "table", "requete", "scan", "jointure", "fenetre", "lot", "flux",
      "ligne", "colonne", "valeur", "cle", "tri", "filtre", "dans", "que", "grand"))

  /** Deterministic doc body. 20% of docs are NEAR-DUPLICATES of their
    * decade-leader (same word sequence, one word perturbed) and leaders
    * recur, so exact/MinHash/SimHash dedup finds real structure at any SF —
    * a generator without planted duplicates benches dedup on noise. */
  private def docIsDup(rowId: Long): Boolean =
    rowId % 10L != 0L && u(rowId, 53, 10L) < 2L
  private def docSeed(rowId: Long): Long =
    if (docIsDup(rowId)) rowId - (rowId % 10L) else rowId

  private val ZipfVocab = 1000000L
  private val zipfLogV = math.log(ZipfVocab.toDouble + 1.0)

  /** Zipf(s≈1) rank draw over [0, ZipfVocab): u uniform in [0,1) from the
    * splitmix stream, rank = ⌊exp(u·ln(V+1))⌋ - 1 — the inverse CDF of the
    * continuous Zipf approximation (P(rank k) ∝ 1/(k+1)). Deterministic
    * per (rowId, salt) like every other synth column. */
  private def zipfRank(rowId: Long, salt: Long): Long = {
    val uu = (mix(rowId, salt) >>> 11).toDouble / (1L << 53).toDouble
    val k = math.exp(uu * zipfLogV).toLong - 1L
    if (k < 0L) 0L else if (k >= ZipfVocab) ZipfVocab - 1L else k
  }

  private def zipfText(rowId: Long): String = {
    val nWords = 30 + u(rowId, 152, 40L).toInt
    val sb = new java.lang.StringBuilder(nWords * 8)
    var j = 0
    while (j < nWords) {
      if (j > 0) sb.append(' ')
      sb.append('w')
      sb.append(zipfRank(rowId, 500L + j))
      j += 1
    }
    sb.toString
  }

  private def docText(rowId: Long): String = {
    val isDup = docIsDup(rowId)
    val seed = docSeed(rowId)
    val langIx = docLangIx(seed)
    val vocab = docVocabs(langIx)
    val nWords = 30 + u(seed, 52, 40L).toInt
    val sb = new java.lang.StringBuilder(nWords * 7)
    var j = 0
    while (j < nWords) {
      if (j > 0) sb.append(' ')
      sb.append(vocab(u(seed, 100L + j, vocab.length.toLong).toInt))
      j += 1
    }
    if (isDup) { sb.append(' '); sb.append(vocab(u(rowId, 54, vocab.length.toLong).toInt)) }
    sb.toString
  }
}

private class SynthTable(table: String, sf: Double, partitions: Int)
  extends Table with SupportsRead {
  override def name(): String = s"synth_${table}_sf$sf"
  override def schema(): StructType = Synth.schemaFor(table)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(table, sf, partitions)
}

private class SynthScanBuilder(table: String, sf: Double, partitions: Int)
  extends ScanBuilder
  with SupportsPushDownRequiredColumns with SupportsPushDownLimit {
  private var required: StructType = Synth.schemaFor(table)
  private var limit: Long = Long.MaxValue

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // partial pushdown: each partition stops after `limit` rows; Spark still
  // applies the exact global limit above (hence `false`)
  override def pushLimit(n: Int): Boolean = { limit = n.toLong; false }

  override def build(): Scan =
    new SynthScan(table, sf, partitions, required, limit)
}

private case class SynthInputPartition(start: Long, end: Long) extends InputPartition

private class SynthScan(
    table: String, sf: Double, partitions: Int,
    required: StructType, limit: Long)
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-synth $table sf=$sf cols=${required.fieldNames.mkString(",")}" +
      (if (limit != Long.MaxValue) s" limit=$limit" else "")

  override def planInputPartitions(): Array[InputPartition] = {
    val total = Synth.rowsFor(table, sf)
    val p = math.max(1, math.min(partitions.toLong, total)).toInt
    (0 until p).map { i =>
      val start = total * i / p
      val end = total * (i + 1) / p
      // guard the cap against Long overflow when no limit was pushed
      val cap = if (limit >= end - start) end else start + limit
      SynthInputPartition(start, cap)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    SynthReaderFactory(table, sf, required.fieldNames.toSeq)
}

private case class SynthReaderFactory(table: String, sf: Double, cols: Seq[String])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val sp = partition.asInstanceOf[SynthInputPartition]
    new PartitionReader[InternalRow] {
      private var row = sp.start - 1
      override def next(): Boolean = { row += 1; row < sp.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(cols.map(c => Synth.colValue(table, c, row, sf)))
      override def close(): Unit = ()
    }
  }
}
