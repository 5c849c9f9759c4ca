package graft

import org.apache.spark.sql.types._

/** Drift guard for the driver-generated testdata (verdict r5 item 5).
  *
  * The testdata is regenerated between rounds and its physical encodings
  * have drifted before — `events.ts` shipped as parquet TIMESTAMP(NANOS)
  * in one generation and `timestamp[us]` in the next, which silently
  * killed 12 queries, the streaming bench leg, and 3 suites in round 5.
  * This spec pins the ENGINE-NORMALIZED schema of every table `Ctx.tbl`
  * serves (after [[Ctx.normalizedEvents]] etc.), at every scale factor on
  * disk: the next drift fails here with one clear message instead of as a
  * dozen opaque analysis errors.
  *
  * Only the columns queries actually depend on are pinned, by (name ->
  * accepted types); extra columns or a wider decimal don't fail the build,
  * a type the engine can't serve does.
  */
class TestdataSchemaSpec extends SparkSpec {

  // columns the query surface does arithmetic/joins on, with the engine
  // contract each must satisfy after Ctx normalization
  private val intLike: Set[DataType] = Set(LongType, IntegerType)
  private val dateLike: Set[DataType] =
    Set(DateType, TimestampType, TimestampNTZType)
  private val numLike: Set[DataType] =
    Set(DoubleType, FloatType) // decimals would also work, but pin what ships

  private val contract: Map[String, Map[String, Set[DataType]]] = Map(
    "region" -> Map("r_regionkey" -> intLike),
    "nation" -> Map("n_nationkey" -> intLike, "n_regionkey" -> intLike),
    "customer" -> Map("c_custkey" -> intLike, "c_nationkey" -> intLike,
      "c_acctbal" -> numLike),
    "supplier" -> Map("s_suppkey" -> intLike, "s_nationkey" -> intLike,
      "s_acctbal" -> numLike),
    "part" -> Map("p_partkey" -> intLike, "p_size" -> intLike,
      "p_retailprice" -> numLike),
    "orders" -> Map("o_orderkey" -> intLike, "o_custkey" -> intLike,
      "o_totalprice" -> numLike, "o_orderdate" -> dateLike),
    "lineitem" -> Map("l_orderkey" -> intLike, "l_partkey" -> intLike,
      "l_suppkey" -> intLike, "l_quantity" -> numLike,
      "l_extendedprice" -> numLike, "l_discount" -> numLike,
      "l_tax" -> numLike, "l_shipdate" -> dateLike),
    "documents" -> Map("doc_id" -> intLike, "n_chars" -> intLike),
    // the whole events surface does exact integer nanosecond arithmetic:
    // ts MUST arrive as epoch-nanos BIGINT whatever the parquet says
    "events" -> Map("event_id" -> intLike, "ts" -> Set[DataType](LongType),
      "user_id" -> intLike, "value" -> numLike),
    "embeddings" -> Map("vec_id" -> intLike,
      "embedding" -> Set[DataType](ArrayType(FloatType, containsNull = true),
        ArrayType(FloatType, containsNull = false))))

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"$sf: every served table matches the engine schema contract") {
      val c = Ctx(spark, s"/root/testdata/$sf")
      val problems = contract.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
        val schema = c.tbl(table).schema
        cols.toSeq.sortBy(_._1).flatMap { case (name, accepted) =>
          schema.fields.find(_.name == name) match {
            case None => Seq(s"$table.$name: MISSING (testdata drift?)")
            case Some(f) if !accepted.contains(f.dataType) =>
              Seq(s"$table.$name: ${f.dataType} not in ${accepted.mkString("{", ", ", "}")}")
            case _ => Nil
          }
        }
      }
      assert(problems.isEmpty,
        "testdata schema drift detected:\n  " + problems.mkString("\n  "))
    }
  }

  test("events ts normalization yields identical epoch seconds to the raw file") {
    // belt and braces: whatever encoding the file uses, the normalized
    // nano count floored to seconds must equal Spark's own reading of the
    // raw column interpreted as UTC
    import org.apache.spark.sql.functions._
    val c = Ctx(spark, "/root/testdata/sf0.001")
    val normalized = c.tbl("events")
      .select(col("event_id"), expr("ts div 1000000000").as("sec"))
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val rawSec = raw.schema("ts").dataType match {
      case LongType => raw.select(col("event_id"), expr("ts div 1000000000").as("sec"))
      case _ => raw.select(col("event_id"),
        expr("unix_micros(cast(ts as timestamp)) div 1000000").as("sec"))
    }
    assert(normalized.except(rawSec).isEmpty && rawSec.except(normalized).isEmpty)
  }
}
