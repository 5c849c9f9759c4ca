package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives for joins on hot keys.
  *
  * TPC-H keys are uniform, but a 100 TB production corpus's keys are not
  * (one customer, one document source, one null-ish default can carry
  * percent-level mass). Two lines of defence at cluster scale:
  *
  *  1. AQE skew-join (spark.sql.adaptive.skewJoin.*) — the runtime splits an
  *     oversized shuffle partition and replicates the matching build side;
  *     zero code changes, first choice. Proven in SkewSpec.
  *  2. Manual salting (this object) — for engines/paths AQE cannot rewrite
  *     (e.g. a skewed aggregation feeding a non-shuffle consumer) or skew so
  *     extreme a single key exceeds one executor: spread the hot key over
  *     `salts` sub-keys on the big side and replicate the small side once
  *     per salt, turning one hot reducer into `salts` even ones.
  */
object Skew {

  /** Deterministic per-row salt in [0, salts): a hash of the whole row, so
    * a hot key's rows spread evenly and re-runs assign identically. */
  def saltCol(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(df.columns.map(col): _*), lit(salts.toLong)).cast("int")

  /** Equi-join `facts ⋈ dim` on `key`, salted: the fact side gets a
    * deterministic salt, the dim side is replicated once per salt value, and
    * the join key becomes (key, salt) — the hot key's rows land on `salts`
    * different reducers instead of one. Result is identical to the unsalted
    * join (every fact row still meets exactly its dim row). */
  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    val sf = facts.withColumn("__skew_salt", saltCol(facts, salts))
    val sd = dim.withColumn("__skew_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    sf.join(sd, Seq(key, "__skew_salt")).drop("__skew_salt")
  }
}
