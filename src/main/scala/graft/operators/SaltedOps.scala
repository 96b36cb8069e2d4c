package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation operators (the "salting for skew" leg of the 100 TB
  * posture): when one grouping/join key holds a disproportionate share of
  * rows, a single reducer becomes the stage's critical path and can OOM.
  * Salting splits each hot key across `salts` reducers with a two-phase
  * aggregate, trading one extra (tiny) shuffle for bounded per-task state.
  *
  * AQE's skew-join handling covers sort-merge JOINS at runtime; these
  * helpers cover aggregation skew, which AQE does not repartition away.
  * Results are exactly equal to the direct aggregation (asserted in
  * SaltedOpsSpec) because count/sum are associative — the only aggregates
  * offered here.
  */
object SaltedOps {

  /** Two-phase salted count/sum per key: phase 1 aggregates (key, salt)
    * across `salts`-way split partials; phase 2 combines the ≤ salts rows
    * per key. Deterministic salt (hash of monotonic id) keeps runs
    * reproducible.
    */
  def saltedAgg(df: DataFrame, key: Column, value: Column, salts: Int = 16): DataFrame = {
    val salted = df.select(key.as("k"), value.as("v"))
      .withColumn("salt", pmod(hash(monotonically_increasing_id()), lit(salts)))
    salted
      .groupBy(col("k"), col("salt"))
      .agg(count(lit(1)).as("pc"), sum(col("v")).as("ps"))
      .groupBy(col("k"))
      .agg(sum(col("pc")).cast("long").as("cnt"), sum(col("ps")).as("sum"))
  }

  /** Broadcast-salted join for a skewed fact side against a small dimension:
    * the dimension is exploded `salts`× with every salt value, the fact side
    * gets a random-but-deterministic salt, and the join key becomes
    * (key, salt) — hot keys spread over `salts` tasks. For dimensions too
    * large to broadcast, AQE skew-join or range-repartition takes over.
    */
  def saltedBroadcastJoin(fact: DataFrame, dim: DataFrame, key: String,
                          salts: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val saltedDim = dim
      .withColumn("salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(broadcast(saltedDim), Seq(key, "salt")).drop("salt")
  }
}
