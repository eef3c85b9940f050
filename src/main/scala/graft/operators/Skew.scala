package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose hot keys exceed what AQE's skew-join
  * splitting can handle (a single key larger than executor memory).
  *
  * Classic salting: the probe (big, skewed) side gets a random-ish salt
  * in [0, saltFactor); the build side is replicated saltFactor times;
  * the join key becomes (key, salt), spreading each hot key over
  * saltFactor tasks. Salt is derived deterministically from row content
  * (xxhash64 of all columns) — no RNG, reproducible plans.
  */
object Skew {

  def saltedLeftJoin(probe: DataFrame, build: DataFrame, key: String,
      saltFactor: Int = 8): DataFrame = {
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(probe.columns.map(col).toSeq: _*), lit(saltFactor)))
    val replicated = build
      .withColumn("__salt", explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt"), "left").drop("__salt")
  }
}
