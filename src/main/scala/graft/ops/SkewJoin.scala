package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join (SURVEY §2b partitioning row): salts the
  * skewed (large) side with a random-free deterministic salt derived from
  * a high-cardinality column, and explodes the build side across all
  * salt values — the classic salting pattern for hot keys that AQE's
  * skew-join splitting can't reach (e.g. when the skew is in a
  * broadcast-ineligible mid-size dimension).
  *
  * Deterministic salt (hash of a row-unique column mod `saltBuckets`)
  * keeps the operator reproducible run-to-run — required for the
  * verify-twice correctness gate — while spreading each hot key over
  * `saltBuckets` reducers.
  */
object SkewJoin {

  /** Inner equi-join of `big` (skewed on `key`) with `small`, spreading
    * each key over `saltBuckets` partitions. `uniqueCol` is any
    * big-side column that varies within a key group (used to derive the
    * deterministic salt). */
  def saltedInnerJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      uniqueCol: String,
      saltBuckets: Int = 16): DataFrame = {
    val salted = big.withColumn("__salt", pmod(hash(col(uniqueCol)), lit(saltBuckets)))
    val exploded = small.withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }
}
