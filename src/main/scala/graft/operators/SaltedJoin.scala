package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join: explicit salting for when a handful of hot
  * keys would otherwise concentrate a shuffle partition on one executor.
  *
  * AQE's skew-join splitting (on by default here) handles most cases at
  * runtime; explicit salting remains the tool when (a) the skewed side
  * feeds a stateful/streaming op AQE can't replan, or (b) key skew is so
  * extreme a single key exceeds one executor's memory. This is the
  * standard scatter/replicate construction:
  *
  *  - fact side: deterministic salt in [0, n) derived from the whole row
  *    (stable across task retries — `rand()` is not);
  *  - dim side: replicated n× with every salt value;
  *  - join on (key, salt) → hot keys spread over n reducers.
  *
  * Cost: dim side shuffles n× larger — use for genuinely small/medium
  * dims, or broadcast instead when the dim fits.
  */
object SaltedJoin {

  def inner(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    // Salt must spread IDENTICAL rows too (a hot key's rows are often
    // byte-identical — a row-content hash would send them all to one
    // reducer, defeating the whole tool). monotonically_increasing_id is
    // non-deterministic across task retries, which is fine here: any salt
    // assignment joins each row exactly once; only the scatter changes.
    val salted = fact.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt"), "inner").drop("__salt")
  }
}
