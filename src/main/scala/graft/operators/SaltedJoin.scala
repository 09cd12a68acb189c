package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  *  - fact side: deterministic salt in [0, n) derived from stable row
  *    content;
  *  - dim side: replicated n× with every salt value;
  *  - join on (key, salt) → hot keys spread over n reducers.
  *
  * The salt MUST be deterministic under recompute: with a
  * non-deterministic salt (`rand()`, `monotonically_increasing_id()`), a
  * fetch failure that partially re-runs the map stage re-salts rows into
  * partitions whose reducers already consumed the old output — rows get
  * duplicated or dropped. Hashing stable row content is retry-safe; the
  * trade-off is that byte-identical duplicate rows share a salt. If the
  * hot key's rows can be fully identical, pass an explicit stable unique
  * row-id via `saltFrom` (e.g. the upstream primary key) to get a perfect
  * spread.
  *
  * Cost: dim side shuffles n× larger — use for genuinely small/medium
  * dims, or broadcast instead when the dim fits.
  */
object SaltedJoin {

  /** Salt derived from ALL fact columns (deterministic; identical
    * duplicate rows collide on one reducer — see class doc). */
  def inner(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame =
    inner(fact, dim, key, salts, fact.columns.toSeq.map(col))

  /** Salt derived from caller-supplied stable columns — supply a unique
    * row-id here when duplicate fact rows must still spread. */
  def inner(fact: DataFrame, dim: DataFrame, key: String, salts: Int,
      saltFrom: Seq[Column]): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(saltFrom.nonEmpty, "saltFrom must name at least one column")
    val salted = fact.withColumn("__salt", pmod(hash(saltFrom: _*), lit(salts)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt"), "inner").drop("__salt")
  }
}
