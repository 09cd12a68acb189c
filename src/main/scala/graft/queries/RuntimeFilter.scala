package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Runtime-filter (Bloom semi-join pruning) surface — the classic
  * big-join optimization: build a Bloom filter on the small filtered
  * build side, broadcast it, and discard probe rows before they reach
  * the join shuffle. Spark's own AQE injects such filters opportunistically
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`); q82 implements the
  * datapath explicitly with the engine's own mergeable
  * [[graft.functions.BloomAgg]] so the pruning decision itself is
  * oracle-verifiable (the DuckDB twin reconstructs the exact bit set —
  * every admitted/rejected row matches, not just an FP-rate bound).
  */
object RuntimeFilter {

  private val M = graft.functions.BloomAgg.MBits
  private val K = graft.functions.BloomAgg.K

  // ------------------------------------------------------------- q82
  // Bloom-pruned semi join: urgent orders (the ~1/5-selectivity build
  // side) → 128 KB Bloom over o_orderkey → probe every lineitem row
  // BEFORE any join. Output: probe count, Bloom-admitted count, true
  // semi-join count, and the structural no-false-negative check.
  // Scale shape: the fact table is scanned once and NEVER shuffled for
  // the pruning decision (bit tests against a broadcast array inside
  // codegen); only the surviving ~20% would proceed to a real join's
  // exchange. At 100 TB that is the difference between shuffling 100 TB
  // and shuffling the selectivity-weighted fraction.
  private val q82 = QueryDef.of(
    (s, d) => {
      val bloomAgg = udaf(graft.functions.BloomAgg)
      val urgent = Tables.raw(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val bloom = urgent.agg(bloomAgg(col("o_orderkey")).as("bf"))
      val probe = Tables.raw(s, d, "lineitem").select(col("l_orderkey"))
      val admittedPred = (0 until K).map { i =>
        val pos = s"pmod(h1 + $i * h2, $M)"
        s"(shiftright(element_at(bf, cast(shiftright($pos, 6) as int) + 1), " +
          s"cast(($pos & 63) as int)) & 1) = 1"
      }.mkString("(", ") AND (", ")")
      val probed = probe.crossJoin(broadcast(bloom))
        .withColumn("h1", expr(
          "cast(conv(substring(md5(cast(l_orderkey as string)), 1, 5), 16, 10) as bigint)"))
        .withColumn("h2", expr(
          "cast(conv(substring(md5(cast(l_orderkey as string)), 6, 5), 16, 10) as bigint)"))
        .withColumn("admitted", expr(admittedPred))
        .agg(count(lit(1)).as("n_probe"),
          sum(when(col("admitted"), 1L).otherwise(0L)).as("n_admitted"))
      val exact = probe
        .join(Tables.raw(s, d, "orders")
            .filter(col("o_orderpriority") === "1-URGENT")
            .select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
        .agg(count(lit(1)).as("n_true"))
      probed.crossJoin(exact)
        .select(col("n_probe"), col("n_admitted"), col("n_true"),
          (col("n_admitted") >= col("n_true")).as("sound"))
    },
    s"""WITH urgent AS (
       |  SELECT o_orderkey AS k FROM orders
       |  WHERE o_orderpriority = '1-URGENT'),
       |uh AS (
       |  SELECT k,
       |    CAST('0x' || substring(md5(CAST(k AS VARCHAR)), 1, 5) AS BIGINT) AS h1,
       |    CAST('0x' || substring(md5(CAST(k AS VARCHAR)), 6, 5) AS BIGINT) AS h2
       |  FROM urgent),
       |setbits AS (
       |  SELECT DISTINCT (h1 + i.i * h2) % $M AS pos
       |  FROM uh CROSS JOIN generate_series(0, ${K - 1}) i(i)),
       |probekeys AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
       |ph AS (
       |  SELECT k,
       |    CAST('0x' || substring(md5(CAST(k AS VARCHAR)), 1, 5) AS BIGINT) AS h1,
       |    CAST('0x' || substring(md5(CAST(k AS VARCHAR)), 6, 5) AS BIGINT) AS h2
       |  FROM probekeys),
       |pbits AS (
       |  SELECT k, i.i AS i, (h1 + i.i * h2) % $M AS pos
       |  FROM ph CROSS JOIN generate_series(0, ${K - 1}) i(i)),
       |adm AS (
       |  SELECT k, COUNT(*) FILTER (WHERE sb.pos IS NOT NULL) = $K AS admitted
       |  FROM pbits LEFT JOIN setbits sb USING (pos) GROUP BY k),
       |truth AS (SELECT DISTINCT k, TRUE AS is_true FROM urgent)
       |SELECT COUNT(*) AS n_probe,
       |  CAST(SUM(CASE WHEN admitted THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
       |  CAST(SUM(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
       |  CAST(SUM(CASE WHEN admitted THEN 1 ELSE 0 END) AS BIGINT)
       |    >= CAST(SUM(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT) AS sound
       |FROM lineitem
       |JOIN adm ON lineitem.l_orderkey = adm.k
       |LEFT JOIN truth ON lineitem.l_orderkey = truth.k""".stripMargin)

  // ------------------------------------------------------------- q85
  // Skew-resistant salted join ([[graft.operators.SaltedJoin]]) run as a
  // driver-contract query: the fact side salts deterministically from
  // row content (retry-safe — recompute re-derives the same salt), the
  // dim side replicates across all 8 salts, and the join key becomes
  // (key, salt) so a hot key spreads over 8 reducers. The oracle is the
  // PLAIN join's SQL: salting must be result-invariant, so any
  // duplicate/dropped row under the rewrite is a hash mismatch.
  private val q85 = QueryDef.of(
    (s, d) => {
      val fact = Tables.raw(s, d, "lineitem")
        .select(col("l_orderkey"),
          col("l_extendedprice").cast("decimal(12,2)").as("price"))
      val dim = Tables.raw(s, d, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      graft.operators.SaltedJoin.inner(fact, dim, "l_orderkey", 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("price")).cast("double").as("sum_price"))
        .orderBy(col("o_orderpriority"))
    },
    """SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
      |    AS sum_price
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin)

  val defs: Map[String, QueryDef] = Map(
    "q82_bloom_join_filter" -> q82,
    "q85_salted_join" -> q85)
}
