package graft.queries

import graft.Tables
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** Data-layout operators — the table-maintenance side of the engine
  * (companion to [[graft.operators.ZOrderLayout]], the OPTIMIZE ZORDER
  * job). The oracled query surface pins the z-value bit math and the
  * zone-map tightness statistics that justify the layout at 100 TB:
  * files clustered by z-interleave have small min/max spans on BOTH
  * dimensions, so scans with a predicate on either column prune most
  * files. The layout job itself (sampled range boundaries) is
  * spec-tested in ZOrderSpec; this query uses deterministic fixed-width
  * z-ranges as stand-ins for files so both engines replay the binning
  * bit-for-bit.
  */
object Layout {

  // ------------------------------------------------------------- q94
  // Z-order zone-map statistics over lineitem clustered on
  // (l_orderkey, l_partkey): interleave → 64 fixed-width z-ranges →
  // per-range row count and min/max of each dimension. The per-range
  // spans (max − min) are the zone-map widths a pruning scan would see.
  // Scale shape: one narrow pass computes z (codegen'd static call), a
  // 1-row global bounds frame is broadcast back, and the only wide op
  // is the 64-key aggregate with map-side partials.
  private val sqlZ =
    """CAST(list_sum(list_transform(range(0, 21),
      |  i -> (((l_orderkey >> i) & 1) << (2*i))
      |     + (((l_partkey >> i) & 1) << (2*i+1)))) AS BIGINT)""".stripMargin

  private val q94 = QueryDef.of(
    (s, d) => {
      VectorFunctions.register(s)
      val z = Tables.raw(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"),
          expr("z_value(cast(l_orderkey as bigint), cast(l_partkey as bigint))")
            .as("z"))
      val bounds = z.agg(min(col("z")).as("zmin"), max(col("z")).as("zmax"))
      z.crossJoin(broadcast(bounds))
        .withColumn("bucket",
          expr("(z - zmin) div ((zmax - zmin) div 64 + 1)"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("l_orderkey")).as("min_ok"),
          max(col("l_orderkey")).as("max_ok"),
          min(col("l_partkey")).as("min_pk"),
          max(col("l_partkey")).as("max_pk"))
        .withColumn("span_ok", col("max_ok") - col("min_ok"))
        .withColumn("span_pk", col("max_pk") - col("min_pk"))
        .orderBy(col("bucket"))
    },
    s"""WITH z AS (
       |  SELECT l_orderkey, l_partkey, $sqlZ AS z FROM lineitem),
       |bounds AS (SELECT MIN(z) AS zmin, MAX(z) AS zmax FROM z),
       |binned AS (
       |  SELECT l_orderkey, l_partkey,
       |    (z.z - zmin) // ((zmax - zmin) // 64 + 1) AS bucket
       |  FROM z CROSS JOIN bounds)
       |SELECT bucket, COUNT(*) AS n_rows,
       |  MIN(l_orderkey) AS min_ok, MAX(l_orderkey) AS max_ok,
       |  MIN(l_partkey) AS min_pk, MAX(l_partkey) AS max_pk,
       |  MAX(l_orderkey) - MIN(l_orderkey) AS span_ok,
       |  MAX(l_partkey) - MIN(l_partkey) AS span_pk
       |FROM binned
       |GROUP BY bucket
       |ORDER BY bucket""".stripMargin)

  val defs: Map[String, QueryDef] = Map(
    "q94_zorder_zonemap" -> q94)
}
