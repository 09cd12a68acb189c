package graft

import org.apache.spark.sql.DataFrame

/** Registry of persisted DataFrames handed across operator boundaries
  * (e.g. [[operators.ConnectedComponents.labels]] returns a persisted
  * frame its caller consumes lazily, so the producer can't unpersist it).
  * Producers `retain` such frames; a session owner (Verify, Bench, specs,
  * a production driver's shutdown hook) calls [[releaseAll]] when the
  * logical job is over, so no cached partitions outlive the run. */
object Resources {
  private val retained = scala.collection.mutable.ListBuffer.empty[DataFrame]
  private val releaseHooks =
    scala.collection.mutable.ListBuffer.empty[() => Unit]

  /** Track a persisted frame for later release; returns it unchanged. */
  def retain(df: DataFrame): DataFrame = synchronized {
    retained += df
    df
  }

  /** Collision-free cache-key identity for a session. Module memos
    * (Dedup/TextAnalysis/Mixing/…) key per-(session, corpus) artifacts
    * on this instead of `System.identityHashCode`: after a session is
    * stopped and GC'd, a NEW session can (rarely) collide on the same
    * identity hash and be served a checkpointed frame bound to the dead
    * session if releaseAll was never called in between. `sessionUUID`
    * The key is a monotonic counter assigned per session OBJECT in a
    * weak-keyed identity map: never reused for the JVM's lifetime (so
    * no cross-GC collision is possible), and the map entry itself is
    * GC-evicted with the session (values are plain strings that don't
    * reference the key, so the weak eviction actually fires — unlike
    * caching the frames themselves under weak keys, see Tables).
    * (`SparkSession.sessionUUID` would be the natural key but is
    * `private[sql]`.) */
  private val sessionKeys =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, String]
  private val sessionSeq = new java.util.concurrent.atomic.AtomicLong
  def sessionKey(s: org.apache.spark.sql.SparkSession): String =
    sessionKeys.synchronized {
      var k = sessionKeys.get(s)
      if (k == null) {
        k = s"sess-${sessionSeq.incrementAndGet()}"
        sessionKeys.put(s, k)
      }
      k
    }

  /** Register a callback fired by every [[releaseAll]] — for module
    * caches that MEMOIZE retained frames (e.g. the shared cluster-label
    * artifact): releasing the checkpoint under a memoized reference
    * would leave the cache serving a dead frame, so the cache clears
    * itself through this hook instead of trusting every caller to pair
    * releaseAll with the module's own release method. Registered once
    * per module (idempotent callbacks). */
  def onReleaseAll(f: () => Unit): Unit = synchronized {
    releaseHooks += f
    ()
  }

  /** [[retain]] scoped to a named SLOT: re-occupying the slot releases
    * the previous occupants first, so a query that pins fresh
    * per-invocation checkpoints (q89's corpus/tf, q163's toks) holds at
    * most ONE generation between releaseAll calls — without this, every
    * bench rep stacked another corpus-sized checkpoint in the block
    * manager until session end. Safe because the previous generation's
    * consuming action has completed before the query re-enters (the
    * runners execute queries serially) and nothing else holds those
    * frames. */
  private val slots =
    scala.collection.mutable.Map.empty[String, Seq[DataFrame]]
  def retainSlot(key: String, dfs: DataFrame*): Unit = synchronized {
    slots.remove(key).foreach(_.foreach { df =>
      try df.unpersist()
      catch { case _: Throwable => () }
      releaseCheckpoint(df)
    })
    slots(key) = dfs
    ()
  }

  /** Unpersist every retained frame (blocking=false: eviction proceeds
    * asynchronously; correctness never depended on the cache). Safe to
    * call twice or while queries on other sessions run — unpersist on an
    * already-released frame is a no-op. */
  def releaseAll(): Unit = synchronized {
    // Hooks run FIRST: a memo cleared after its checkpoint is released
    // leaves a window where a concurrent caller is handed a
    // lineage-truncated frame that can never recompute. Clearing the
    // memos first means a racing caller either sees the old (still
    // persisted) frame or rebuilds fresh — never a dead reference.
    releaseHooks.foreach { f =>
      try f() catch { case _: Throwable => () }
    }
    retained.foreach { df =>
      try df.unpersist()
      catch { case _: Throwable => () }
      releaseCheckpoint(df)
    }
    retained.clear()
    slots.values.foreach(_.foreach { df =>
      try df.unpersist()
      catch { case _: Throwable => () }
      releaseCheckpoint(df)
    })
    slots.clear()
  }

  /** Release the block-manager storage behind a `localCheckpoint`ed
    * frame. `Dataset.unpersist` only talks to the CacheManager, which
    * never hears about checkpoint RDDs — they are persisted at the RDD
    * layer — so a checkpointed frame needs its `LogicalRDD` leaves
    * unpersisted directly or the blocks outlive the job. */
  def releaseCheckpoint(df: DataFrame): Unit =
    try df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    } catch { case _: Throwable => () }
}
