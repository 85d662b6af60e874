package graft.operators

import org.apache.spark.sql.DataFrame

/** PLANS.md generation hook (VERDICT r10 #2, widened in r11):
  * `localCheckpoint` truncates lineage, so a post-hoc `explainString` on
  * a pinned query shows only `Scan ExistingRDD` — blinding the plan
  * artifact for exactly the queries that pin. Every batch-operator pin
  * site routes through [[pin]], which under `SPARK_GRAFT_EXPLAIN`
  * records the simple-mode plan of its input BEFORE checkpointing;
  * `scripts/plans.scala` drains the buffer per query and emits the
  * recorded sections (last pins = the full topology of the frame the
  * query returns; earlier ones are its pinned inputs). Off by default —
  * explainString walks the whole tree and would tax every pin in
  * production paths.
  *
  * Chained use: `.transform(PinExplain.pin)` replaces
  * `.localCheckpoint(true)` verbatim. */
object PinExplain {
  private val enabled = sys.env.contains("SPARK_GRAFT_EXPLAIN")
  private val buf = scala.collection.mutable.ListBuffer[String]()

  def drain(): Seq[String] =
    buf.synchronized { val r = buf.toList; buf.clear(); r }

  private def record(df: DataFrame): Unit =
    if (enabled) {
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
      buf.synchronized { buf += p }
    }

  def pin(df: DataFrame): DataFrame = {
    record(df)
    df.localCheckpoint(true)
  }

  /** Lazy-checkpoint variant (materializes on first use) for frames whose
    * first consumer is part of the same job — same plan recording. */
  def pinLazy(df: DataFrame): DataFrame = {
    record(df)
    df.localCheckpoint(false)
  }

  /** Genuinely release a frame regardless of HOW it is held.
    * `Dataset.unpersist` only evicts CacheManager entries (`.persist()`);
    * a [[pin]]ned frame is an RDD-level localCheckpoint persist OUTSIDE
    * the CacheManager, so unpersist is a no-op on it (measured r10) and
    * the blocks sit in executor storage until GC + ContextCleaner — the
    * leak class Bench's scrub counts as `leaked_rdds`. A pinned frame's
    * analyzed plan is exactly the `LogicalRDD` leaf the checkpoint left
    * behind (public accessor), so unpersist that RDD directly. Only the
    * ROOT is matched — a derived frame whose plan merely CONTAINS someone
    * else's pinned input must not release it out from under other
    * consumers. Call only once every consumer of the frame is done: a
    * checkpointed RDD has no lineage left to recompute from. */
  // unpersisting a locally-checkpointed RDD logs a WARN ("lineage has
  // been truncated and cannot be recomputed") from the RDD's class
  // logger — benign under release()'s no-remaining-consumer contract,
  // and at one line per released pin it would bury the bench/verify
  // stdout the driver tail-captures. Silence exactly that logger.
  private lazy val silenceUnpersistWarn: Unit =
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD",
      org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => () }

  def release(dfs: DataFrame*): Unit = {
    silenceUnpersistWarn
    dfs.foreach { df =>
      df.unpersist(false)
      df.queryExecution.analyzed match {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          l.rdd.unpersist(false): Unit
        case _ => ()
      }
    }
  }
}
