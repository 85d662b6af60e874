package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** K4-class warehouse writers (the reference's ClickHouse JDBC sink,
  * ClickHouseUtil.java:27-78, becomes partitioned columnar tables).
  *
  * 100 TB layout rules encoded here:
  *  - partition by day so serving queries (GMV by date — A7) prune to one
  *    partition instead of scanning the store;
  *  - drop "transient" columns before write (the reference's
  *    @TransientSink marker, bean/TransientSink.java) — a projection;
  *  - coalesce small streaming micro-batches so the store does not
  *    accumulate thousands of tiny files (the small-files problem).
  */
object Warehouse {

  /** Append a DWS frame partitioned by its window-start day. */
  def writeDws(df: DataFrame, path: String,
               transientCols: Seq[String] = Nil,
               filesPerBatch: Int = 4): Unit =
    df.drop(transientCols: _*)
      .withColumn("dt", substring(col("stt"), 1, 10))
      .coalesce(filesPerBatch)
      .write.mode(SaveMode.Append)
      .partitionBy("dt")
      .parquet(path)

  /** Serving-side read with partition pruning by day. */
  def readDay(spark: org.apache.spark.sql.SparkSession, path: String,
              day: String): DataFrame =
    spark.read.parquet(path).filter(col("dt") === day)

  /** Bucketed catalog table: hash-co-locates (and sorts) rows by the join
    * key at WRITE time, so every downstream equi-join or aggregation on
    * that key between same-bucketing tables runs with NO exchange — the
    * planner proves both sides share HashPartitioning(buckets). This is
    * the 100 TB answer to repeated fact⋈fact joins (e.g. orders⋈lineitem
    * every night): pay the shuffle once at ingest, never again.
    * BucketedJoinSpec asserts the exchange-free plan. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    buckets: Int = 32): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Z-ordered layout: cluster files on the Morton interleave of two
    * dimension columns so parquet footer min/max stays tight in BOTH —
    * selective filters on EITHER dimension then skip most row groups
    * (ZOrderPruningSpec measures 6× fewer rows read vs a single-column
    * sort; bucketing solves repeated equi-joins, this solves 2-D
    * selective scans). Columns are normalized to the 16-bit grid by their
    * own max (one broadcast stats row), and the sort key is dropped
    * before write — the layout is invisible to readers except in cost. */
  def writeZOrdered(df: DataFrame, path: String, dimA: String, dimB: String,
                    files: Int = 64): Unit = {
    val stats = df.agg(max(col(dimA)).as("za_max"), max(col(dimB)).as("zb_max"))
    df.crossJoin(broadcast(stats))
      .withColumn("zv", graft.functions.ZOrder.zValue(
        (col(dimA) * 65536L) / (col("za_max") + 1) cast "long",
        (col(dimB) * 65536L) / (col("zb_max") + 1) cast "long"))
      .repartitionByRange(files, col("zv"))
      .sortWithinPartitions(col("zv"))
      .drop("zv", "za_max", "zb_max")
      .write.mode(SaveMode.Overwrite)
      .parquet(path)
  }

  /** [[writeZOrdered]] with the Hilbert index as the clustering key —
    * same per-file min/max tightening, plus the q137-measured property
    * that a 2-D box predicate maps to ~2× fewer contiguous curve ranges
    * (fewer file fragments to stitch on a range-pruned scan). The
    * 8-bit Hilbert grid is coarser than z-order's 16-bit one: 65 536
    * curve positions over `files` ≤ a few hundred output files is
    * already far below one position per file. */
  def writeHilbertOrdered(df: DataFrame, path: String, dimA: String,
                          dimB: String, files: Int = 64): Unit = {
    val n = graft.functions.Hilbert.N
    val stats = df.agg(max(col(dimA)).as("ha_max"), max(col(dimB)).as("hb_max"))
    val keyed = graft.functions.Hilbert.withHilbert(
      df.crossJoin(broadcast(stats))
        .withColumn("hcx", (col(dimA) * n / (col("ha_max") + 1)).cast("long"))
        .withColumn("hcy", (col(dimB) * n / (col("hb_max") + 1)).cast("long")),
      "hcx", "hcy", "hv")
    keyed
      .repartitionByRange(files, col("hv"))
      .sortWithinPartitions(col("hv"))
      .drop("hv", "hcx", "hcy", "ha_max", "hb_max")
      .write.mode(SaveMode.Overwrite)
      .parquet(path)
  }

  /** Small-file compaction — the maintenance job every streaming sink
    * needs: foreachBatch appends leave one-file-per-trigger debris, and
    * at 100 TB a million 100 KB files costs more in scan planning +
    * open() overhead than the data itself. Rewrites a parquet directory
    * into ≤ `targetFiles` files, re-sorted by `sortKey` when given (so
    * compaction REPAIRS clustering that trigger-sized appends eroded —
    * min/max footers tighten back up).
    *
    * Atomicity: writes to `<path>.compact.tmp`, then swaps directories —
    * readers race either the old or the new complete layout, never a
    * half-written one (same visibility idea as VersionedState's
    * _SUCCESS gate). Returns (filesBefore, filesAfter). */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              targetFiles: Int, sortKey: Option[String] = None): (Int, Int) = {
    def parquetFiles(p: java.io.File): Int =
      Option(p.listFiles).map(_.count(f =>
        f.getName.endsWith(".parquet") && !f.getName.startsWith("."))).getOrElse(0)
    val dir = new java.io.File(path)
    val before = parquetFiles(dir)
    val df = spark.read.parquet(path)
    val arranged = sortKey match {
      case Some(k) =>
        df.repartitionByRange(targetFiles, col(k)).sortWithinPartitions(col(k))
      case None => df.coalesce(targetFiles)
    }
    val tmp = path + ".compact.tmp"
    arranged.write.mode(SaveMode.Overwrite).parquet(tmp)
    val old = new java.io.File(path + ".compact.old")
    if (!dir.renameTo(old))
      throw new java.io.IOException(s"compact: cannot move $path aside")
    if (!new java.io.File(tmp).renameTo(dir)) {
      old.renameTo(dir) // roll back visibility before failing
      throw new java.io.IOException(s"compact: cannot publish $tmp")
    }
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(old)
    (before, parquetFiles(dir))
  }

  /** HRW-sharded corpus write — q162's rendezvous assignment as an
    * actual output layout: each document lands in `shard=<s>/` by the
    * argmax-hash rule, so ANY writer (or a later append job) computes
    * any doc's shard statelessly and a shard-count change moves only
    * ≈1/(S+1) of files. Partition pruning gives shard-local readers a
    * directory-level scan cut, and the q162 report doubles as the
    * layout's balance audit. */
  def writeHrwSharded(docs: DataFrame, path: String,
                      shards: Int = 16): Unit =
    graft.operators.Layout.shardOf(docs, shards)
      .repartition(col("shard"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard")
      .parquet(path)
}
