package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DynamicRoutingSpec extends SparkSpec {

  test("X2/P4/K2/K3: config-driven routing, pruning, dim upsert") {
    val s = spark
    import s.implicits._
    val config = Seq(
      ("order_info", "insert", "kafka", "dwd_order_info", "id,user_id,total_amount", "id"),
      ("base_trademark", "insert", "dim", "dim_base_trademark", "id,tm_name", "id"))
      .toDF("sourceTable", "operateType", "sinkType", "sinkTable", "sinkColumns", "sinkPk")

    val cdc = Seq(
      ("order_info", "insert", 1L, Map("id" -> "1", "user_id" -> "5",
        "total_amount" -> "9.90", "secret" -> "drop_me")),
      ("base_trademark", "bootstrap-insert", 2L, Map("id" -> "10", "tm_name" -> "Apple", "junk" -> "x")),
      ("base_trademark", "insert", 3L, Map("id" -> "10", "tm_name" -> "Apple Inc")),
      ("unconfigured", "insert", 4L, Map("id" -> "9", "a" -> "b", "c" -> "d")))
      .toDF("table", "type", "ts", "data")

    val routedDf = DynamicRouting.routed(cdc, config)
    assert(routedDf.count() === 3) // unconfigured table dropped (X2 routing)

    // P4: column pruning by config whitelist
    val fact = routedDf.filter(col("sinkType") === "kafka").head()
    val keys = fact.getAs[Map[String, String]]("data").keySet
    assert(keys === Set("id", "user_id", "total_amount"))

    // K2: per-row topic column shape
    val facts = DynamicRouting.factRecords(routedDf).collect()
    assert(facts.length === 1 && facts.head.getAs[String]("topic") === "dwd_order_info")

    // K3: last-write-wins upsert by pk
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dims").toString
    DynamicRouting.upsertDims(routedDf, dimDir)
    val dim = s.read.parquet(s"$dimDir/dim_base_trademark")
    assert(dim.count() === 1)
    assert(dim.head().getAs[Map[String, String]]("data")("tm_name") === "Apple Inc")
  }

  test("K3 scale: an upsert batch rewrites ONLY its dirty pk-hash buckets") {
    val s = spark
    import s.implicits._
    val config = Seq(
      ("base_trademark", "insert", "dim", "dim_tm", "id,tm_name", "id"))
      .toDF("sourceTable", "operateType", "sinkType", "sinkTable", "sinkColumns", "sinkPk")
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dims-bkt").toString

    val cdc1 = (1 to 40).map(i => ("base_trademark", "insert", 1L,
      Map("id" -> i.toString, "tm_name" -> s"name$i")))
      .toDF("table", "type", "ts", "data")
    DynamicRouting.upsertDims(DynamicRouting.routed(cdc1, config), dimDir)

    // byte-level listing of every bucket partition's files
    def files(): Map[String, Array[Byte]] = {
      val root = java.nio.file.Paths.get(dimDir, "dim_tm")
      val out = scala.collection.mutable.Map.empty[String, Array[Byte]]
      java.nio.file.Files.walk(root).forEach { p =>
        val rel = root.relativize(p).toString
        if (rel.startsWith("bucket=") && rel.endsWith(".parquet"))
          out(rel) = java.nio.file.Files.readAllBytes(p)
      }
      out.toMap
    }
    val before = files()
    assert(before.keySet.map(_.split("/")(0)).size > 1) // pks spread over buckets

    // second batch touches exactly one pk
    val cdc2 = Seq(("base_trademark", "insert", 2L,
      Map("id" -> "1", "tm_name" -> "updated")))
      .toDF("table", "type", "ts", "data")
    DynamicRouting.upsertDims(DynamicRouting.routed(cdc2, config), dimDir)
    val after = files()

    val dirtyBucket = "bucket=" + s.range(1)
      .select(pmod(xxhash64(lit("1")), lit(DynamicRouting.DimBuckets))).head().getLong(0)
    // untouched buckets: identical file names AND identical bytes
    val cleanBefore = before.filter(!_._1.startsWith(dirtyBucket))
    val cleanAfter = after.filter(!_._1.startsWith(dirtyBucket))
    assert(cleanBefore.keySet === cleanAfter.keySet)
    cleanBefore.foreach { case (f, bytes) =>
      assert(java.util.Arrays.equals(bytes, cleanAfter(f)), s"$f was rewritten")
    }
    // the upsert itself took effect, with last-write-wins
    val dim = s.read.parquet(s"$dimDir/dim_tm")
    assert(dim.count() === 40)
    assert(dim.filter(col("pk") === "1").head()
      .getAs[Map[String, String]]("data")("tm_name") === "updated")
  }

  test("K3 migration: a pre-bucketing (unbucketed) snapshot upgrades in place") {
    val s = spark
    import s.implicits._
    val config = Seq(
      ("base_trademark", "insert", "dim", "dim_mig", "id,tm_name", "id"))
      .toDF("sourceTable", "operateType", "sinkType", "sinkTable", "sinkColumns", "sinkPk")
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dims-mig").toString

    // simulate a snapshot written by the pre-bucketing format: data/ts/pk,
    // no bucket column, flat directory
    Seq(
      (Map("id" -> "1", "tm_name" -> "old1"), 1L, "1"),
      (Map("id" -> "2", "tm_name" -> "old2"), 1L, "2"))
      .toDF("data", "ts", "pk")
      .write.parquet(s"$dimDir/dim_mig")

    val cdc = Seq(("base_trademark", "insert", 2L,
      Map("id" -> "1", "tm_name" -> "new1")))
      .toDF("table", "type", "ts", "data")
    // pre-fix this threw AnalysisException (filter on the missing bucket
    // column) and the micro-batch died; now it migrates with a full rewrite
    DynamicRouting.upsertDims(DynamicRouting.routed(cdc, config), dimDir)

    val dim = s.read.parquet(s"$dimDir/dim_mig")
    assert(dim.columns.contains("bucket")) // snapshot is now bucketed
    assert(dim.count() === 2)              // legacy rows survived
    assert(dim.filter(col("pk") === "1").head()
      .getAs[Map[String, String]]("data")("tm_name") === "new1")
    assert(dim.filter(col("pk") === "2").head()
      .getAs[Map[String, String]]("data")("tm_name") === "old2")
    // the legacy flat files are GONE — a non-Spark reader scanning every
    // parquet file under the root must see only the bucketed snapshot
    // (stale root files would resurrect the overwritten pk=1 row)
    val rootParquet = java.nio.file.Files.list(
        java.nio.file.Paths.get(dimDir, "dim_mig"))
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .count()
    assert(rootParquet === 0, "legacy unbucketed files left at snapshot root")
    val allFiles = s.read.option("recursiveFileLookup", "true")
      .parquet(s"$dimDir/dim_mig")
    assert(allFiles.count() === 2)
  }
}
