package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated name prefixes — local iteration
    // only; the driver always runs the full surface with 2 args
    val only: String => Boolean = args.lift(2) match {
      case Some(f) => val ps = f.split(','); n => ps.exists(n.startsWith)
      case None    => _ => true
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // ship the catalog-level extension path as the default: SQL-surface
      // users get float_vec_cosine / float_vec_lsh_bucket without Scala
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet stores TIMESTAMP(NANOS); Spark reads it as Long ns
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_GATE=1: emit the sfx1 oracle-gate slice variants
    // (SparkEntry.gateQueries/gateOracleSql) INSTEAD of the main surface —
    // the driver's correctness contract is untouched; scripts/check.py
    // runs unchanged against the gate outDir (VERDICT r13 #2).
    val gateMode = sys.env.get("SPARK_GRAFT_GATE").contains("1")
    val (queries, oracles) =
      if (gateMode) (SparkEntry.gateQueries, SparkEntry.gateOracleSql)
      else (SparkEntry.queries, SparkEntry.oracleSql)
    queries.filter(kv => only(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // explicit failure marker: a sentinel frame whose schema can never
        // match any oracle, so the compare records a RED row for this
        // query instead of silently omitting it (a crashed query must not
        // read as absent-and-therefore-fine — ADVICE r5 #2)
        try {
          import spark.implicits._
          Seq("GRAFT_QUERY_FAILED: " + String.valueOf(e.getMessage).take(500))
            .toDF("graft_error").coalesce(1)
            .write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case _: Throwable => () }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = oracles.filter(kv => only(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
