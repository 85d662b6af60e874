// Full-board fourth-decade sweep (VERDICT r10 #6): measure EVERY
// registered query at /tmp/sfx1 (the synthetic 10x of sf0.1 from
// scripts/gen_sfx1.scala) AND at sf0.1 in the SAME JVM, so the x1
// growth column compares same-run medians. Writes the scaling.py
// 4th-arg artifact. Run:
//   /opt/spark/bin/spark-shell --master 'local[32]' ... -I scripts/sweep_sfx1.scala
// (builds /tmp/bench_sfx1_full.json; ~1h — median-of-3, noop writes,
// per-run cache scrub, no concurrent JVMs)
//
// INTERLEAVED since the r11 close: the two dirs are timed back-to-back
// PER QUERY, so a query's x1 ratio compares medians taken under the
// same accumulated-JVM state. The earlier pass-per-dir layout (which
// produced scripts/bench_sfx1_r11full.json) ran all sf0.1 rows before
// any sfx1 row, so late/heavy sfx1 rows carried extra suite-tail state
// and the flagged q131@x1 ratio read ~2x its standalone value.
import java.io.PrintWriter
val names = graft.SparkEntry.queries.keys.toSeq.sorted
def scrub(): Unit = { graft.operators.Dedup.clearClusterCache(); graft.operators.Curation.clearFeatureCache(); graft.operators.Similarity.clearIndexCache(); spark.sqlContext.clearCache(); val leaked = spark.sparkContext.getPersistentRDDs; leaked.values.foreach(_.unpersist(false)); if (leaked.nonEmpty) System.gc() }
def timeOne(n: String, dir: String): Double = { val fn = graft.SparkEntry.queries(n); val times = (1 to 3).map { _ => scrub(); val t0 = System.nanoTime(); try { fn(spark, dir).write.format("noop").mode("overwrite").save(); (System.nanoTime() - t0) / 1e9 } catch { case _: Throwable => -1.0 } }; scrub(); val m = times.sorted.apply(1); println(f"SWEEP $dir $n $m%.2f"); m }
// warm codegen once at the smallest SF
names.foreach { n => try { graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save() } catch { case _: Throwable => () } }
scrub()
val both = names.map { n => (n, timeOne(n, "/root/testdata/sf0.1"), timeOne(n, "/tmp/sfx1")) }
val t01 = both.map { case (n, a, _) => n -> a }.toMap
val tx1 = both.map { case (n, _, b) => n -> b }.toMap
def j(m: Map[String, Double]): String = m.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
new PrintWriter("/tmp/bench_sfx1_full.json") { write(s"""{"sf":1.0,"queries":${j(tx1)},"sf01_same_run":${j(t01)}}"""); close() }
println("SWEEP_WRITTEN")
