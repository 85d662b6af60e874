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
// same accumulated-JVM state.
//
// RECYCLED PER QUERY since r12 (VERDICT r11 #3): interleaving alone
// still carried suite-tail state into late/heavy rows (q131@x1 read
// 11.8x in-table vs 5.9x standalone and needed adjudication prose), and
// a recycle-every-8 draft still let heavy group NEIGHBORS pollute (q131
// sharing a group with q129/q130 read 90.7 s at sfx1 vs 30.7 s
// same-session standalone). The sweep now rebuilds the SparkSession
// after EVERY query — each query's 6 timed runs see only their own
// session state, which is the DEFINITION of the standalone protocol, so
// the x1 column needs no adjudication at all. Costs ~3-4 s per query
// (~12 min on the full board); Janino's codegen cache is JVM-global so
// warmup survives recycles. After each recycle ONE untimed query runs at
// the smallest SF so the first timed row never pays session bring-up
// (VERDICT r11 #6's boundary-warmup tax, observed on q01/q121/q194).
//
// Failure policy (ADVICE r11): a failed run must FLAG the row, never
// bias it — timeOne mirrors Bench.timeQuery: any failed run makes the
// row -max(|t|); otherwise the median of the three successes. (The old
// -1.0 sentinel sorted FIRST, so one failure silently returned the MIN
// of the two good runs.)
// SPARK_GRAFT_SWEEP_ONLY: comma-separated name prefixes — re-measure a
// subset (e.g. one fixed query) with the full recycled protocol; the
// partial artifact is merged into the full board's by scripts/scaling.py
// callers, each fragment carrying its own run_id.
import java.io.PrintWriter
val onlyPrefixes = sys.env.get("SPARK_GRAFT_SWEEP_ONLY").map(_.split(",").toSeq)
val names = graft.SparkEntry.queries.keys.toSeq.sorted.filter(n => onlyPrefixes.forall(_.exists(n.startsWith)))
var sess: org.apache.spark.sql.SparkSession = spark
def build(): org.apache.spark.sql.SparkSession = { val s = org.apache.spark.sql.SparkSession.builder().master("local[32]").config("spark.sql.extensions", "graft.plans.GraftExtensions").config("spark.sql.shuffle.partitions", "32").config("spark.sql.session.timeZone", "UTC").config("spark.ui.enabled", "false").config("spark.sql.legacy.parquet.nanosAsLong", "true").config("spark.sql.adaptive.enabled", "true").getOrCreate(); s.sparkContext.setLogLevel("WARN"); s }
def scrub(): Unit = { graft.operators.Dedup.clearClusterCache(); graft.operators.Curation.clearFeatureCache(); graft.operators.Similarity.clearIndexCache(); sess.sqlContext.clearCache(); val leaked = sess.sparkContext.getPersistentRDDs; leaked.values.foreach(_.unpersist(false)); if (leaked.nonEmpty) System.gc() }
def warmOne(): Unit = { try { graft.SparkEntry.queries("q01_pricing_summary")(sess, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save() } catch { case _: Throwable => () }; scrub() }
def recycle(): Unit = { scrub(); sess.stop(); System.gc(); sess = build(); warmOne() }
def timeOne(n: String, dir: String): Double = { val fn = graft.SparkEntry.queries(n); val times = (1 to 3).map { _ => scrub(); val t0 = System.nanoTime(); val ok = try { fn(sess, dir).write.format("noop").mode("overwrite").save(); true } catch { case _: Throwable => false }; val secs = (System.nanoTime() - t0) / 1e9; if (ok) secs else -secs }; scrub(); val m = if (times.exists(_ < 0)) -times.map(math.abs).max else times.sorted.apply(1); println(f"SWEEP $dir $n $m%.2f"); m }
// warm codegen once at the smallest SF (Janino cache survives recycles)
names.foreach { n => try { graft.SparkEntry.queries(n)(sess, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save() } catch { case _: Throwable => () } }
recycle()
val both = names.map { n => val row = (n, timeOne(n, "/root/testdata/sf0.1"), timeOne(n, "/tmp/sfx1")); recycle(); row }
val t01 = both.map { case (n, a, _) => n -> a }.toMap
val tx1 = both.map { case (n, _, b) => n -> b }.toMap
def j(m: Map[String, Double]): String = m.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
val sweepRunId = s"sweep-${java.time.Instant.now().toEpochMilli}-p${ProcessHandle.current().pid()}"
new PrintWriter("/tmp/bench_sfx1_full.json") { write(s"""{"run_id":"$sweepRunId","generated_utc":"${java.time.Instant.now()}","sf":1.0,"queries":${j(tx1)},"sf01_same_run":${j(t01)}}"""); close() }
println(s"SWEEP_WRITTEN $sweepRunId")
