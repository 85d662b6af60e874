// Fourth-decade synthetic extension (VERDICT r9 #6): build /tmp/sfx1, a
// 10x scale-up of the driver's sf0.1 testdata, WITHOUT naively cloning
// rows (identical copies would plant 9 artificial exact-dup partners per
// doc and explode every near-dup query's output far beyond natural
// growth). Model: 10 statistically-identical shards.
//  - documents: per-shard VOCABULARY PERMUTATION of the text (same ~40
//    word vocab, deterministic per-shard bijection). Each shard keeps
//    sf0.1's intra-shard shingle-df distribution, dup-pair density, and
//    doc-length mix exactly; cross-shard similarity falls at the same
//    random-chance rate unrelated sf0.1 docs already have.
//  - embeddings: per-shard coordinate permutation + sign flips (an
//    orthogonal transform: norms and intra-shard cosines preserved,
//    cross-shard vectors decorrelated).
//  - lineitem/orders: key-space offsets per shard (10 disjoint
//    order/part graphs — components/pagerank see 10x edges at equal
//    local density).
//  - events: user/event id offsets per shard, same time range (10x
//    events per window, funnel patterns preserved).
//  - dims (region/nation/customer/supplier/part): copied as-is (the
//    measured queries don't scale on them).
// Usage: spark-shell -I scripts/gen_sfx1.scala (repo classpath +
// nanosAsLong conf); writes /tmp/sfx1/*.parquet. NOTE: one statement
// per line (spark-shell -I splits on complete lines).
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

val src = "/root/testdata/sf0.1"
val out = "/tmp/sfx1"
val copies = 10
def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
def write(df: DataFrame, t: String): Unit = df.write.mode("overwrite").parquet(s"$out/$t.parquet")
for (t <- Seq("region", "nation", "customer", "supplier", "part")) write(read(t), t)

val docs = read("documents")
val vocab = docs.select(explode(split(col("text"), " ")).as("w")).filter(length(col("w")) > 0).distinct().collect().map(_.getString(0)).sorted
println(s"GEN vocab=${vocab.length}")
def docShard(k: Int): DataFrame = { val rnd = new scala.util.Random(42 + k); val perm = if (k == 0) vocab else rnd.shuffle(vocab.toSeq).toArray; val m = vocab.zip(perm).flatMap { case (a, b) => Seq(lit(a), lit(b)) }; val mapping = map(m.toIndexedSeq: _*); docs.select((col("doc_id") + lit(k * 5000L)).as("doc_id"), array_join(transform(split(col("text"), " "), w => coalesce(element_at(mapping, w), w)), " ").as("text"), col("lang"), col("source"), col("n_chars")) }
write((0 until copies).map(docShard).reduce(_.unionByName(_)), "documents")

val emb = read("embeddings")
val dim = 64
def embShard(k: Int): DataFrame = { val rnd = new scala.util.Random(4242 + k); val perm = if (k == 0) (0 until dim).toArray else rnd.shuffle((0 until dim).toVector).toArray; val sign = (0 until dim).map(i => if (k == 0 || rnd.nextBoolean()) 1.0f else -1.0f); val cols = (0 until dim).map(i => element_at(col("embedding"), perm(i) + 1) * lit(sign(i))); emb.select((col("vec_id") + lit(k * 2000L)).as("vec_id"), array(cols: _*).cast("array<float>").as("embedding"), col("label")) }
write((0 until copies).map(embShard).reduce(_.unionByName(_)), "embeddings")

val li = read("lineitem")
val ord = read("orders")
val okStep = 200000L
val pkStep = 20000L
val skStep = 1000L
write((0 until copies).map(k => li.withColumn("l_orderkey", col("l_orderkey") + lit(k * okStep)).withColumn("l_partkey", col("l_partkey") + lit(k * pkStep)).withColumn("l_suppkey", col("l_suppkey") + lit(k * skStep))).reduce(_.unionByName(_)), "lineitem")
write((0 until copies).map(k => ord.withColumn("o_orderkey", col("o_orderkey") + lit(k * okStep))).reduce(_.unionByName(_)), "orders")

val ev = read("events")
val uidStep = 1000000L
val eidStep = 10000000L
write((0 until copies).map(k => ev.withColumn("event_id", col("event_id") + lit(k * eidStep)).withColumn("user_id", col("user_id") + lit(k * uidStep))).reduce(_.unionByName(_)), "events")

println("GEN_DONE " + Seq("documents", "embeddings", "lineitem", "orders", "events").map(t => t + "=" + spark.read.parquet(s"$out/$t.parquet").count()).mkString(" "))
sys.exit(0)
