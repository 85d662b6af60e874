package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FloatVecCosineSpec extends SparkSpec {

  test("codegen expression is bit-identical to the HOF cosine formula") {
    val s = spark
    val emb = graft.Tables.load(s, sf, "embeddings").limit(100)
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val pairs = a.join(b, col("ia") < col("ib"))
    def hofDot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    def hofNorm(x: org.apache.spark.sql.Column) =
      aggregate(transform(x, v => v.cast("double") * v.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    val cmp = pairs.select(
      FloatVecCosine(s, col("ea"), col("eb")).as("native"),
      (hofDot(col("ea"), col("eb")) /
        (sqrt(hofNorm(col("ea"))) * sqrt(hofNorm(col("eb"))))).as("hof"))
    // bitwise equality, not tolerance — both must accumulate left-to-right
    assert(cmp.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("registered SQL function works and handles nulls/identical vectors") {
    val s = spark
    FloatVecCosine.register(s)
    import s.implicits._
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f))).toDF("a", "b")
    df.createOrReplaceTempView("vec_pairs")
    val r = s.sql("SELECT float_vec_cosine(a, b) AS c FROM vec_pairs").collect()
    assert(math.abs(r(0).getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r(1).getDouble(0)) < 1e-12)
    val withNull = s.sql("SELECT float_vec_cosine(a, CAST(NULL AS ARRAY<FLOAT>)) FROM vec_pairs")
    assert(withNull.collect().forall(_.isNullAt(0)))
  }

  test("lsh bucket: null elements and short vectors poison to bucket 0 (oracle parity)") {
    val s = spark
    import s.implicits._
    // DuckDB's generated bucketSql indexes vec[1..dims]; NULL elements and
    // out-of-range indexes poison every per-bit sum to NULL -> bit 0 ->
    // bucket 0. The expression must agree (ADVICE r3).
    val dims = 4
    val rows = Seq(
      (1L, Seq[Option[Float]](Some(1f), Some(-2f), Some(3f), Some(4f))), // clean
      (2L, Seq[Option[Float]](Some(1f), None, Some(3f), Some(4f))),      // null elem
      (3L, Seq[Option[Float]](Some(1f), Some(2f))),                      // short
      (4L, Seq[Option[Float]](Some(1f), Some(2f), Some(3f), Some(4f), Some(5f)))) // long: extra ignored
    val df = rows.toDF("id", "v")
      .select(col("id"), col("v").cast("array<float>").as("v"))
    val out = df.select(col("id"), FloatVecLshBucket(s, col("v"), 8, dims).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(2L) === 0L)
    assert(out(3L) === 0L)
    assert((out(1L) != 0L) || (out(4L) != 0L)) // sanity: clean vectors hash normally
    // interpreted eval path agrees with codegen on the short-vector case
    val litArr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(1f, 2f))
    val dummyChild = org.apache.spark.sql.catalyst.expressions.Literal(1)
    assert(FloatVecLshBucket(dummyChild, 8, dims).nullSafeEval(litArr) === 0L)
  }

  test("per-config registration: bucket Columns with different bits coexist") {
    val s = spark
    // pre-fix, one shared function name meant the LAST apply() won: a
    // Column built with bits=8 before a bits=60 registration resolved to
    // 60 bits at analysis time (ADVICE r3)
    val emb = graft.Tables.load(s, sf, "embeddings").limit(20)
    val c8 = FloatVecLshBucket(s, col("embedding"), 8)
    val c60 = FloatVecLshBucket(s, col("embedding"), 60) // registered after c8
    val both = emb.select(col("vec_id"), c8.as("b8"), c60.as("b60"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(both.forall(_._2 < 256L)) // b8 really is the 8-bit config
    val alone = emb.select(col("vec_id"),
        FloatVecLshBucket(s, col("embedding"), 8).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    both.foreach { case (id, b8, _) => assert(alone(id) === b8) }
  }

  test("extensions builders: SQL float_vec_lsh_bucket matches the Column API") {
    val s = spark
    // the same builders GraftExtensions injects, registered on the live
    // session (a shared test session cannot take extensions post-start)
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "float_vec_lsh_bucket", GraftExtensions.lshBucketBuilder, "built-in")
    val emb = graft.Tables.load(s, sf, "embeddings").limit(50)
    emb.createOrReplaceTempView("emb_ext")
    val viaSql = s.sql(
      "SELECT vec_id, float_vec_lsh_bucket(embedding, 8) AS b FROM emb_ext ORDER BY vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaCol = emb.select(col("vec_id"),
        FloatVecLshBucket(s, col("embedding"), 8).as("b"))
      .orderBy(col("vec_id")).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaSql.sameElements(viaCol))
    // explicit dims arg parses too
    val withDims = s.sql(
      "SELECT float_vec_lsh_bucket(embedding, 8, 64) AS b FROM emb_ext ORDER BY vec_id")
      .collect().map(_.getLong(0))
    assert(withDims.sameElements(viaSql.map(_._2)))
  }
}
