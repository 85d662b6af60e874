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
