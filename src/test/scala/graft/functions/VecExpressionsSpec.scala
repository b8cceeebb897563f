package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class VecExpressionsSpec extends AnyFunSuite with SparkSpec {

  test("native vec_dot / vec_cosine match the builtin HOF composition") {
    import spark.implicits._
    VecExpressions.register(spark)
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.5f, -1.5f), Array(2.0f, 2.0f)),
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f))) // zero vector -> cosine 0
      .toDF("a", "b")

    val out = df.select(
      VecExpressions.vec_dot(col("a"), col("b")).as("dot"),
      VecExpressions.vec_cosine(col("a"), col("b")).as("cos"),
      VectorFunctions.cosine(col("a"), col("b")).as("cos_hof"))
      .collect()

    assert(out(0).getDouble(0) == 32.0)
    assert(out(1).getDouble(0) == -2.0)
    assert(math.abs(out(0).getDouble(1) - out(0).getDouble(2)) < 1e-12)
    assert(math.abs(out(1).getDouble(1) - out(1).getDouble(2)) < 1e-12)
    assert(out(2).getDouble(1) == 0.0)
  }

  test("registered functions resolve from SQL, with codegen") {
    import spark.implicits._
    VecExpressions.register(spark)
    Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT vec_cosine(a, b) AS c, vec_dot(a, b) AS d FROM vecs").head()
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 1.0)
  }

  test("type mismatch is rejected at analysis time") {
    import spark.implicits._
    VecExpressions.register(spark)
    Seq((1, 2)).toDF("a", "b").createOrReplaceTempView("notvecs")
    val e = intercept[Exception](spark.sql("SELECT vec_dot(a, b) FROM notvecs").head())
    assert(e.getMessage.contains("array<float>"))
  }
}
