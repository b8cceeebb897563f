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

  test("multiple instances in one codegen scope compile (freshName locals)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    // Non-nullable inputs make nullSafeCodeGen inline all three bodies
    // into one Java scope: fixed local names would collide (Janino
    // compile error -> silent interpreted fallback in the real plan).
    // Generating the projection directly has no fallback, so a collision
    // fails this test loudly.
    val t = ArrayType(FloatType, containsNull = false)
    val a = BoundReference(0, t, nullable = false)
    val b = BoundReference(1, t, nullable = false)
    val proj = GenerateUnsafeProjection.generate(
      Seq(VecDotFloat(a, b), VecCosineFloat(a, b), VecDotFloat(b, a), VecCosineFloat(b, a)))
    val row = InternalRow(
      ArrayData.toArrayData(Array(1.0f, 2.0f)), ArrayData.toArrayData(Array(3.0f, 4.0f)))
    val out = proj(row)
    assert(out.getDouble(0) == 11.0 && out.getDouble(2) == 11.0)
    assert(math.abs(out.getDouble(1) - out.getDouble(3)) < 1e-15)
  }

  test("vec_dot_q equals the zip_with composition it replaced, including null/length semantics") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    VecExpressions.register(spark)
    // the PORTABLE formulation (old dotQ) as the executable reference
    def oldDotQ(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),        // plain: 32
      (Seq(-7L, 0L), Seq(3L, 9L)),                // negatives: -21
      (Seq(1L, 2L), Seq(1L, 2L, 3L)),             // length mismatch -> null
      (Seq.empty[Long], Seq.empty[Long])          // empty -> 0
    ).toDF("a", "b")
    val rows = df.select(
        VecExpressions.vec_dot_q(col("a"), col("b")).as("fused"),
        oldDotQ(col("a"), col("b")).as("portable"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), r.toString)
      if (!r.isNullAt(0)) assert(r.getLong(0) == r.getLong(1), r.toString)
    }
    assert(rows(0).getLong(0) == 32L && rows(2).isNullAt(0) && rows(3).getLong(0) == 0L)
    // null ELEMENT propagates to a null dot on both forms
    val withNullElem = spark.sql(
      "SELECT vec_dot_q(array(1L, CAST(NULL AS BIGINT)), array(1L, 1L)) AS d")
    assert(withNullElem.head().isNullAt(0))
  }

  test("sorted_intersect_size equals size(array_intersect) on sorted distinct sets, incl. property sweep") {
    import spark.implicits._
    VecExpressions.register(spark)
    // deterministic pseudo-random sorted distinct long arrays, with
    // overlap planted by drawing both sides from a shared small domain
    val rnd = new scala.util.Random(42)
    def arr(n: Int): Seq[Long] =
      Seq.fill(n)(rnd.nextInt(200).toLong).distinct.sorted
    val cases = Seq(
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)),          // partial overlap: 2
      (Seq(1L, 2L), Seq(3L, 4L)),                  // disjoint: 0
      (Seq(5L, 6L, 7L), Seq(5L, 6L, 7L)),          // identical: 3
      (Seq.empty[Long], Seq(1L)),                  // empty side: 0
      (Seq(-5L, -1L, 0L, 9L), Seq(-5L, 9L))        // negatives sort first
    ) ++ Seq.fill(50)((arr(rnd.nextInt(40)), arr(rnd.nextInt(40))))
    val rows = cases.toDF("a", "b").select(
        VecExpressions.sorted_intersect_size(col("a"), col("b")).as("fused"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("builtin"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
    assert(rows(0).getLong(0) == 2L && rows(1).getLong(0) == 0L &&
      rows(2).getLong(0) == 3L && rows(3).getLong(0) == 0L &&
      rows(4).getLong(0) == 2L)
  }

  test("type mismatch is rejected at analysis time") {
    import spark.implicits._
    VecExpressions.register(spark)
    Seq((1, 2)).toDF("a", "b").createOrReplaceTempView("notvecs")
    val e = intercept[Exception](spark.sql("SELECT vec_dot(a, b) FROM notvecs").head())
    assert(e.getMessage.contains("array<float>"))
  }
}
