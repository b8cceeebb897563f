package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class LinearModelSpec extends AnyFunSuite with SparkSpec {

  test("perceptron learns a linearly separable set and scores it perfectly") {
    import spark.implicits._
    // y = +1 iff x1 > x2 — separable by w = (0, 1, -1) (bias 0)
    val rows = for {
      a <- 0L to 9L; b <- 0L to 9L if a != b
    } yield (a * 10 + b, a, b, if (a > b) 1L else -1L)
    val feats = rows.toDF("id", "x1", "x2", "y")
    val w = LinearModel.perceptronTrain(feats, Seq("x1", "x2"), "y", 10)
    val scored = LinearModel.perceptronScore(feats, Seq("x1", "x2"), "y", w)
    assert(scored.where(!col("correct")).count() === 0L)
  }

  test("perceptron training is a pure function of the data, not its order or layout") {
    import spark.implicits._
    val rows = (0L until 200L).map { i =>
      (i, i % 7, i % 11, if ((i % 7) >= (i % 11)) 1L else -1L)
    }
    val a = rows.toDF("id", "x1", "x2", "y").repartition(1)
    val b = util.Random.shuffle(rows).toDF("id", "x1", "x2", "y")
      .repartition(13)
    val wa = LinearModel.perceptronTrain(a, Seq("x1", "x2"), "y", 5)
    val wb = LinearModel.perceptronTrain(b, Seq("x1", "x2"), "y", 5)
    assert(wa.toSeq === wb.toSeq)
  }

  test("zero-margin rows count as misclassified (the all-zero model updates on everything)") {
    import spark.implicits._
    val feats = Seq((1L, 2L, 1L), (2L, 3L, 1L)).toDF("id", "x1", "y")
    // epoch 1 from w = 0: every margin is 0 -> both rows contribute
    val w = LinearModel.perceptronTrain(feats, Seq("x1"), "y", 1)
    assert(w.toSeq === Seq(2L, 5L)) // bias = sum(y) = 2, w1 = sum(y*x1) = 5
  }

  test("OLS on a noiseless line recovers it exactly") {
    import spark.implicits._
    // y = 3 + 2x: integer points, exact sums, exact Cramer ratio
    val data = (1L to 100L).map(x => (x, x, 3 + 2 * x)).toDF("id", "x", "y")
    val (a, b) = LinearModel.olsFit(data, "x", "y")
    assert(a === 3.0 && b === 2.0)
    val res = LinearModel.olsResiduals(data, "x", "y", a, b)
    assert(res.agg(max(abs(col("residual")))).head().getDouble(0) === 0.0)
  }

  test("OLS refuses a zero-variance regressor loudly") {
    import spark.implicits._
    val data = Seq((1L, 5L, 1L), (2L, 5L, 2L)).toDF("id", "x", "y")
    val e = intercept[IllegalArgumentException] {
      LinearModel.olsFit(data, "x", "y")
    }
    assert(e.getMessage.contains("singular"))
  }

  test("OLS refuses long overflow loudly instead of wrapping") {
    import spark.implicits._
    // x ~ 2^31 so x*x ~ 2^62 per row; three rows overflow the Σxx sum.
    // Spark's ANSI arithmetic faults the aggregate itself before our
    // Cramer-product guard can (both are loud; the guard covers the
    // n·Σxx / Σx·Σy products that a non-overflowing scan can still
    // trip) — accept either failure point, never a wrapped result.
    val big = 1L << 31
    val data = Seq((1L, big, 1L), (2L, big + 1, 2L), (3L, big + 2, 3L))
      .toDF("id", "x", "y")
    val e = intercept[Exception] {
      LinearModel.olsFit(data, "x", "y")
    }
    assert(e.isInstanceOf[IllegalArgumentException]
      || e.getClass.getName.contains("SparkArithmeticException"))
  }
}
