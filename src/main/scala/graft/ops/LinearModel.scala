package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained linear models over integer feature relations (SURVEY §2C
  * text analysis / curation): the quality-classifier and
  * trend-regression shapes every corpus pipeline runs (fasttext-style
  * filters, heuristic-score calibration), expressed so that EVERY
  * arithmetic step is exact — which makes training reproducible
  * bit-for-bit across engines AND across cluster topologies, something
  * float-gradient training fundamentally is not.
  *
  * The determinism trick extends the t14/t16 house rules from scoring
  * to TRAINING: features are integer counts (the length-difference
  * occurrence identity, token counts), the perceptron's learning rate
  * is 1, so weights/gradients/margins stay BIGINT end to end — integer
  * sums are associative-commutative-exact, so partition order, AQE
  * re-planning, and map-side combining cannot perturb the model. The
  * OLS fit keeps the normal-equation sums integer and defers the ONLY
  * inexact operations (two divisions, one multiply-subtract chain) to
  * a fixed left-associated shape both engines state identically.
  *
  * Scale shape: one epoch (or the whole OLS fit) is one
  * map-side-combined aggregate over the feature relation — the
  * classic distributed-GD layout where the model (a handful of
  * scalars) rides the driver and the data never moves. Epochs are
  * sequential actions by construction (each needs the previous
  * weights); the feature relation is checkpointed once so K epochs
  * re-scan columnar cache, not lineage. Gradient sums merge
  * algebraically across batches (the q42/t15/t18 rule), so a model can
  * be continued from yesterday's weights on today's data without
  * replaying history.
  */
object LinearModel {

  /** Batch (gang) perceptron, K epochs, learning rate 1: per epoch,
    * w += Σ_{i misclassified} y_i·x_i with x_0 ≡ 1 the bias feature and
    * "misclassified" = y_i·(w·x_i) ≤ 0. All quantities are longs —
    * the epoch gradient is one exact integer aggregate, so the trained
    * weights are a pure function of (features, labels, epochs),
    * independent of row order or parallelism.
    *
    * `feats` must carry integer (castable-to-long) feature columns and
    * a label column in {+1, −1}; callers checkpoint `feats` once since
    * every epoch scans it. Returns bias-first weights,
    * length = featCols.size + 1.
    */
  def perceptronTrain(feats: DataFrame, featCols: Seq[String],
      labelCol: String, epochs: Int): Array[Long] = {
    require(epochs >= 1, s"epochs must be >= 1, got $epochs")
    val y = col(labelCol).cast("long")
    val xs = lit(1L) +: featCols.map(c => col(c).cast("long"))
    var w = Array.fill(xs.size)(0L)
    for (_ <- 0 until epochs) {
      val margin = xs.zip(w).map { case (x, wi) => x * lit(wi) }
        .reduce(_ + _)
      val mis = y * margin <= 0
      val grads = feats.agg(
        sum(when(mis, y * xs.head).otherwise(lit(0L))).as("g0"),
        xs.tail.zipWithIndex.map { case (x, i) =>
          sum(when(mis, y * x).otherwise(lit(0L))).as(s"g${i + 1}")
        }: _*).head()
      w = w.indices.map { i =>
        w(i) + (if (grads.isNullAt(i)) 0L else grads.getLong(i))
      }.toArray
    }
    w
  }

  /** Score `feats` under bias-first integer weights: margin = w·x
    * (exact long), predicted = sign in {+1, −1} (0-margin ties break
    * negative — the perceptron's own misclassification convention, so
    * an all-zero untrained model predicts −1 everywhere), and a
    * correctness flag against the label.
    */
  def perceptronScore(feats: DataFrame, featCols: Seq[String],
      labelCol: String, weights: Array[Long]): DataFrame = {
    require(weights.length == featCols.size + 1,
      s"want ${featCols.size + 1} bias-first weights, got ${weights.length}")
    val xs = lit(1L) +: featCols.map(c => col(c).cast("long"))
    val margin = xs.zip(weights).map { case (x, wi) => x * lit(wi) }
      .reduce(_ + _)
    feats
      .withColumn("margin", margin)
      .withColumn("predicted",
        when(col("margin") > 0, lit(1L)).otherwise(lit(-1L)))
      .withColumn("correct",
        col("predicted") === col(labelCol).cast("long"))
  }

  /** Simple-OLS coefficients (intercept, slope) of y on x via the
    * normal equations over EXACT integer sums: n, Σx, Σy, Σxx, Σxy are
    * longs (one map-side-combined aggregate), slope =
    * (n·Σxy − Σx·Σy) / (n·Σxx − Σx·Σx) with numerator/denominator
    * formed in long arithmetic (Cramer's rule on the 2×2 system;
    * exact), and the two casts to double + one division are the first
    * inexact steps — deterministic IEEE round-to-nearest in any
    * engine. The intercept repeats the fixed shape
    * (Σy − slope·Σx) / n in doubles.
    *
    * Long-overflow headroom: Σx·Σy overflows past ~3·10⁹ rows of
    * ~10³-sized values; at that scale the same sums widen to
    * DECIMAL(38,0)/HUGEINT with the identical algebra (stated here,
    * not implemented — the test corpora sit 6 orders of magnitude
    * below the cliff, and `require`s guard the products).
    *
    * Degenerate x (zero variance) makes the system singular; refused
    * loudly rather than returning NaNs.
    */
  def olsFit(data: DataFrame, xCol: String, yCol: String): (Double, Double) = {
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val r = data.agg(
      count(lit(1)).as("n"),
      sum(x).as("sx"), sum(y).as("sy"),
      sum(x * x).as("sxx"), sum(x * y).as("sxy")).head()
    val n = r.getLong(0)
    require(n > 0, "olsFit: empty input")
    val (sx, sy, sxx, sxy) =
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    def exact(a: Long, b: Long): Long =
      try Math.multiplyExact(a, b)
      catch {
        case _: ArithmeticException => throw new IllegalArgumentException(
          s"olsFit: $a*$b overflows long — widen the sums to decimal")
      }
    val denom = Math.subtractExact(exact(n, sxx), exact(sx, sx))
    require(denom != 0L,
      s"olsFit: singular system (zero x-variance, x=$xCol)")
    val slope =
      Math.subtractExact(exact(n, sxy), exact(sx, sy)).toDouble / denom.toDouble
    val intercept = (sy.toDouble - slope * sx.toDouble) / n.toDouble
    (intercept, slope)
  }

  /** Per-row OLS diagnostics under (intercept, slope): prediction
    * intercept + slope·x and residual y − prediction, both in the
    * fixed double shape the oracle states.
    */
  def olsResiduals(data: DataFrame, xCol: String, yCol: String,
      intercept: Double, slope: Double): DataFrame =
    data
      .withColumn("pred",
        lit(intercept) + lit(slope) * col(xCol).cast("double"))
      .withColumn("residual", col(yCol).cast("double") - col("pred"))
}
