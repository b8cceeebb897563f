package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Character k-shingle hashes in ONE generated pass (SURVEY §7.3's
  * bench-gated custom tier). The md5-per-shingle formulation
  * (`md5(substr(text, i, k))` per sampled position) pays a digest, a hex
  * encode, and a base-16 parse per shingle — measured as the dominant
  * MinHash-LSH cost at sf0.1. This expression computes, per sampled
  * position, the polynomial hash
  *
  *   (Σ_j code(text[i+j]) * 31^(k-1-j)) mod 2^32
  *
  * with plain long multiply-adds (the unreduced sum fits a long for
  * k <= 8: 255 * Σ 31^j ≈ 7.2e12), no allocation per shingle, fully
  * inside whole-stage codegen. The DuckDB oracle states the identical
  * arithmetic with literal powers, so results hash-match bit-for-bit.
  *
  * Positions run 1, 1+stride, ... max(len-k+1, 1) (saturating so short
  * docs get one shingle); characters past the end contribute 0. Char
  * codes are UTF-16 units Spark-side == codepoints for BMP text (the
  * oracle's `ord()`); supplementary-plane text would diverge — the
  * corpus contract here is BMP.
  */
case class ShingleHash32(child: Expression, k: Int, stride: Int)
    extends UnaryExpression {
  require(k >= 1 && k <= 12, "k > 12 would overflow the unreduced long sum")
  require(stride >= 1, "stride must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string argument")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash32"

  override def nullSafeEval(input: Any): Any = {
    val s = input.toString
    val n = s.length
    val last = math.max(n - k + 1, 1)
    val cnt = (last - 1) / stride + 1
    val out = new Array[Long](cnt)
    var p = 0
    while (p < cnt) {
      val i = p * stride
      var h = 0L
      var j = 0
      while (j < k) {
        val idx = i + j
        h = h * 31L + (if (idx < n) s.charAt(idx).toLong else 0L)
        j += 1
      }
      out(p) = h & 0xFFFFFFFFL
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      val cnt = ctx.freshName("cnt")
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val j = ctx.freshName("j")
      val idx = ctx.freshName("idx")
      s"""
         |java.lang.String $s = $a.toString();
         |int $n = $s.length();
         |int $cnt = (java.lang.Math.max($n - $k + 1, 1) - 1) / $stride + 1;
         |long[] $out = new long[$cnt];
         |for (int $p = 0; $p < $cnt; $p++) {
         |  int $i = $p * $stride;
         |  long $h = 0L;
         |  for (int $j = 0; $j < $k; $j++) {
         |    int $idx = $i + $j;
         |    $h = $h * 31L + ($idx < $n ? (long) $s.charAt($idx) : 0L);
         |  }
         |  $out[$p] = $h & 0xFFFFFFFFL;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): ShingleHash32 =
    copy(child = c)
}

object TextHashExpressions {

  /** The literal 31-powers the DuckDB oracle must use for the same k. */
  def polyPowers(k: Int): Seq[Long] =
    (0 until k).map(j => (0 until (k - 1 - j)).foldLeft(1L)((acc, _) => acc * 31L))

  def shingle_hash32(text: Column, k: Int, stride: Int): Column = {
    register(SparkSession.active)
    org.apache.spark.sql.functions.call_function(
      "shingle_hash32", text,
      org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(stride))
  }

  private def builder(es: Seq[Expression]): Expression =
    ShingleHash32(es.head,
      es(1).eval().asInstanceOf[Int], es(2).eval().asInstanceOf[Int])

  /** Idempotent per-session registration (resolution goes through the
    * function registry — no private Spark internals).
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("shingle_hash32", builder, "built-in")
  }
}
