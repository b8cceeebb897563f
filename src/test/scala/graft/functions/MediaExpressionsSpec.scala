package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class MediaExpressionsSpec extends AnyFunSuite with SparkSpec {

  private val payload = "abcde".getBytes("UTF-8")

  // W=2 over "abcde": windows "ab", "cd" (trailing 'e' dropped)
  //   ab: (97-128)^2 + (98-128)^2 = 1861; cd: 841 + 784 = 1625
  // W=3: one full window "abc": 961 + 900 + 841 = 2702
  test("codegen path: two instances in one scope, exact energies, window rule") {
    val a = BoundReference(0, BinaryType, nullable = false)
    val proj = GenerateUnsafeProjection.generate(
      Seq(Pcm8WindowEnergy(a, 2), Pcm8WindowEnergy(a, 3)))
    val out = proj(InternalRow(payload))
    assert(out.getArray(0).toLongArray.toSeq == Seq(1861L, 1625L))
    assert(out.getArray(1).toLongArray.toSeq == Seq(2702L))
  }

  test("interpreted path agrees; short payload gets one short window; empty gets none") {
    val a = BoundReference(0, BinaryType, nullable = false)
    def run(bytes: Array[Byte], w: Int): Seq[Long] =
      Pcm8WindowEnergy(a, w).eval(InternalRow(bytes))
        .asInstanceOf[ArrayData].toLongArray.toSeq
    assert(run(payload, 2) == Seq(1861L, 1625L))
    assert(run("a".getBytes("UTF-8"), 100) == Seq(961L))
    assert(run(Array.emptyByteArray, 100) == Seq.empty)
    // unsigned byte handling: 0xFF reads as 255, not -1
    assert(run(Array(0xFF.toByte), 4) == Seq((255L - 128L) * (255L - 128L)))
  }

  test("SQL builder validates windowBytes: non-literal and non-INT get a typed analysis error") {
    import spark.implicits._
    MediaExpressions.register(spark)
    Seq((Array[Byte](1, 2), 2)).toDF("b", "w").createOrReplaceTempView("pcm_in")
    // the codegen'd function itself works through raw SQL
    assert(spark.sql("SELECT pcm8_window_energy(b, 2) AS e FROM pcm_in")
      .head().getSeq[Long](0).nonEmpty)
    def analysisMessage(sql: String): String = {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(sql).collect()
      }
      e.getMessage
    }
    // a column reference is not foldable
    assert(analysisMessage("SELECT pcm8_window_energy(b, w) FROM pcm_in")
      .contains("foldable integer literal"))
    // a BIGINT literal evals to Long, not Int
    assert(analysisMessage("SELECT pcm8_window_energy(b, 1000000000000) FROM pcm_in")
      .contains("foldable integer literal"))
  }

  test("pcm8_decimate: pair averages, odd tail passthrough, unsigned bytes, empty, null") {
    import spark.implicits._
    def run(bytes: Array[Byte]): Seq[Int] =
      Seq(Tuple1(bytes)).toDF("b")
        .select(MediaExpressions.pcm8_decimate(col("b")))
        .head().getAs[Array[Byte]](0).toSeq.map(_ & 0xFF)
    // (10+20)/2=15, (30+41)/2=35 (truncating), odd tail 99 unaveraged
    assert(run(Array[Byte](10, 20, 30, 41, 99)) == Seq(15, 35, 99))
    // unsigned: 0xFF + 0x01 -> 128, never (-1 + 1)/2 = 0
    assert(run(Array(0xFF.toByte, 0x01.toByte)) == Seq(128))
    assert(run(Array.emptyByteArray) == Seq())
    val n = Seq(Tuple1(null: Array[Byte])).toDF("b")
      .select(MediaExpressions.pcm8_decimate(col("b"))).head()
    assert(n.isNullAt(0))
    // halving twice == quartering the length (composability)
    val big = Array.tabulate[Byte](101)(i => (i * 7 % 256).toByte)
    val once = run(big)
    assert(once.length == 51)
    val twice = Seq(Tuple1(big)).toDF("b")
      .select(MediaExpressions.pcm8_decimate(
        MediaExpressions.pcm8_decimate(col("b"))))
      .head().getAs[Array[Byte]](0)
    assert(twice.length == 26)
  }

  test("pcm8_normalize: negative branch, full-scale peak, silence passthrough, idempotent") {
    import spark.implicits._
    def run(bytes: Array[Byte]): Seq[Int] =
      Seq(Tuple1(bytes)).toDF("b")
        .select(MediaExpressions.pcm8_normalize(col("b")))
        .head().getAs[Array[Byte]](0).toSeq.map(_ & 0xFF)
    // d = -100 and +50, peak 100: -100 -> 128 - 127 = 1 (the NEGATIVE
    // branch the m15 oracle corpus never exercises), +50 -> 128 + 63
    // (50*127/100 truncated — magnitude-scaled, not floor-of-signed)
    assert(run(Array((128 - 100).toByte, (128 + 50).toByte)) == Seq(1, 191))
    // silence passes through, never divides by zero
    assert(run(Array.fill[Byte](4)(128.toByte)) == Seq(128, 128, 128, 128))
    // a normalized payload has peak 127, and renormalizing at peak
    // 127 is the identity (m * 127 / 127 == m): idempotence
    val onceN = run(Array((128 - 90).toByte, 128.toByte, (128 + 45).toByte))
    assert(onceN.map(v => math.abs(v - 128)).max == 127)
    val twiceN = Seq(Tuple1(onceN.map(_.toByte).toArray)).toDF("b")
      .select(MediaExpressions.pcm8_normalize(col("b")))
      .head().getAs[Array[Byte]](0).toSeq.map(_ & 0xFF)
    assert(twiceN == onceN)
  }
}
