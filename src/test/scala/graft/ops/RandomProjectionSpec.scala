package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** s13 random projection: the sign-matrix contract (±1 only, the
  * basis-vector probe), exact linearity on integer-valued floats, and
  * the dim-mismatch guard.
  */
class RandomProjectionSpec extends AnyFunSuite with SparkSpec {

  import testImplicits._
  private lazy val testImplicits = spark.implicits

  private val Dim = 8

  private def proj(rows: (Long, Seq[Float])*) =
    Similarity.randomProjection(rows.toDF("vec_id", "embedding"),
      "vec_id", "embedding", dim = Dim, outDim = 4)

  test("projecting basis vectors recovers a ±1 sign matrix") {
    val basis = (0 until Dim).map(i =>
      (i.toLong, Seq.tabulate(Dim)(k => if (k == i) 1.0f else 0.0f)))
    val rows = proj(basis: _*).orderBy("vec_id").collect()
    for (r <- rows; j <- 1 to 4) {
      val v = r.getDouble(j)
      assert(v === 1.0 || v === -1.0, s"sign matrix entry was $v")
    }
  }

  test("projection is exactly linear on integer-valued floats") {
    val x = Seq.tabulate(Dim)(i => (i + 1).toFloat)
    val y = Seq.tabulate(Dim)(i => (2 * i + 3).toFloat)
    val sum = x.zip(y).map { case (a, b) => a + b }
    val out = proj(1L -> x, 2L -> y, 3L -> sum).orderBy("vec_id").collect()
    for (j <- 1 to 4)
      assert(out(0).getDouble(j) + out(1).getDouble(j) === out(2).getDouble(j))
  }

  test("a row with the wrong dimension raises instead of projecting nulls") {
    val e = intercept[Exception] {
      proj(1L -> Seq.tabulate(Dim + 1)(_.toFloat)).collect()
    }
    assert(e.getMessage.contains("expected dim"))
  }

  test("a NULL embedding raises instead of silently projecting nulls") {
    // size(null) is null, so a bare `size =!= dim` guard never fires on
    // a NULL vector — the guard must test isNull explicitly
    val df = Seq(Tuple2(1L, Seq.tabulate(Dim)(_.toFloat)))
      .toDF("vec_id", "embedding")
      .unionByName(Seq(Tuple1(2L)).toDF("vec_id")
        .withColumn("embedding", lit(null).cast("array<float>")))
    val e = intercept[Exception] {
      Similarity.randomProjection(df, "vec_id", "embedding",
        dim = Dim, outDim = 4).collect()
    }
    assert(e.getMessage.contains("NULL vector"))
  }
}
