package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector helpers over `ArrayType(FloatType)` columns.
  *
  * Everything is built from codegen'd builtin higher-order functions
  * (`transform`/`zip_with`/`aggregate`) — no UDFs, so whole-stage codegen
  * stays intact (SURVEY §4).
  *
  * Cross-engine determinism: float dot products summed in parallel are
  * order-dependent, so similarity scores that must hash-match the DuckDB
  * oracle are computed over *quantized* vectors (`round(x*1000)` as
  * BIGINT): integer sums are exact and order-free, and every subsequent
  * double op (sqrt/divide) is IEEE-deterministic given identical inputs.
  */
object VectorFunctions {

  /** Quantize a float vector to integer milliunits. The element is
    * cast to DOUBLE before the multiply, EXPLICITLY: a float32 product
    * rounds differently at representation edges (0.3195f * 1000 is
    * 319.5 in float32 but 319.4999992... in double — round() then
    * disagrees by one), and the DuckDB oracle performs the same
    * double-width multiply. Found at sf0.1 via s08, which sums every
    * vector and so catches any single off-by-one the top-k queries
    * can dodge.
    */
  def quantize(v: Column, scale: Int = 1000): Column =
    transform(v, x => round(x.cast("double") * scale).cast("long"))

  /** Exact integer dot product of two quantized vectors — the fused
    * native loop ([[VecDotLong]]); same integer arithmetic and null
    * semantics as the `aggregate(zip_with(...))` composition it
    * replaced, at none of its per-element lambda + intermediate-array
    * cost.
    */
  def dotQ(a: Column, b: Column): Column = VecExpressions.vec_dot_q(a, b)

  /** Exact integer squared norm of a quantized vector. */
  def normSqQ(v: Column): Column = dotQ(v, v)

  /** Deterministic cosine similarity of two quantized vectors
    * (dot / (sqrt(|a|²) * sqrt(|b|²)) — identical op sequence in the
    * DuckDB oracle).
    */
  def cosineQ(a: Column, b: Column, aNormSq: Column, bNormSq: Column): Column =
    dotQ(a, b) / (sqrt(aNormSq.cast("double")) * sqrt(bNormSq.cast("double")))

  /** Plain double-precision cosine (fast path, NOT oracle-deterministic —
    * use for production scoring where a 1-ulp difference is irrelevant).
    */
  def cosine(a: Column, b: Column): Column = {
    val ad = transform(a, _.cast("double"))
    val bd = transform(b, _.cast("double"))
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (s, x) => s + x)
    val denom = sqrt(aggregate(ad, lit(0.0), (s, x) => s + x * x)) *
      sqrt(aggregate(bd, lit(0.0), (s, x) => s + x * x))
    when(denom === 0.0, lit(0.0)).otherwise(dot / denom) // zero vector; ANSI-safe
  }

  /** Axis-aligned LSH signature from the signs of the first `bits`
    * quantized components — the cheapest deterministic bucketing (used
    * where the blocking only needs *identical* vectors to collide, e.g.
    * exact-duplicate detection).
    */
  def signBucket(q: Column, bits: Int): Column =
    (0 until bits).map { i =>
      when(element_at(q, i + 1) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Seeded signed-random-projection hyperplanes: `bits` x `dim` entries
    * in {-1, 0, 1} (sparse SRP a la Achlioptas/Li), deterministic from
    * the seed so the DuckDB oracle embeds the identical literals.
    */
  def srpPlanes(bits: Int, dim: Int, seed: Long = 42L): Array[Array[Long]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bits)(Array.fill(dim) {
      rnd.nextInt(6) match { // P(+1)=P(-1)=1/6, P(0)=2/3 — sparse SRP
        case 0 => 1L
        case 1 => -1L
        case _ => 0L
      }
    })
  }

  /** True SRP-LSH signature: bit i = sign(q . plane_i). Integer dot of a
    * quantized vector with a {-1,0,1} plane is exact, so the signature
    * is bit-identical across engines. Cosine-similar vectors collide
    * with probability 1 - theta/pi per bit.
    */
  def srpBucket(q: Column, planes: Array[Array[Long]]): Column =
    planes.zipWithIndex.map { case (plane, i) =>
      val dot = plane.zipWithIndex.collect {
        case (w, j) if w != 0L => element_at(q, j + 1) * w
      }.reduceOption[Column](_ + _).getOrElse(lit(0L))
      when(dot >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
}
