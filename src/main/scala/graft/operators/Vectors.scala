package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector/similarity primitives over `array<float>` embedding columns
  * (LLM-pipeline surface, BASELINE.json; the reference has no array types
  * at all — SURVEY.md §1.2).
  *
  * Determinism contract: floats are widened to double (exact), products
  * and sums run as a SEQUENTIAL left fold in double — bit-identical to
  * DuckDB's `list_dot_product(CAST(x AS DOUBLE[]), ...)` (verified
  * empirically; both are ordered accumulations, and IEEE multiply is
  * commutative), so similarity queries are oracle-checkable with no
  * tolerance fudge. Note the widening happens BEFORE multiplication
  * (`toDouble` wraps each input ahead of the kernel): a float-array
  * pair multiplies in double here, whereas the pre-round-10 zip_with
  * fold multiplied array<float> inputs in float precision and widened
  * the products. Current call sites all pre-cast to array<double>, so
  * the bit-identical claim is scoped to double inputs; a future
  * float-array call site gets (correctly rounded) double products,
  * not the old float ones.
  *
  * Scale notes: dot / distSq compile to the custom whole-stage-codegen
  * kernels in [[graft.functions.VecDot]]/[[graft.functions.VecDistSq]]
  * (round 10) — a tight primitive loop inside the generated stage.
  * Through round 10 they were `aggregate`/`zip_with` folds, which are
  * `CodegenFallback` (the lambda fold evaluates interpreted over
  * InternalRow, boxing per element; verified against the 4.1.2 jars).
  * The kernels accumulate in the SAME ascending order as the folds they
  * replaced, so every oracle result is bit-identical — re-verified by
  * the full gate after the swap. The engine still bounds the candidate
  * set the kernel runs over at cluster scale: brute-force top-k is the
  * documented BASELINE, IVF/LSH/PQ are the scale paths.
  */
object Vectors {

  import org.apache.spark.sql.GraftSqlBridge.{column => c, expression => x}

  /** Exact widening float[] → double[]. */
  def toDouble(v: Column): Column = v.cast("array<double>")

  /** Sequential-fold dot product in double (codegen'd kernel). */
  def dot(a: Column, b: Column): Column =
    c(graft.functions.VecDot(x(toDouble(a)), x(toDouble(b))))

  /** L2 norm. */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Squared Euclidean distance (sequential fold, no sqrt;
    * codegen'd kernel). */
  def distSq(a: Column, b: Column): Column =
    c(graft.functions.VecDistSq(x(toDouble(a)), x(toDouble(b))))

  /** Cosine similarity; caller supplies precomputed norms to avoid
    * recomputing them per pair. Zero-norm vectors yield SQL null (no
    * direction → no similarity) rather than an ANSI divide-by-zero
    * failure; threshold filters then drop them. */
  def cosine(dotAB: Column, normA: Column, normB: Column): Column =
    when(normA * normB > 0, dotAB / (normA * normB))

  /** Deterministic pseudo-random hyperplane component i of plane j, in
    * [-0.5, 0.5): integer Weyl-style mix then scale. Pure integer + one
    * double division → bit-identical in any engine. */
  def hyperplaneComponent(j: Int, i: Column): Column =
    ((lit(j.toLong * 64L) + i) * lit(2654435761L) % lit(1000003L)) /
      lit(1000003.0) - lit(0.5)

  /** 64-dim hyperplane j as an in-engine generated array. */
  def hyperplane(j: Int, dim: Int = 64): Column =
    transform(sequence(lit(0), lit(dim - 1)), i => hyperplaneComponent(j, i))

  /** Sign-random-projection LSH bucket id from `nPlanes` hyperplanes. */
  def srpBucket(v: Column, nPlanes: Int, dim: Int = 64): Column = {
    require(nPlanes >= 1 && nPlanes <= 63,
      s"nPlanes ($nPlanes) must be in [1, 63]: 1L << j wraps mod 64")
    (0 until nPlanes).map { j =>
      when(dot(v, hyperplane(j, dim)) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Banded SRP bucket: band `band` hashes planes
    * `[band*planesPerBand, (band+1)*planesPerBand)` into one id. Two
    * vectors are LSH candidates when any band collides — more bands →
    * higher recall, more planes per band → fewer false candidates
    * (the cosine analog of MinHash banding). */
  def srpBandBucket(v: Column, band: Int, planesPerBand: Int,
      dim: Int = 64): Column = {
    require(planesPerBand >= 1 && planesPerBand <= 63)
    (0 until planesPerBand).map { p =>
      when(dot(v, hyperplane(band * planesPerBand + p, dim)) > 0,
        lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }
}
