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
  * tolerance fudge.
  *
  * Scale notes: these are pure Catalyst column expressions
  * (`ArrayAggregate`/`ZipWith`) — no UDF/serialization boundary, but
  * Spark's higher-order functions are `CodegenFallback` (the lambda
  * fold evaluates interpreted over InternalRow inside the generated
  * stage; verified against the 4.1.2 jars). That is still far cheaper
  * than a Scala UDF (no encoder round-trip), and the engine keeps the
  * fold off corpus-sized hot paths by construction: brute-force top-k
  * broadcasts the query side and is the documented BASELINE, while the
  * IVF/LSH operators in Embeddings.scala bound the candidate set the
  * fold actually runs over at cluster scale.
  */
object Vectors {

  /** Exact widening float[] → double[]. */
  def toDouble(v: Column): Column = v.cast("array<double>")

  /** Sequential-fold dot product in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Squared Euclidean distance (sequential fold, no sqrt). */
  def distSq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

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
