package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** [EXT] Vector similarity primitives over `array<float>` embedding columns
  * (SURVEY §2.11). All are higher-order-function compositions
  * (`zip_with`/`aggregate`/`transform`) — native Catalyst expressions, no
  * Scala UDFs, so they stay inside codegen and serialize nothing per row.
  *
  * Determinism: products and sums are forced to DOUBLE before accumulation and
  * fold left-to-right in element order, so results are bit-stable and
  * reproducible against an oracle computing the same left-associated chain.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ as an in-order double fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine similarity in [-1, 1]; NULL for zero vectors. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na === 0 || nb === 0, lit(null)).otherwise(d / (na * nb))
  }

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val diff = x.cast("double") - y.cast("double")
        diff * diff
      }),
      lit(0.0), (acc, x) => acc + x))

  /** Random-hyperplane (sign) LSH bucket id with `bits` hyperplanes.
    *
    * Hyperplane components are deterministic pseudo-random ±1 from a
    * SplitMix64 counter stream seeded by (seed, planeIdx) — computed
    * DRIVER-side and embedded as plan literals, so per-row evaluation is a
    * literal-weighted sum (no per-row hashing inside the fold), every
    * executor sees identical hyperplanes with zero broadcast state, and an
    * external oracle can reproduce the exact bucket function from
    * [[planeSigns]]. Bucketing cost is O(bits × dim) per row; at 100 TB the
    * bucket id becomes the shuffle key and candidate search touches only
    * same-bucket rows (brute force within bucket), turning O(n²) ANN into
    * O(n²/2^bits) expected.
    */
  def lshBucket(v: Column, bits: Int = 8, seed: Int = 42): Column =
    lshBucketImpl(v, bits, seed)

  /** Supported vector length bound for the precomputed hyperplane signs:
    * vectors longer than this would see null signs past the bound (zip_with
    * pads) and bucket to 0. Raise alongside embedding width if needed.
    */
  val MaxDim = 128

  /** SplitMix64 finalizer (Steele, Lea & Flood, "Fast splittable
    * pseudorandom number generators", OOPSLA 2014 — public domain).
    */
  private def splitmix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** The ±1 hyperplane signs for plane `j` (deterministic in (seed, j, i)).
    * Public so oracles/tools can regenerate the identical hyperplanes.
    */
  def planeSigns(seed: Int, j: Int, dim: Int = MaxDim): IndexedSeq[Double] = {
    val planeKey = splitmix64(seed.toLong ^ (j.toLong * 0x9e3779b97f4a7c15L))
    (0 until dim).map { i =>
      if ((splitmix64(planeKey + i) & 1L) == 0L) 1.0 else -1.0
    }
  }

  /** Symmetric int8 quantization: struct(q: array&lt;int&gt; in [-127,127],
    * scale: double). 4× smaller at rest than float32 — the storage-side
    * compression for embedding columns at 100 TB; cosine is scale-invariant,
    * so similarity search on the quantized form loses only rounding precision
    * (≈1e-2 on unit-norm vectors).
    */
  def quantizeInt8(v: Column): Column = {
    val maxAbs = array_max(transform(v, x => abs(x.cast("double"))))
    val scale = when(maxAbs === 0, lit(1.0)).otherwise(lit(127.0) / maxAbs)
    struct(
      transform(v, x => round(x.cast("double") * scale).cast("int")).as("q"),
      scale.as("scale"))
  }

  /** Dequantize back to double vectors (q / scale). */
  def dequantize(qs: Column): Column =
    transform(qs.getField("q"), x => x.cast("double") / qs.getField("scale"))

  /** Query-directed MULTI-PROBE bucket list (Lv et al., "Multi-Probe LSH",
    * VLDB 2007): the query's own bucket first, then the buckets reached by
    * flipping its `flips` lowest-|projection| sign bits one at a time — the
    * bits most likely to disagree for a true neighbour are exactly the ones
    * whose hyperplane the query sits closest to. Probing 1+flips buckets
    * multiplies candidate cost by that factor while recovering most of the
    * recall a single hash table loses; the probe list is computed from the
    * SAME projections as [[lshBucket]], so probe ids land in the same bucket
    * space with zero extra state.
    */
  def lshProbeBuckets(v: Column, bits: Int = 8, seed: Int = 42, flips: Int = 2): Column = {
    val projArr = projections(v, bits, seed)
    val powers = typedlit((0 until bits).map(j => 1L << j))
    val bucket = aggregate(
      zip_with(projArr, powers, (p, pw) => when(p >= 0, pw).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
    // flip order: ascending |projection| margin (struct sort on first field)
    val order = sort_array(zip_with(projArr,
      typedlit((0 until bits).map(_.toLong)),
      (p, i) => struct(abs(p).as("m"), i.as("i"))))
    val flipped = transform(slice(order, 1, flips),
      e => bucket.bitwiseXOR(element_at(powers, e.getField("i").cast("int") + 1)))
    concat(array(bucket), flipped).as("lsh_probes")
  }

  /** zip the vector with its index to evaluate Σ v[i]·sign(hash(j,i));
    * bucket bit j = (projection_j >= 0).
    */
  private def lshBucketImpl(v: Column, bits: Int, seed: Int): Column = {
    val bitVals = (0 until bits).map { j =>
      when(projection(v, j, seed) >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    bitVals.reduce(_ + _).as("lsh_bucket")
  }

  /** Signed projection of `v` onto pseudo-random hyperplane `j` — shared by
    * [[lshBucket]] and [[lshProbeBuckets]] so bucket ids agree bit-for-bit.
    * Left-to-right double fold of x·(±1) with literal signs; bit-identical to
    * an oracle summing the same sign-applied terms in element order.
    */
  private def projection(v: Column, j: Int, seed: Int): Column = {
    val signs = typedlit(planeSigns(seed, j).toSeq)
    aggregate(
      zip_with(v, slice(signs, lit(1), size(v)), (x, sg) => x.cast("double") * sg),
      lit(0.0), (acc, x) => acc + x)
  }

  private def projections(v: Column, bits: Int, seed: Int): Column =
    array((0 until bits).map(j => projection(v, j, seed)): _*)
}
