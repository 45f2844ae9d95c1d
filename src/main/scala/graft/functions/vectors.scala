package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector / embedding kernels (SURVEY.md §2.8 D5, north-star similarity
  * search). Everything is expression-level (codegen'd array intrinsics), no
  * UDFs, no explode — one row in, one scalar out.
  *
  * Floats are quantized to 60-bit integers (`floor(x * 1e6)`) before any
  * reduction so dot products and norms are exact integer arithmetic: the
  * result is bit-identical across Spark partition orders AND across engines
  * (the DuckDB oracle uses the same quantization). A float embedding with
  * |x| < 5 quantizes to |q| < 5e6; a 4096-dim dot then stays below 2^53, so
  * even the final cast-to-double is exact.
  */
object vectors {

  /** Quantize array<float> to array<bigint> with scale 1e6. */
  def quantize(v: Column): Column =
    transform(v, x => floor(x.cast("double") * 1000000.0).cast("long"))

  /** Exact integer dot product of two quantized vectors. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (s, x) => s + x)

  /** Exact integer self dot product (squared L2 norm) of a quantized vector. */
  def normSqQ(a: Column): Column = dotQ(a, a)

  /** Cosine similarity from quantized integers: exact dot cast to double over
    * the product of IEEE-exact sqrt norms — deterministic in both engines. */
  def cosineQ(a: Column, b: Column): Column =
    dotQ(a, b).cast("double") / (sqrt(normSqQ(a).cast("double")) * sqrt(normSqQ(b).cast("double")))

  /** Max embedding dimension the precomputed LSH weight tables cover. */
  val MaxDim = 4096

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Driver-side precomputed hyperplane weight: same value the SQL oracle
    * derives as CAST(concat('0x', substr(md5(seed||'|'||p||'|'||i), 1, 15))
    * AS BIGINT) % 2001 - 1000. */
  private def weight(seed: String, p: Int, i: Int): Long =
    java.lang.Long.parseLong(md5Hex(s"$seed|$p|$i").substring(0, 15), 16) % 2001L - 1000L

  /** Random-hyperplane LSH bucket for cosine similarity: `planes` signed
    * projections onto md5-derived pseudo-random hyperplanes packed into one
    * integer bucket id. Used to restrict ANN search to same-bucket candidates
    * at scale (IVF/LSH path). Deterministic given the seed.
    *
    * The hyperplane component for (seed, plane p, dim i) is
    * hash60("seed|p|i") % 2001 - 1000 ∈ [-1000, 1000] — integer, so the
    * signed projection is exact integer arithmetic. Weights are materialized
    * as literals at plan-build time — computing md5 per row per dim would put
    * planes*dim hashes on the hot path for a constant table.
    */
  def lshBucket(q: Column, planes: Int, seed: String): Column = {
    val bits = (0 until planes).map { p =>
      val w = typedLit((1 to MaxDim).map(i => weight(seed, p, i)))
      val proj = aggregate(
        zip_with(q, slice(w, lit(1), size(q)), (x, wi) => x * wi),
        lit(0L),
        (s, x) => s + x
      )
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Deterministic mock embedding (dim `d`) of a text column: component i is
    * an md5-derived integer in [0, 1000). Stands in for the reference's HTTP
    * embedding client (wurzel/steps/embedding/huggingface.py:43-192) in
    * tests/oracles; the real client is `graft.operators.Embedding`. */
  def mockEmbedQ(text: Column, d: Int): Column =
    transform(sequence(lit(0), lit(d - 1)), i =>
      conv(substring(md5(concat(text, lit("#e"), i)), 1, 8), 16, 10).cast("long") % 1000L)
}
