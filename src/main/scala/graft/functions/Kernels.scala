package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** JVM kernels for the hash-heavy document operators, exposed as Scala UDFs.
  *
  * The pure-`Column` formulations in [[text]] are kept for the SQL surface
  * and as the semantic spec, but Spark evaluates higher-order functions
  * (transform/aggregate/zip_with) interpreted — measured ~10µs per lambda
  * step, which puts a 300-shingle doc at ~15ms per pass. These UDFs compute
  * the exact same md5-derived values (bit-for-bit — the DuckDB oracles keep
  * matching) in tight JVM loops. Preference order per SURVEY.md §4: native
  * codegen Expression > Scala UDF > interpreted HOF chain; UDF is the
  * pragmatic middle until a doGenCode Expression is warranted.
  */
object Kernels {

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  /** Lowercase hex md5 — identical to Spark's md5() / DuckDB's md5(). */
  def md5Hex(s: String): String = {
    val dig = mdLocal.get()
    dig.reset()
    val bytes = dig.digest(s.getBytes("UTF-8"))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** First 7 hex chars of md5 as a 28-bit non-negative long
    * (== text.shingleHash28 / oracle CAST(concat('0x', substr(md5(x),1,7)))). */
  def hash28(s: String): Long = {
    val dig = mdLocal.get()
    dig.reset()
    val b = dig.digest(s.getBytes("UTF-8"))
    ((b(0) & 0xffL) << 20) | ((b(1) & 0xffL) << 12) | ((b(2) & 0xffL) << 4) | ((b(3) & 0xf0L) >> 4)
  }

  /** First 15 hex chars of md5 as a 60-bit non-negative long
    * (== text.hash60 without the seed suffix handling — pass the suffixed
    * string). */
  def hash60(s: String): Long = {
    val dig = mdLocal.get()
    dig.reset()
    val b = dig.digest(s.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    (v << 4) | ((b(7) & 0xf0L) >> 4)
  }

  private val WsRun = java.util.regex.Pattern.compile("\\s+")

  /** Whitespace tokens — same as Spark split(col, "\\s+") for non-null
    * input; null tokenizes to NO tokens (Spark UDFs don't null-check
    * String args, so every kernel flowing through here must degrade to
    * empty results rather than NPE the stage — TLSH's Option guard is the
    * same contract). */
  def tokenize(text: String): Array[String] =
    if (text == null) Array.empty else WsRun.split(text, -1)

  /** Distinct word n-gram shingles, first-seen order. */
  def shingleSet(toks: Array[String], n: Int): java.util.LinkedHashSet[String] = {
    val set = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + n <= toks.length) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      set.add(sb.toString)
      i += 1
    }
    set
  }

  /** MinHash signature over distinct n-gram shingles: min over shingles of
    * ((31j+97)*hash28 + 907j+13) % 1000000007 per seed j; Long.MaxValue
    * sentinels for docs with < n tokens. == text.minhashSignature. */
  def minhashSig(text: String, k: Int, n: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    val it = shingleSet(tokenize(text), n).iterator()
    while (it.hasNext) {
      val h = hash28(it.next())
      var j = 0
      while (j < k) {
        val v = ((31L * j + 97L) * h + 907L * j + 13L) % 1000000007L
        if (v < sig(j)) sig(j) = v
        j += 1
      }
    }
    sig
  }

  /** SimHash fingerprint (frequency-weighted tokens, 60-bit token hash with
    * '#sh' suffix). == text.simhash. */
  def simhashFp(text: String, bits: Int): Long = {
    val votes = new Array[Int](bits)
    val toks = tokenize(text)
    var i = 0
    while (i < toks.length) {
      val h = hash60(toks(i) + "#sh")
      var b = 0
      while (b < bits) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < bits) { if (votes(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }

  /** Distinct n-gram shingles as an array column value. */
  def shingleArr(text: String, n: Int): Array[String] = {
    val set = shingleSet(tokenize(text), n)
    set.toArray(new Array[String](set.size))
  }

  /** Winnowing fingerprint set (north-star "document fingerprinting,
    * rolling hash"; Schleimer et al. 2003): hash consecutive word n-grams
    * (NOT deduped — sequence order matters), take the min of every sliding
    * window of `w` hashes, return the distinct selected hashes sorted.
    * Guarantees every shared substring of length >= n+w-1 words contributes
    * a shared fingerprint — the classic plagiarism/near-dup sketch. */
  def winnow(text: String, n: Int, w: Int): Array[Long] = {
    val toks = tokenize(text)
    if (toks.length < n) return Array.empty
    val hs = new Array[Long](toks.length - n + 1)
    var i = 0
    while (i + n <= toks.length) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      hs(i) = hash28(sb.toString)
      i += 1
    }
    val sel = new java.util.TreeSet[java.lang.Long]()
    if (hs.length <= w) { var m = hs(0); var k = 1; while (k < hs.length) { if (hs(k) < m) m = hs(k); k += 1 }; sel.add(m) }
    else {
      var s = 0
      while (s + w <= hs.length) {
        var m = hs(s); var k = s + 1
        while (k < s + w) { if (hs(k) < m) m = hs(k); k += 1 }
        sel.add(m)
        s += 1
      }
    }
    val out = new Array[Long](sel.size)
    val it = sel.iterator(); var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    out
  }

  def winnowUdf(n: Int, w: Int): UserDefinedFunction =
    udf((text: String) => winnow(text, n, w))

  /** Rolling `w`-token window hashes for ExactSubstr dedup: element i is
    * hash60 of the space-joined tokens [i, i+w) + "#win" — byte-identical
    * to the Column form `hash60(concat_ws(" ", slice(tokens, i+1, w)),
    * "win")` and to the oracle's md5-prefix scheme, but one JVM pass per
    * doc instead of an interpreted per-window lambda chain. Empty when the
    * doc has fewer than w tokens; null tokenizes to no windows. */
  def windowHashes(text: String, w: Int): Array[Long] = {
    val toks = tokenize(text)
    if (toks.length < w) return Array.empty
    val out = new Array[Long](toks.length - w + 1)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i + w <= toks.length) {
      sb.setLength(0)
      sb.append(toks(i))
      var j = 1
      while (j < w) { sb.append(' ').append(toks(i + j)); j += 1 }
      sb.append("#win")
      out(i) = hash60(sb.toString)
      i += 1
    }
    out
  }

  def windowHashesUdf(w: Int): UserDefinedFunction =
    udf((text: String) => windowHashes(text, w))

  /** Stride-window chunk texts: chunk k covers tokens [k*stride,
    * min(k*stride + window, n)), space-joined — byte-identical to the
    * Column form `concat_ws(" ", slice(tokens, k*stride + 1, window))`
    * over `ceil(n / stride)` chunks, one JVM pass per doc instead of an
    * interpreted per-chunk slice+join. Empty text yields one "" chunk
    * (tokenize("") is [""], matching Spark split); null yields none. */
  def strideChunkTexts(text: String, window: Int, stride: Int): Array[String] = {
    val t = tokenize(text)
    if (t.isEmpty) return Array.empty
    val n = t.length
    val nc = (n + stride - 1) / stride
    val out = new Array[String](nc)
    var k = 0
    while (k < nc) {
      val start = k * stride
      val end = math.min(start + window, n)
      val sb = new java.lang.StringBuilder()
      var i = start
      while (i < end) { if (i > start) sb.append(' '); sb.append(t(i)); i += 1 }
      out(k) = sb.toString
      k += 1
    }
    out
  }

  /** Stride chunks as (chunks_count, chunk_text) structs: the count rides
    * in every element so the chunker reads it off the exploded row — one
    * kernel evaluation, one tokenization, and the count structurally
    * cannot disagree with the number of rows. */
  def strideChunksUdf(window: Int, stride: Int): UserDefinedFunction =
    udf { text: String =>
      val a = strideChunkTexts(text, window, stride)
      a.map(s => (a.length, s))
    }

  /** Bigram transition pairs for LM scoring: element i is (w_i + " " +
    * w_{i+1}, w_i) — byte-identical to the per-transition concat_ws
    * Column chain, one JVM pass (the interpreted transform measured 13s
    * vs ~2s on the sf0.1 corpus). Fewer than 2 tokens -> no pairs. */
  def bigramPairs(text: String): Array[(String, String)] = {
    val t = tokenize(text)
    if (t.length < 2) return Array.empty
    val out = new Array[(String, String)](t.length - 1)
    var i = 0
    while (i < t.length - 1) {
      out(i) = (t(i) + " " + t(i + 1), t(i))
      i += 1
    }
    out
  }

  def bigramPairsUdf: UserDefinedFunction = udf((text: String) => bigramPairs(text))

  /** Per-doc term frequencies in ONE pass: whitespace tokens (optionally
    * ROOT-locale case-folded) -> (term -> count) map. Emitting the per-doc
    * MAP instead of raw tokens pre-aggregates within-doc repetition before
    * any exchange: the posting census shuffles |distinct terms per doc|
    * rows, not |tokens| — on natural text a 2-5x reduction before the term
    * key ever hits a partitioner. Null text -> empty map (kernel null
    * contract, see [[tokenize]]). */
  def termFreq(text: String, lowercase: Boolean): Map[String, Int] = {
    val base = if (text != null && lowercase)
      text.toLowerCase(java.util.Locale.ROOT) else text
    val toks = tokenize(base)
    val m = scala.collection.mutable.HashMap.empty[String, Int]
    var i = 0
    while (i < toks.length) {
      m.update(toks(i), m.getOrElse(toks(i), 0) + 1)
      i += 1
    }
    m.toMap
  }

  def termFreqUdf(lowercase: Boolean): UserDefinedFunction =
    udf((text: String) => termFreq(text, lowercase))

  /** [[termFreq]] plus the doc length (token count) from the SAME single
    * pass — the impact-ordered champion build needs dl for the BM25
    * length normalization and re-tokenizing to count would double the
    * kernel cost. Null text -> (0, empty map). */
  def termFreqDl(text: String, lowercase: Boolean): (Int, Map[String, Int]) = {
    val base = if (text != null && lowercase)
      text.toLowerCase(java.util.Locale.ROOT) else text
    val toks = tokenize(base)
    val m = scala.collection.mutable.HashMap.empty[String, Int]
    var i = 0
    while (i < toks.length) {
      m.update(toks(i), m.getOrElse(toks(i), 0) + 1)
      i += 1
    }
    (toks.length, m.toMap)
  }

  def termFreqDlUdf(lowercase: Boolean): UserDefinedFunction =
    udf((text: String) => termFreqDl(text, lowercase))

  /** Span-removal rebuild: drop every token covered by a flagged window
    * [p, p+w), p from the ASCENDING `sortedPos`, and space-join the rest.
    * Returns (keptText, coveredCount). One pass with a rolling cover-end
    * pointer — O(n + |positions|), where the equivalent filter/exists
    * Column form is O(n x |positions|) in interpreted lambdas (a fully-
    * duplicated 20k-token doc would pay ~4e8 lambda steps). */
  def stripCovered(text: String, sortedPos: Seq[Int], w: Int): (String, Long) = {
    val t = tokenize(text)
    val sb = new java.lang.StringBuilder()
    var coverEnd = -1
    var covered = 0L
    var pi = 0
    var i = 0
    while (i < t.length) {
      while (pi < sortedPos.length && sortedPos(pi) <= i) {
        val e = sortedPos(pi) + w
        if (e > coverEnd) coverEnd = e
        pi += 1
      }
      if (i < coverEnd) covered += 1
      else { if (sb.length > 0) sb.append(' '); sb.append(t(i)) }
      i += 1
    }
    (sb.toString, covered)
  }

  def stripCoveredUdf(w: Int): UserDefinedFunction =
    udf((text: String, ps: Seq[Int]) => stripCovered(text, ps, w))

  // ---- vector kernels -----------------------------------------------------

  /** Quantize float vector to exact longs (== vectors.quantize). */
  def quantizeVec(v: Array[Float]): Array[Long] = {
    val out = new Array[Long](v.length)
    var i = 0
    while (i < v.length) { out(i) = math.floor(v(i).toDouble * 1000000.0).toLong; i += 1 }
    out
  }

  def dotLong(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L; var i = 0
    while (i < a.length && i < b.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Hyperplane weight == vectors.weight (md5-derived, oracle-shared). */
  def planeWeight(seed: String, p: Int, i: Int): Long =
    java.lang.Long.parseLong(md5Hex(s"$seed|$p|$i").substring(0, 15), 16) % 2001L - 1000L

  /** LSH bucket over a quantized vector (== vectors.lshBucket). Weight
    * tables are memoized per (seed, planes, dim). */
  private val weightCache = new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Long]]]()
  def lshBucketVec(qv: Array[Long], planes: Int, seed: String): Long = {
    val key = s"$seed|$planes|${qv.length}"
    val w = weightCache.computeIfAbsent(key, _ =>
      Array.tabulate(planes, qv.length)((p, i) => planeWeight(seed, p, i + 1)))
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var proj = 0L; var i = 0
      while (i < qv.length) { proj += qv(i) * w(p)(i); i += 1 }
      if (proj > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  // ---- UDF wrappers -------------------------------------------------------

  def minhashSigUdf(k: Int, n: Int): UserDefinedFunction =
    udf((text: String) => minhashSig(text, k, n))

  def simhashUdf(bits: Int): UserDefinedFunction =
    udf((text: String) => simhashFp(text, bits))

  def shinglesUdf(n: Int): UserDefinedFunction =
    udf((text: String) => shingleArr(text, n))

  def shingleCountUdf(n: Int): UserDefinedFunction =
    udf((text: String) => shingleSet(tokenize(text), n).size)

  /** (quantized vector, squared norm, lsh bucket) in one pass. */
  def vecFeaturesUdf(planes: Int, seed: String): UserDefinedFunction =
    udf((v: Array[Float]) => {
      val qv = quantizeVec(v)
      (qv, dotLong(qv, qv), lshBucketVec(qv, planes, seed))
    })

  /** (quantized vector, squared norm) without bucketing. */
  def quantNormUdf: UserDefinedFunction =
    udf((v: Array[Float]) => { val qv = quantizeVec(v); (qv, dotLong(qv, qv)) })


  /** Deterministic pseudo-random rank of a key (for partition-order-free
    * sampling, e.g. k-means seed selection). */
  def md5RankUdf: UserDefinedFunction = udf((s: String) => hash60(s + "#rank"))

  /** Gopher-style repetition statistics over whitespace tokens (Rae et al.
    * 2021, "Scaling Language Models: Methods, Analysis & Insights from
    * Training Gopher", appendix A MassiveText quality filters): the most
    * frequent word `n`-gram with its occurrence count (ties break to the
    * lexicographically smallest gram, so the value is deterministic and
    * oracle-checkable), plus the characters covered by duplicate `m`-grams
    * (count x gram length summed over grams occurring more than once).
    * All-integer outputs — the fraction divisions happen once, identically,
    * on the Spark side and in the DuckDB oracle. One token pass, two hash
    * maps; no hashing of content, so no digest scheme to keep in sync. */
  def repStats(text: String, n: Int, m: Int): (String, Long, Long) = {
    val toks = tokenize(text)
    def gramCounts(g: Int): java.util.HashMap[String, Long] = {
      val counts = new java.util.HashMap[String, Long]()
      var i = 0
      while (i + g <= toks.length) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < g) { sb.append(' ').append(toks(i + j)); j += 1 }
        counts.merge(sb.toString, 1L, (a, b) => a + b)
        i += 1
      }
      counts
    }
    var topGram = ""
    var topCnt = 0L
    gramCounts(n).forEach { (gram, cnt) =>
      if (cnt > topCnt || (cnt == topCnt && (topCnt == 0L || gram < topGram))) {
        topGram = gram; topCnt = cnt
      }
    }
    var dupChars = 0L
    gramCounts(m).forEach { (gram, cnt) =>
      // codepoint count, not UTF-16 units — exact parity with DuckDB len()
      if (cnt > 1) dupChars += cnt * gram.codePointCount(0, gram.length)
    }
    (topGram, topCnt, dupChars)
  }

  def repStatsUdf(n: Int, m: Int): UserDefinedFunction =
    udf((text: String) => repStats(text, n, m))

  /** One-pass counts for the Gopher quality gate (QualityFilter): token
    * count, non-whitespace codepoints, tokens containing an ASCII letter,
    * stopword tokens, distinct tokens, line count, bullet lines ("- "/"* "
    * prefix), "..."-suffixed lines. All-integer outputs so the threshold
    * divisions happen once, identically, on the Spark side and in the
    * DuckDB oracle; semantics are exactly the Column formulation the q80
    * oracle pins (split("\\s+") tokens incl. a leading empty token,
    * codepoint lengths, ASCII [A-Za-z] alpha test). Replaces seven
    * interpreted higher-order lambdas (~ms/row) with one JVM pass. */
  def gopherStats(text: String, stop: Set[String]):
      (Long, Long, Long, Long, Long, Long, Long, Long) = {
    // null text = zero of everything -> fails word_count for any minTokens
    // >= 1 (a null doc must gate out, not kill the stage with an NPE)
    if (text == null) return (0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
    val toks = tokenize(text)
    var lenNoWs = 0L
    var nAlpha = 0L
    var nStop = 0L
    val distinct = new java.util.HashSet[String]()
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      lenNoWs += t.codePointCount(0, t.length)
      var hasAlpha = false
      var j = 0
      while (j < t.length && !hasAlpha) {
        val c = t.charAt(j)
        if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) hasAlpha = true
        j += 1
      }
      if (hasAlpha) nAlpha += 1
      if (stop.contains(t)) nStop += 1
      distinct.add(t)
      i += 1
    }
    val lines = text.split("\n", -1)
    var nBullet = 0L
    var nEllipsis = 0L
    var k = 0
    while (k < lines.length) {
      val l = lines(k)
      if (l.startsWith("- ") || l.startsWith("* ")) nBullet += 1
      if (l.endsWith("...")) nEllipsis += 1
      k += 1
    }
    (toks.length.toLong, lenNoWs, nAlpha, nStop, distinct.size.toLong,
      lines.length.toLong, nBullet, nEllipsis)
  }

  def gopherStatsUdf(stop: Seq[String]): UserDefinedFunction = {
    val set = stop.toSet
    udf((text: String) => gopherStats(text, set))
  }
}
