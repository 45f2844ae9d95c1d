package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text / document scalar functions (SURVEY.md §2.9, §2.8).
  *
  * All functions are built from `org.apache.spark.sql.functions` built-ins so
  * they stay inside whole-stage codegen and are expressible 1:1 in the DuckDB
  * oracle SQL. No Scala UDFs on the hot path.
  *
  * Determinism rules (SURVEY.md §7): hash-derived integers use the first 15
  * hex chars of md5 (60 bits, always positive in an i64); doubles are only
  * ever produced by division of exact integers/decimals so Spark and DuckDB
  * agree bit-for-bit.
  */
object text {

  /** sha256 hex digest of a column (reference: content hashing,
    * wurzel/steps/qdrant/step.py:259-283). */
  def sha256Hex(c: Column): Column = sha2(c.cast("string"), 256)

  /** Evaluate `e` once per row and hand it to `f` as a lambda variable.
    * Catalyst's CollapseProject inlines a projected expression into every
    * downstream reference — for an expensive expression (md5 over hundreds
    * of shingles) referenced by k band keys that multiplies the work by k.
    * Lambda variables are bound values, so wrapping in a 1-element
    * transform is a let-binding the optimizer cannot undo. */
  def bindOnce(e: Column)(f: Column => Column): Column =
    element_at(transform(array(e), f), 1)

  /** Reference `PydanticModel.__hash__`: sha256 over the space-joined string
    * values of the fields sorted by field name
    * (wurzel/datacontract/datacontract.py:194-206). Callers pass columns
    * already sorted by field name. */
  def identityHash(sortedFields: Seq[Column]): Column =
    sha2(concat_ws(" ", sortedFields.map(_.cast("string")): _*), 256)

  /** Whitespace tokenizer (reference regex split,
    * wurzel/steps/embedding/step.py:35, 172-175). */
  def tokens(c: Column): Column = split(c, "\\s+")

  /** Token count of a text column (reference token counting,
    * wurzel/utils/tokenizers.py — whitespace flavor). */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** 60-bit deterministic hash: first 15 hex chars of md5(s || '#' || seed)
    * parsed base-16. Matches DuckDB
    * `CAST(concat('0x', substr(md5(s || '#<seed>'), 1, 15)) AS BIGINT)`. */
  def hash60(c: Column, seed: String): Column =
    conv(substring(md5(concat(c, lit("#" + seed))), 1, 15), 16, 10).cast("long")

  /** Distinct word n-gram shingles of a token array column. Empty array when
    * there are fewer than n tokens. */
  def shingles(toks: Column, n: Int): Column = {
    // transform(sequence(1, size-n+1), i -> concat_ws(' ', toks[i], ...))
    when(size(toks) < n, array().cast("array<string>")).otherwise(
      array_distinct(
        transform(
          sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*)
        )
      )
    )
  }

  /** 28-bit base hash of a shingle: first 7 hex chars of md5. Small enough
    * that affine re-hashing below never overflows an i64 (DuckDB BIGINT
    * arithmetic is checked, Spark's wraps — stay in the safe range). */
  def shingleHash28(c: Column): Column =
    conv(substring(md5(c), 1, 7), 16, 10).cast("long")

  /** Affine universal re-hash for seed j over a 28-bit base hash. */
  private def affineHash(j: Column, h: Column): Column =
    ((lit(31) * j + 97) * h + lit(907) * j + 13) % 1000000007L

  /** MinHash signature: k minimums over per-shingle hashes (scale path for
    * near-dup dedup; reference near-dup is TLSH,
    * wurzel/steps/qdrant/step.py:264-281 — MinHash is the distributed-join
    * friendly equivalent). Returns array<bigint> of length k; empty shingle
    * sets yield Long.MaxValue sentinels.
    *
    * One md5 per shingle, not k: the expensive hash runs once inside a
    * `transform`, and the k "permutations" are affine re-hashes mod a prime
    * computed in a single `aggregate` pass (higher-order functions are
    * interpreted, so a naive k-fold array_min would re-run md5 k times). */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    aggregate(
      transform(shingleCol, shingleHash28(_)),
      array_repeat(lit(Long.MaxValue), k),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(k - 1)),
        (m, j) => least(m, affineHash(j, h))))

  /** LSH band keys from a minhash signature: bands of r consecutive hashes
    * joined into a string key. Docs sharing any band key are candidates. */
  def bandKeys(sig: Column, k: Int, r: Int): Column =
    array((0 until k / r).map { b =>
      concat_ws(":", lit(b.toString) +: (0 until r).map(i => element_at(sig, b * r + i + 1)): _*)
    }: _*)

  /** SimHash fingerprint over a token array: `bits`-bit fingerprint where bit
    * i is set iff sum over tokens of (+1 / -1 by token-hash bit i) is > 0.
    * Frequency-weighted (tokens not deduped), like classic SimHash.
    *
    * Single pass: tokens are md5-hashed once, bit votes accumulate in an
    * array<long> of length `bits`, then the vote vector folds into the
    * packed fingerprint. (A per-bit aggregate would re-hash every token
    * `bits` times — higher-order functions don't share subexpressions.) */
  def simhash(toks: Column, bits: Int): Column = {
    val votes = aggregate(
      transform(toks, t =>
        conv(substring(md5(concat(t, lit("#sh"))), 1, 15), 16, 10).cast("long")),
      array_repeat(lit(0L), bits),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(bits - 1)),
        (c, b) => c + when(call_function("shiftright", h, b).bitwiseAND(lit(1L)) === 1L, 1L)
          .otherwise(-1L)))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(bits - 1)),
        (v, b) => when(v > 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))),
      lit(0L), (s, x) => s + x)
  }

  /** Jaccard similarity of two (already-distinct) array columns as an exact
    * double: |A ∩ B| / |A ∪ B| with an integer-valued numerator/denominator. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Replace every URL with the literal `LINK` (reference URL masking,
    * wurzel/steps/embedding/step.py:36, 214-233). */
  def maskUrls(c: Column): Column = regexp_replace(c, "https?://[^\\s]+", "LINK")

  /** PII redaction for training corpora (north-star surface extending the
    * reference's URL masking): emails, IPv4 addresses, then international
    * phone numbers are replaced with typed placeholder tokens, in that
    * order — the phone pattern requires a leading `+` so it can never eat
    * an IPv4 remnant. Patterns stay inside the RE2 subset (no lookaround,
    * no backrefs) so the DuckDB oracle applies the byte-identical regexes;
    * everything is codegen'd `regexp_replace`, zero UDFs. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+\\d{1,3}[ -]?\\d{2,4}[ -]?\\d{3,8}"

  def maskPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Unicode text normalization for corpus hygiene (north-star): a
    * C0/C1-control strip (C0 minus tab/newline/CR, DEL, and C1
    * U+0080-U+009F — the cp1252-mojibake band) followed by NFC
    * composition (so `e` + COMBINING ACUTE and precomposed `é` hash,
    * dedup, and tokenize identically). Order matters for idempotence —
    * stripping AFTER NFC can juxtapose a letter with a combining mark the
    * next pass would compose (caught by the PropertySpec fixpoint check);
    * stripping first is a fixpoint because NFC never emits controls.
    * Java's Normalizer and DuckDB's nfc_normalize implement the same
    * Unicode algorithm, so the oracle reproduces the bytes exactly. */
  private lazy val NfcUdf = org.apache.spark.sql.functions.udf(
    (s: String) => if (s == null) null
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))

  def normalizeText(c: Column): Column =
    NfcUdf(regexp_replace(c, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\x80-\\x9F]", ""))

  /** URL canonicalization for URL-level dedup of web corpora (north-star;
    * extends the reference's URL handling — filenameFromUrl/maskUrls):
    * lowercase scheme and host, strip the fragment, drop default ports
    * (:80/:443), drop tracking params (utm_*, fbclid, gclid), SORT the
    * surviving query params, and strip trailing path slashes. Non-URLs
    * (no `scheme://`) pass through unchanged. Pure deterministic
    * regex/array steps in the RE2-compatible subset, so the DuckDB oracle
    * applies the byte-identical pipeline. */
  def canonicalizeUrl(c: Column): Column = {
    val SchemeRe = "^[A-Za-z][A-Za-z0-9+.-]*://"
    val noFrag = regexp_replace(c, "#.*", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, SchemeRe, "")
    val authority = regexp_extract(rest, "^([^/?]*)", 1)
    // only the HOST is case-insensitive (RFC 3986) — userinfo keeps case
    val userinfo = regexp_extract(authority, "^([^@]*@)", 1)
    val hostPort = lower(regexp_replace(authority, "^[^@]*@", ""))
    // default-port strip is scheme-specific: http:80 / https:443 only —
    // http://host:443 is a DIFFERENT resource and must not merge
    val host = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val pathQ = regexp_replace(rest, "^[^/?]*", "")
    val path = regexp_replace(regexp_extract(pathQ, "^([^?]*)", 1), "/+$", "")
    val rawQ = regexp_extract(pathQ, "\\?(.*)$", 1)
    val params = array_sort(filter(split(rawQ, "&"),
      p => p =!= "" && !p.rlike("^(utm_[^=]*|fbclid|gclid)(=|$)")))
    val canon = concat(scheme, lit("://"), userinfo, host, path,
      when(size(params) > 0, concat(lit("?"), concat_ws("&", params)))
        .otherwise(lit("")))
    when(noFrag.rlike(SchemeRe), canon).otherwise(c)
  }

  /** Stopword-filtered token array (reference stopword filter,
    * wurzel/steps/embedding/step.py:71-76, 168-181). Keeps duplicates. */
  def removeStopwords(toks: Column, stopwords: Seq[String]): Column =
    filter(toks, t => !t.isin(stopwords: _*))

  /** Stopword list used by the language-id heuristic and quality scoring.
    * Small by design so the oracle SQL stays readable. */
  val EnStop: Seq[String] = Seq("the", "a", "and", "of", "to", "in", "is")
  val DeStop: Seq[String] = Seq("der", "die", "das", "und", "ist", "ein")
  val EsStop: Seq[String] = Seq("el", "la", "de", "que", "y", "los")
  val FrStop: Seq[String] = Seq("le", "la", "et", "les", "des", "un")

  private def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  /** Per-language marker-stopword counts; returns (en, de, es, fr) counts. */
  def langScores(toks: Column): (Column, Column, Column, Column) =
    (countIn(toks, EnStop), countIn(toks, DeStop), countIn(toks, EsStop), countIn(toks, FrStop))

  /** n-gram-heuristic language id: argmax of marker counts with fixed
    * tiebreak order en > de > es > fr; 'und' (undetermined) when all zero. */
  def langId(toks: Column): Column = {
    val (en, de, es, fr) = langScores(toks)
    val mx = greatest(en, de, es, fr)
    when(mx === 0, lit("und"))
      .when(en === mx, lit("en"))
      .when(de === mx, lit("de"))
      .when(es === mx, lit("es"))
      .otherwise(lit("fr"))
  }

  /** First-heading title extraction with fallbacks (reference
    * wurzel/steps/decagon/step.py:94-108): first `# ` heading, else first
    * line truncated to 100 chars. */
  def titleFromMd(md: Column): Column = {
    val h1 = regexp_extract(md, "(?m)^# (.*)$", 1)
    when(h1 =!= "", h1).otherwise(substring(regexp_extract(md, "^([^\\n]*)", 1), 1, 100))
  }

  /** Stable filename from a URL: host-stripped path, slashes trimmed, '.md'
    * (reference wurzel/steps/wonderful/step.py:234-243). */
  def filenameFromUrl(url: Column): Column =
    concat(regexp_replace(regexp_extract(url, "^https?://[^/]+/(.*)$", 1), "/+$", ""), lit(".md"))

  /** YAML-ish front-matter split (reference regex common.py:17):
    * `(?s)^---\n(.*?)\n---\n?(.*)$` — group 1 = header, group 2 = body. */
  def frontMatterHeader(md: Column): Column =
    regexp_extract(md, "(?s)^---\\n(.*?)\\n---\\n(.*)$", 1)

  def frontMatterBody(md: Column): Column =
    when(frontMatterHeader(md) =!= "", regexp_extract(md, "(?s)^---\\n(.*?)\\n---\\n(.*)$", 2))
      .otherwise(md)

  /** Scalar front-matter field lookup inside the header block. YAML-faithful
    * on the reference's case table (tests/datacontract/md_test.py:11-36,
    * from_file yaml.safe_load common.py:113-131): uniform leading-SPACE
    * indentation still parses (YAML permits an indented top-level mapping),
    * while a TAB in indentation makes the whole header invalid YAML — every
    * field falls back, though the header block is still stripped from the
    * body. Divergence note: this regex takes the first `field:` match at
    * any space-indent, so a header nesting url/keywords under another
    * mapping key would mis-extract where YAML would not — no reference
    * test or corpus doc has that shape. */
  def frontMatterField(md: Column, field: String): Column = {
    val hdr = frontMatterHeader(md)
    // post-colon whitespace is [ \t]* NOT \s*: \s crosses the newline, so an
    // empty-valued field would capture the NEXT header line as its value.
    // An empty value yields "" here and the caller's fallback engages (the
    // reference gets YAML null and would fail its str contract — returning
    // the fallback is this engine's containment of that shape).
    when(hdr.rlike("(?m)^[ ]*\\t"), lit(""))
      .otherwise(regexp_extract(hdr, "(?m)^[ ]*" + field + ":[ \\t]*(.*?)[ \\t]*$", 1))
  }
}
