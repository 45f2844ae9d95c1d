package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class TlshSpec extends SparkSpec {

  private val para =
    """The quick brown fox jumps over the lazy dog while seventeen engineers
      |review the quarterly ingestion metrics. Deduplication keeps the corpus
      |small; similarity hashing keeps retrieval honest. Every document that
      |enters the pipeline is hashed, scored, split and embedded before it
      |reaches the vector store for downstream retrieval workloads.""".stripMargin

  test("digest shape: T1 + 70 hex chars, deterministic") {
    val d1 = Tlsh.hashText(para)
    val d2 = Tlsh.hashText(para)
    assert(d1.isDefined && d1 == d2)
    val hex = d1.get
    assert(hex.startsWith("T1") && hex.length == 72)
    assert(hex.drop(2).forall(c => c.isDigit || ('A' to 'F').contains(c)))
  }

  test("sub-50-byte and low-variation inputs yield no digest (library TNULL contract)") {
    assert(Tlsh.hashText("short text under fifty bytes long!").isEmpty)
    assert(Tlsh.hashText(null).isEmpty)
    // one repeated byte: every window identical -> a handful of buckets
    assert(Tlsh.hashText("a" * 400).isEmpty)
    // two alternating bytes: still far under the half-nonzero guard
    assert(Tlsh.hashText("ab" * 200).isEmpty)
  }

  test("distance: zero on self, symmetric, small for a near-dup, large for unrelated text") {
    val base = para + " " + para // ~700 bytes
    val nearDup = base.replace("quarterly", "monthly")
    val unrelated =
      """Completely different subject matter: alpine skiing conditions depend
        |on snowpack stability, overnight refreeze cycles and wind loading on
        |leeward slopes. Avalanche advisories rate the danger by elevation
        |band and aspect; travelers check the forecast before dawn starts and
        |carry transceivers, probes and shovels on every single outing.""".stripMargin
    val hBase = Tlsh.hashText(base).get
    val hDup = Tlsh.hashText(nearDup).get
    val hOther = Tlsh.hashText(unrelated).get
    assert(Tlsh.diff(hBase, hBase) == 0)
    assert(Tlsh.diff(hBase, hDup) == Tlsh.diff(hDup, hBase))
    val near = Tlsh.diff(hBase, hDup)
    val far = Tlsh.diff(hBase, hOther)
    assert(near < far, s"near=$near should be < far=$far")
    // the paper's practical match threshold is ~100; a two-word edit on
    // ~700 bytes lands at 83 with this permutation (deterministic)
    assert(near <= 100, s"one-word edit should score as near-dup, got $near")
    assert(far >= 150, s"unrelated text should score far, got $far")
  }

  test("includeLength=false drops only the length term") {
    val doubled = para + "\n" + para + "\n" + para
    val h1 = Tlsh.hashText(para).get
    val h2 = Tlsh.hashText(doubled).get
    assert(Tlsh.diff(h1, h2, includeLength = false) <= Tlsh.diff(h1, h2))
  }

  test("length header is log-bucketed and capped") {
    assert(Tlsh.lCapturing(0) == 0)
    assert(Tlsh.lCapturing(656) == Tlsh.lCapturing(655)) // same 1.5-log bucket
    assert(Tlsh.lCapturing(Long.MaxValue) == 255) // cap engages far beyond 32-bit lengths
    // monotone non-decreasing across the piecewise boundaries
    val samples = Seq(50L, 200L, 656L, 657L, 1000L, 3199L, 3200L, 100000L)
    samples.sliding(2).foreach { case Seq(a, b) =>
      assert(Tlsh.lCapturing(a) <= Tlsh.lCapturing(b), s"l($a) > l($b)")
    }
  }

  test("malformed digests are rejected") {
    intercept[IllegalArgumentException](Tlsh.diff("T1ABCD", "T1ABCD"))
  }

  test("SQL surface: tlsh_hash / tlsh_diff registered, null-safe") {
    graft.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(para, "tiny").toDF("text")
    df.createOrReplaceTempView("tlsh_in")
    val rows = spark.sql(
      "SELECT tlsh_hash(text) AS h, tlsh_diff(tlsh_hash(text), tlsh_hash(text)) AS d FROM tlsh_in"
    ).collect()
    assert(rows(0).getString(0).startsWith("T1") && rows(0).getInt(1) == 0)
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
  }

  test("tlshPairs: planted near-dups found, distinct topics stay unpaired, short docs never pair") {
    import spark.implicits._
    // 20 docs on clearly distinct topics + 3 planted near-dup partners
    val topics = (0 until 20).map { i =>
      val words = Seq("alpha", "ember", "quartz", "violet", "harbor", "meadow",
        "cobalt", "saffron", "timber", "glacier")
      val w = words(i % words.size)
      // ~1 KB per doc: TLSH bucket statistics need a few hundred windows
      // before a one-word edit stays local (the paper's 50-byte floor is a
      // validity bound, not an accuracy one)
      s"doc$i" -> (s"Chapter $i covers the $w protocol in exhaustive detail. " +
        s"The $w subsystem negotiates ${i * 7} retries before the $w fallback " +
        s"engages, and operators tune the $w window against observed latency " +
        s"budgets across deployment region number $i with care and patience. " +
        s"Rollouts of the $w stack proceed canary-first through ring $i, " +
        s"holding ${i * 3} percent of traffic until the error budget for the " +
        s"$w tier recovers; paging thresholds derive from the $w burn rate " +
        s"over rolling windows, and the runbook for $w incidents names the " +
        s"owning rotation for escalation path number $i explicitly. Capacity " +
        s"planning for $w clusters projects quarter $i demand from the " +
        s"trailing seasonality of $w checkpoints, provisioning headroom of " +
        s"${i + 11} percent so that $w failover drills never breach the " +
        s"latency objective recorded for service tier number $i last cycle.")
    }
    val nearDups = Seq(0, 7, 13).map { i =>
      s"doc${i}_dup" -> topics(i)._2.replace("exhaustive", "extensive")
    }
    val short = Seq("tiny" -> "too short to hash")
    val df = (topics ++ nearDups ++ short).toDF("id", "text")
    // query with a LOOSER filter (200) than the bound asserted below (100),
    // so the planted-pair distance claim is tested, not the operator's own
    // threshold filter echoed back
    val pairs = graft.operators.Dedup.tlshPairs(df, "id", "text", maxDist = 200)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    val pairKeys = pairs.map(p => Set(p._1, p._2)).toSet
    Seq(0, 7, 13).foreach { i =>
      assert(pairKeys.contains(Set(s"doc$i", s"doc${i}_dup")), s"planted pair $i missed")
      val d = pairs.find(p => Set(p._1, p._2) == Set(s"doc$i", s"doc${i}_dup")).get._3
      assert(d <= 100, s"planted one-word edit $i should score under the match threshold, got $d")
    }
    assert(!pairs.exists(p => p._1 == "tiny" || p._2 == "tiny"))
  }

  test("withPayloadHashes reproduces the reference payload: sha256 pins from tlsh_test.py") {
    // expected values are the reference test's own vectors
    // (tests/steps/qdrant/tlsh_test.py:20-24)
    val expected = Map(
      "example_text_1" -> "5840445c9d0a1457627eaa4718d48bbc5071782ac6df6d85dfef7f82a4dc01a6",
      "example_text_2" -> "69cee72aa104c9a62e6ceb4e7cebdffef3ce0f385cbb807c4a587149bd9fc028",
      "example_text_3" -> "7fde1636e509f9a34474f6dcdaddb66db7b09871ed6f934a384b3fb3b491a24e")
    import spark.implicits._
    val df = graft.sinks.VersionedTableSink.withPayloadHashes(
      (expected.keys.toSeq :+ para).toDF("text"), "text")
    assert(df.columns.toSet == Set("text", "text_sha256_hash", "text_tlsh_hash"))
    val got = df.collect().map(r => r.getString(0) -> (r.getString(1), Option(r.getString(2)))).toMap
    expected.foreach { case (t, sha) =>
      assert(got(t)._1 == sha, s"sha256 mismatch for $t")
      assert(got(t)._2.isEmpty, "short texts have no TLSH digest")
    }
    assert(got(para)._2.exists(_.startsWith("T1")))
  }
}
