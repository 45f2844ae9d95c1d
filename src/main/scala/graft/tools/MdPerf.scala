package graft.tools

/** Dev-only micro-benchmark for MdFormatLite.normalize over the exact
  * synthetic shapes the q63/q118-q131 oracle queries feed it — measures
  * the kernel alone (no Spark) so per-call cost and hot spots are
  * attributable. args: [iters] */
object MdPerf {
  def main(args: Array[String]): Unit = {
    import graft.split.MdFormatLite
    import graft.split.MdFormatLite.Wrap
    val iters = args.headOption.map(_.toInt).getOrElse(5000)
    val w = Array("alpha", "bravo", "charlie", "delta", "echo", "foxtrot")
    // q127 legs
    val a127 = (s"a ${w(0)}\nb ${w(1)}\n\n> q ${w(2)}\nlazy\n\n1. i ${w(3)}\n   cont\n2. z", Wrap.No)
    val b127 = ("eins zwei drei vier\n\n> fuenf sechs sieben acht\n\n1. neun zehn elf zwoelf", Wrap.Width(10))
    val c127 = (s"1. i ${w(4)}\n   > p q\n   > r\n2. z", Wrap.No)
    val d127 = ("1. neun\n   > aaa bbb ccc\n2. s", Wrap.Width(12))
    // q131 legs
    val a131 = (s"- a ${w(0)}\n\n  cc dd\n  ee\n\n- b", Wrap.No)
    val b131 = ("- aa\n\n  ff gg hh ii jj kk\n\n- bb", Wrap.Width(12))
    val c131 = ("1. aa bb cc dd ee ff\n   - gg hh ii jj kk ll mm nn", Wrap.Width(12))
    val d131 = ("10. aa\n\n    ff gg hh ii jj\n\n12. b", Wrap.Width(12))
    val e131 = (s"1. # h\n   cont more\n   words ${w(1)}\n2. z", Wrap.No)
    val f131 = ("2. lazy one\n===", Wrap.Keep)
    val g131 = ("- a\n\n  p\n  ===\n- b", Wrap.Keep)
    // q63/q118-family keep-mode shape (representative)
    val kx = ("# t\n\npara one *two*\n\n- a\n- b\n\n> q\n\n```\ncode\n```", Wrap.Keep)
    val cases = Seq(("q127a", a127), ("q127b", b127), ("q127c", c127), ("q127d", d127),
      ("q131a", a131), ("q131b", b131), ("q131c", c131), ("q131d", d131),
      ("q131e", e131), ("q131f", f131), ("q131g", g131), ("keep", kx))
    // warmup
    for (_ <- 1 to 3; (_, (s, m)) <- cases) {
      var i = 0; while (i < 2000) { MdFormatLite.normalize(s, m); i += 1 }
    }
    var total = 0.0
    for ((n, (s, m)) <- cases) {
      val t0 = System.nanoTime()
      var i = 0
      while (i < iters) { MdFormatLite.normalize(s, m); i += 1 }
      val dt = (System.nanoTime() - t0) / 1e9
      total += dt
      println(f"$n%-6s ${dt / iters * 1e6}%9.1f us/call  (${dt}%6.2f s for $iters)")
    }
    println(f"TOTAL  ${total}%6.2f s (${cases.size} cases x $iters)")
  }
}
