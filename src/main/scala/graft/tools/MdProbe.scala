package graft.tools

/** Dev probe for MdFormatLite: feed case strings (\\n-encoded) as args, or
  * use the built-in gap-shape set; prints keep/no/width renderings plus a
  * fixpoint check per mode. */
object MdProbe {
  private def show(s: String): String =
    s.replace("\\", "\\\\").replace("\n", "\\n")
  def main(args: Array[String]): Unit = {
    import graft.split.MdFormatLite
    val builtIn = Seq(
      "- aa bb cc dd ee\n  ff gg hh",
      "- aa\n\n  ff gg hh ii jj kk\n\n- bb",
      "1. aa bb cc dd ee ff\n   - gg hh ii jj kk ll",
      "10. aa\n\n    ff gg hh ii jj\n\n12. b",
      "1. aa bb\n  ===",
      "1. a\n   \\`\\`\\`",
      "1. a\n   \\*\\*\\*",
      "1. a\n\n   -",
      "1. a\n   ```\n   ```\n   -",
      "- a\n\n  > q\n- b",
      "10. a\n\n    ***\n\n12. b")
    val cases =
      if (args.nonEmpty) args.toSeq.map(_.replace("\\n", "\n").replace("\\\\", "\\"))
      else builtIn
    val modes: Seq[(String, MdFormatLite.Wrap)] = Seq(
      ("keep", MdFormatLite.Wrap.Keep), ("no", MdFormatLite.Wrap.No),
      ("w12", MdFormatLite.Wrap.Width(12)))
    for (s <- cases) {
      println(s"== in   : ${show(s)}")
      for ((n, m) <- modes) {
        val once = MdFormatLite.normalize(s, m)
        val twice = MdFormatLite.normalize(once, m)
        val fp = if (twice == once) "" else s"  !!NOT FIXPOINT: ${show(twice)}"
        println(f"   $n%-4s : ${show(once)}$fp")
      }
    }
  }
}
