package graft.tools
// temporary deep-fuzz driver (deleted after use)
object FuzzDeep2 {
  def main(args: Array[String]): Unit = {
    val seedBase = if (args.nonEmpty) args(0).toLong else 300L
    val atoms = Seq("&amp;", "&copy;", "&#65;", "&nope;", "**", "](u)",
      "<https://x.y>", "<div>", "`c`", "\\*", "\\\\",
      "1. ", "2) ", "   5. ", "\\- ", "1\\. ", "&#42; ", "&#45; ",
      "[a*b](u)", "![i](p)", "\\!", "\\.", "\\,", "foo\\\n", "- x\n", "# h\n",
      "***\n", "---\n", "___\n", "=====\n", "t\n---\n", "- - -\n", "* --\n",
      "\\=", "\\_", "=", "    code [1]\n", "    a*b\n", "    ",
      "> x\n", ">>y\n", "> - q\n", ">\n", "\\>", "&#62;",
      "> 3. a\n", "> # h\n", "> |a|b|\n", "> ---\n", ">     c\n", "> a\nb\n",
      "> a\nb\n> c\n", ">> d\ne\n", "> p\n\nq\n", "> ```\nz\n", "> a\n    i\n",
      "1. a\n   b\n", "10. a\n    b\n", "1. a\n       c\n", "1. a\n  z\n",
      "1. a\n\n   p\n\n2. b\n", "2. a\n\tq\n", "1. a\n   - m\n",
      "# #\n", "#\n", "## ###\n", "p\n- - -\n", "- -\t-\n", "#######\n",
      "2. b\n    >\n", "1. a\n    # h\n", "1. a\n   ---\n", "1. a\n    ```\n",
      "1. a\n   - b\n", "1. a\n   - b\n     7. z\n", "3. a\n- c\n9. d\n",
      "10. a\n    - b\n", "1. a\n  - b\n", "1. a\n   * c\n",
      "- a\n  3. x\n", "- a\n   - b\n", "- a\n1. x\n", "* a\n  cont\n",
      "- b\n    7. z\n      c\n", "9. d\n     1. a\n       c\n",
      "- c\n\t* --\n", "- b\n   7. z\n  3. x\n", "100. w\n", "  21. a\n",
      "\\|", "|-|\n", "|:-|\n", "a|b\n-|-\n", "\\:")
    val chars = "abAB \n\n*_[]<>`&\\*_[]<>`&\\.-)#!0123=\t|:"
    var failures = 0
    for (seed <- seedBase until (seedBase + 20)) {
      val rnd = new scala.util.Random(seed)
      def gen(): String = {
        val n = rnd.nextInt(60)
        (0 until n).map { _ =>
          if (rnd.nextInt(5) == 0) atoms(rnd.nextInt(atoms.length))
          else chars(rnd.nextInt(chars.length)).toString
        }.mkString
      }
      var i = 0
      while (i < 50000) {
        val s = gen()
        try {
          val once = graft.split.MdFormatLite.normalize(s)
          val twice = graft.split.MdFormatLite.normalize(once)
          if (twice != once) {
            println(s"NOT IDEMPOTENT seed=$seed case=$i on: " +
              s.replace("\\", "\\\\").replace("\n", "\\n").replace("\t", "\\t"))
            failures += 1
          }
        } catch {
          case e: Throwable =>
            println(s"THROW seed=$seed case=$i: ${e.getClass.getSimpleName} on " +
              s.replace("\\", "\\\\").replace("\n", "\\n").replace("\t", "\\t"))
            failures += 1
        }
        i += 1
      }
    }
    println(s"TOTAL failures: $failures / 1000000 (seeds $seedBase..${seedBase + 19})")
  }
}
