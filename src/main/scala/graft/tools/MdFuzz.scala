package graft.tools

/** Throwaway-style deep fuzz driver for MdFormatLite idempotence:
  * normalize(normalize(x)) == normalize(x) under every wrap mode, over
  * the MdEscapeFuzzSpec atom mix plus the round-under-work shapes.
  * Usage: runMain graft.tools.MdFuzz [seed] [cases] [modes]
  *   modes: csv of keep,no,w12,w40 (default all) */
object MdFuzz {
  private val atoms: Array[String] = Array(
    "&amp;", "&copy;", "&#65;", "&nope;", "**", "](u)",
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
    "\\|", "|-|\n", "|:-|\n", "a|b\n-|-\n", "\\:",
    "1. a\n   ```\n   x\n   ```\n", "2. a\n   ```\n   3. z\n\n   [r]\n   ```\n5. b\n",
    "1. a\n\t```\n\tc\n\t```\n", "1. a\n   ```\n   x\n", "1. a\n  ```\n  x\n  ```\n",
    "1. a\n   1. b\n      ```\n      x\n      ```\n   2. c\n",
    "1. a\n   \\> q\n   ---\n", "1. x\n\n   ```\n   ```\n\t=\n",
    "1. a\n\n   p\n\n   ```\n   x\n   ```\n\t=====\n",
    "1. a\n\n   ***\n\n2. b\n", "1. a\n\n   # h\n\n5. b\n",
    "1. a\n\n   > q\n   > r\n\n5. b\n", "1. a\n\n   |k|v|\n   |-|-|\n\n5. b\n",
    "1. a\n\n   p\n   ---\n\n5. b\n", "1. a\n\n   p\n   ===\n",
    "- a\n\n  ***\n- b\n", "10. a\n\n    ***\n\n12. b\n",
    "1. a\n\n   |\n    >\n", "9. d\n   ```\n   ```\n\n\t0. w\n\t>\n",
    "1. a\n\n   > q\n\n   # h\n\n5. b\n", "1. a\n\n   ---\n\n   > x\n",
    "1. a\n\n   cc dd\n   ee\n\n2. b\n", "- a\n\n  p q\n- b\n",
    "1. aa bb cc\n   dd ee\n2. x\n", "> aa bb\n> cc\ndd\n",
    "- aa bb cc dd\n- e\n", "1. a\n\n   long words here to fill\n\n2. b\n",
    // r15 shapes under work: lazy '=' absorption, escaped '*'/'_'
    // breaks in item content (tight + loose), deep/lazy mixes
    "1. a\n  ===\n", "2. a\n===\n", "1. aa\nbb\n  ===\n   ---\n",
    "1. a\n   \\*\\*\\*\n", "1. a\n    \\_\\_\\_\n9. b\n",
    "1. a\n\n   \\*\\*\\*\n\n2. b\n", "- a\n  \\*\\*\\*\n",
    "1. a\n   4. b\n  ====\n", "1. a\n  ==\n  ==\n", "&#61;&#61;&#61;\n",
    "1. a\n   \\`\\`\\`\n", "\\~\\~\\~\n", "* a\n \\=\n",
    // r15 loose-column generalization shapes: 2-column bullet defers,
    // wide-marker continuations, stable-witness boundary classes
    "- a\n\n  > q\n\n- b\n", "- a\n\n  # h\n\n- b\n", "- a\n\n  ***\n- b\n",
    "- a\n\n  p\n  ===\n- b\n", "- a\n\n  |k|v|\n  |-|-|\n\n- b\n",
    "- a\n\n  ```\n  x\n  ```\n\n- b\n", "10. a\n\n    p\n\n12. b\n",
    "1. a\n\n    p\n\n2. b\n", "- a\n\n    p\n\n- b\n",
    "021. a\n   * c\n\n    .\n", ">\n 3. x\n\n    .\n",
    ">\n - b\n\n  ```\n  ```\n.\n", " 21. a\n\n     p\n\n 9. b\n",
    "- a\n\n  p q r\n\n- b\n", "10. a\n\n    ***\n\n12. b\n",
    "- a\n\n   p\n\n- b\n", "- a\n\n  1. z\n\n- b\n", "  - a\n\n  > q\n",
    // r15 bare '-'/'--' empty-bullet / plain-text resolution shapes
    "1. a\n   ```\n   ```\n   -\n", "- x\n  ```\n  ```\n  -\n",
    "1. a\n   ```\n   ```\n   --\n2. b\n",
    "1. a\n   ```\n   ```\n   -\n     x\n", "1. a\n   -\n   ---\n",
    "1. a\n   ```\n   ```\n   --\n   ---\n", "2. b\n    >\n   -\n",
    // r15 unclosed top-level fences (closer appended in output)
    "```\nx\n", "````s\ny\n", "~~~\n", "```\n",
    // r15 table-head minting / code-absorption boundary classes
    " 1. z\n- b\n  5. |\n-|\n", "12. b\n\n\t\t_\n   d\n2. x\n")
  private val chars = "abAB \n\n*_[]<>`&\\*_[]<>`&\\.-)#!0123=\t|:~"

  def main(args: Array[String]): Unit = {
    import graft.split.MdFormatLite
    val seed = if (args.length > 0) args(0).toLong else 1L
    val cases = if (args.length > 1) args(1).toInt else 1000000
    val modeNames =
      if (args.length > 2) args(2).split(",").toSeq
      else Seq("keep", "no", "w12", "w40")
    val modes: Seq[MdFormatLite.Wrap] = modeNames.map {
      case "keep" => MdFormatLite.Wrap.Keep
      case "no"   => MdFormatLite.Wrap.No
      case "w12"  => MdFormatLite.Wrap.Width(12)
      case "w40"  => MdFormatLite.Wrap.Width(40)
      case other  => MdFormatLite.Wrap.Width(other.toInt)
    }
    val nThreads = Runtime.getRuntime.availableProcessors().min(16)
    val failures = new java.util.concurrent.atomic.AtomicInteger(0)
    val done = new java.util.concurrent.atomic.AtomicLong(0L)
    val threads = (0 until nThreads).map { t =>
      new Thread(() => {
        val rnd = new scala.util.Random(seed + t * 7919)
        var i = 0
        val per = cases / nThreads
        while (i < per && failures.get() < 20) {
          val n = rnd.nextInt(40)
          val s = (0 until n).map { _ =>
            if (rnd.nextInt(6) == 0) atoms(rnd.nextInt(atoms.length))
            else chars(rnd.nextInt(chars.length)).toString
          }.mkString
          for (m <- modes) {
            try {
              val once = MdFormatLite.normalize(s, m)
              val twice = MdFormatLite.normalize(once, m)
              if (twice != once) {
                failures.incrementAndGet()
                println(s"FLIP mode=$m case: " +
                  s.replace("\\", "\\\\").replace("\n", "\\n"))
                println("  once : " + once.replace("\\", "\\\\").replace("\n", "\\n"))
                println("  twice: " + twice.replace("\\", "\\\\").replace("\n", "\\n"))
              }
            } catch {
              case e: Throwable =>
                failures.incrementAndGet()
                println(s"THROW mode=$m ${e.getClass.getSimpleName}: ${e.getMessage} case: " +
                  s.replace("\\", "\\\\").replace("\n", "\\n"))
            }
          }
          i += 1
          val d = done.incrementAndGet()
          if (d % 500000 == 0) println(s"... $d cases")
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    println(s"DONE ${done.get()} cases x ${modes.length} modes, ${failures.get()} failures")
    if (failures.get() > 0) sys.exit(1)
  }
}
