package graft.tools

/** Dev probe for mdformat edge shapes (r14 setext-in-item work). */
object MdProbe {
  def main(args: Array[String]): Unit = {
    val cases: Seq[String] =
      if (args.nonEmpty) args.toSeq.map(_.replace("\\n", "\n"))
      else Seq(
        "1. a\n   ---\n2. b",
        "1. a\n   b\n   ---\n2. c",
        "1. title\n   ===\n2. b",
        "- title\n  ---",
        "1. a\n   ----\n2. b",
        "1. a\n   # h\n   ---\n2. b",
        "1. a\n   # h\n   p\n   ---\n2. b",
        "1. a\n   # h\n   ===\n2. b",
        "1. a\n   1. b\n   ---\n   c",
        "1. a\n   1. b\n      ---\n2. c",
        "1. a\n   ---\n   b\n2. c",
        "1. [x\n   ---\n2. b",
        "1. a *b\n   ---",
        "3. a\n7. b\n   ---\n9. c",
        "1. a\n\n   ---\n\n2. b",
        "1. a\n   --\n2. b",
        "1. a\n   =\n2. b")
    for (c <- cases) {
      val o1 = graft.split.MdFormatLite.normalize(c)
      val o2 = graft.split.MdFormatLite.normalize(o1)
      val idem = if (o1 == o2) "IDEM" else "FLIP!"
      println(s"IN : ${c.replace("\n", "\\n")}")
      println(s"OUT: ${o1.replace("\n", "\\n")}  [$idem]")
      if (o1 != o2) println(s"O2 : ${o2.replace("\n", "\\n")}")
      println()
    }
  }
}
