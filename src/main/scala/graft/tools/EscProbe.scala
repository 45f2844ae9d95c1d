package graft.tools

import graft.split.MdFormatLite

/** Ad-hoc probe for the MdFormatLite text-escape pass (R9-R14): prints
  * normalize() on adversarial samples + golden-file invariants. */
object EscProbe {
  def main(args: Array[String]): Unit = {
    val g = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "src/test/resources/table_splitter_ref/table_and_text/expected_output_000.md")), "UTF-8")
    val n = MdFormatLite.normalize(g)
    println("golden gained backslash: " + n.contains("\\"))
    println("PyKnowFlow strong preserved: " + n.contains("**PyKnowFlow**"))
    println("golden idempotent: " + (MdFormatLite.normalize(n) == n))
    for (s <- Seq("5*6=30 and foo_bar_baz", "a * b", "**bold** and *em*",
        "x < y", "&copy; &amp;copy; &notanentity; &#65;", "a\\b",
        "`code` and un`matched", "[link](http://x) and [dangl",
        "***bold** leftover", "_a_b_", "auto <https://x.y/z> and <div>html</div>")) {
      val o = MdFormatLite.normalize(s)
      val stable = MdFormatLite.normalize(o) == o
      println(s"IN : $s\nOUT: $o${if (!stable) "   [NOT IDEMPOTENT]" else ""}")
    }
  }
}
