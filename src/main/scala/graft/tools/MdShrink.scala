package graft.tools

/** Greedy idempotence-failure minimizer (line-level then char-level). */
object MdShrink {
  private def fails(s: String): Boolean = {
    val once = graft.split.MdFormatLite.normalize(s)
    graft.split.MdFormatLite.normalize(once) != once
  }
  def main(args: Array[String]): Unit = {
    var s = args(0).replace("\\n", "\n").replace("\\\\", "\\")
    require(fails(s), "case does not fail")
    var changed = true
    while (changed) {
      changed = false
      // line-level greedy delete
      var lines = s.split("\n", -1).toVector
      var i = 0
      while (i < lines.length) {
        val cand = (lines.take(i) ++ lines.drop(i + 1)).mkString("\n")
        if (lines.length > 1 && fails(cand)) { lines = lines.take(i) ++ lines.drop(i + 1); s = cand; changed = true }
        else i += 1
      }
      // char-level greedy delete
      var j = 0
      while (j < s.length) {
        val cand = s.substring(0, j) + s.substring(j + 1)
        if (fails(cand)) { s = cand; changed = true } else j += 1
      }
    }
    println("MINIMAL: " + s.replace("\\", "\\\\").replace("\n", "\\n"))
    val o1 = graft.split.MdFormatLite.normalize(s)
    val o2 = graft.split.MdFormatLite.normalize(o1)
    println("O1: " + o1.replace("\\", "\\\\").replace("\n", "\\n"))
    println("O2: " + o2.replace("\\", "\\\\").replace("\n", "\\n"))
  }
}
