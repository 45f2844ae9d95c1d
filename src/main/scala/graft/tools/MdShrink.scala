package graft.tools

/** Greedy idempotence-failure minimizer (line-level then char-level).
  * Args: case ("@/path" reads raw bytes from a file, else \n-encoded
  * inline) [wrap mode: "no" | "w<N>" | anything else = keep]. */
object MdShrink {
  private var wrap: graft.split.MdFormatLite.Wrap = graft.split.MdFormatLite.Wrap.Keep
  private def fails(s: String): Boolean = {
    val once = graft.split.MdFormatLite.normalize(s, wrap)
    graft.split.MdFormatLite.normalize(once, wrap) != once
  }
  def main(args: Array[String]): Unit = {
    if (args.length > 1) wrap = args(1) match {
      case "no" => graft.split.MdFormatLite.Wrap.No
      case w if w.startsWith("w") => graft.split.MdFormatLite.Wrap.Width(w.drop(1).toInt)
      case _ => graft.split.MdFormatLite.Wrap.Keep
    }
    var s =
      if (args(0).startsWith("@"))
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(args(0).drop(1))), "UTF-8")
      else args(0).replace("\\n", "\n").replace("\\\\", "\\")
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
    val o1 = graft.split.MdFormatLite.normalize(s, wrap)
    val o2 = graft.split.MdFormatLite.normalize(o1, wrap)
    println("O1: " + o1.replace("\\", "\\\\").replace("\n", "\\n"))
    println("O2: " + o2.replace("\\", "\\\\").replace("\n", "\\n"))
  }
}
