package graft.tools

/** Shrink a normalize-idempotence counterexample: greedily delete
  * lines/chars while the flip (or throw) persists under the given mode.
  * Usage: runMain graft.tools.MdShrink <mode> <case-with-\n-escapes> */
object MdShrink {
  import graft.split.MdFormatLite
  private def mode(s: String): MdFormatLite.Wrap = s match {
    case "keep" => MdFormatLite.Wrap.Keep
    case "no"   => MdFormatLite.Wrap.No
    case n      => MdFormatLite.Wrap.Width(n.toInt)
  }
  private def flips(s: String, m: MdFormatLite.Wrap): Boolean =
    try {
      val once = MdFormatLite.normalize(s, m)
      MdFormatLite.normalize(once, m) != once
    } catch { case _: Throwable => true }
  def main(args: Array[String]): Unit = {
    val m = mode(args(0))
    var cur = args(1).replace("\\n", "\n").replace("\\t", "\t").replace("\\\\", "\\")
    require(flips(cur, m), "case does not flip")
    var progress = true
    while (progress) {
      progress = false
      // try deleting each line
      val lines = cur.split("\n", -1)
      var i = 0
      while (i < lines.length) {
        val cand = (lines.take(i) ++ lines.drop(i + 1)).mkString("\n")
        if (cand != cur && flips(cand, m)) { cur = cand; progress = true }
        else i += 1
      }
      // try deleting each char
      var j = 0
      while (j < cur.length) {
        val cand = cur.substring(0, j) + cur.substring(j + 1)
        if (flips(cand, m)) { cur = cand; progress = true }
        else j += 1
      }
    }
    def show(s: String) = s.replace("\\", "\\\\").replace("\n", "\\n").replace("\t", "\\t")
    println("MIN : " + show(cur))
    val once = try MdFormatLite.normalize(cur, m) catch { case e: Throwable => "THROW " + e }
    println("once: " + show(once.toString))
    val twice = try MdFormatLite.normalize(once.toString, m) catch { case e: Throwable => "THROW " + e }
    println("twce: " + show(twice.toString))
  }
}
