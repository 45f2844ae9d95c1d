package graft.tools

/** Throwaway wrap-mode fuzz driver (r14): replays the spec's seed-19
  * generator; args: cases [seed]. Prints failing cases to files. */
object MdWrapFuzz {
  def main(args: Array[String]): Unit = {
    val cases = if (args.nonEmpty) args(0).toInt else 5000
    val seed = if (args.length > 1) args(1).toLong else 19L
    val spec = Class.forName("graft.split.MdEscapeFuzzSpec")
      .getDeclaredConstructor().newInstance()
    val atoms = spec.getClass.getMethod("atoms").invoke(spec).asInstanceOf[Seq[String]]
    val chars = "abAB \n\n*_[]<>`&\\*_[]<>`&\\.-)#!0123=\t|:~"
    val modes = Seq(graft.split.MdFormatLite.Wrap.No,
      graft.split.MdFormatLite.Wrap.Width(12), graft.split.MdFormatLite.Wrap.Width(40))
    val rnd = new scala.util.Random(seed)
    def gen(): String = {
      val n = rnd.nextInt(40)
      (0 until n).map { _ =>
        if (rnd.nextInt(6) == 0) atoms(rnd.nextInt(atoms.length))
        else chars(rnd.nextInt(chars.length)).toString
      }.mkString
    }
    var fails = 0
    for (i <- 0 until cases; s = gen(); m <- modes) {
      val once = graft.split.MdFormatLite.normalize(s, m)
      if (graft.split.MdFormatLite.normalize(once, m) != once) {
        fails += 1
        val p = s"/tmp/wrapfail_${seed}_${i}_$m.txt"
        java.nio.file.Files.write(java.nio.file.Paths.get(p), s.getBytes("UTF-8"))
        println(s"FAIL case=$i mode=$m -> $p")
      }
    }
    println(s"DONE $cases cases x ${modes.length} modes, $fails failures")
  }
}
