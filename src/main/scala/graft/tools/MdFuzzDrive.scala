package graft.tools

/** Throwaway deep-fuzz driver (r14): seeds x cases over the
  * MdEscapeFuzzSpec atom pool (instantiated reflectively from
  * test-classes so the pool stays single-sourced). Args: seedFrom seedTo
  * casesPerSeed. */
object MdFuzzDrive {
  def main(args: Array[String]): Unit = {
    val (from, to, per) = (args(0).toLong, args(1).toLong, args(2).toInt)
    val spec = Class.forName("graft.split.MdEscapeFuzzSpec")
      .getDeclaredConstructor().newInstance()
    val m = spec.getClass.getMethod("atoms")
    val atoms = m.invoke(spec).asInstanceOf[Seq[String]]
    val chars = "abAB \n\n*_[]<>`&\\*_[]<>`&\\.-)#!0123=\t|:~"
    var failures = 0
    var total = 0L
    for (seed <- from to to) {
      val rnd = new scala.util.Random(seed)
      def gen(): String = {
        val n = rnd.nextInt(40)
        (0 until n).map { _ =>
          if (rnd.nextInt(6) == 0) atoms(rnd.nextInt(atoms.length))
          else chars(rnd.nextInt(chars.length)).toString
        }.mkString
      }
      var i = 0
      while (i < per) {
        val s = gen()
        val once = graft.split.MdFormatLite.normalize(s)
        if (graft.split.MdFormatLite.normalize(once) != once) {
          failures += 1
          println(s"FAIL seed=$seed case=$i: " +
            s.replace("\\", "\\\\").replace("\n", "\\n"))
        }
        i += 1
        total += 1
      }
      if (seed % 50 == 0) println(s"  ...seed $seed done ($total cases, $failures failures)")
    }
    println(s"DONE: $total cases, $failures failures")
  }
}
