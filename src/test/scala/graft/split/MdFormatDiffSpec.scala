package graft.split

import org.scalatest.funsuite.AnyFunSuite

/** DIFFERENTIAL harness against the real `mdformat` (r15, behind an
  * environment seam): when the Python package is importable in this
  * container, every fuzz atom (the MdEscapeFuzzSpec mix — the shapes
  * that drove every fixpoint class found since round 11) runs through
  * BOTH `MdFormatLite.normalize` and `mdformat.text(...)` under the
  * default and the `--wrap no|12` modes, and any byte difference fails
  * the test with the full divergence list. The container this engine is
  * built in has no mdformat (zero egress), so the test SKIPS cleanly
  * today — its value is that the moment any environment gains
  * `pip install mdformat`, one `sbt test` converts ~100M fuzz pairs of
  * self-consistency evidence into true parity evidence (or an
  * actionable divergence list). FIXTURES.md documents the known
  * divergence classes the list is expected to surface first. */
class MdFormatDiffSpec extends AnyFunSuite {

  private def mdformatAvailable: Boolean =
    try {
      val p = new ProcessBuilder("python3", "-c", "import mdformat").start()
      p.waitFor() == 0
    } catch { case _: Exception => false }

  /** Run every doc through python mdformat in ONE process (JSON in/out
    * over stdio — no temp files, no shell quoting). `wrap` is the
    * mdformat `wrap` option: "keep", "no", or an integer width. */
  private def mdformatBatch(docs: Seq[String], wrap: String): Seq[String] = {
    val script =
      """import sys, json, mdformat
        |docs, wrap = json.load(sys.stdin)
        |if wrap not in ("keep", "no"):
        |    wrap = int(wrap)
        |out = [mdformat.text(d, options={"wrap": wrap}) for d in docs]
        |json.dump(out, sys.stdout)
        |""".stripMargin
    val p = new ProcessBuilder("python3", "-c", script)
      .redirectErrorStream(false).start()
    val payload = {
      // minimal JSON encode: array of strings + the wrap mode
      def q(s: String): String = "\"" + s.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
      docs.map(q).mkString("[[", ",", s"], ${q(wrap)}]")
    }
    p.getOutputStream.write(payload.getBytes("UTF-8"))
    p.getOutputStream.close()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    require(p.waitFor() == 0, "mdformat batch process failed")
    // minimal JSON string-array decode (the payload is our own shape)
    val items = Vector.newBuilder[String]
    val sb = new StringBuilder
    var i = 0
    var inStr = false
    while (i < out.length) {
      val c = out.charAt(i)
      if (!inStr) { if (c == '"') inStr = true; i += 1 }
      else if (c == '\\') {
        out.charAt(i + 1) match {
          case 'n' => sb += '\n'; i += 2
          case 't' => sb += '\t'; i += 2
          case 'r' => sb += '\r'; i += 2
          case 'u' =>
            sb += Integer.parseInt(out.substring(i + 2, i + 6), 16).toChar
            i += 6
          case x => sb += x; i += 2
        }
      } else if (c == '"') { items += sb.result(); sb.clear(); inStr = false; i += 1 }
      else { sb += c; i += 1 }
    }
    items.result()
  }

  test("differential parity vs python mdformat over the fuzz atoms (skips when mdformat is absent)") {
    assume(mdformatAvailable,
      "python mdformat is not importable in this container — differential " +
        "parity evidence is env-blocked; the self-consistency fuzz stands in")
    val atoms = (new MdEscapeFuzzSpec).atoms.toVector
    val modes: Seq[(String, MdFormatLite.Wrap)] = Seq(
      ("keep", MdFormatLite.Wrap.Keep),
      ("no", MdFormatLite.Wrap.No),
      ("12", MdFormatLite.Wrap.Width(12)))
    val diverged = Vector.newBuilder[String]
    for ((wname, w) <- modes) {
      val theirs = mdformatBatch(atoms, wname)
      for ((a, t) <- atoms.zip(theirs)) {
        val ours = MdFormatLite.normalize(a, w)
        // mdformat.text always appends a trailing newline; normalize
        // strips — compare the stripped forms
        if (ours != t.strip()) {
          diverged += s"mode=$wname atom=${a.replace("\n", "\\n")}\n" +
            s"  ours  : ${ours.replace("\n", "\\n")}\n" +
            s"  theirs: ${t.strip().replace("\n", "\\n")}"
        }
      }
    }
    val d = diverged.result()
    assert(d.isEmpty,
      s"${d.size} divergences vs mdformat:\n" + d.mkString("\n"))
  }
}
