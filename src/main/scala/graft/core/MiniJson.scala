package graft.core

/** Minimal strict JSON parser for the manifest subset the store writes:
  * objects with string keys, arrays, strings (with \" \\ \n \uXXXX
  * escapes), integer numbers, true/false/null. Replaces the earlier
  * split-on-substring manifest parsing, which could be confused by field
  * values containing manifest-syntax literals (e.g. a schema DDL with
  * `", "dirs"` in a comment). No dependency on a JSON library — the
  * build is intentionally Spark-jars-only.
  */
private[graft] object MiniJson {

  def parse(s: String): Any = {
    val p = new P(s)
    val v = p.value()
    p.ws()
    require(p.eof, s"trailing content at offset ${p.i} in manifest JSON")
    v
  }

  def obj(s: String): Map[String, Any] = parse(s) match {
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
    case other => throw new IllegalArgumentException(s"expected JSON object, got $other")
  }

  private final class P(s: String) {
    var i = 0
    def eof: Boolean = i >= s.length
    def ws(): Unit = while (!eof && s(i).isWhitespace) i += 1

    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"$msg at offset $i")

    private def expect(c: Char): Unit = {
      ws()
      if (eof || s(i) != c) fail(s"expected '$c'")
      i += 1
    }

    def value(): Any = {
      ws()
      if (eof) fail("unexpected end of input")
      s(i) match {
        case '{' => objValue()
        case '[' => arrValue()
        case '"' => strValue()
        case 't' => litValue("true", true)
        case 'f' => litValue("false", false)
        case 'n' => litValue("null", null)
        case c if c == '-' || c.isDigit => numValue()
        case c => fail(s"unexpected character '$c'")
      }
    }

    private def objValue(): Map[String, Any] = {
      expect('{'); ws()
      if (!eof && s(i) == '}') { i += 1; return Map.empty }
      val b = Map.newBuilder[String, Any]
      var done = false
      while (!done) {
        ws()
        val k = strValue()
        expect(':')
        b += (k -> value())
        ws()
        if (!eof && s(i) == ',') i += 1
        else { expect('}'); done = true }
      }
      b.result()
    }

    private def arrValue(): Seq[Any] = {
      expect('['); ws()
      if (!eof && s(i) == ']') { i += 1; return Seq.empty }
      val b = Seq.newBuilder[Any]
      var done = false
      while (!done) {
        b += value()
        ws()
        if (!eof && s(i) == ',') i += 1
        else { expect(']'); done = true }
      }
      b.result()
    }

    private def strValue(): String = {
      expect('"')
      val sb = new StringBuilder
      while (!eof && s(i) != '"') {
        if (s(i) == '\\') {
          if (i + 1 >= s.length) fail("dangling escape")
          s(i + 1) match {
            case '"' => sb += '"'; i += 2
            case '\\' => sb += '\\'; i += 2
            case '/' => sb += '/'; i += 2
            case 'n' => sb += '\n'; i += 2
            case 't' => sb += '\t'; i += 2
            case 'r' => sb += '\r'; i += 2
            case 'b' => sb += '\b'; i += 2
            case 'f' => sb += '\f'; i += 2
            case 'u' =>
              if (i + 6 > s.length) fail("truncated \\u escape")
              sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
            case c => fail(s"bad escape '\\$c'")
          }
        } else { sb += s(i); i += 1 }
      }
      expect('"')
      sb.toString
    }

    private def litValue(lit: String, v: Any): Any = {
      if (!s.startsWith(lit, i)) fail(s"expected '$lit'")
      i += lit.length
      v
    }

    private def numValue(): Any = {
      val start = i
      if (!eof && s(i) == '-') i += 1
      val digitsFrom = i
      while (!eof && s(i).isDigit) i += 1
      if (i == digitsFrom) fail("expected digits")
      // manifests only ever emit integers (doubles travel as strings),
      // but the parser also serves builder artifacts (bench JSON lines,
      // BenchReportSpec) — fraction/exponent forms parse as Double
      if (!eof && (s(i) == '.' || s(i) == 'e' || s(i) == 'E')) {
        if (s(i) == '.') { i += 1; while (!eof && s(i).isDigit) i += 1 }
        if (!eof && (s(i) == 'e' || s(i) == 'E')) {
          i += 1
          if (!eof && (s(i) == '+' || s(i) == '-')) i += 1
          val expFrom = i
          while (!eof && s(i).isDigit) i += 1
          if (i == expFrom) fail("expected exponent digits")
        }
        s.substring(start, i).toDoubleOption.getOrElse(
          fail(s"bad number: ${s.substring(start, i)}"))
      } else
        // toLongOption: an overflowing literal gets the parser's
        // offset-tagged error, not a bare NumberFormatException
        s.substring(start, i).toLongOption.getOrElse(
          fail(s"integer out of Long range: ${s.substring(start, i)}"))
    }
  }
}
