package graft.catalog

/** Identifier scanning/rewriting over catalog-stored SQL expression text
  * (sort specs, partition transforms). The expressions are short —
  * column refs, function calls like `year(ts)`, arithmetic — so a
  * quote-aware lexical pass is sufficient and keeps MetadataManager free
  * of any Spark-parser dependency (it must also run inside the JDBC
  * commit path). Semantics:
  *
  *  - `'…'` string literals are opaque;
  *  - `"…"` / `` `…` `` quoted identifiers match case-insensitively and
  *    keep their quoting on rewrite;
  *  - a bare word followed by `(` is a function name, not a column ref;
  *  - a word preceded by `.` is a struct-field tail, not a top-level
  *    column (the head of `s.x` IS the column ref).
  */
private[catalog] object SqlIdent {

  /** lower-cased top-level column identifiers referenced by `e` */
  def refs(e: String): Set[String] = {
    val out = scala.collection.mutable.Set.empty[String]
    scan(e,
      onQuotedIdent = (name, _) => { out += name.toLowerCase; name },
      onWord = (w, isCall, prevDot) => {
        if (!isCall && !prevDot) out += w.toLowerCase
        w
      })
    out.toSet
  }

  /** rewrite every reference to `from` (case-insensitive) into `to` */
  def rewrite(e: String, from: String, to: String): String =
    scan(e,
      onQuotedIdent = (name, q) =>
        if (name.equalsIgnoreCase(from)) to else name,
      onWord = (w, isCall, prevDot) =>
        if (!isCall && !prevDot && w.equalsIgnoreCase(from)) to else w)

  /** shared lexer: quoted segments and identifier words get callbacks,
    * everything else copies through; returns the (possibly rewritten)
    * expression. */
  private def scan(e: String,
      onQuotedIdent: (String, Char) => String,
      onWord: (String, Boolean, Boolean) => String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < e.length) {
      val ch = e.charAt(i)
      if (ch == '\'') { // string literal: opaque (with '' escape)
        var j = i + 1
        var done = false
        while (j < e.length && !done) {
          if (e.charAt(j) == '\'') {
            if (j + 1 < e.length && e.charAt(j + 1) == '\'') j += 2
            else { j += 1; done = true }
          } else j += 1
        }
        sb.append(e.substring(i, j)); i = j
      } else if (ch == '"' || ch == '`') {
        val j = e.indexOf(ch, i + 1)
        val end = if (j < 0) e.length else j
        val name = e.substring(i + 1, end)
        val prevDot = sb.nonEmpty && sb.last == '.'
        val mapped = if (prevDot) name else onQuotedIdent(name, ch)
        sb.append(ch).append(mapped)
        if (j >= 0) sb.append(ch)
        i = if (j < 0) e.length else j + 1
      } else if (Character.isJavaIdentifierStart(ch)) {
        var j = i
        while (j < e.length && Character.isJavaIdentifierPart(e.charAt(j)))
          j += 1
        val word = e.substring(i, j)
        var k = j
        while (k < e.length && e.charAt(k) == ' ') k += 1
        val isCall = k < e.length && e.charAt(k) == '('
        val prevDot = i > 0 && e.charAt(i - 1) == '.'
        sb.append(onWord(word, isCall, prevDot))
        i = j
      } else { sb.append(ch); i += 1 }
    }
    sb.toString
  }
}
