package graft

/** Engine-portable SQL idiom rewrites applied to every oracle text at
  * registry construction ([[Registry.all]]).
  *
  * The oracles are authored in the natural DuckDB dialect; this pass
  * mechanically replaces the one idiom with no shared spelling — the
  * hex-literal cast `CAST(('0x' || substr(E, s, w)) AS BIGINT)` (DuckDB
  * parses hex strings in integer casts; Spark requires `conv`, which
  * DuckDB lacks) — with a positional-value sum both engines evaluate
  * exactly in BIGINT:
  *
  *   Σᵢ (position(substr(E, s+i, 1) IN '0123456789abcdef') - 1) · 16^(w-1-i)
  *
  * `position(x IN y)`, `substr` (1-based) and BIGINT `*`/`+` behave
  * identically in DuckDB and Spark, md5 output is lowercase hex in both,
  * and w ≤ 15 keeps the value below 2^60 — no overflow, no doubles, no
  * rounding anywhere. The transform is value-preserving by construction;
  * the DuckDB digest check in tools/oracle_parity.py pins it.
  */
object SqlIdioms {

  private val Marker = "CAST(('0x' || substr("

  /** Replace every hex-cast idiom occurrence in `sql`. The substr
    * argument list is parsed with balance-aware scanning (the digest
    * expression may itself contain parens/commas/strings); anything not
    * exactly matching the idiom's shape is left untouched.
    */
  def portable(sql: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < sql.length) {
      val at = sql.indexOf(Marker, i)
      if (at < 0) { b.append(sql.substring(i)); i = sql.length }
      else {
        b.append(sql.substring(i, at))
        rewriteAt(sql, at) match {
          case Some((replacement, end)) => b.append(replacement); i = end
          case None => b.append(Marker); i = at + Marker.length
        }
      }
    }
    b.toString
  }

  /** Parse one idiom occurrence starting at `at`; return the portable
    * replacement and the index just past the idiom's closing paren.
    */
  private def rewriteAt(sql: String, at: Int): Option[(String, Int)] = {
    val argsStart = at + Marker.length
    // scan the substr(...) argument list to its closing paren, splitting
    // at top-level commas; skip over quoted strings
    var depth = 1
    var j = argsStart
    val parts = scala.collection.mutable.ListBuffer.empty[String]
    var partStart = argsStart
    while (j < sql.length && depth > 0) {
      sql.charAt(j) match {
        case '\'' =>
          j += 1
          while (j < sql.length && sql.charAt(j) != '\'') j += 1
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) parts += sql.substring(partStart, j)
        case ',' if depth == 1 =>
          parts += sql.substring(partStart, j)
          partStart = j + 1
        case _ =>
      }
      j += 1
    }
    // expect the idiom tail `) AS BIGINT)` after substr's close; the
    // authored SQL may break the line between the concat's close paren
    // and AS (stripMargin keeps the newline), so skip whitespace
    var t = j
    while (t < sql.length && sql.charAt(t).isWhitespace) t += 1
    if (t >= sql.length || sql.charAt(t) != ')') return None
    t += 1
    while (t < sql.length && sql.charAt(t).isWhitespace) t += 1
    val Tail = "AS BIGINT)"
    if (parts.length != 3 || !sql.regionMatches(t, Tail, 0, Tail.length))
      return None
    val j2 = t + Tail.length
    val (expr, startS, widthS) = (parts(0).trim, parts(1).trim, parts(2).trim)
    if (!startS.forall(_.isDigit) || !widthS.forall(_.isDigit)) return None
    val (start, width) = (startS.toInt, widthS.toInt)
    if (width < 1 || width > 15) return None
    val terms = (0 until width).map { k =>
      val weight = java.math.BigInteger.valueOf(16L).pow(width - 1 - k)
      val digit =
        s"(position(substr($expr, ${start + k}, 1) IN '0123456789abcdef') - 1)"
      // weight cast: Spark parses small integer literals as INT and (under
      // ANSI) overflows on INT*INT — keep every term's arithmetic in BIGINT
      if (width - 1 - k == 0) digit
      else s"$digit * CAST($weight AS BIGINT)"
    }
    Some((terms.mkString("(", " + ", ")"), j2))
  }
}
