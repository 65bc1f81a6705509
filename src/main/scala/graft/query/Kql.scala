package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * KQL-ish query-string parser — the Kibana search box is the reference's
 * ONLY ad-hoc query surface (`README.md:26-42`: `key: "1"`,
 * `key: "1" and topic: "foo"`, `message.bar: 1234`), so a user switching
 * from kafana brings query STRINGS, not Column expressions. This parses
 * the KQL subset those workflows use into an ordinary Catalyst `Column`
 * predicate, which means every parsed query still gets predicate
 * pushdown, partition pruning and codegen for free — the parser is pure
 * plan-time sugar with zero execution-time footprint.
 *
 * Supported grammar (case-insensitive keywords):
 * {{{
 *   expr    := or
 *   or      := and ( OR and )*
 *   and     := not ( AND not )*           // AND binds tighter than OR
 *   not     := NOT not | primary
 *   primary := '(' expr ')' | clause
 *   clause  := field ':' value            // equality; each * = wildcard
 *            | field (> | >= | < | <=) number
 *            | value                      // free text (see below)
 * }}}
 * Values are bare words or double-quoted phrases (quotes allow spaces
 * and disable wildcard interpretation, like KQL). Every `*` in an
 * unquoted value is a wildcard (embedded ones included, `event_type:c*ck`
 * matches `click`), translated to an escaped `LIKE`. Dotted field names
 * (`message.bar`) resolve through struct columns as in Spark SQL.
 *
 * Free text follows ES semantics: a BARE term is matched against the
 * ANALYZED token stream of the text field (lowercase + punctuation
 * split, [[graft.functions.AnalyzeTokens]]) with the term lowercased
 * too — `Spark` finds `"spark,"` — and bare-term wildcards match
 * analyzed tokens by LIKE. A QUOTED phrase is an analyzed
 * `match_phrase` ([[graft.functions.PhraseMatch]]): BOTH sides run
 * through the analyzer and the phrase tokens must appear CONSECUTIVELY,
 * so `"Spark streaming"` matches `spark, streaming.` exactly as ES
 * would (a single-token phrase like `"TOMBSTONE"` degenerates to
 * analyzed token containment). A Lucene proximity suffix `"a b"~N`
 * relaxes adjacency to in-order span_near with slop N
 * ([[graft.functions.PhraseNear]]). A Lucene fuzzy suffix on a BARE
 * term — `term~` (ES `fuzziness: AUTO`) or `term~N` (N ≤ 2, the ES
 * limit) — matches any analyzed token within classic Levenshtein
 * distance N of the analyzed term ([[graft.functions.FuzzyMatch]]; AUTO
 * maps term length 0-2/3-5/≥6 → 0/1/2). Quoted FIELD values (`f:"v"`)
 * keep exact equality, and `f:*` is a field-existence test
 * (`IS NOT NULL`), both as in KQL. Quoted values may escape `\"` and
 * `\\`.
 *
 * Untyped string literals are left to Catalyst's comparison coercion
 * (string literal vs numeric column casts the literal), matching how
 * Kibana queries typed mappings with unquoted tokens.
 */
object Kql {

  /** Parse a KQL-ish string into a Column predicate over `textField` as
    * the free-text target (the envelope's JSON-string view). */
  def parse(query: String, textField: String = "value_json"): Column = {
    val p = new Parser(tokenize(query), textField)
    val c = p.expr()
    p.expectEnd()
    c
  }

  // ---- lexer ------------------------------------------------------------

  private sealed trait Tok
  private case class Word(s: String) extends Tok // bare token (field/value)
  private case class Quoted(s: String) extends Tok
  private case class Sym(s: String) extends Tok // ( ) : > >= < <=

  private def tokenize(q: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < q.length) {
      q.charAt(i) match {
        case c if c.isWhitespace => i += 1
        case '"' =>
          // backslash escapes \" and \\ inside quotes (KQL lexer rule)
          val sb = new java.lang.StringBuilder(16)
          var j = i + 1
          var closed = false
          while (j < q.length && !closed) {
            val c = q.charAt(j)
            if (c == '\\' && j + 1 < q.length &&
              (q.charAt(j + 1) == '"' || q.charAt(j + 1) == '\\')) {
              sb.append(q.charAt(j + 1)); j += 2
            } else if (c == '"') { closed = true; j += 1 }
            else { sb.append(c); j += 1 }
          }
          require(closed, s"unterminated quote at offset $i in: $q")
          out += Quoted(sb.toString); i = j
        case '(' => out += Sym("("); i += 1
        case ')' => out += Sym(")"); i += 1
        case ':' => out += Sym(":"); i += 1
        case '>' | '<' =>
          if (i + 1 < q.length && q.charAt(i + 1) == '=') {
            out += Sym(q.substring(i, i + 2)); i += 2
          } else { out += Sym(q.substring(i, i + 1)); i += 1 }
        case _ =>
          val start = i
          while (i < q.length && !q.charAt(i).isWhitespace &&
            !"():><\"".contains(q.charAt(i))) i += 1
          out += Word(q.substring(start, i))
      }
    }
    out.result()
  }

  // ---- recursive-descent parser ----------------------------------------

  private final class Parser(toks: Vector[Tok], textField: String) {
    private var pos = 0
    private def peek: Option[Tok] = toks.lift(pos)
    private def next(): Tok = { val t = toks(pos); pos += 1; t }
    private def isKw(t: Tok, kw: String): Boolean = t match {
      case Word(s) => s.equalsIgnoreCase(kw)
      case _ => false
    }

    def expectEnd(): Unit =
      require(pos == toks.length, s"trailing tokens from position $pos")

    def expr(): Column = or()

    private def or(): Column = {
      var left = and()
      while (peek.exists(isKw(_, "or"))) { next(); left = left || and() }
      left
    }

    private def and(): Column = {
      var left = notExpr()
      while (peek.exists(isKw(_, "and"))) { next(); left = left && notExpr() }
      left
    }

    private def notExpr(): Column =
      if (peek.exists(isKw(_, "not"))) { next(); !notExpr() }
      else primary()

    private def primary(): Column = peek match {
      case Some(Sym("(")) =>
        next()
        val c = expr()
        require(peek.contains(Sym(")")), "expected )")
        next(); c
      case Some(Word(w)) => next(); afterTerm(w, quoted = false)
      case Some(Quoted(s)) => next(); afterTerm(s, quoted = true)
      case other => throw new IllegalArgumentException(s"unexpected $other")
    }

    /** A term was consumed; decide clause shape from what follows. */
    private def afterTerm(term: String, quoted: Boolean): Column = peek match {
      case Some(Sym(":")) =>
        next()
        val (v, q) = next() match {
          case Word(s) => (s, false)
          case Quoted(s) => (s, true)
          case t => throw new IllegalArgumentException(s"expected value, got $t")
        }
        // a bare * is KQL field existence; any other unquoted * is a
        // wildcard (trailing OR embedded); LIKE metacharacters in the
        // literal parts are escaped
        if (!q && v == "*") col(term).isNotNull
        else if (!q && v.contains("*")) col(term).like(likePattern(v))
        else col(term) === lit(v)
      case Some(Sym(op)) if op == ">" || op == ">=" || op == "<" || op == "<=" =>
        next()
        val n = next() match {
          case Word(s) => s.toDouble
          case t => throw new IllegalArgumentException(s"expected number, got $t")
        }
        op match {
          case ">" => col(term) > lit(n)
          case ">=" => col(term) >= lit(n)
          case "<" => col(term) < lit(n)
          case "<=" => col(term) <= lit(n)
        }
      case Some(Word(w)) if quoted && w.matches("~\\d+") =>
        // Lucene proximity suffix on a quoted phrase: "a b"~N. Mapped to
        // in-order span_near with slop N (identical to Lucene's sloppy
        // phrase for N <= 1; Lucene additionally admits out-of-order
        // transpositions at N >= 2, which this deliberately does not).
        next()
        graft.functions.PhraseMatch.near(col(textField), term,
          w.drop(1).toInt)
      case _ =>
        // free text. Quoted phrase = analyzed match_phrase (consecutive
        // analyzed tokens); bare term = ES-analyzed token match (both
        // the text field and the term go through the analyzer); bare
        // term with a trailing ~ or ~N = Lucene fuzzy match.
        if (quoted) graft.functions.PhraseMatch.phrase(col(textField), term)
        else fuzzySuffix(term) match {
          case Some((base, dist)) =>
            require(!base.contains("*"),
              s"fuzzy and wildcard cannot combine in one term: $term")
            // Lucene-style leniency: a base analyzing to anything but ONE
            // token (foo-bar~, !!!~) is not a fuzzy candidate — fall back
            // to the analyzed-phrase path the base would take unfuzzed
            // (zero tokens match nothing) instead of throwing a raw
            // plan-time require from deep inside FuzzyMatch
            if (graft.functions.PhraseMatch.analyzePhrase(base).length == 1)
              graft.functions.FuzzyMatch.fuzzy(col(textField), base, dist)
            else graft.functions.PhraseMatch.phrase(col(textField), base)
          case None =>
            val toks = graft.functions.AnalyzeTokens.analyze(col(textField))
            val t = term.toLowerCase(java.util.Locale.ROOT)
            if (t.contains("*"))
              exists(toks, _.like(likePattern(t)))
            else array_contains(toks, lit(t))
        }
    }
  }

  /** Split a bare free-text term into (base, explicit distance) when it
    * carries a Lucene fuzzy suffix: `term~` → AUTO (None), `term~N` → N.
    * A lone `~`/`~N` (empty base) is not a fuzzy term. An explicit N
    * outside ES's 0..2 cap is a clear PARSE error here (length-guarded
    * before `toInt`, so `term~99999999999` can't NumberFormatException)
    * rather than a raw require escaping from plan construction. */
  private def fuzzySuffix(term: String): Option[(String, Option[Int])] = {
    val m = "^(.+?)~(\\d*)$".r
    term match {
      case m(base, digits) =>
        val dist = if (digits.isEmpty) None else {
          require(digits.length == 1 && digits.toInt <= 2,
            s"fuzzy distance must be 0..2 (ES limit), got ~$digits in: $term")
          Some(digits.toInt)
        }
        Some((base, dist))
      case _ => None
    }
  }

  /** Translate a KQL wildcard value into a LIKE pattern: each `*`
    * becomes `%`, LIKE metacharacters in the literal parts escaped. */
  private def likePattern(v: String): String =
    v.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
      .replace("*", "%")
}
