package graft.sql

import SqlLexer._
import scala.collection.mutable.ArrayBuffer

/** Dialect rewrites that close the gap between the reference's SQL surface
  * (Polars SQL — SURVEY §2.4) and Spark SQL:
  *
  *   - double-quoted identifiers → backticks (Q1; reference corpus uses
  *     `"Ano do Período de Apuração"` style throughout testes-sqls.txt)
  *   - `STRFTIME(x, '%d/%m/%Y')` → `DATE_FORMAT(x, 'dd/MM/yyyy')` (Q16,
  *     sqls.rs:467-480)
  *   - `SELECT * EXCEPT(…) REPLACE(… AS c) RENAME(a AS b)` projection
  *     modifiers (Q4–Q7, sqls.rs:109-217) — expanded against the probed
  *     schema into an explicit column list, applied in Polars' order
  *     except → replace → rename
  *   - HAVING on a select-list alias (Q15, sqls.rs:441-464) — alias
  *     substituted with its defining expression on analysis failure
  *
  * All rewrites are pre-parse text transformations; Spark's own
  * parser/analyzer runs afterwards, so this adds zero cost to the
  * optimized plan.
  */
object SqlRewriter {

  /** strftime %-code → java.time DateTimeFormatter pattern fragments. */
  private val strftimeMap: Map[Char, String] = Map(
    'Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'd' -> "dd",
    'e' -> "d", 'H' -> "HH", 'I' -> "hh", 'M' -> "mm", 'S' -> "ss",
    'f' -> "SSSSSS", 'p' -> "a", 'B' -> "MMMM", 'b' -> "MMM",
    'A' -> "EEEE", 'a' -> "EEE", 'j' -> "DDD", 'G' -> "YYYY",
    'V' -> "ww", 'u' -> "e", 'Z' -> "zzz", 'z' -> "xx")

  /** Translate a strftime format string body (no surrounding quotes) into a
    * JVM datetime pattern; literal letter runs get single-quote protected. */
  def translateStrftime(fmt: String): String = {
    val out = new StringBuilder
    val lit = new StringBuilder
    def flushLit(): Unit = {
      if (lit.nonEmpty) {
        val s = lit.toString
        if (s.exists(_.isLetter)) out.append("'").append(s.replace("'", "''")).append("'")
        else out.append(s)
        lit.clear()
      }
    }
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        val code = fmt.charAt(i + 1)
        if (code == '%') { lit.append('%'); i += 2 }
        else strftimeMap.get(code) match {
          case Some(p) => flushLit(); out.append(p); i += 2
          case None    => lit.append(c); i += 1
        }
      } else { lit.append(c); i += 1 }
    }
    flushLit()
    out.toString
  }

  /** Polars-SQL function names that rename 1:1 onto a Spark builtin with
    * identical argument order and semantics. Applied only when the word
    * heads a call (next non-ws token is `(`) — a column named
    * `array_length` stays untouched. */
  private val fnRenames: Map[String, String] = Map(
    "starts_with" -> "STARTSWITH",
    "ends_with" -> "ENDSWITH",
    "strpos" -> "INSTR",
    "array_length" -> "ARRAY_SIZE",
    "array_to_string" -> "ARRAY_JOIN",
    "array_unique" -> "ARRAY_DISTINCT",
    "array_upper" -> "ARRAY_MAX",
    "array_lower" -> "ARRAY_MIN",
    "array_reverse" -> "REVERSE",
    // Spark's GET is 0-based with null-on-out-of-bounds — Polars'
    // list.get contract (negative indexes differ: Polars wraps from the
    // end, Spark nulls; the sweep spec documents it)
    "array_get" -> "GET",
    "unnest" -> "EXPLODE",
    // Spark's `percentile` is the exact linearly-interpolated quantile —
    // the same definition as SQL QUANTILE_CONT — and takes (col, q) in
    // the same order
    "quantile_cont" -> "PERCENTILE")

  /** DATE_PART/EXTRACT field spellings Polars accepts that Spark names
    * differently. `weekday`/`isodow` are ISO Mon=1..Sun=7 in Polars —
    * Spark's DAYOFWEEK_ISO, not its Sun=1 DAYOFWEEK. `epoch` has no
    * Spark field at all and is special-cased to a double cast. */
  private val datePartMap: Map[String, String] = Map(
    "ordinal_day" -> "DOY",
    "weekday" -> "DAYOFWEEK_ISO",
    "isodow" -> "DAYOFWEEK_ISO")

  /** Words that can directly precede an operand without being one
    * (operator/clause keywords). Used to decide whether a `(`-group is a
    * function call and whether `~` / a sign is infix or prefix. CAST,
    * EXTRACT etc. are deliberately absent — they ARE call heads. */
  private val sqlKeywords: Set[String] = Set(
    "select", "from", "where", "group", "by", "having", "order", "limit",
    "offset", "union", "intersect", "except", "join", "on", "using", "as",
    "and", "or", "not", "in", "is", "like", "ilike", "rlike", "between",
    "case", "when", "then", "else", "end", "distinct",
    "exists", "values", "escape", "with", "over", "partition",
    "rows", "range", "preceding", "following", "unbounded", "current",
    "asc", "desc", "nulls", "within")

  private def isOperandEndTok(t: Tok): Boolean = t match {
    case _: SStr | _: BQuot | _: DQuot => true
    // END closes a CASE expression — an operand-final keyword: what
    // follows it (`~`, a sign, `//`) is infix, not prefix
    case w: Word if w.text.equalsIgnoreCase("end") => true
    case w: Word                       => !sqlKeywords.contains(w.text.toLowerCase)
    case Punct(")")                    => true
    case Punct("*")                    => false
    case _                             => false
  }

  private def prevNonWs(toks: IndexedSeq[Tok], from: Int): Int = {
    var i = from
    while (i >= 0 && toks(i).isInstanceOf[Ws]) i -= 1
    i
  }

  /** Index of the matching OPEN paren for the close paren at `close`. */
  private def matchParenRev(toks: IndexedSeq[Tok], close: Int): Int = {
    var depth = 0
    var i = close
    while (i >= 0) {
      toks(i) match {
        case Punct(")") => depth += 1
        case Punct("(") =>
          depth -= 1
          if (depth == 0) return i
        case _ =>
      }
      i -= 1
    }
    -1
  }

  /** `1e-3` lexes as Word("1e") Punct("-") Word("3") — these helpers let
    * the atom scanners glue a signed exponent back into one numeric
    * operand instead of mistaking the sign for a binary operator. */
  private def isExpHead(t: Tok): Boolean = t match {
    case Word(x) => x.matches("(?i)[0-9][0-9_.]*e")
    case _       => false
  }
  private def isDigits(t: Tok): Boolean = t match {
    case Word(x) => x.nonEmpty && x.forall(_.isDigit)
    case _       => false
  }

  /** Exclusive end of the primary expression starting at `start`:
    * a parenthesized group, a string literal, a signed-exponent numeric
    * literal, or an (optionally dotted) identifier chain with an
    * optional trailing call-argument group. */
  private def atomEndFwd(toks: Vector[Tok], start: Int): Int = {
    if (start >= toks.length) return start
    toks(start) match {
      case Punct("(") =>
        val c = matchParen(toks, start)
        if (c < 0) toks.length else c + 1
      case _: SStr => start + 1
      case w: Word if w.text.equalsIgnoreCase("case") =>
        // CASE … END is one atom; CASEs nest, so depth-count to the
        // matching END (e.g. `2 // CASE WHEN p THEN a ELSE b END`)
        var depth = 1
        var i = start + 1
        var res = toks.length
        while (i < toks.length && depth > 0) {
          toks(i) match {
            case x: Word if x.text.equalsIgnoreCase("case") => depth += 1
            case x: Word if x.text.equalsIgnoreCase("end") =>
              depth -= 1; if (depth == 0) res = i + 1
            case _ => ()
          }
          i += 1
        }
        res
      case w: Word if isExpHead(w) && start + 2 < toks.length &&
          (toks(start + 1) == Punct("-") || toks(start + 1) == Punct("+")) &&
          isDigits(toks(start + 2)) =>
        start + 3
      case _: Word | _: BQuot | _: DQuot =>
        var e = start + 1
        var go = true
        while (go) {
          val d = nextNonWs(toks, e)
          if (d < toks.length && toks(d) == Punct(".")) {
            val w = nextNonWs(toks, d + 1)
            if (w < toks.length && (toks(w).isInstanceOf[Word] ||
              toks(w).isInstanceOf[BQuot] || toks(w).isInstanceOf[DQuot])) { e = w + 1 }
            else go = false
          } else go = false
        }
        val p = nextNonWs(toks, e)
        if (p < toks.length && toks(p) == Punct("(")) {
          val c = matchParen(toks, p)
          if (c < 0) toks.length else c + 1
        } else e
      case _ => start + 1
    }
  }

  /** Start of the dotted identifier chain whose last word is at `end`. */
  private def dottedStartBack(toks: Vector[Tok], end: Int): Int = {
    var s = end
    var go = true
    while (go) {
      val d = prevNonWs(toks, s - 1)
      if (d >= 0 && toks(d) == Punct(".")) {
        val w = prevNonWs(toks, d - 1)
        if (w >= 0 && (toks(w).isInstanceOf[Word] || toks(w).isInstanceOf[BQuot] ||
          toks(w).isInstanceOf[DQuot])) s = w
        else go = false
      } else go = false
    }
    s
  }

  /** Start index of the primary expression whose LAST token is at `end`:
    * mirrors [[atomEndFwd]] scanning backwards (close-paren group plus a
    * possible function-name head, or a dotted identifier chain). */
  private def atomStartBack(toks: Vector[Tok], end: Int): Int = toks(end) match {
    case d: Word if isDigits(d) && end >= 2 &&
        (toks(end - 1) == Punct("-") || toks(end - 1) == Punct("+")) &&
        isExpHead(toks(end - 2)) =>
      end - 2
    case w: Word if w.text.equalsIgnoreCase("end") =>
      // the atom ending in END is a whole CASE expression; CASEs nest,
      // so depth-count back to the matching CASE head
      var depth = 1
      var i = end - 1
      var res = end
      while (i >= 0 && depth > 0) {
        toks(i) match {
          case x: Word if x.text.equalsIgnoreCase("end")  => depth += 1
          case x: Word if x.text.equalsIgnoreCase("case") =>
            depth -= 1; if (depth == 0) res = i
          case _ => ()
        }
        i -= 1
      }
      if (depth == 0) res else end
    case Punct(")") =>
      val open = matchParenRev(toks, end)
      if (open < 0) end
      else {
        val p = prevNonWs(toks, open - 1)
        val isFnHead = p >= 0 && (toks(p) match {
          case w: Word => !sqlKeywords.contains(w.text.toLowerCase)
          case _: BQuot | _: DQuot => true
          case _ => false
        })
        if (isFnHead) dottedStartBack(toks, p) else open
      }
    case _: Word | _: BQuot | _: DQuot => dottedStartBack(toks, end)
    case _ => end
  }

  /** Start of the multiplicative chain that forms the LEFT operand of the
    * operator at `opIdx` — walks back over `* / %`-joined terms (each an
    * atom with optional unary signs) and stops at any lower-precedence
    * boundary, so `a * b // c` floors `a * b / c` (left associativity),
    * not `b / c`. */
  private def multChainStart(toks: Vector[Tok], opIdx: Int): Int = {
    var start = opIdx
    var pos = opIdx
    var continue = true
    while (continue) {
      val e = prevNonWs(toks, pos - 1)
      if (e < 0) continue = false
      else {
        var s = atomStartBack(toks, e)
        // fold in unary signs: `-a // b` must floor `(-a)/b`, and signs
        // chain (`- -a`); a sign is unary iff nothing operand-like
        // precedes it
        var signGo = true
        while (signGo) {
          val q = prevNonWs(toks, s - 1)
          if (q >= 0 && (toks(q) == Punct("-") || toks(q) == Punct("+"))) {
            val r = prevNonWs(toks, q - 1)
            if (r < 0 || !isOperandEndTok(toks(r))) s = q else signGo = false
          } else signGo = false
        }
        start = s
        val p = prevNonWs(toks, s - 1)
        if (p >= 0 && (toks(p) == Punct("*") || toks(p) == Punct("/") ||
          toks(p) == Punct("%"))) pos = p
        else continue = false
      }
    }
    start
  }

  /** Polars' `//` floor-division operator →
    * `GRAFT_FLOORDIV((left), (right))` — the native
    * [[graft.functions.FloorDiv]] expression [[graft.sql.GraftSql]]
    * registers per session. The earlier `FLOOR((l) / (r))` form was
    * correct only up to 2^53: Spark's `/` promotes integers to double,
    * so larger int64 operands silently lost ulps where Polars' `//` is
    * exact. The native expression dispatches on the RESOLVED types
    * (integral → exact `Math.floorDiv` over longs; fractional →
    * `floor(l/r)`, byte-identical to the old form) — a dispatch the
    * text-level rewrite cannot make. Floor (not truncate-toward-zero)
    * either way: `-7 // 2` is -4. Processes the LEFTMOST occurrence
    * then recurses, so chains left-associate: `a // b // c` →
    * `GRAFT_FLOORDIV(GRAFT_FLOORDIV(a, b), c)`. */
  private[sql] def rewriteFloorDiv(toks: Vector[Tok]): Vector[Tok] = {
    var i = 0
    while (i + 1 < toks.length) {
      if (toks(i) == Punct("/") && toks(i + 1) == Punct("/")) {
        val lStart = multChainStart(toks, i)
        // right operand: optional unary signs then one atom (binding
        // tighter than the division, per left associativity)
        var rAtom = nextNonWs(toks, i + 2)
        while (rAtom < toks.length &&
          (toks(rAtom) == Punct("-") || toks(rAtom) == Punct("+")))
          rAtom = nextNonWs(toks, rAtom + 1)
        val rEnd = atomEndFwd(toks, rAtom)
        val right = toks.slice(nextNonWs(toks, i + 2), rEnd)
        val replaced = Vector(Word("GRAFT_FLOORDIV"), Punct("("), Punct("(")) ++
          toks.slice(lStart, i) ++
          Vector(Punct(")"), Punct(","), Ws(" "), Punct("(")) ++
          right ++ Vector(Punct(")"), Punct(")"))
        return rewriteFloorDiv(
          toks.slice(0, lStart) ++ replaced ++ toks.slice(rEnd, toks.length))
      }
      i += 1
    }
    toks
  }

  /** Polars SQL's file table functions, usable in FROM. */
  private val tableFns = Set("read_csv", "read_parquet", "read_json", "read_ndjson")

  /** Pass 0: replace each `read_*('path')` table-function call with the
    * name `resolve(fn, path)` returns — the caller registers the file
    * as a temp view under that name through graft's Readers (delimiter
    * sniffing, bounded inference, format dispatch all apply). A call
    * whose argument is not a single string literal passes through
    * untouched and surfaces as Spark's own parse/analysis error. */
  def substituteTableFns(sql: String, resolve: (String, String) => String): String = {
    val toks = lex(sql)
    val out = ArrayBuffer.empty[Tok]
    var i = 0
    while (i < toks.length) {
      toks(i) match {
        case w: Word if tableFns.contains(w.text.toLowerCase) =>
          val open = nextNonWs(toks, i + 1)
          val close =
            if (open < toks.length && toks(open) == Punct("(")) matchParen(toks, open) else -1
          val inner =
            if (close >= 0) toks.slice(open + 1, close).filterNot(_.isInstanceOf[Ws])
            else Vector.empty[Tok]
          inner match {
            case Vector(s: SStr) =>
              val path = s.text.substring(1, s.text.length - 1).replace("''", "'")
              out += Word(resolve(w.text.toLowerCase, path))
              i = close + 1
            case _ => out += w; i += 1
          }
        case t => out += t; i += 1
      }
    }
    render(out.toVector)
  }

  /** Pass 1: double-quoted identifiers → backticks; `//` floor division;
    * Polars function renames; STRFTIME/STRPTIME pattern translation;
    * QUANTILE_DISC → WITHIN GROUP form; `~ !~ ~* !~*` regex operators;
    * `[NOT] SIMILAR TO` → anchored RLIKE. */
  def rewriteQuotesAndFunctions(sql: String): String =
    render(rewriteToks(rewriteFloorDiv(lex(sql))))

  /** Translate a SQL-standard `SIMILAR TO` pattern into an anchored Java
    * regex (the RLIKE operand). Per the standard (and PostgreSQL's
    * documented semantics): `%` → `.*`, `_` → `.`; the POSIX-borrowed
    * metacharacters `| * + ? ( ) [ ] { }` keep their regex meaning;
    * everything else — notably `.` `^` `$` `\` — is LITERAL and gets
    * regex-escaped. Bracket expressions pass through verbatim (their
    * grammar is already POSIX). `escapeChar` (default `\`) makes the
    * next character literal; a pattern may not end on it. The result is
    * wrapped `^(?:…)$` — SIMILAR TO matches the WHOLE string, unlike
    * the `~` operators' substring search. */
  def translateSimilarTo(pat: String, escapeChar: Option[Char] = Some('\\')): String = {
    val out = new StringBuilder
    // regex-special chars that SIMILAR TO treats as LITERAL (the
    // POSIX-borrowed `| * + ? ( ) [ ] { }` keep their regex meaning)
    val literalSpecial = "\\^$."
    // everything regex-special — an ESCAPED char is always literal
    val regexSpecial = "\\^$.|?*+()[]{}"
    def emitLiteral(c: Char): Unit = {
      if (regexSpecial.indexOf(c.toInt) >= 0) out.append('\\')
      out.append(c)
    }
    var inClass = false
    var i = 0
    while (i < pat.length) {
      val c = pat.charAt(i)
      if (inClass) {
        // VERBATIM inside a bracket expression — including the escape
        // character, which is not special there (the documented POSIX
        // pass-through; a backslash in-class means whatever the regex
        // engine says it means, same as the DuckDB oracle's engine).
        // Known caveat: an in-class `\]` ends the SCANNER's class state
        // early even though the engine reads it as a literal `]`.
        if (c == ']') inClass = false
        out.append(c); i += 1
      } else if (escapeChar.contains(c)) {
        if (i + 1 >= pat.length)
          throw new IllegalArgumentException(
            s"SIMILAR TO pattern must not end with its escape character: $pat")
        emitLiteral(pat.charAt(i + 1)); i += 2
      } else {
        c match {
          case '%' => out.append(".*")
          case '_' => out.append('.')
          case '[' => inClass = true; out.append(c)
          case ch if literalSpecial.indexOf(ch.toInt) >= 0 => out.append('\\').append(ch)
          case ch  => out.append(ch)
        }
        i += 1
      }
    }
    // \A..\z, not ^..$: Java's `$` (sans MULTILINE) also matches just
    // before a FINAL line terminator, so "red\n" would wrongly satisfy
    // SIMILAR TO 'red' under find()-style RLIKE; \z is end-of-input
    "\\A(?:" + out.toString + ")\\z"
  }

  /** A Java-regex string as a Spark SQL single-quoted literal (Spark's
    * default lexer processes C-style backslash escapes, so regex
    * backslashes double and embedded quotes backslash-escape). */
  private def regexAsSparkLiteral(regex: String): String =
    "'" + regex.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** Recursive token rewrite. STRFTIME/STRPTIME handling is
    * argument-aware: only the FORMAT argument (2nd) has its string
    * literal pattern-translated — a '%' inside any other argument's
    * literal is data, not a pattern (e.g. `STRFTIME(x,'%Y') || ' %done'`)
    * — and value arguments are rewritten recursively so a nested call is
    * also renamed instead of surviving as an unresolvable function. */
  private def rewriteToks(toks: Vector[Tok]): Vector[Tok] = {
    val out = ArrayBuffer.empty[Tok]

    def lastIsOperandEnd: Boolean = {
      var j = out.length - 1
      while (j >= 0 && out(j).isInstanceOf[Ws]) j -= 1
      j >= 0 && isOperandEndTok(out(j))
    }

    /** Emit the regex PATTERN operand starting at `from`, prefixing
      * `(?i)` when `ci`. A string literal gets the prefix folded into the
      * literal; any other operand is wrapped in CONCAT('(?i)', atom).
      * Returns the resume index. */
    def emitPattern(from: Int, ci: Boolean): Int = {
      val j = nextNonWs(toks, from)
      if (j == from) out += Ws(" ") // `a~'p'` → keep a gap after RLIKE
      out ++= toks.slice(from, j) // preserve whitespace
      if (!ci) j
      else if (j < toks.length && toks(j).isInstanceOf[SStr]) {
        val s = toks(j).asInstanceOf[SStr]
        out += SStr("'(?i)" + s.text.substring(1))
        j + 1
      } else {
        val aEnd = atomEndFwd(toks, j)
        out += Word("CONCAT"); out += Punct("("); out += SStr("'(?i)'"); out += Punct(",")
        out ++= rewriteToks(toks.slice(j, aEnd))
        out += Punct(")")
        aEnd
      }
    }

    var i = 0
    while (i < toks.length) {
      toks(i) match {
        case d: DQuot =>
          out += BQuot("`" + d.name.replace("`", "``") + "`")
          i += 1
        case w: Word if w.text.equalsIgnoreCase("strftime") ||
            w.text.equalsIgnoreCase("strptime") =>
          val open = nextNonWs(toks, i + 1)
          val close = if (open < toks.length && toks(open) == Punct("(")) matchParen(toks, open) else -1
          if (close >= 0) {
            // STRPTIME(str, '%…') parses with the same %-codes STRFTIME
            // prints with; Spark's TO_TIMESTAMP takes the same translated
            // JVM pattern DATE_FORMAT does
            out += Word(if (w.text.equalsIgnoreCase("strftime")) "DATE_FORMAT" else "TO_TIMESTAMP")
            out ++= toks.slice(i + 1, open + 1) // pre-paren ws + '('
            val args = splitTopLevel(toks.slice(open + 1, close))
            args.zipWithIndex.foreach { case (arg, k) =>
              if (k > 0) out += Punct(",")
              val nonWs = arg.filterNot(_.isInstanceOf[Ws])
              if (k == 1 && nonWs.length == 1 && nonWs.head.isInstanceOf[SStr]) {
                out ++= arg.map {
                  case s: SStr =>
                    val body = s.text.substring(1, s.text.length - 1).replace("''", "'")
                    SStr("'" + translateStrftime(body).replace("'", "''") + "'")
                  case t => t
                }
              } else out ++= rewriteToks(arg.toVector)
            }
            out += Punct(")")
            i = close + 1
          } else { out += w; i += 1 }
        case w: Word if w.text.equalsIgnoreCase("date_part") =>
          // field-name mapping, plus the epoch special case: Spark has
          // no 'epoch' field — seconds-since-epoch (with fraction) is a
          // double cast of the timestamp
          val open = nextNonWs(toks, i + 1)
          val close = if (open < toks.length && toks(open) == Punct("(")) matchParen(toks, open) else -1
          val args = if (close >= 0) splitTopLevel(toks.slice(open + 1, close)) else Nil
          val fieldLit = args.headOption.flatMap(_.collectFirst { case s: SStr => s })
            .filter(_ => args.length == 2)
          val field = fieldLit.map(s => s.text.substring(1, s.text.length - 1).toLowerCase)
          def trimWs(ts: Seq[Tok]): Vector[Tok] =
            ts.dropWhile(_.isInstanceOf[Ws]).reverse
              .dropWhile(_.isInstanceOf[Ws]).reverse.toVector
          if (field.contains("epoch")) {
            out += Word("CAST"); out += Punct("(")
            out += Word("CAST"); out += Punct("(")
            out ++= rewriteToks(trimWs(args(1)))
            out += Ws(" "); out += Word("AS"); out += Ws(" "); out += Word("TIMESTAMP")
            out += Punct(")")
            out += Ws(" "); out += Word("AS"); out += Ws(" "); out += Word("DOUBLE")
            out += Punct(")")
            i = close + 1
          } else if (field.exists(datePartMap.contains)) {
            out += Word("DATE_PART"); out += Punct("(")
            out += SStr("'" + datePartMap(field.get) + "'"); out += Punct(",")
            out ++= rewriteToks(trimWs(args(1)))
            out += Punct(")")
            i = close + 1
          } else { out += w; i += 1 }
        case w: Word if w.text.equalsIgnoreCase("extract") && {
            val open = nextNonWs(toks, i + 1)
            open < toks.length && toks(open) == Punct("(")
          } =>
          // EXTRACT(field FROM x): same field mapping, keyword position
          val open = nextNonWs(toks, i + 1)
          val close = matchParen(toks, open)
          val fIdx = nextNonWs(toks, open + 1)
          val fieldW = toks(fIdx) match {
            case fw: Word => Some(fw.text.toLowerCase)
            case _        => None
          }
          if (close >= 0 && fieldW.contains("epoch")) {
            val fromIdx = nextNonWs(toks, fIdx + 1)
            if (fromIdx < close && isWord(toks(fromIdx), "from")) {
              out += Word("CAST"); out += Punct("(")
              out += Word("CAST"); out += Punct("(")
              out ++= rewriteToks(toks.slice(fromIdx + 1, close))
              out += Ws(" "); out += Word("AS"); out += Ws(" "); out += Word("TIMESTAMP")
              out += Punct(")")
              out += Ws(" "); out += Word("AS"); out += Ws(" "); out += Word("DOUBLE")
              out += Punct(")")
              i = close + 1
            } else { out += w; i += 1 }
          } else if (close >= 0 && fieldW.exists(datePartMap.contains)) {
            out += w
            out ++= toks.slice(i + 1, fIdx)
            out += Word(datePartMap(fieldW.get))
            out ++= rewriteToks(toks.slice(fIdx + 1, close + 1))
            i = close + 1
          } else { out += w; i += 1 }
        case w: Word if w.text.equalsIgnoreCase("quantile_disc") =>
          // QUANTILE_DISC(x, q) → PERCENTILE_DISC(q) WITHIN GROUP
          // (ORDER BY x): Spark only has the SQL-standard inverse-
          // distribution syntax for the discrete quantile
          val open = nextNonWs(toks, i + 1)
          val close = if (open < toks.length && toks(open) == Punct("(")) matchParen(toks, open) else -1
          val args = if (close >= 0) splitTopLevel(toks.slice(open + 1, close)) else Nil
          if (args.length == 2) {
            def trimWs(ts: Seq[Tok]): Vector[Tok] =
              ts.dropWhile(_.isInstanceOf[Ws]).reverse
                .dropWhile(_.isInstanceOf[Ws]).reverse.toVector
            out += Word("PERCENTILE_DISC"); out += Punct("(")
            out ++= rewriteToks(trimWs(args(1)))
            out += Punct(")"); out += Ws(" "); out += Word("WITHIN"); out += Ws(" ")
            out += Word("GROUP"); out += Ws(" "); out += Punct("(")
            out += Word("ORDER"); out += Ws(" "); out += Word("BY"); out += Ws(" ")
            out ++= rewriteToks(trimWs(args(0)))
            out += Punct(")")
            i = close + 1
          } else { out += w; i += 1 }
        case w: Word if (w.text.equalsIgnoreCase("array_sum") ||
            w.text.equalsIgnoreCase("array_mean")) && {
            val open = nextNonWs(toks, i + 1)
            open < toks.length && toks(open) == Punct("(") &&
              matchParen(toks, open) >= 0
          } =>
          // no 1:1 Spark builtin — template onto the higher-order
          // AGGREGATE fold (codegen-friendly, null array → null).
          // Sum of an empty list is 0.0 (Polars' convention); mean of
          // an empty list TRY_DIVIDEs by count 0 → NULL — Polars'
          // null-mean convention, ANSI-mode-safe. Result type is
          // DOUBLE regardless of element type (documented widening).
          // The argument is templated exactly ONCE: mean folds a
          // (sum, count) struct accumulator in a single AGGREGATE, so
          // a nondeterministic or expensive argument is never
          // evaluated twice with potentially diverging values.
          val open = nextNonWs(toks, i + 1)
          val close = matchParen(toks, open)
          val arg = render(rewriteToks(toks.slice(open + 1, close)))
          val expr =
            if (w.text.equalsIgnoreCase("array_sum"))
              s"AGGREGATE(($arg), CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE))"
            else
              s"AGGREGATE(($arg), NAMED_STRUCT('s', CAST(0.0 AS DOUBLE), 'n', CAST(0 AS BIGINT)), " +
                "(acc, x) -> NAMED_STRUCT('s', acc.s + CAST(x AS DOUBLE), 'n', acc.n + 1L), " +
                "acc -> TRY_DIVIDE(acc.s, acc.n))"
          out ++= lex(expr)
          i = close + 1
        case w: Word if fnRenames.contains(w.text.toLowerCase) && {
            val open = nextNonWs(toks, i + 1)
            open < toks.length && toks(open) == Punct("(")
          } =>
          out += Word(fnRenames(w.text.toLowerCase))
          i += 1
        case w: Word if w.text.equalsIgnoreCase("similar") && {
            // operand (plain form) or NOT (negated form) must precede —
            // a column literally named `similar` can't be followed by TO
            val ok = lastIsOperandEnd || {
              var j = out.length - 1
              while (j >= 0 && out(j).isInstanceOf[Ws]) j -= 1
              j >= 0 && isWord(out(j), "not")
            }
            val to = nextNonWs(toks, i + 1)
            ok && to < toks.length && isWord(toks(to), "to")
          } =>
          // `x [NOT] SIMILAR TO 'pat' [ESCAPE 'c']` → `x [NOT] RLIKE
          // '^(?:regex)$'` — whole-string match per the SQL standard
          // (polars-sql itself rejects the construct, so this is a
          // strict dialect extension, oracle-gated in q45_similar_to).
          // The translation happens at rewrite time, so only a string
          // LITERAL pattern is expressible; anything else fails loudly
          // rather than mis-matching.
          val to = nextNonWs(toks, i + 1)
          val pIdx = nextNonWs(toks, to + 1)
          val patTok = if (pIdx < toks.length) toks(pIdx) else Punct("")
          patTok match {
            case s: SStr =>
              val body = s.text.substring(1, s.text.length - 1).replace("''", "'")
              // optional ESCAPE 'c': single char overrides the default
              // backslash; empty string selects NO escape character
              var resume = pIdx + 1
              var esc: Option[Char] = Some('\\')
              val eIdx = nextNonWs(toks, pIdx + 1)
              if (eIdx < toks.length && isWord(toks(eIdx), "escape")) {
                val lIdx = nextNonWs(toks, eIdx + 1)
                toks(lIdx) match {
                  case l: SStr =>
                    val e = l.text.substring(1, l.text.length - 1).replace("''", "'")
                    if (e.length > 1) throw new IllegalArgumentException(
                      s"SIMILAR TO ESCAPE must be a single character, got '$e'")
                    esc = e.headOption
                    resume = lIdx + 1
                  case other => throw new IllegalArgumentException(
                    s"SIMILAR TO ESCAPE requires a string literal, got ${other.text}")
                }
              }
              out += Word("RLIKE"); out += Ws(" ")
              out += SStr(regexAsSparkLiteral(translateSimilarTo(body, esc)))
              i = resume
            case other => throw new IllegalArgumentException(
              "SIMILAR TO requires a string-literal pattern (translated at " +
                s"rewrite time); got ${other.text}")
          }
        case Punct("!") if i + 1 < toks.length && toks(i + 1) == Punct("~") &&
            lastIsOperandEnd =>
          // `a !~ p` / `a !~* p` — negated (case-insensitive) regex match
          val ci = i + 2 < toks.length && toks(i + 2) == Punct("*")
          out += Ws(" "); out += Word("NOT"); out += Ws(" "); out += Word("RLIKE")
          i = emitPattern(i + (if (ci) 3 else 2), ci)
        case Punct("~") if lastIsOperandEnd =>
          // infix `a ~ p` / `a ~* p` — regex match (unanchored search,
          // same as RLIKE); prefix `~` (no preceding operand) passes
          // through as Spark's bitwise NOT
          val ci = i + 1 < toks.length && toks(i + 1) == Punct("*")
          out += Ws(" "); out += Word("RLIKE")
          i = emitPattern(i + (if (ci) 2 else 1), ci)
        case t => out += t; i += 1
      }
    }
    out.toVector
  }

  // ---- star-modifier expansion ------------------------------------------

  final case class StarModifiers(
      except: Seq[String], replace: Seq[(String, String)], rename: Seq[(String, String)],
      ilike: Option[String] = None)

  /** One `* EXCEPT(..) REPLACE(..) RENAME(..)` occurrence: token span
    * [starIdx, endIdx) covering the star and all modifier groups. */
  final case class StarSite(starIdx: Int, endIdx: Int, mods: StarModifiers)

  private def identName(t: Tok): String = t match {
    case b: BQuot => b.name
    case d: DQuot => d.name
    case w: Word  => w.text
    case o        => o.text
  }

  /** Split the tokens of a parenthesized group body on top-level commas. */
  private def splitTopLevel(toks: IndexedSeq[Tok]): Seq[Seq[Tok]] = {
    val parts = ArrayBuffer(ArrayBuffer.empty[Tok])
    var depth = 0
    toks.foreach {
      case p @ Punct("(") => depth += 1; parts.last += p
      case p @ Punct(")") => depth -= 1; parts.last += p
      case Punct(",") if depth == 0 => parts += ArrayBuffer.empty[Tok]
      case t => parts.last += t
    }
    parts.map(_.toSeq).toSeq
  }

  /** Parse `expr AS name` — the alias is the ident after the LAST top-level
    * AS; returns (exprText, aliasName). */
  private def splitAs(item: Seq[Tok]): Option[(String, String)] = {
    var depth = 0
    var asIdx = -1
    item.indices.foreach { k =>
      item(k) match {
        case Punct("(") => depth += 1
        case Punct(")") => depth -= 1
        case w: Word if depth == 0 && w.text.equalsIgnoreCase("as") => asIdx = k
        case _ =>
      }
    }
    if (asIdx < 0) None
    else {
      val expr = render(item.take(asIdx)).trim
      val alias = item.drop(asIdx + 1).collectFirst {
        case t @ (_: Word | _: BQuot | _: DQuot) => identName(t)
      }
      alias.map(a => (expr, a))
    }
  }

  /** Find all star-modifier sites in a token vector. */
  def findStarSites(toks: Vector[Tok]): Seq[StarSite] = {
    val sites = ArrayBuffer.empty[StarSite]
    var i = 0
    while (i < toks.length) {
      if (toks(i) == Punct("*")) {
        var j = nextNonWs(toks, i + 1)
        var except = Seq.empty[String]
        var repl = Seq.empty[(String, String)]
        var ren = Seq.empty[(String, String)]
        var ilike = Option.empty[String]
        var any = false
        var continue = true
        while (continue && j < toks.length) {
          val kw = toks(j) match {
            case w: Word if w.text.equalsIgnoreCase("except")  => "except"
            case w: Word if w.text.equalsIgnoreCase("exclude") => "except"
            case w: Word if w.text.equalsIgnoreCase("replace") => "replace"
            case w: Word if w.text.equalsIgnoreCase("rename")  => "rename"
            case w: Word if w.text.equalsIgnoreCase("ilike")   => "ilike"
            case _ => ""
          }
          if (kw == "ilike") {
            // Polars `SELECT * ILIKE 'pat%'` — parenless, one string
            // literal: select only columns whose NAME matches the
            // case-insensitive LIKE pattern. (A bare `*` can never be
            // an ILIKE operand, so this position is unambiguous.)
            val lit = nextNonWs(toks, j + 1)
            if (lit < toks.length && toks(lit).isInstanceOf[SStr]) {
              val s = toks(lit).text
              ilike = Some(s.substring(1, s.length - 1).replace("''", "'"))
              any = true
              j = nextNonWs(toks, lit + 1)
            } else continue = false
          } else if (kw.isEmpty) continue = false
          else {
            val open = nextNonWs(toks, j + 1)
            if (open >= toks.length || toks(open) != Punct("(") ||
              matchParen(toks, open) < 0) continue = false
            else {
              val close = matchParen(toks, open)
              val body = toks.slice(open + 1, close)
              // keep whitespace: REPLACE expressions must render verbatim
              val items = splitTopLevel(body)
              kw match {
                case "except" =>
                  except = items.flatMap(_.find(!_.isInstanceOf[Ws])).map(identName)
                case "replace" =>
                  // splitAs yields (expr, alias); REPLACE semantics are
                  // column-name → replacement-expr
                  repl = items.flatMap(it => splitAs(it)).map { case (e, a) => (a, e) }
                case "rename" =>
                  ren = items.flatMap { it =>
                    splitAs(it).map { case (e, a) =>
                      // left side of RENAME is an identifier, not an expr
                      (e.stripPrefix("`").stripSuffix("`").replace("``", "`"), a)
                    }
                  }
              }
              any = true
              j = nextNonWs(toks, close + 1)
            }
          }
        }
        if (any) { sites += StarSite(i, j, StarModifiers(except, repl, ren, ilike)); i = j }
        else i += 1
      } else i += 1
    }
    sites.toSeq
  }

  private def bq(name: String): String = "`" + name.replace("`", "``") + "`"

  /** Expand one site's modifiers against the probed column list, in Polars'
    * order: except → replace → rename (sqls.rs:192-217). */
  def expandProjection(columns: Seq[String], m: StarModifiers): String = {
    val exceptSet = m.except.toSet
    val replMap = m.replace.toMap
    val renMap = m.rename.toMap
    // ILIKE pattern → case-insensitive regex over the column NAME
    // (% → .*, _ → ., everything else literal)
    val ilikeRe = m.ilike.map { pat =>
      val sb = new StringBuilder("(?i)")
      pat.foreach {
        case '%' => sb.append(".*")
        case '_' => sb.append('.')
        case c   => sb.append(java.util.regex.Pattern.quote(c.toString))
      }
      sb.toString.r
    }
    val selected = ilikeRe.fold(columns)(re =>
      columns.filter(c => re.pattern.matcher(c).matches()))
    require(m.ilike.isEmpty || selected.nonEmpty,
      s"`* ILIKE '${m.ilike.get}'` matches no columns of ${columns.mkString("(", ", ", ")")}")
    selected.filterNot(exceptSet).map { c =>
      (replMap.get(c), renMap.get(c)) match {
        case (Some(e), Some(nn)) => s"$e AS ${bq(nn)}"
        case (Some(e), None)     => s"$e AS ${bq(c)}"
        case (None, Some(nn))    => s"${bq(c)} AS ${bq(nn)}"
        case (None, None)        => bq(c)
      }
    }.mkString(", ")
  }

  /** Expand every star-modifier site in `sql`. `probeSchema` receives a
    * Spark-parseable query (the site's enclosing SELECT with a bare `*`)
    * and must return its output columns — analysis only, no execution.
    *
    * CTE-aware: sites inside `WITH name AS ( … )` bodies are probed with
    * the preceding (already-expanded) CTEs prefixed.
    */
  def expandStarModifiers(sql: String, probeSchema: String => Seq[String]): String = {
    val toks = lex(sql)
    val sites = findStarSites(toks)
    if (sites.isEmpty) return sql

    // Replace sites bottom-up so indices stay valid.
    var current = toks
    sites.sortBy(-_.starIdx).foreach { site =>
      val probe = schemaProbe(current, site.starIdx)
      val cols = probeSchema(probe)
      val projection = expandProjection(cols, site.mods)
      current = current.patch(site.starIdx, lex(projection), site.endIdx - site.starIdx)
    }
    render(current)
  }

  /** Probe text resolving the FROM-scope columns visible at token
    * `siteIdx`: `SELECT *` over the site's OWN select block FROM its
    * top-level FROM onward — probing the whole select would leak
    * sibling select items' aliases into the expansion
    * (`SELECT * EXCEPT(d), f(d) AS ts FROM t` must expand to t's
    * columns minus d, never include ts). CTEs stay in scope via the
    * WITH prefix; any star sites inside the probe are bared. Shared by
    * the star-modifier and COLUMNS() expansions. */
  private def schemaProbe(current: Vector[Tok], siteIdx: Int): String = {
    val (from, to) = enclosingBlock(current, siteIdx).getOrElse((0, current.length))
    schemaProbeInBlock(current, from, to, siteIdx)
  }

  /** [[schemaProbe]] with an explicitly chosen scope — the COLUMNS()
    * expansion resolves sites nested inside call parens, where the
    * innermost paren group is NOT the select block. `scanFrom` must be
    * a block-depth-0 position (the star site itself, or the COLUMNS
    * item's SELECT keyword); the probe takes the first depth-0 FROM
    * after it, so a set-op sibling's FROM is never picked up. */
  private def schemaProbeInBlock(current: Vector[Tok], blockStart: Int,
      blockEnd: Int, scanFrom: Int): String = {
    val blockToks = current.slice(blockStart, blockEnd)
    val offset = blockStart
    val probeBody = {
      var depth = 0
      var fromIdx = -1
      var k = scanFrom - offset
      while (k < blockToks.length && fromIdx < 0) {
        blockToks(k) match {
          case Punct("(") => depth += 1
          case Punct(")") => depth -= 1
          case w: Word if depth == 0 && w.text.equalsIgnoreCase("from") =>
            fromIdx = k
          case _ =>
        }
        k += 1
      }
      if (fromIdx < 0) render(blockToks) // FROM-less select: probe as-is
      else {
        // truncate clauses that may reference the REPLACED select list
        // (ORDER BY on a sibling alias, GROUP BY vs a bare star) or
        // splice in other branches (set ops) — none affect the FROM
        // relation's schema
        val stop = Set("group", "having", "order", "window", "limit",
          "offset", "union", "intersect", "except")
        var depth = 0
        var endIdx = blockToks.length
        var m = fromIdx
        while (m < blockToks.length && endIdx == blockToks.length) {
          blockToks(m) match {
            case Punct("(") => depth += 1
            case Punct(")") => depth -= 1
            case w: Word if depth == 0 && m > fromIdx &&
              stop.contains(w.text.toLowerCase) => endIdx = m
            case _ =>
          }
          m += 1
        }
        "SELECT * " + render(blockToks.slice(fromIdx, endIdx))
      }
    }
    render(bareStars(lex(withPrefix(current) + probeBody)))
  }

  // ---- COLUMNS() projection expansion -----------------------------------

  /** Polars SQL's `COLUMNS(...)` projection function: expands to the
    * FROM-scope columns its argument selects —
    *   - `COLUMNS('^re$')` — a string literal both starting with `^`
    *     and ending with `$` selects by regex (polars' `col("^…$")`
    *     convention);
    *   - `COLUMNS('name')` — any other string literal is a LITERAL
    *     column name, which must exist;
    *   - `COLUMNS(*)` — every column.
    * A select item that IS a bare `COLUMNS(...)` call expands to the
    * matching columns in schema order. When the call is nested in a
    * larger expression (`SUM(COLUMNS('^x'))`), the whole select item
    * is replicated once per matching column with the call replaced by
    * that column and the replica aliased to the column's name —
    * polars' expression-expansion naming, where a multi-column
    * expression keeps each root column's name. Zero matching columns
    * fail loudly (a typo'd regex must not masquerade as an empty
    * projection), as does an explicit `AS` alias on a multi-column
    * expansion (polars rejects the duplicate output name). One
    * COLUMNS call per select item. */
  def expandColumnsFn(sql: String, probeSchema: String => Seq[String]): String = {
    val toks = lex(sql)
    // sites: Word("columns") heading a paren group whose content is one
    // string literal (Right(pattern)) or a bare star (Left(()))
    final case class Site(head: Int, close: Int, arg: Either[Unit, String])
    val sites = toks.indices.flatMap { i =>
      toks(i) match {
        case w: Word if w.text.equalsIgnoreCase("columns") =>
          val open = nextNonWs(toks, i + 1)
          val close =
            if (open < toks.length && toks(open) == Punct("(")) matchParen(toks, open)
            else -1
          val inner =
            if (close >= 0) toks.slice(open + 1, close).filterNot(_.isInstanceOf[Ws])
            else Vector.empty[Tok]
          inner match {
            case Vector(s: SStr) =>
              Some(Site(i, close,
                Right(s.text.substring(1, s.text.length - 1).replace("''", "'"))))
            case Vector(Punct("*")) => Some(Site(i, close, Left(())))
            case _                  => None
          }
        case _ => None
      }
    }
    if (sites.isEmpty) return sql

    var current = toks
    // bottom-up: items are disjoint, so earlier sites' indices survive
    sites.sortBy(-_.head).foreach { site =>
      // the select item containing the site: find the nearest enclosing
      // scope (innermost paren span outward, then the whole query) whose
      // depth-0 stream has a SELECT before the site, then cut at that
      // scope's depth-0 commas / clause keywords
      val spans: Seq[(Int, Int)] = {
        val ps = ArrayBuffer.empty[(Int, Int)]
        var i = 0
        while (i < site.head) {
          if (current(i) == Punct("(")) {
            val c = matchParen(current, i)
            if (c > site.head) ps += ((i + 1, c))
          }
          i += 1
        }
        ps.sortBy(-_._1).toSeq :+ ((0, current.length))
      }
      val (bStart, bEnd, selIdx) = spans.iterator.map { case (s, e) =>
        var depth = 0
        var sel = -1
        var i = s
        while (i < site.head) {
          current(i) match {
            case Punct("(") => depth += 1
            case Punct(")") => depth -= 1
            case w: Word if depth == 0 && w.text.equalsIgnoreCase("select") => sel = i
            case _ =>
          }
          i += 1
        }
        (s, e, sel)
      }.find(_._3 >= 0).getOrElse(
        throw new IllegalArgumentException("COLUMNS() outside a SELECT list"))

      val cols = probeSchema(schemaProbeInBlock(current, bStart, bEnd, selIdx))
      val matched: Seq[String] = site.arg match {
        case Left(_) => cols
        case Right(p) if p.startsWith("^") && p.endsWith("$") =>
          val re = p.r
          cols.filter(c => re.findFirstIn(c).isDefined)
        case Right(name) => cols.filter(_ == name)
      }
      require(matched.nonEmpty,
        s"COLUMNS(${site.arg.fold(_ => "*", p => s"'$p'")}) matched no columns " +
          s"of [${cols.mkString(", ")}]")

      val clauseStop = Set("from", "where", "group", "having", "order",
        "window", "limit", "offset", "union", "intersect", "except")
      var itemStart = {
        var last = selIdx + 1
        var depth = 0
        var i = selIdx + 1
        while (i < site.head) {
          current(i) match {
            case Punct("(")               => depth += 1
            case Punct(")")               => depth -= 1
            case Punct(",") if depth == 0 => last = i + 1
            case _                        =>
          }
          i += 1
        }
        last
      }
      val afterSel = nextNonWs(current, itemStart)
      if (afterSel < site.head && isWord(current(afterSel), "distinct"))
        itemStart = afterSel + 1
      val itemEnd = {
        // the site may sit inside wrapping call parens: start the scan
        // at its depth relative to the select list, so the separators
        // (depth-0 commas / clause keywords) are found at depth 0
        var depth = {
          var d = 0
          var i = selIdx
          while (i < site.head) {
            current(i) match {
              case Punct("(") => d += 1
              case Punct(")") => d -= 1
              case _          =>
            }
            i += 1
          }
          d
        }
        var end = bEnd
        var i = site.close + 1
        while (i < bEnd && end == bEnd) {
          current(i) match {
            case Punct("(") => depth += 1
            case Punct(")") => depth -= 1
            case Punct(",") if depth == 0 => end = i
            case w: Word if depth == 0 && clauseStop.contains(w.text.toLowerCase) =>
              end = i
            case _ =>
          }
          i += 1
        }
        end
      }

      val itemToks = current.slice(itemStart, itemEnd)
      val relHead = site.head - itemStart
      val relClose = site.close - itemStart
      val nonWs = itemToks.indices.filterNot(itemToks(_).isInstanceOf[Ws])
      val bare = nonWs.head == relHead && nonWs.last == relClose
      val quoted = matched.map(c => s"`${c.replace("`", "``")}`")
      val replacement: String =
        if (bare) quoted.mkString(", ")
        else {
          val hasAlias = nonWs.length >= 2 &&
            isWord(itemToks(nonWs(nonWs.length - 2)), "as")
          require(!hasAlias || matched.lengthCompare(1) == 0,
            s"explicit AS alias on a COLUMNS expansion matching " +
              s"${matched.length} columns — every replica would share one name")
          matched.zip(quoted).map { case (c, q) =>
            val body = render(itemToks.patch(relHead, lex(q), relClose + 1 - relHead))
            if (hasAlias) body else s"$body AS `${c.replace("`", "``")}`"
          }.mkString(", ")
        }
      current = current.patch(itemStart, lex(replacement), itemEnd - itemStart)
    }
    render(current)
  }

  /** All star-modifier sites reduced to bare `*` (for probe queries). */
  private def bareStars(toks: Vector[Tok]): Vector[Tok] = {
    val sites = findStarSites(toks)
    sites.sortBy(-_.starIdx).foldLeft(toks) { (t, s) =>
      t.patch(s.starIdx, Vector(Punct("*")), s.endIdx - s.starIdx)
    }
  }

  /** The token span of the parenthesized block enclosing `idx`, if any
    * (content WITHOUT the outer parens); None → top level. */
  private def enclosingBlock(toks: Vector[Tok], idx: Int): Option[(Int, Int)] = {
    // scan for the innermost '(' whose matching ')' is beyond idx
    var best: Option[(Int, Int)] = None
    var i = 0
    while (i < idx) {
      if (toks(i) == Punct("(")) {
        val close = matchParen(toks, i)
        if (close > idx) best = Some((i + 1, close))
      }
      i += 1
    }
    best
  }

  /** Render the query's WITH clause (all CTE definitions) if present, with
    * star sites reduced to bare form, for probe prefixing. */
  private def withPrefix(toks: Vector[Tok]): String = {
    val i = nextNonWs(toks, 0)
    if (i >= toks.length || !isWord(toks(i), "with")) return ""
    // find end of the CTE list: the top-level SELECT after the last CTE
    var j = i + 1
    var depth = 0
    var end = -1
    while (j < toks.length && end < 0) {
      toks(j) match {
        case Punct("(") => depth += 1
        case Punct(")") => depth -= 1
        case w: Word if depth == 0 && w.text.equalsIgnoreCase("select") => end = j
        case _ =>
      }
      j += 1
    }
    if (end < 0) "" else render(bareStars(toks.slice(0, end))) + " "
  }

  // ---- HAVING alias substitution ----------------------------------------

  /** Substitute select-list aliases referenced in HAVING with their
    * defining expressions (Q15). Applied as a fallback when direct
    * analysis fails. */
  def rewriteHavingAliases(sql: String): String = {
    val toks = lex(sql)
    // collect top-level select-list aliases: expr AS alias — the SELECT
    // must be at paren depth 0 (skip CTE bodies / subqueries)
    val selIdx = {
      var depth = 0
      var found = -1
      var k = 0
      while (k < toks.length && found < 0) {
        toks(k) match {
          case Punct("(") => depth += 1
          case Punct(")") => depth -= 1
          case w: Word if depth == 0 && w.text.equalsIgnoreCase("select") => found = k
          case _ =>
        }
        k += 1
      }
      if (found < 0) return sql
      found
    }
    var depth = 0
    var fromIdx = -1
    var k = selIdx + 1
    while (k < toks.length && fromIdx < 0) {
      toks(k) match {
        case Punct("(") => depth += 1
        case Punct(")") => depth -= 1
        case w: Word if depth == 0 && w.text.equalsIgnoreCase("from") => fromIdx = k
        case _ =>
      }
      k += 1
    }
    if (fromIdx < 0) return sql
    val items = splitTopLevel(toks.slice(selIdx + 1, fromIdx).toIndexedSeq)
    val aliases: Map[String, String] = items.flatMap(splitAs)
      .map { case (e, a) => a.toLowerCase -> e }.toMap
    if (aliases.isEmpty) return sql
    // find HAVING clause at depth 0
    var havIdx = -1
    depth = 0
    toks.indices.foreach { j =>
      toks(j) match {
        case Punct("(") => depth += 1
        case Punct(")") => depth -= 1
        case w: Word if depth == 0 && w.text.equalsIgnoreCase("having") && havIdx < 0 => havIdx = j
        case _ =>
      }
    }
    if (havIdx < 0) return sql
    // having clause ends at next top-level ORDER/LIMIT/UNION or EOF
    var endIdx = toks.length
    depth = 0
    (havIdx + 1 until toks.length).foreach { j =>
      toks(j) match {
        case Punct("(") => depth += 1
        case Punct(")") => depth -= 1
        case w: Word if depth == 0 && endIdx == toks.length &&
          Seq("order", "limit", "union", "intersect", "window").exists(w.text.equalsIgnoreCase) =>
          endIdx = j
        case _ =>
      }
    }
    val rewritten = toks.zipWithIndex.map { case (t, j) =>
      if (j > havIdx && j < endIdx) t match {
        case w: Word if aliases.contains(w.text.toLowerCase) =>
          Word("(" + aliases(w.text.toLowerCase) + ")")
        case b: BQuot if aliases.contains(b.name.toLowerCase) =>
          Word("(" + aliases(b.name.toLowerCase) + ")")
        case o => o
      } else t
    }
    render(rewritten)
  }

  // ---- UNION BY NAME ----------------------------------------------------

  /** Rewrite Polars' `A UNION [ALL] BY NAME B` — which Spark SQL does
    * not parse — into a column-aligned plain UNION: every branch is
    * wrapped in a SELECT projecting the union of all branches' columns
    * in first-seen order, with `NULL AS c` filling columns a branch
    * lacks (DuckDB/Polars diagonal-concat semantics; a branch's own
    * order never matters again). `probeSchema` resolves each branch's
    * columns analysis-only, with the query's WITH prefix attached so
    * CTE references stay in scope.
    *
    * Scope: the TOP-LEVEL set-op chain (parenthesized subqueries keep
    * their content intact — a nested BY NAME inside a subquery is
    * rewritten when that text passes through the front end on its
    * own). A chain mixing BY NAME with positional set ops
    * (INTERSECT / EXCEPT / plain UNION) is rejected loudly: silently
    * aligning the positional branches by name would change their
    * meaning. A trailing top-level ORDER BY / LIMIT / OFFSET applies
    * to the whole union and stays outside the wrapping. */
  def expandUnionByName(sql: String, probeSchema: String => Seq[String]): String = {
    val toks = lex(sql)
    // body starts after the WITH prefix (at the first depth-0 SELECT)
    val prefix = withPrefix(toks)
    var bodyStart = 0
    if (prefix.nonEmpty) {
      var depth = 0
      var k = 0
      var found = -1
      while (k < toks.length && found < 0) {
        toks(k) match {
          case Punct("(") => depth += 1
          case Punct(")") => depth -= 1
          case w: Word if depth == 0 && w.text.equalsIgnoreCase("select") => found = k
          case _ =>
        }
        k += 1
      }
      if (found < 0) return sql
      bodyStart = found
    }
    // top-level set-op boundaries: (index of op start, index after op,
    // byName, unionAll)
    final case class Op(start: Int, end: Int, byName: Boolean, all: Boolean, kind: String)
    val ops = ArrayBuffer.empty[Op]
    var depth = 0
    var k = bodyStart
    while (k < toks.length) {
      toks(k) match {
        case Punct("(") => depth += 1
        case Punct(")") => depth -= 1
        case w: Word if depth == 0 &&
            Seq("union", "intersect", "except").exists(w.text.equalsIgnoreCase) =>
          val kind = w.text.toLowerCase
          var e = k + 1
          var all = false
          var byName = false
          val afterKw = nextNonWs(toks, e)
          var cursor = afterKw
          if (cursor < toks.length && (isWord(toks(cursor), "all") ||
              isWord(toks(cursor), "distinct"))) {
            all = isWord(toks(cursor), "all")
            cursor = nextNonWs(toks, cursor + 1)
          }
          if (kind == "union" && cursor < toks.length && isWord(toks(cursor), "by")) {
            val nameIdx = nextNonWs(toks, cursor + 1)
            if (nameIdx < toks.length && isWord(toks(nameIdx), "name")) {
              byName = true
              cursor = nameIdx + 1
            }
          }
          e = if (byName) cursor else {
            // end of the op tokens actually consumed (kw [+ALL/DISTINCT])
            var c = k + 1
            val a = nextNonWs(toks, c)
            if (a < toks.length && (isWord(toks(a), "all") || isWord(toks(a), "distinct")))
              c = a + 1
            c
          }
          ops += Op(k, e, byName, all, kind)
          k = e - 1
        case _ =>
      }
      k += 1
    }
    if (!ops.exists(_.byName)) return sql
    require(ops.forall(o => o.byName),
      "a set-operator chain mixing UNION BY NAME with positional set ops " +
        "(UNION/INTERSECT/EXCEPT) is unsupported — positional branches cannot " +
        "be silently re-aligned by name; parenthesize the BY NAME pair")
    // split off a trailing top-level ORDER BY / LIMIT / OFFSET from the
    // last branch — it applies to the WHOLE union
    var tailStart = toks.length
    depth = 0
    var m = ops.last.end
    while (m < toks.length) {
      toks(m) match {
        case Punct("(") => depth += 1
        case Punct(")") => depth -= 1
        case w: Word if depth == 0 && tailStart == toks.length &&
          Seq("order", "limit", "offset").exists(w.text.equalsIgnoreCase) => tailStart = m
        case _ =>
      }
      m += 1
    }
    val blockRanges =
      (Seq(bodyStart) ++ ops.map(_.end)).zip(ops.map(_.start) :+ tailStart)
    val blocks = blockRanges.map { case (s, e) => render(toks.slice(s, e)).trim }
    val branchCols = blocks.map(b => probeSchema(prefix + b))
    val target = branchCols.foldLeft(Vector.empty[String]) { (acc, cols) =>
      acc ++ cols.filterNot(acc.contains)
    }
    val wrapped = blocks.zip(branchCols).zipWithIndex.map { case ((b, cols), bi) =>
      val proj = target.map(c =>
        if (cols.contains(c)) bq(c) else s"NULL AS ${bq(c)}").mkString(", ")
      s"SELECT $proj FROM ($b) AS __graft_ubn_$bi"
    }
    val glued = wrapped.zipWithIndex.map { case (w, bi) =>
      if (bi == 0) w
      else (if (ops(bi - 1).all) " UNION ALL " else " UNION ") + w
    }.mkString
    val tail = render(toks.slice(tailStart, toks.length))
    render(toks.slice(0, bodyStart)) + glued +
      (if (tail.nonEmpty && !tail.startsWith(" ")) " " + tail else tail)
  }
}
