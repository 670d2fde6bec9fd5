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

  /** Pass 1: double-quoted identifiers → backticks; STRFTIME → DATE_FORMAT
    * with a translated pattern. */
  def rewriteQuotesAndFunctions(sql: String): String =
    render(rewriteToks(lex(sql)))

  /** Recursive token rewrite. STRFTIME handling is argument-aware: only
    * the FORMAT argument (2nd) has its string literal pattern-translated —
    * a '%' inside any other argument's literal is data, not a pattern
    * (e.g. `STRFTIME(x,'%Y') || ' %done'`) — and value arguments are
    * rewritten recursively so a nested STRFTIME is also renamed instead of
    * surviving as an unresolvable function. */
  private def rewriteToks(toks: Vector[Tok]): Vector[Tok] = {
    val out = ArrayBuffer.empty[Tok]
    var i = 0
    while (i < toks.length) {
      toks(i) match {
        case d: DQuot =>
          out += BQuot("`" + d.name.replace("`", "``") + "`")
          i += 1
        case w: Word if w.text.equalsIgnoreCase("strftime") =>
          val open = nextNonWs(toks, i + 1)
          val close = if (open < toks.length && toks(open) == Punct("(")) matchParen(toks, open) else -1
          if (close >= 0) {
            out += Word("DATE_FORMAT")
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
        case t => out += t; i += 1
      }
    }
    out.toVector
  }

  // ---- star-modifier expansion ------------------------------------------

  final case class StarModifiers(
      except: Seq[String], replace: Seq[(String, String)], rename: Seq[(String, String)])

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
        var any = false
        var continue = true
        while (continue && j < toks.length) {
          val kw = toks(j) match {
            case w: Word if w.text.equalsIgnoreCase("except")  => "except"
            case w: Word if w.text.equalsIgnoreCase("exclude") => "except"
            case w: Word if w.text.equalsIgnoreCase("replace") => "replace"
            case w: Word if w.text.equalsIgnoreCase("rename")  => "rename"
            case _ => ""
          }
          if (kw.isEmpty) continue = false
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
        if (any) { sites += StarSite(i, j, StarModifiers(except, repl, ren)); i = j }
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
    columns.filterNot(exceptSet).map { c =>
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
      // probe text: whole query, with EVERY site reduced to a bare star —
      // then ask for the schema of this site's enclosing SELECT block.
      val allBare = bareStars(current)
      val block = enclosingBlock(current, site.starIdx)
      val probe = render(bareStars(lex(block match {
        case Some((from, to)) =>
          // include any WITH prefix (CTEs the block may reference)
          withPrefix(current) + render(current.slice(from, to))
        case None => render(current)
      })))
      val cols = probeSchema(probe)
      val projection = expandProjection(cols, site.mods)
      current = current.patch(site.starIdx, lex(projection), site.endIdx - site.starIdx)
      val _ = allBare // (kept for clarity; bareStars applied per-probe above)
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
}
