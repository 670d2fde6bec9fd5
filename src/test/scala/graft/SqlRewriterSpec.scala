package graft

import graft.sql.{GraftSql, SqlLexer, SqlRewriter}
import org.scalatest.funsuite.AnyFunSuite

class SqlRewriterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- pass 1: quotes + strftime ---------------------------------------

  test("double-quoted identifiers → backticks; string literals untouched") {
    val in = """SELECT "Ano do Período" FROM t WHERE "Mês" Like 'dez%' AND x = 'it''s'"""
    val out = SqlRewriter.rewriteQuotesAndFunctions(in)
    assert(out.contains("`Ano do Período`"))
    assert(out.contains("`Mês`"))
    assert(out.contains("'dez%'"))
    assert(out.contains("'it''s'"))
  }

  test("comments are stripped, not parsed") {
    val in = "SELECT a -- \"quoted\" in comment\n, b /* \"x\" */ FROM t"
    val out = SqlRewriter.rewriteQuotesAndFunctions(in)
    assert(!out.contains("comment"))
    assert(!out.contains("\"x\""))
  }

  test("strftime translation table") {
    assert(SqlRewriter.translateStrftime("%d/%m/%Y") == "dd/MM/yyyy")
    assert(SqlRewriter.translateStrftime("%Y-%m-%d %H:%M:%S") == "yyyy-MM-dd HH:mm:ss")
    assert(SqlRewriter.translateStrftime("%b %Y") == "MMM yyyy")
    assert(SqlRewriter.translateStrftime("%d%%") == "dd%")
    // literal letters get quoted for the JVM formatter
    assert(SqlRewriter.translateStrftime("%YT%H") == "yyyy'T'HH")
  }

  test("STRFTIME call rewritten to DATE_FORMAT with translated pattern") {
    val out = SqlRewriter.rewriteQuotesAndFunctions(
      "SELECT STRFTIME(d, '%d/%m/%Y') FROM t")
    assert(out.contains("DATE_FORMAT"))
    assert(out.contains("'dd/MM/yyyy'"))
  }

  test("STRFTIME: only the FORMAT argument is translated, not other % literals") {
    val out = SqlRewriter.rewriteQuotesAndFunctions(
      "SELECT STRFTIME(COALESCE(d, '% raw'), '%Y') || ' %done' FROM t")
    assert(out.contains("'yyyy'"))
    assert(out.contains("'% raw'"), out)     // 1st-arg literal untouched
    assert(out.contains("' %done'"), out)    // post-call literal untouched
  }

  test("STRFTIME nested inside an argument is also rewritten") {
    val out = SqlRewriter.rewriteQuotesAndFunctions(
      "SELECT STRFTIME(to_date(STRFTIME(d, '%Y-%m-%d'), 'yyyy-MM-dd'), '%b %Y') FROM t")
    assert(!out.toLowerCase.contains("strftime"), out)
    assert(out.contains("'yyyy-MM-dd'") && out.contains("'MMM yyyy'"), out)
  }

  // ---- star modifiers --------------------------------------------------

  test("expandProjection: except → replace → rename order") {
    val cols = Seq("a", "b", "c", "d")
    val m = SqlRewriter.StarModifiers(
      except = Seq("b"),
      replace = Seq("c" -> "UPPER(`c`)"),
      rename = Seq("d" -> "dd"))
    assert(SqlRewriter.expandProjection(cols, m) ==
      "`a`, UPPER(`c`) AS `c`, `d` AS `dd`")
  }

  test("replace + rename on the SAME column applies expr then new name") {
    val m = SqlRewriter.StarModifiers(Seq.empty, Seq("c" -> "f(`c`)"), Seq("c" -> "c2"))
    assert(SqlRewriter.expandProjection(Seq("c"), m) == "f(`c`) AS `c2`")
  }

  test("findStarSites parses all three modifier groups") {
    val toks = SqlLexer.lex(
      "SELECT * EXCEPT(a, b) REPLACE (f(x) AS c) RENAME (d AS e) FROM t")
    val sites = SqlRewriter.findStarSites(toks)
    assert(sites.length == 1)
    assert(sites.head.mods.except == Seq("a", "b"))
    assert(sites.head.mods.replace == Seq("c" -> "f(x)"))
    assert(sites.head.mods.rename == Seq("d" -> "e"))
  }

  test("bare star is not a site; qualified t.* untouched") {
    assert(SqlRewriter.findStarSites(SqlLexer.lex("SELECT *, t.* FROM t")).isEmpty)
  }

  // ---- end-to-end through spark.sql -----------------------------------

  def fixture() = {
    val df = Seq((2019, "abc-123456789-2019", 10.0, "PER1", "tA"),
      (2018, "abc-123456789-2018", 20.0, "PER2", "tB"))
      .toDF("Ano do Período", "Período Apuração", "Valor Total", "PER/DCOMP", "Tipo")
    df.createOrReplaceTempView("AllData")
    df
  }

  test("corpus shape: CTE + EXCEPT + REPLACE + RENAME + double quotes (testes-sqls.txt:64-104)") {
    fixture()
    val q =
      """WITH DadosComAno AS (
        |  SELECT *, CAST(SUBSTR("Período Apuração", 15, 4) AS INTEGER) AS Ano2
        |  FROM AllData
        |)
        |SELECT *
        |  EXCEPT ("Valor Total")
        |  REPLACE (SUBSTR("Período Apuração", 1, 3) AS "Período Apuração")
        |  RENAME ("PER/DCOMP" AS "Pedido (PER)")
        |FROM DadosComAno
        |WHERE Ano2 >= 2019
        |ORDER BY Ano2 ASC, "Tipo" DESC""".stripMargin
    val out = GraftSql.run(spark, q)
    assert(out.columns.toSeq ==
      Seq("Ano do Período", "Período Apuração", "Pedido (PER)", "Tipo", "Ano2"))
    val r = out.head()
    assert(r.getString(1) == "abc")        // REPLACE applied
    assert(r.getString(2) == "PER1")       // RENAME kept value
    assert(out.count() == 1)               // WHERE on CTE column
  }

  test("HAVING on select alias resolves via fallback rewrite") {
    Seq(("x", 10.0), ("x", 5.0), ("y", 1.0)).toDF("k", "v")
      .createOrReplaceTempView("hav")
    val out = GraftSql.run(spark,
      "SELECT k, SUM(v) AS total FROM hav GROUP BY k HAVING total > 10 ORDER BY k")
    assert(out.collect().map(_.getString(0)).toSeq == Seq("x"))
  }

  test("ILIKE and BETWEEN pass through") {
    fixture()
    val out = GraftSql.run(spark,
      """SELECT "Tipo" FROM AllData WHERE "Tipo" ILIKE '%ta%' AND "Ano do Período" BETWEEN 2019 AND 2020""")
    assert(out.count() == 1)
  }

  test("STRFTIME end-to-end formats a timestamp") {
    Seq(java.sql.Timestamp.valueOf("2024-03-07 00:00:00")).toDF("d")
      .createOrReplaceTempView("dts")
    val out = GraftSql.run(spark, "SELECT STRFTIME(d, '%d/%m/%Y') AS s FROM dts")
    assert(out.head().getString(0) == "07/03/2024")
  }

  test("star modifiers inside a nested subquery expand against the inner scope") {
    fixture()
    val out = GraftSql.run(spark,
      """SELECT "Tipo", "Valor Total" FROM (
        |  SELECT * EXCEPT ("PER/DCOMP") FROM AllData
        |) t WHERE "Valor Total" > 5""".stripMargin)
    assert(out.columns.toSeq == Seq("Tipo", "Valor Total"))
    assert(out.count() == 2)
  }

  test("EXCEPT( inside a string literal is not treated as a modifier") {
    fixture()
    val out = GraftSql.run(spark,
      "SELECT 'use * EXCEPT(x) wisely' AS tip, COUNT(*) AS n FROM AllData")
    assert(out.head().getString(0).contains("EXCEPT(x)"))
  }

  test("unknown column still raises a clear AnalysisException") {
    fixture()
    assertThrows[org.apache.spark.sql.AnalysisException] {
      GraftSql.run(spark, """SELECT "No Such Column" FROM AllData""").collect()
    }
  }

  test("unmatched paren does not hang the rewriter (falls through to Spark's parser)") {
    val broken = "SELECT STRFTIME(d, '%Y' FROM t"
    // must terminate; Spark's parser then reports the syntax error
    assertThrows[org.apache.spark.sql.catalyst.parser.ParseException] {
      GraftSql.run(spark, broken)
    }
  }

  test("HAVING alias works when the query starts with a CTE") {
    Seq(("x", 10.0), ("x", 5.0), ("y", 1.0)).toDF("k", "v")
      .createOrReplaceTempView("havc")
    val out = GraftSql.run(spark,
      """WITH base AS (SELECT k, v FROM havc)
        |SELECT k, SUM(v) AS total FROM base GROUP BY k HAVING total > 10 ORDER BY k""".stripMargin)
    assert(out.collect().map(_.getString(0)).toSeq == Seq("x"))
  }

  // ---- Polars dialect widening: renames, STRPTIME, quantiles -----------

  test("function renames apply only at call sites") {
    val out = SqlRewriter.rewriteQuotesAndFunctions(
      "SELECT STARTS_WITH(s, 'a'), ends_with(s, 'z'), STRPOS(s, 'q'), " +
        "ARRAY_LENGTH(arr), array_to_string(arr, ','), ARRAY_UNIQUE(arr), " +
        "ARRAY_UPPER(arr), ARRAY_LOWER(arr), ARRAY_REVERSE(arr), UNNEST(arr), " +
        "QUANTILE_CONT(v, 0.25), array_length FROM t")
    val low = out.toLowerCase
    assert(low.contains("startswith(") && low.contains("endswith(") &&
      low.contains("instr(") && low.contains("array_size(") &&
      low.contains("array_join(") && low.contains("array_distinct(") &&
      low.contains("array_max(") && low.contains("array_min(") &&
      low.contains("reverse(") && low.contains("explode(") &&
      low.contains("percentile("), out)
    // bare word (a column named array_length) is untouched
    assert(low.contains(" array_length from t"), out)
  }

  test("STRPTIME → TO_TIMESTAMP with translated %-pattern") {
    val out = SqlRewriter.rewriteQuotesAndFunctions(
      "SELECT STRPTIME(s, '%Y-%m-%d %H:%M:%S') FROM t")
    assert(out.contains("TO_TIMESTAMP"), out)
    assert(out.contains("'yyyy-MM-dd HH:mm:ss'"), out)
  }

  test("QUANTILE_DISC(x, q) → PERCENTILE_DISC(q) WITHIN GROUP (ORDER BY x)") {
    val out = SqlRewriter.rewriteQuotesAndFunctions(
      "SELECT QUANTILE_DISC(v, 0.9) FROM t GROUP BY k")
    assert(out.replaceAll("\\s+", " ")
      .contains("PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY v)"), out)
  }

  test("quantile rewrites execute end-to-end") {
    Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("b", 10.0))
      .toDF("k", "v").createOrReplaceTempView("qt")
    val rows = GraftSql.run(spark,
      """SELECT k, QUANTILE_CONT(v, 0.5) AS qc, QUANTILE_DISC(v, 0.5) AS qd,
        |MEDIAN(v) AS med FROM qt GROUP BY k ORDER BY k""".stripMargin).collect()
    assert(rows(0).getDouble(1) == 2.5) // interpolated
    assert(rows(0).getDouble(2) == 2.0) // discrete picks a data value
    assert(rows(0).getDouble(3) == 2.5)
    assert(rows(1).getDouble(1) == 10.0)
  }

  test("DATE_PART/EXTRACT field mapping") {
    def rw(s: String) =
      SqlRewriter.rewriteQuotesAndFunctions(s).replaceAll("\\s+", " ")
    assert(rw("SELECT DATE_PART('ordinal_day', d) FROM t")
      .contains("DATE_PART('DOY',d)"))
    assert(rw("SELECT DATE_PART('weekday', d) FROM t")
      .contains("DATE_PART('DAYOFWEEK_ISO',d)"))
    assert(rw("SELECT DATE_PART('epoch', ts) FROM t")
      .contains("CAST(CAST(ts AS TIMESTAMP) AS DOUBLE)"))
    assert(rw("SELECT EXTRACT(isodow FROM d) FROM t")
      .contains("EXTRACT(DAYOFWEEK_ISO FROM d)"))
    assert(rw("SELECT EXTRACT(epoch FROM ts) FROM t")
      .contains("CAST(CAST( ts AS TIMESTAMP) AS DOUBLE)"))
    // standard fields pass through untouched
    assert(rw("SELECT DATE_PART('year', d) FROM t")
      .contains("DATE_PART('year', d)"))
    assert(rw("SELECT EXTRACT(YEAR FROM d) FROM t")
      .contains("EXTRACT(YEAR FROM d)"))
  }

  test("date-part mapping executes end-to-end") {
    spark.sql("SELECT TIMESTAMP '2021-03-08 06:30:00' AS ts")
      .createOrReplaceTempView("dp") // 2021-03-08 is a Monday
    val r = GraftSql.run(spark,
      """SELECT DATE_PART('weekday', ts) AS wd,
        |DATE_PART('ordinal_day', ts) AS doy,
        |DATE_PART('epoch', ts) AS ep FROM dp""".stripMargin).head()
    assert(r.getInt(0) == 1) // ISO Monday = 1
    assert(r.getInt(1) == 67)
    assert(r.getDouble(2) == 1615185000.0)
  }

  test("read_* table functions register views through the Readers") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tf").toFile.getAbsolutePath
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    graft.sources.Writers.writeCsv(df, s"$dir/t.csv", delimiter = '|')
    graft.sources.Writers.writeParquet(df, s"$dir/t.parquet")
    val out = GraftSql.run(spark,
      s"""SELECT a.id, b.s FROM read_csv('$dir/t.csv') a
         |JOIN read_parquet('$dir/t.parquet') b ON a.id = b.id
         |ORDER BY a.id""".stripMargin).collect()
    assert(out.map(_.getString(1)).toSeq == Seq("x", "y"))
    // non-literal argument passes through → Spark's own error, not ours
    assertThrows[org.apache.spark.sql.AnalysisException] {
      GraftSql.run(spark, "SELECT * FROM read_parquet(p)").collect()
    }
  }

  // ---- Polars dialect widening: regex operators ------------------------

  test("regex match operators rewrite to RLIKE forms") {
    def rw(s: String) =
      SqlRewriter.rewriteQuotesAndFunctions(s).replaceAll("\\s+", " ")
    assert(rw("SELECT a ~ 'x' FROM t") == "SELECT a RLIKE 'x' FROM t")
    assert(rw("SELECT a !~ 'x' FROM t") == "SELECT a NOT RLIKE 'x' FROM t")
    assert(rw("SELECT a ~* 'x' FROM t") == "SELECT a RLIKE '(?i)x' FROM t")
    assert(rw("SELECT a !~* 'x' FROM t") == "SELECT a NOT RLIKE '(?i)x' FROM t")
    // non-literal pattern under ~* gets a CONCAT-ed prefix
    assert(rw("SELECT a ~* p FROM t").contains("RLIKE CONCAT('(?i)',p)"))
    // no-space form still gets a separator
    assert(rw("SELECT a~'x' FROM t") == "SELECT a RLIKE 'x' FROM t")
  }

  test("prefix ~ (bitwise NOT) is left alone; != survives") {
    def rw(s: String) = SqlRewriter.rewriteQuotesAndFunctions(s)
    assert(rw("SELECT ~5 FROM t") == "SELECT ~5 FROM t")
    assert(rw("SELECT a != b FROM t") == "SELECT a != b FROM t")
    // after AND (keyword), ~ is prefix again
    assert(rw("SELECT x FROM t WHERE b AND ~a = 0")
      == "SELECT x FROM t WHERE b AND ~a = 0")
  }

  test("regex operators execute end-to-end") {
    Seq("Alpha", "beta", "gamma").toDF("s").createOrReplaceTempView("rx")
    val n = GraftSql.run(spark,
      "SELECT COUNT(*) AS n FROM rx WHERE s ~* '^AL'").head().getLong(0)
    assert(n == 1)
    val m = GraftSql.run(spark,
      "SELECT COUNT(*) AS n FROM rx WHERE s !~ 'ta$'").head().getLong(0)
    assert(m == 2) // 'beta' ends in ta; Alpha and gamma survive
  }

  test("HAVING on a quantile alias survives the fallback substitution") {
    Seq(("a", 1.0), ("a", 9.0), ("b", 2.0), ("b", 3.0))
      .toDF("k", "v").createOrReplaceTempView("havq")
    val out = GraftSql.run(spark,
      """SELECT k, QUANTILE_DISC(v, 0.5) AS med FROM havq
        |GROUP BY k HAVING med > 1.5 ORDER BY k""".stripMargin).collect()
    // medians: a → 1.0 (discrete lower middle), b → 2.0; only b survives
    assert(out.map(_.getString(0)).toSeq == Seq("b"))
  }

  test("star modifiers expand over a table-function source") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tf_star")
      .toFile.getAbsolutePath
    Seq((1L, "x", 5.0), (2L, "y", 6.0)).toDF("id", "s", "v")
      .write.parquet(s"$dir/t.parquet")
    val out = GraftSql.run(spark,
      s"SELECT * EXCEPT(v) FROM read_parquet('$dir/t.parquet') ORDER BY id")
    assert(out.columns.toSeq == Seq("id", "s"))
    assert(out.count() == 2)
  }

  test("all dialect passes compose in one query") {
    // CTE + star modifiers + regex op + // + STRPTIME + QUANTILE_CONT
    // in a single statement: the pass ORDER (table fns → floordiv →
    // token rewrites → star expansion → HAVING fallback) must not
    // interfere
    Seq((1L, "alpha", 10.0, "2021-01-05"), (2L, "beta", 20.0, "2021-01-06"),
      (3L, "alpha", 30.0, "2021-01-07"), (4L, "gamma", 40.0, "2021-01-08"))
      .toDF("id", "grp", "v", "d").createOrReplaceTempView("combo")
    val out = GraftSql.run(spark,
      """WITH base AS (
        |  SELECT * EXCEPT(d), STRPTIME(d, '%Y-%m-%d') AS ts
        |  FROM combo WHERE grp ~* '^(AL|GA)' AND id // 2 <= 1
        |)
        |SELECT grp, QUANTILE_CONT(v, 0.5) AS med, COUNT(*) AS n
        |FROM base GROUP BY grp HAVING n >= 1 ORDER BY grp""".stripMargin)
      .collect()
    // rows surviving the filter: ids 1,3 (alpha; 1//2=0, 3//2=1) — id 4
    // (gamma) fails // <= 1; beta fails the regex
    assert(out.map(_.getString(0)).toSeq == Seq("alpha"))
    assert(out.head.getDouble(1) == 20.0) // median of 10, 30
    assert(out.head.getLong(2) == 2L)
  }

  // ---- COLUMNS() projection expansion ----------------------------------

  test("COLUMNS('^re$') expands to matching columns; COLUMNS(*) to all") {
    Seq((1L, 2.0, 3.0, "x")).toDF("id", "v_a", "v_b", "tag")
      .createOrReplaceTempView("colfn")
    val out = GraftSql.run(spark, "SELECT COLUMNS('^v_.*$') FROM colfn")
    assert(out.columns.toSeq == Seq("v_a", "v_b"))
    val all = GraftSql.run(spark, "SELECT COLUMNS(*) FROM colfn")
    assert(all.columns.toSeq == Seq("id", "v_a", "v_b", "tag"))
    // non-anchored string is a literal column name
    val lit = GraftSql.run(spark, "SELECT COLUMNS('tag') FROM colfn")
    assert(lit.columns.toSeq == Seq("tag"))
    // alongside other select items
    val mixed = GraftSql.run(spark,
      "SELECT id, COLUMNS('^v_.*$'), tag FROM colfn")
    assert(mixed.columns.toSeq == Seq("id", "v_a", "v_b", "tag"))
  }

  test("COLUMNS nested in an expression replicates the item per column") {
    Seq((1L, 2.0, 30.0), (2L, 4.0, 10.0)).toDF("id", "v_a", "v_b")
      .createOrReplaceTempView("colfn2")
    val out = GraftSql.run(spark,
      "SELECT SUM(COLUMNS('^v_.*$')) FROM colfn2")
    assert(out.columns.toSeq == Seq("v_a", "v_b"))
    val r = out.collect().head
    assert(r.getDouble(0) == 6.0 && r.getDouble(1) == 40.0)
    // deeper nesting with extra call args
    val r2 = GraftSql.run(spark,
      "SELECT ROUND(COLUMNS('^v_.*$') / 3, 2) FROM colfn2 WHERE id = 1")
      .collect().head
    assert(r2.getDouble(0) == 0.67 && r2.getDouble(1) == 10.0)
  }

  test("COLUMNS edge cases: zero matches fail loudly; CTE scope; multi-alias rejected") {
    Seq((1L, 2.0)).toDF("id", "v").createOrReplaceTempView("colfn3")
    val e = intercept[IllegalArgumentException] {
      GraftSql.run(spark, "SELECT COLUMNS('^nope_.*$') FROM colfn3")
    }
    assert(e.getMessage.contains("matched no columns"))
    assertThrows[IllegalArgumentException] {
      GraftSql.run(spark, "SELECT SUM(COLUMNS('^.*$')) AS t FROM colfn3")
    }
    // expansion resolves against the CTE's schema, not an outer table
    val out = GraftSql.run(spark,
      """WITH c AS (SELECT id AS k_id, v AS k_v FROM colfn3)
        |SELECT COLUMNS('^k_.*$') FROM c""".stripMargin)
    assert(out.columns.toSeq == Seq("k_id", "k_v"))
  }

  test("GROUP BY ALL and ORDER BY ALL pass through to Spark's native support") {
    Seq(("a", 1L), ("b", 2L), ("a", 3L)).toDF("g", "n")
      .createOrReplaceTempView("gball")
    val out = GraftSql.run(spark,
      "SELECT g, SUM(n) AS s FROM gball GROUP BY ALL ORDER BY ALL")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("a", 4L), ("b", 2L)))
    // composed with the dialect passes that rewrite nearby tokens
    val out2 = GraftSql.run(spark,
      """SELECT g, SUM(n) // 2 AS h FROM gball
        |WHERE g ~ '^[ab]$' GROUP BY ALL ORDER BY ALL""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out2.toSeq == Seq(("a", 2L), ("b", 1L)))
    // and with COLUMNS in the select list
    val out3 = GraftSql.run(spark,
      "SELECT COLUMNS('g'), SUM(n) AS s FROM gball GROUP BY ALL ORDER BY ALL")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out3.toSeq == Seq(("a", 4L), ("b", 2L)))
  }

  // ---- Polars dialect widening: // floor division ----------------------

  test("// floor division: precedence and associativity") {
    def rw(s: String) =
      SqlRewriter.rewriteQuotesAndFunctions(s).replaceAll("\\s+", "")
    assert(rw("SELECT a // b FROM t") == "SELECTGRAFT_FLOORDIV((a),(b))FROMt")
    // left operand is the whole multiplicative chain
    assert(rw("SELECT a * b // c FROM t") == "SELECTGRAFT_FLOORDIV((a*b),(c))FROMt")
    // right operand is one term only (left associativity)
    assert(rw("SELECT a // b * c FROM t") == "SELECTGRAFT_FLOORDIV((a),(b))*cFROMt")
    // chains left-associate
    assert(rw("SELECT a // b // c FROM t")
      == "SELECTGRAFT_FLOORDIV((GRAFT_FLOORDIV((a),(b))),(c))FROMt")
    // additive boundary stops the left scan
    assert(rw("SELECT x + a // b FROM t") == "SELECTx+GRAFT_FLOORDIV((a),(b))FROMt")
    // unary minus folds into the floored operand: (-a)//b, not -(a//b)
    assert(rw("SELECT -a // b FROM t") == "SELECTGRAFT_FLOORDIV((-a),(b))FROMt")
    // function-call operands survive intact
    assert(rw("SELECT CAST(x AS INT) // 3 FROM t")
      == "SELECTGRAFT_FLOORDIV((CAST(xASINT)),(3))FROMt")
    // scientific-notation literals are one operand, not a binary minus
    assert(rw("SELECT x // 1e-3 FROM t") == "SELECTGRAFT_FLOORDIV((x),(1e-3))FROMt")
    assert(rw("SELECT 2.5e-2 // y FROM t") == "SELECTGRAFT_FLOORDIV((2.5e-2),(y))FROMt")
  }

  test("CASE … END is an operand for // and the regex operators") {
    def rw(s: String) =
      SqlRewriter.rewriteQuotesAndFunctions(s).replaceAll("\\s+", "")
    // END terminates the left operand: the whole CASE floors, and ~ after
    // END is the infix regex match, not bitwise NOT
    assert(rw("SELECT CASE WHEN p THEN a ELSE b END // 2 FROM t")
      == "SELECTGRAFT_FLOORDIV((CASEWHENpTHENaELSEbEND),(2))FROMt")
    assert(rw("SELECT CASE WHEN p THEN a ELSE b END ~ 'x' FROM t")
      == "SELECTCASEWHENpTHENaELSEbENDRLIKE'x'FROMt")
    // CASE as the RIGHT operand spans to its matching END
    assert(rw("SELECT 9 // CASE WHEN p THEN a ELSE b END FROM t")
      == "SELECTGRAFT_FLOORDIV((9),(CASEWHENpTHENaELSEbEND))FROMt")
    // nested CASEs depth-match
    assert(rw("SELECT CASE WHEN p THEN CASE WHEN q THEN a END ELSE b END // 2 FROM t")
      == "SELECTGRAFT_FLOORDIV((CASEWHENpTHENCASEWHENqTHENaENDELSEbEND),(2))FROMt")
    // and it executes end-to-end
    Seq((1L, "ax"), (8L, "by")).toDF("n", "s").createOrReplaceTempView("fd_case")
    val got = GraftSql.run(spark,
      """SELECT CASE WHEN n < 5 THEN n + 10 ELSE n END // 3 AS q,
        |       CASE WHEN n < 5 THEN s ELSE 'zz' END ~ '^a' AS m
        |FROM fd_case ORDER BY n""".stripMargin).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(3L, 2L)) // 11//3, 8//3
    assert(got.map(_.getBoolean(1)).toSeq == Seq(true, false))
  }

  test("// floor division executes with Polars semantics") {
    Seq((7L, 2L), (-7L, 2L), (9L, 3L)).toDF("a", "b")
      .createOrReplaceTempView("fd")
    val rows = GraftSql.run(spark,
      "SELECT a // b AS q FROM fd ORDER BY a").collect().map(_.getLong(0))
    assert(rows.toSeq == Seq(-4L, 3L, 3L)) // floor, not truncate: -7//2 = -4

    // exact over the FULL int64 range — the FLOOR(l/r) double form lost
    // ulps past 2^53; the native GRAFT_FLOORDIV must not
    val big = Seq(
      (Long.MaxValue, 3L), (Long.MaxValue - 1L, 7L),
      ((1L << 53) + 1L, 2L), (-(1L << 53) - 1L, 2L),
      (Long.MinValue + 1L, 3L), (Long.MinValue, 2L),
      (8_000_000_000_000_000_003L, -7L), (-8_000_000_000_000_000_003L, 7L))
    big.toDF("a", "b").createOrReplaceTempView("fd_big")
    val gotBig = GraftSql.run(spark,
      "SELECT a, b, a // b AS q FROM fd_big ORDER BY a").collect()
    gotBig.foreach { r =>
      assert(r.getLong(2) == Math.floorDiv(r.getLong(0), r.getLong(1)),
        s"${r.getLong(0)} // ${r.getLong(1)}")
    }

    // fractional operands keep the floor(l/r) double semantics (result
    // is BIGINT, floored toward -inf), bit-identical to the old form
    Seq((7.5, 2.0), (-7.5, 2.0), (1.0, 3.0)).toDF("x", "y")
      .createOrReplaceTempView("fd_dbl")
    val gotDbl = GraftSql.run(spark,
      "SELECT x // y AS q FROM fd_dbl ORDER BY x").collect().map(_.getLong(0))
    assert(gotDbl.toSeq == Seq(-4L, 0L, 3L))
  }
}
