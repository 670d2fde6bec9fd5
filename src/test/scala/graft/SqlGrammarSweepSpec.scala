package graft

import org.scalatest.funsuite.AnyFunSuite

/** Systematic sweep of the public Polars SQL grammar surface against
  * the shim (round-10 verdict item 5): every construct is classified
  *   - NATIVE     — Spark parses/executes it unchanged,
  *   - REWRITTEN  — a shim pass translates it (value-checked here and,
  *                  for UNION BY NAME + the array fns, oracle-gated in
  *                  `q44_union_by_name`),
  *   - REJECTED   — no translation exists; the front end fails LOUDLY
  *                  (parse error), never silently misevaluates.
  * The reference's own corpus (`sqls.rs`, testes-sqls.txt) uses none
  * of the REWRITTEN/REJECTED tail — this sweep is dialect-completeness
  * evidence, not app-behavior parity. */
class SqlGrammarSweepSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def setup(): Unit = {
    import spark.implicits._
    Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "a", 3.5)).toDF("id", "k", "v")
      .createOrReplaceTempView("t")
    Seq((1L, "x"), (4L, "y")).toDF("id", "s").createOrReplaceTempView("u")
  }

  private def run(sql: String) = graft.sql.GraftSql.run(spark, sql)

  /** (construct, query, expected row count) — NATIVE Spark surface. */
  private val native: Seq[(String, String, Long)] = Seq(
    ("postgres :: cast", "SELECT id::STRING AS s FROM t", 3L),
    ("TRY_CAST", "SELECT TRY_CAST(k AS INT) AS n FROM t", 3L),
    ("LIMIT + OFFSET", "SELECT id FROM t ORDER BY id LIMIT 1 OFFSET 1", 1L),
    ("IS DISTINCT FROM", "SELECT id IS DISTINCT FROM 1 AS d FROM t", 3L),
    ("NATURAL JOIN", "SELECT * FROM t NATURAL JOIN u", 1L),
    ("SEMI JOIN", "SELECT * FROM t SEMI JOIN u ON t.id = u.id", 1L),
    ("LEFT SEMI JOIN", "SELECT * FROM t LEFT SEMI JOIN u ON t.id = u.id", 1L),
    ("ANTI JOIN", "SELECT * FROM t ANTI JOIN u ON t.id = u.id", 2L),
    ("INTERSECT", "SELECT id FROM t INTERSECT SELECT id FROM u", 1L),
    ("EXCEPT set op", "SELECT id FROM t EXCEPT SELECT id FROM u", 2L),
    ("positional GROUP BY", "SELECT k, count(*) AS n FROM t GROUP BY 1", 2L),
    ("positional ORDER BY", "SELECT id, k FROM t ORDER BY 2, 1", 3L),
    ("VALUES clause", "SELECT * FROM (VALUES (1, 'a'), (2, 'b')) AS v(a, b)", 2L),
    ("EXISTS subquery", "SELECT id FROM t WHERE EXISTS (SELECT 1 FROM u WHERE u.id = t.id)", 1L),
    ("INITCAP/LEFT/RIGHT", "SELECT INITCAP(k), LEFT(k, 1), RIGHT(k, 1) FROM t", 3L),
    ("BIT/OCTET_LENGTH", "SELECT BIT_LENGTH(k), OCTET_LENGTH(k) FROM t", 3L),
    ("REGEXP_LIKE", "SELECT REGEXP_LIKE(k, 'a') FROM t", 3L),
    ("SPLIT_PART", "SELECT SPLIT_PART(k, 'x', 1) FROM t", 3L),
    ("TIMESTAMP literal + INTERVAL", "SELECT TIMESTAMP '2024-01-01' + INTERVAL '1' DAY AS ts", 1L),
    ("NULLIF/IFNULL/IF", "SELECT NULLIF(id, 1), IFNULL(NULL, 1), IF(id > 1, 'b', 's') FROM t", 3L),
    ("GREATEST/LEAST", "SELECT GREATEST(id, 2), LEAST(id, 2) FROM t", 3L),
    ("ARRAY_AGG", "SELECT ARRAY_AGG(id) FROM t", 1L),
    ("ARRAY_CONTAINS", "SELECT ARRAY_CONTAINS(ARRAY(1,2), id) FROM t", 3L),
    ("VARIANCE/STDDEV", "SELECT VARIANCE(v), STDDEV(v) FROM t", 1L),
    ("COVAR_SAMP/CORR", "SELECT COVAR_SAMP(id, v), CORR(id, v) FROM t", 1L),
    ("bitwise & |", "SELECT id & 1, id | 2 FROM t", 3L),
    // -1 sentinel: at-least-one rows (SHOW TABLES sees every temp view
    // other suites registered in the shared test session)
    ("SHOW TABLES", "SHOW TABLES", -1L),
    ("DESCRIBE", "DESCRIBE t", 3L))

  test("NATIVE surface: Spark executes each construct unchanged") {
    setup()
    native.foreach { case (name, sql, rows) =>
      val got = run(sql).count()
      if (rows < 0) assert(got >= 1, s"$name: expected rows, got $got — $sql")
      else assert(got == rows, s"$name: expected $rows rows, got $got — $sql")
    }
  }

  test("REWRITTEN: UNION [ALL] BY NAME aligns by name, fills missing with NULL") {
    setup()
    import spark.implicits._
    // reordered columns align by NAME, not position
    val basic = run("SELECT id, k FROM t UNION ALL BY NAME SELECT 'z' AS k, 9::BIGINT AS id")
      .select("id", "k").as[(Long, String)].collect().toSet
    assert(basic == Set((1L, "a"), (2L, "b"), (3L, "a"), (9L, "z")))
    // a column present on only one side NULL-fills on the other
    // (diagonal-concat); trailing ORDER BY applies to the whole union
    val fill = run("SELECT id, k FROM t UNION BY NAME SELECT 9::BIGINT AS id, 'e' AS extra ORDER BY id")
      .select("id", "k", "extra").as[(Long, Option[String], Option[String])].collect().toList
    assert(fill == List((1L, Some("a"), None), (2L, Some("b"), None),
      (3L, Some("a"), None), (9L, None, Some("e"))))
    // CTEs stay in scope for the right branch
    val cte = run("WITH c AS (SELECT id FROM t) " +
      "SELECT id, k FROM t UNION ALL BY NAME SELECT 'q' AS k, id FROM c ORDER BY id LIMIT 3")
      .count()
    assert(cte == 3L)
    // three-branch chain with mixed ALL/DISTINCT ops: each operator
    // keeps its own semantics, columns accumulate first-seen
    val chain = run(
      "SELECT id FROM t UNION ALL BY NAME SELECT id FROM t " +
        "UNION BY NAME SELECT 7.5 AS w, id FROM u ORDER BY id")
    assert(chain.columns.toSeq == Seq("id", "w"))
    // final UNION (distinct) collapses the doubled t-rows; u adds 2
    assert(chain.count() == 5L, chain.collect().mkString(","))
    // mixing BY NAME with positional set ops in one chain rejects loudly
    val e = intercept[IllegalArgumentException] {
      run("SELECT id FROM t UNION BY NAME SELECT id FROM u INTERSECT SELECT id FROM t")
    }
    assert(e.getMessage.contains("positional"))
  }

  test("REWRITTEN: SELECT * ILIKE selects columns by case-insensitive name pattern") {
    setup()
    assert(run("SELECT * ILIKE '%K%' FROM t").columns.toSeq == Seq("k"))
    assert(run("SELECT * ILIKE 'i_' FROM t").columns.toSeq == Seq("id"))
    // composes with EXCLUDE, and zero matches fail loudly
    assert(run("SELECT * ILIKE '%' EXCLUDE (v) FROM t").columns.toSeq == Seq("id", "k"))
    val e = intercept[IllegalArgumentException] {
      run("SELECT * ILIKE 'nope%' FROM t").collect()
    }
    assert(e.getMessage.contains("matches no columns"))
  }

  test("REWRITTEN: array_get / array_sum / array_mean") {
    setup()
    import spark.implicits._
    // array_get is 0-based with null on out-of-bounds (Polars list.get;
    // negative indexes differ — Polars wraps, Spark GET nulls)
    assert(run("SELECT ARRAY_GET(ARRAY(10, 20), 1) AS x").as[Int].head() == 20)
    assert(run("SELECT ARRAY_GET(ARRAY(10, 20), 5) AS x").select($"x".isNull).as[Boolean].head())
    // sum/mean template onto AGGREGATE: double result, empty sums to
    // 0.0, empty mean is NULL (0/0), null array propagates NULL
    assert(run("SELECT ARRAY_SUM(ARRAY(1, 2, 4)) AS x").as[Double].head() == 7.0)
    assert(run("SELECT ARRAY_MEAN(ARRAY(1.0, 2.0, 6.0)) AS x").as[Double].head() == 3.0)
    assert(run("SELECT ARRAY_SUM(ARRAY()) AS x").as[Double].head() == 0.0)
    assert(run("SELECT ARRAY_MEAN(ARRAY()) AS x").select(org.apache.spark.sql.functions.isnull(
      org.apache.spark.sql.functions.col("x"))).as[Boolean].head())
    assert(run("SELECT ARRAY_SUM(CAST(NULL AS ARRAY<INT>)) AS x").select(
      org.apache.spark.sql.functions.isnull(org.apache.spark.sql.functions.col("x")))
      .as[Boolean].head())
    // single-evaluation contract: the argument is templated exactly ONCE
    // (mean folds a (sum, count) struct), so a nondeterministic or
    // expensive argument can never diverge between a sum pass and a
    // size pass
    val rewritten = graft.sql.SqlRewriter.rewriteQuotesAndFunctions(
      "SELECT ARRAY_MEAN(SHUFFLE(ARRAY(1, 2, 6))) AS x")
    assert("SHUFFLE".r.findAllIn(rewritten.toUpperCase).length == 1,
      s"array_mean must evaluate its argument once: $rewritten")
    // and the fold itself is value-correct regardless of element order
    assert(run("SELECT ARRAY_MEAN(SHUFFLE(ARRAY(1.0, 2.0, 6.0))) AS x")
      .as[Double].head() == 3.0)
  }

  test("REWRITTEN: [NOT] SIMILAR TO translates to anchored RLIKE (r12 promotion)") {
    setup()
    import spark.implicits._
    // whole-string semantics: 'a' alone only matches the exact string
    // "a"; '%a%' is the substring form. SQL wildcards translate
    // (% → .*, _ → .), POSIX-borrowed metachars keep regex meaning.
    assert(run("SELECT id FROM t WHERE k SIMILAR TO 'a'").count() == 2L)
    assert(run("SELECT id FROM t WHERE k SIMILAR TO '(a|b)'").count() == 3L)
    assert(run("SELECT id FROM t WHERE k SIMILAR TO '_'").count() == 3L)
    assert(run("SELECT id FROM t WHERE k NOT SIMILAR TO 'a%'").count() == 1L)
    // `.` is LITERAL in SIMILAR TO (unlike regex): 'a.' matches nothing
    assert(run("SELECT id FROM t WHERE k SIMILAR TO 'a.'").count() == 0L)
    // escape: `\%` is a literal percent; ESCAPE 'x' overrides; ESCAPE ''
    // disables escaping entirely (backslash becomes a literal)
    assert(run("SELECT 1 AS r WHERE '5%' SIMILAR TO '_\\%'").count() == 1L)
    assert(run("SELECT 1 AS r WHERE '5%' SIMILAR TO '_x%' ESCAPE 'x'").count() == 1L)
    // LHS builds "a\b" via CHR(92): a literal '\b' would be Spark's
    // backspace escape, which is exactly the convention mismatch the
    // rewriter-side literal escaping exists to avoid
    assert(run("SELECT 1 AS r WHERE CONCAT('a', CHR(92), 'b') SIMILAR TO '_\\_' ESCAPE ''")
      .count() == 1L)
    // translation unit contract, spelled out (\A..\z, not ^..$: Java's
    // `$` also matches before a FINAL newline, so "red\n" would wrongly
    // satisfy SIMILAR TO 'red' under find()-style RLIKE)
    assert(graft.sql.SqlRewriter.translateSimilarTo("%(ab|c)_[0-9]%") ==
      "\\A(?:.*(ab|c).[0-9].*)\\z")
    assert(graft.sql.SqlRewriter.translateSimilarTo("a.b^c$d") ==
      "\\A(?:a\\.b\\^c\\$d)\\z")
    // whole-string means whole-string: a trailing newline is a mismatch
    assert(run("SELECT 1 AS r WHERE CONCAT('red', CHR(10)) SIMILAR TO 'red'")
      .count() == 0L)
    // the escape character is NOT special inside a bracket expression
    // (verbatim pass-through, same as the oracle engine's regex): [\d]
    // stays a digit class, not a literal 'd'
    assert(graft.sql.SqlRewriter.translateSimilarTo("[\\d]%") ==
      "\\A(?:[\\d].*)\\z")
    assert(run("SELECT 1 AS r WHERE '7x' SIMILAR TO '[\\d]%'").count() == 1L)
    // non-literal patterns and dangling escapes fail LOUDLY
    intercept[IllegalArgumentException] { run("SELECT k SIMILAR TO k FROM t") }
    intercept[IllegalArgumentException] {
      graft.sql.SqlRewriter.translateSimilarTo("abc\\")
    }
    ()
  }

  test("SIMILAR TO fuzz: on wildcard-only patterns it IS LIKE (independent oracle)") {
    // for patterns built from literals + % + _ (no POSIX metachars, no
    // escapes), the SQL standard defines SIMILAR TO and LIKE
    // identically — Spark's native LIKE is therefore an independent
    // oracle for the translator on that subgrammar. Deterministic
    // splitmix sampling over a 3-letter alphabet keeps collision
    // (match) rates high enough to exercise both outcomes.
    def mix(x0: Long): Long = {
      var z = x0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val sym = "ab%_c"
    val cases = (0 until 200).map { i =>
      val s = (0 until (math.floorMod(mix(i * 7L), 6L).toInt))
        .map(j => "abc".charAt(math.floorMod(mix(i * 131L + j), 3L).toInt)).mkString
      val p = (0 until (math.floorMod(mix(i * 13L + 1), 5L).toInt + 1))
        .map(j => sym.charAt(math.floorMod(mix(i * 257L + j), sym.length.toLong).toInt)).mkString
      (s, p)
    }
    // one VALUES frame per predicate pair: both predicates evaluate
    // over the same rows in one query, so a translator bug surfaces as
    // a row where the two columns disagree
    import spark.implicits._
    cases.grouped(40).foreach { chunk =>
      chunk.groupBy(_._2).foreach { case (p, group) =>
        val values = group.map { case (s, _) => s"('$s')" }.mkString(", ")
        val bad = run(
          s"SELECT s, s SIMILAR TO '$p' AS sim, s LIKE '$p' AS lik " +
            s"FROM (SELECT col1 AS s FROM (VALUES $values))")
          .filter($"sim" =!= $"lik").collect()
        assert(bad.isEmpty,
          s"pattern '$p': SIMILAR TO disagrees with LIKE on ${bad.mkString(", ")}")
      }
    }
  }

  test("REJECTED tail fails loudly, never silently") {
    setup()
    // `#` is not an operator in either dialect — parse error (COVERAGE.md
    // records why it stays rejected)
    intercept[Throwable] { run("SELECT id # 4 FROM t").collect() }
    ()
  }

  test("dialect note: ^ is Spark XOR (sqlparser GenericDialect semantics), not POWER") {
    // polars-sql parses with sqlparser's GenericDialect, where `^` is
    // bitwise XOR (PGExp's power-^ is PostgreSqlDialect-only), so Spark
    // agrees: 2 ^ 3 = 1. POWER/POW spell exponentiation in both.
    setup()
    import spark.implicits._
    assert(run("SELECT 2 ^ 3 AS p").as[Int].head() == 1)
    assert(run("SELECT POWER(2, 3) AS p").as[Double].head() == 8.0)
  }
}
