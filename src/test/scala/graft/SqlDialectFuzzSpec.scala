package graft

import graft.sql.GraftSql
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property fuzz for the `//` floor-division rewrite: random integer
  * expression trees over {+, -, *, //, %} with unary minus are printed
  * by a PRECEDENCE-AWARE renderer (parens only where the grammar needs
  * them — so the rewriter's operand-span scanning, not the printer, is
  * what must get multiplicative chains, left associativity, and sign
  * folding right) and evaluated through GraftSql against a direct
  * in-memory reference (Math.floorDiv for `//`). Divisor subtrees are
  * restricted to (possibly negated) nonzero atoms: ANSI mode makes a
  * zero divisor an error, which is division semantics, not rewrite
  * semantics.
  */
class SqlDialectFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private sealed trait E
  private case class Lit(v: Long) extends E
  private case class Col(name: String) extends E
  private case class Neg(e: E) extends E
  private case class Bin(op: String, l: E, r: E) extends E

  private def prec(e: E): Int = e match {
    case Bin("+", _, _) | Bin("-", _, _) => 1
    case Bin(_, _, _)                    => 2
    case Neg(_)                          => 3
    case _                               => 4
  }

  /** Minimal-parens printer: child parenthesized only when its
    * precedence demands it (right child also at EQUAL precedence —
    * left associativity). `- ` keeps a space so two negations never
    * fuse into a `--` line comment. */
  private def render(e: E): String = e match {
    case Lit(v) => v.toString
    case Col(n) => n
    case Neg(x) =>
      val sx = if (prec(x) <= 2) s"(${render(x)})" else render(x)
      s"- $sx"
    case b @ Bin(op, l, r) =>
      val pl = if (prec(l) < prec(b)) s"(${render(l)})" else render(l)
      val pr = if (prec(r) <= prec(b)) s"(${render(r)})" else render(r)
      s"$pl $op $pr"
  }

  private def eval(e: E, a: Long, b: Long): Long = e match {
    case Lit(v)    => v
    case Col("a")  => a
    case Col(_)    => b
    case Neg(x)    => -eval(x, a, b)
    case Bin(op, l, r) =>
      val (lv, rv) = (eval(l, a, b), eval(r, a, b))
      op match {
        case "+"  => lv + rv
        case "-"  => lv - rv
        case "*"  => lv * rv
        case "//" => Math.floorDiv(lv, rv) // Polars floors toward -inf
        case "%"  => lv % rv               // both engines: sign of dividend
      }
  }

  private val atom: Gen[E] = Gen.oneOf(
    Gen.chooseNum(1L, 9L).map(Lit.apply),
    Gen.oneOf("a", "b").map(Col.apply))
  // nonzero by construction: atoms are 1..9 or the positive columns,
  // negation preserves nonzero
  private val divisor: Gen[E] = Gen.oneOf(atom, atom.map(Neg.apply))

  private def genE(depth: Int): Gen[E] =
    if (depth == 0) atom
    else Gen.frequency(
      2 -> atom,
      1 -> genE(depth - 1).map(Neg.apply),
      5 -> (for {
        op <- Gen.oneOf("+", "-", "*", "//", "%")
        l  <- genE(depth - 1)
        r  <- if (op == "//" || op == "%") divisor else genE(depth - 1)
      } yield Bin(op, l, r)))

  test("random expression trees round-trip through the // rewrite") {
    val seed0 = org.scalacheck.rng.Seed(17L)
    val exprs = Iterator.iterate(seed0)(_.next)
      .take(60)
      .map(s => genE(3).pureApply(Gen.Parameters.default, s))
      .toSeq
    // at least some of the fuzzed trees must actually contain a //
    assert(exprs.count(e => render(e).contains("//")) >= 10)
    val rows = Seq((1L, 1L), (3L, 2L), (7L, 5L), (9L, 4L), (2L, 9L))
    rows.toDF("a", "b").createOrReplaceTempView("fuzz_arith")
    val select = exprs.zipWithIndex
      .map { case (e, i) => s"CAST(${render(e)} AS BIGINT) AS c$i" }
      .mkString(", ")
    val got = GraftSql.run(spark,
      s"SELECT a, b, $select FROM fuzz_arith ORDER BY a, b").collect()
    got.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      exprs.zipWithIndex.foreach { case (e, i) =>
        val expected = eval(e, a, b)
        assert(r.getLong(i + 2) == expected,
          s"expr `${render(e)}` at (a=$a, b=$b): " +
            s"got ${r.getLong(i + 2)}, expected $expected")
      }
    }
  }

  test("UNION BY NAME fuzz: random column subsets align by name with NULL fill") {
    // reference model: rows are (colName -> value) maps; the rewrite's
    // output must equal the union of each branch's rows extended with
    // NULLs for columns it lacks, aligned to first-seen column order
    val universe = Vector("c0", "c1", "c2", "c3", "c4")
    val rnd = new scala.util.Random(411)
    (0 until 25).foreach { trial =>
      val nBranches = 2 + rnd.nextInt(2)
      // each branch: a nonempty random subset in random order, with
      // branch-distinct values so rows never collide across branches
      val branches = (0 until nBranches).map { bi =>
        val cols = rnd.shuffle(universe).take(1 + rnd.nextInt(universe.size))
        val rows = 1 + rnd.nextInt(3)
        (bi, cols, rows)
      }
      val sql = branches.map { case (bi, cols, rows) =>
        val selects = (0 until rows).map { ri =>
          cols.map(c => s"${(bi + 1) * 1000 + ri * 10 + c.drop(1).toInt}::BIGINT AS $c")
            .mkString("SELECT ", ", ", "")
        }
        // rows within a branch via UNION ALL inside parens (a
        // parenthesized subquery — its own chain, not the top-level one)
        if (rows == 1) selects.head
        else s"SELECT * FROM (${selects.mkString(" UNION ALL ")}) AS b$bi"
      }.mkString(" UNION ALL BY NAME ")
      val got = GraftSql.run(spark, sql)
      val expectedCols = branches.foldLeft(Vector.empty[String]) { case (acc, (_, cols, _)) =>
        acc ++ cols.filterNot(acc.contains)
      }
      assert(got.columns.toSeq == expectedCols,
        s"trial $trial: cols ${got.columns.toSeq} vs $expectedCols\n$sql")
      val gotRows = got.collect().map(r =>
        expectedCols.map(c => Option(r.getAs[Any](c)).map(_.toString).getOrElse("null"))).toSet
      val expRows = branches.flatMap { case (bi, cols, rows) =>
        (0 until rows).map { ri =>
          expectedCols.map(c =>
            if (cols.contains(c)) ((bi + 1) * 1000 + ri * 10 + c.drop(1).toInt).toString
            else "null")
        }
      }.toSet
      assert(gotRows == expRows, s"trial $trial rows mismatch\n$sql")
    }
  }
}
