package graft

import graft.operators._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference's per-operator unit tests (SURVEY §5):
  * normalize.rs, replace.rs, drop.rs, remove.rs, add.rs, traits.rs. */
class TransformsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- T2 normalize (fixture F2, normalize.rs:146-556) -----------------

  def normFrame = Seq(
    (1, Option("1.234,56"), Option("1,234.56"), Option("1,0")),
    (2, Option("78,90"), Option("78.90"), Option("Invalid")),
    (3, Option("1.000"), Option("1,000"), None),
    (4, Option("-10,0"), Option("-10.0"), Option("")),
    (5, Option("500,"), Option("500."), Option("-1.000,5")),
    (6, None, None, Option(",5")),
    (7, Option("0,1"), Option("0.1"), Option(".")),
    (8, Option("10"), Option("10"), Option("1.2.3,4.5"))
  ).toDF("ID", "Value_PT", "Value_US", "Mixed_Data")

  test("normalize PT column: dots stripped then comma→dot") {
    val out = NormalizeEuroStrings("^Value_PT$")(normFrame)
      .select("Value_PT").as[Option[Double]].collect().toSeq
    assert(out == Seq(Some(1234.56), Some(78.90), Some(1000.0), Some(-10.0),
      Some(500.0), None, Some(0.1), Some(10.0)))
  }

  test("normalize mixed garbage: Invalid/''/'.' → null, '1.2.3,4.5' → 123.45") {
    val out = NormalizeEuroStrings("^Mixed_Data$")(normFrame)
      .select("Mixed_Data").as[Option[Double]].collect().toSeq
    assert(out == Seq(Some(1.0), None, None, None, Some(-1000.5),
      Some(0.5), None, Some(123.45)))
  }

  test("normalize regex on non-string column errors (InvalidDataTypeForRegex)") {
    val df = normFrame.withColumn("Already_F64", lit(1.5))
    assertThrows[GraftError.InvalidDataTypeForRegex] {
      NormalizeEuroStrings("^Already_F64$")(df)
    }
  }

  test("normalize invalid regex format / syntax") {
    assertThrows[GraftError.InvalidRegexFormat] {
      NormalizeEuroStrings("Value_PT")(normFrame) // not ^…$ and not *
    }
    assertThrows[GraftError.InvalidRegexSyntax] {
      NormalizeEuroStrings("^Va[lue$")(normFrame)
    }
  }

  test("normalize wildcard hits every string column") {
    val out = NormalizeEuroStrings("*")(normFrame)
    assert(out.schema.fields.filter(_.name != "ID").forall(_.dataType == DoubleType))
  }

  // ---- T3 replace (fixture F3, replace.rs:143-527) ---------------------

  val markers = Seq("", "<N/D>", "NA", "N/A", "999", "3.45", "false")

  test("replace string-only mode: trimmed match → null, other dtypes untouched") {
    val df = Seq(
      ("Keep", 1, 1.0, true), (" N/A ", 999, 999.0, false),
      ("<N/D>", 3, 3.45, true), ("  ", 4, 4.0, false),
      ("999", 5, 5.0, true)
    ).toDF("col_str", "col_int", "col_flt", "col_bool")
    val out = ReplaceWithNull(markers)(df)
    val strs = out.select("col_str").as[Option[String]].collect().toSeq
    assert(strs == Seq(Some("Keep"), None, None, None, None))
    // int 999 / float 999.0 / bool false survive in string-only mode
    assert(out.filter($"col_int" === 999).count() == 1)
    assert(out.filter($"col_bool" === false).count() == 2)
  }

  test("replace all-columns mode matches the trimmed string form per dtype") {
    val df = Seq((999, 999.0, 3.45, false, "x"))
      .toDF("i", "f999", "f345", "b", "s")
    val out = ReplaceWithNull(markers, applyToAllColumns = true)(df)
    val r = out.head()
    assert(r.isNullAt(0))        // "999" matches marker 999
    assert(!r.isNullAt(1))       // "999.0" does NOT match "999" (replace.rs:346-352)
    assert(r.isNullAt(2))        // "3.45" matches
    assert(r.isNullAt(3))        // "false" matches
    assert(r.getString(4) == "x")
  }

  test("replace with empty marker list is identity") {
    val df = Seq(("a", 1)).toDF("s", "i")
    assert(ReplaceWithNull(Seq.empty)(df).collect().toSeq == df.collect().toSeq)
  }

  test("marker config parsing: comma-separated, optional quotes") {
    assert(ReplaceWithNull.parseMarkers("\"\", <N/D>, NA") == Seq("", "<N/D>", "NA"))
    assert(ReplaceWithNull.parseMarkers("") == Seq.empty)
  }

  // ---- T1 drop (fixture F4, drop.rs:98-335) ----------------------------

  def dropFrame = Seq((1, "a", "b", 1.0, true))
    .toDF("ID", "Value_A", "Description B", "Value_C", "IgnoreMe")

  test("drop by anchored regex incl. space-in-name") {
    val out = DropColumnsByRegex("^Description B$")(dropFrame)
    assert(out.columns.toSeq == Seq("ID", "Value_A", "Value_C", "IgnoreMe"))
  }

  test("drop pattern ^Value_.$ drops both value columns") {
    val out = DropColumnsByRegex("^Value_.$")(dropFrame)
    assert(out.columns.toSeq == Seq("ID", "Description B", "IgnoreMe"))
  }

  test("drop wildcard → 0x0 frame; no-match → identity; bad regex errors") {
    val all = DropColumnsByRegex("*")(dropFrame)
    assert(all.columns.isEmpty && all.count() == 0)
    assert(DropColumnsByRegex("^NoSuch$")(dropFrame).columns.toSeq == dropFrame.columns.toSeq)
    assertThrows[GraftError.InvalidRegexFormat](DropColumnsByRegex("Value")(dropFrame))
  }

  // ---- T5 remove null cols (fixture F5, remove.rs:50-181) --------------

  test("remove all-null columns, keep mixed") {
    val df = Seq((Some(1), Option.empty[Int], Some("x"), Option.empty[String]))
      .toDF("col_a", "col_b", "col_c", "col_d")
    val out = RemoveNullColumns(df)
    assert(out.columns.toSeq == Seq("col_a", "col_c"))
  }

  test("remove on zero-row frame drops ALL columns (remove.rs:157-180)") {
    val df = Seq((1, "x")).toDF("a", "b").filter(lit(false))
    val out = RemoveNullColumns(df)
    assert(out.columns.isEmpty)
  }

  test("remove null cols reads the cache, not the source, when input is cached") {
    val df = Seq((Some(1), Option.empty[Int]), (Some(2), Option.empty[Int]))
      .toDF("keep", "drop").cache()
    try {
      val out = RemoveNullColumns(df)
      assert(out.columns.toSeq == Seq("keep"))
      // both the counts pass and the returned frame hit the cached blocks
      assert(out.queryExecution.executedPlan.toString.contains("InMemoryTableScan"))
    } finally df.unpersist()
  }

  test("applyWithCounts skips the counts action entirely") {
    val df = Seq((Some(1), Option.empty[Int], Some("x"))).toDF("a", "b", "c")
    val counts = Row(5L, 0L, 3L)
    val out = RemoveNullColumns.applyWithCounts(df, counts)
    assert(out.columns.toSeq == Seq("a", "c"))
  }

  // ---- T6 row index (fixture F6, add.rs:50-293) ------------------------

  test("row index: default name, offset, first position, long dtype") {
    val df = Seq("a", "b", "c").toDF("v")
    val out = AddRowIndex("Row Number", 1L)(df)
    assert(out.columns.head == "Row Number")
    assert(out.schema.head.dataType == LongType)
    assert(out.select("Row Number").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("row index name conflicts suffix _1.._3") {
    val df = Seq((1, 2, 3, 4)).toDF("CustomID", "CustomID_1", "CustomID_2", "x")
    val out = AddRowIndex("CustomID", 0L)(df)
    assert(out.columns.head == "CustomID_3")
  }

  test("unique-name exhaustion after 1000 attempts errors") {
    val existing = "N" +: (1 to 1000).map(i => s"N_$i")
    assertThrows[GraftError.UniqueNameExhausted] {
      AddRowIndex.resolveUniqueName("N", existing)
    }
  }

  test("row index offset 10") {
    val out = AddRowIndex("idx", 10L)(Seq("a", "b").toDF("v"))
    assert(out.select("idx").as[Long].collect().sorted.toSeq == Seq(10L, 11L))
  }

  // ---- T7 round (traits.rs:336-359 HalfAwayFromZero) -------------------

  test("round floats half-away-from-zero, non-floats untouched") {
    val df = Seq((2.5, -2.5, 1.005, 7)).toDF("a", "b", "c", "i")
    val out = RoundFloatColumns(0)(df).head()
    assert(out.getDouble(0) == 3.0)
    assert(out.getDouble(1) == -3.0)  // away from zero
    assert(out.getDouble(2) == 1.0)
    assert(out.getInt(3) == 7)
  }

  // ---- pipeline ordering ----------------------------------------------

  test("pipeline runs drop → normalize → replace → sql → remove → index") {
    val df = Seq(("1.000,5", "x", "<N/D>")).toDF("euro", "junk", "marked")
    val cfg = PipelineConfig(
      dropRegex = Some("^junk$"),
      normalizeRegex = Some("^euro$"),
      sql = Some("SELECT * FROM AllData"),
      removeNullCols = true,
      rowIndex = Some(("Row Number", 1L)))
    val out = Pipeline.run(df, cfg)
    // marked → null → all-null column removed; junk dropped; euro parsed
    assert(out.columns.toSeq == Seq("Row Number", "euro"))
    assert(out.head().getDouble(1) == 1000.5)
  }
}
