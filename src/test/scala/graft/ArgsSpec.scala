package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference CLI test suite (args.rs:234-388 `tests_args`)
  * plus the validator rules (args.rs:187-214) and the requires
  * constraints our parser enforces. */
class ArgsSpec extends AnyFunSuite {

  test("basic path only → defaults (test_args_basic_path_only)") {
    val a = Arguments.parse(Seq("data.csv"))
    assert(a.path.contains("data.csv"))
    assert(a.delimiter == ";")
    assert(a.nullValues == "\"\", <N/D>")
    assert(a.query.isEmpty)
    assert(a.tableName == "AllData")
    assert(!a.excludeNullCols)
    assert(a.regex.isEmpty)
  }

  test("dot path (test_args_defaults_with_dot_path)") {
    val a = Arguments.parse(Seq("."))
    assert(a.path.contains("."))
    assert(a.delimiter == ";")
  }

  test("all options, short form (test_args_all_options_short)") {
    val a = Arguments.parse(Seq(
      "-d", ",", "-n", "NA,-99", "-q", "SELECT c1 FROM MyData WHERE c2 > 0",
      "-t", "MyData", "-e", "-r", "^Col_\\d+$", "input.parquet"))
    assert(a.path.contains("input.parquet"))
    assert(a.delimiter == ",")
    assert(a.nullValues == "NA,-99")
    assert(a.query.contains("SELECT c1 FROM MyData WHERE c2 > 0"))
    assert(a.tableName == "MyData")
    assert(a.excludeNullCols)
    assert(a.regex.contains("^Col_\\d+$"))
  }

  test("all options, long form (test_args_all_options_long)") {
    val a = Arguments.parse(Seq(
      "--delimiter", ";", "--null-values", "\"-\", \"?\"",
      "--query", "SELECT *", "--table-name", "LogData",
      "--exclude-null-cols", "--regex", "*", "log.ndjson"))
    assert(a.path.contains("log.ndjson"))
    assert(a.delimiter == ";")
    assert(a.nullValues == "\"-\", \"?\"")
    assert(a.query.contains("SELECT *"))
    assert(a.tableName == "LogData")
    assert(a.excludeNullCols)
    assert(a.regex.contains("*"))
  }

  test("no path → all defaults, path None (test_args_no_path_provided)") {
    val a = Arguments.parse(Seq.empty)
    assert(a.path.isEmpty)
    assert(a.delimiter == ";")
    assert(a.tableName == "AllData")
  }

  test("query without table-name keeps AllData (test_args_query_without_tablename)") {
    val a = Arguments.parse(Seq("-q", "SELECT count(*) FROM AllData", "metrics.csv"))
    assert(a.query.contains("SELECT count(*) FROM AllData"))
    assert(a.tableName == "AllData")
  }

  test("flag only (test_args_flags_only)") {
    val a = Arguments.parse(Seq("-e", "config.json"))
    assert(a.path.contains("config.json"))
    assert(a.excludeNullCols)
    assert(a.query.isEmpty)
  }

  test("--opt=value form") {
    val a = Arguments.parse(Seq("--query=SELECT 1", "d.csv"))
    assert(a.query.contains("SELECT 1"))
  }

  test("force-string and normalize regexes are validated at parse time") {
    // '*' and anchored forms pass
    assert(Arguments.parse(Seq("-f", "*", "x.csv")).forceStringPatterns.contains("*"))
    assert(Arguments.parse(Seq("-r", "^Val.*$", "x.csv")).regex.contains("^Val.*$"))
    // unanchored → InvalidArgument
    assertThrows[GraftError.InvalidArgument](Arguments.parse(Seq("-r", "Val.*", "x.csv")))
    // anchored but syntactically broken → InvalidArgument (args.rs '^Val[')
    assertThrows[GraftError.InvalidArgument](Arguments.parse(Seq("-r", "^Val[$", "x.csv")))
    assertThrows[GraftError.InvalidArgument](Arguments.parse(Seq("-f", "Chave", "x.csv")))
  }

  test("value options require FILE_PATH; -t requires -q (clap requires=)") {
    assertThrows[GraftError.InvalidArgument](Arguments.parse(Seq("-q", "SELECT 1")))
    assertThrows[GraftError.InvalidArgument](Arguments.parse(Seq("-d", ",")))
    assertThrows[GraftError.InvalidArgument](Arguments.parse(Seq("-t", "T", "x.csv")))
    // defaults don't trigger requires: bare parse is fine
    Arguments.parse(Seq.empty)
  }

  test("delimiter must be exactly one character (clap char parser parity)") {
    assertThrows[GraftError.InvalidArgument](Arguments.parse(Seq("-d", "||", "x.csv")))
    assertThrows[GraftError.InvalidArgument](Arguments.parse(Seq("-d", "", "x.csv")))
    assert(Arguments.parse(Seq("-d", "\t", "x.csv")).delimiter == "\t")
  }

  test("unknown option / duplicate path / missing value are rejected") {
    assertThrows[GraftError.InvalidArgument](Arguments.parse(Seq("--bogus", "x.csv")))
    assertThrows[GraftError.InvalidArgument](Arguments.parse(Seq("-z", "x.csv")))
    assertThrows[GraftError.InvalidArgument](Arguments.parse(Seq("a.csv", "b.csv")))
    assertThrows[GraftError.InvalidArgument](Arguments.parse(Seq("x.csv", "-q")))
  }

  test("configs wire through: delimiter, force-string, nulls, sql, flags") {
    val a = Arguments.parse(Seq("-d", ",", "-f", "^(Chave|ID).*$",
      "-n", "NA,\"-\"", "-q", "SELECT * FROM T", "-t", "T", "-e",
      "-r", "^Val.*$", "data.csv"))
    val rc = a.toReadConfig
    assert(rc.delimiter.contains(','))
    assert(rc.forceStringRegex.contains("^(Chave|ID).*$"))
    val pc = a.toPipelineConfig
    assert(pc.normalizeRegex.contains("^Val.*$"))
    assert(pc.nullMarkers == Seq("NA", "-"))
    assert(pc.sql.contains("SELECT * FROM T"))
    assert(pc.tableName == "T")
    assert(pc.removeNullCols)
  }
}
