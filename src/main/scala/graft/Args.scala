package graft

import graft.operators.{PipelineConfig, ReplaceWithNull}
import graft.sources.ReadConfig

/** Command-line argument surface mirroring the reference CLI
  * (reference: src/args.rs:52-182 — clap parser over delimiter /
  * exclude-null-cols / force-string-cols / null-values / query / regex /
  * table-name + optional positional FILE_PATH). Dependency-free parser
  * (no external CLI library is available offline, and the surface is six
  * options), with the same semantics the reference's `tests_args` suite
  * (args.rs:234-388) pins:
  *
  *   - short (`-q v`) and long (`--query v`, `--query=v`) forms;
  *   - defaults: delimiter ";" (DEFAULT_CSV_DELIMITER,
  *     data_filter.rs:28), null-values `"", <N/D>` (NULL_VALUES,
  *     data_filter.rs:24), table-name "AllData";
  *   - `-e/--exclude-null-cols` is a bare flag;
  *   - value options REQUIRE the positional FILE_PATH (clap
  *     `requires = "path"`), and `-t` requires `-q` — defaults never
  *     trigger the requirement, only explicitly-passed values do;
  *   - `-f` and `-r` regex values are validated at parse time: `*` or
  *     anchored `^...$`, and syntactically-valid regex (args.rs:187-214).
  */
final case class Arguments(
    path: Option[String] = None,
    delimiter: String = Arguments.DefaultCsvDelimiter,
    excludeNullCols: Boolean = false,
    forceStringPatterns: Option[String] = None,
    nullValues: String = Arguments.NullValues,
    query: Option[String] = None,
    regex: Option[String] = None,
    tableName: String = Arguments.DefaultTableName) {

  /** Read-side config: the configured delimiter is the FIRST candidate
    * the sniffer tries; auto-detect falls back to the common separators
    * when it fails to parse >1 column (reference args.rs:53-63). */
  def toReadConfig: ReadConfig = ReadConfig(
    delimiter = delimiter.headOption,
    forceStringRegex = forceStringPatterns)

  /** Pipeline config in the reference's fixed stage order. */
  def toPipelineConfig: PipelineConfig = PipelineConfig(
    normalizeRegex = regex,
    nullMarkers = ReplaceWithNull.parseMarkers(nullValues),
    sql = query,
    tableName = tableName,
    removeNullCols = excludeNullCols)
}

object Arguments {
  val DefaultCsvDelimiter = ";"
  val NullValues = "\"\", <N/D>"
  val DefaultTableName = "AllData"

  private val longNames = Map(
    "delimiter" -> 'd', "exclude-null-cols" -> 'e', "force-string-cols" -> 'f',
    "null-values" -> 'n', "query" -> 'q', "regex" -> 'r', "table-name" -> 't')
  private val flags = Set('e')

  /** Parse argv (program name NOT included, unlike clap's parse_from).
    * Throws [[GraftError.InvalidArgument]] on unknown options, missing
    * values, bad regex values, or violated `requires` constraints. */
  def parse(argv: Seq[String]): Arguments = {
    var args = Arguments()
    var explicit = Set.empty[Char]
    var i = 0

    def setOpt(short: Char, display: String, value: => String): Unit = {
      short match {
        case 'd' =>
          // clap's char value_parser rejects anything but a single char;
          // silently truncating "||" to '|' (or "" to auto-detect) would
          // diverge from the reference
          val v = value
          if (v.length != 1)
            throw GraftError.InvalidArgument(display,
              s"delimiter must be exactly one character (got ${v.length})")
          args = args.copy(delimiter = v)
        case 'e' => args = args.copy(excludeNullCols = true)
        case 'f' => args = args.copy(forceStringPatterns =
          Some(validateCliRegex(value, "--force-string-cols")))
        case 'n' => args = args.copy(nullValues = value)
        case 'q' => args = args.copy(query = Some(value))
        case 'r' => args = args.copy(regex =
          Some(validateCliRegex(value, "--regex")))
        case 't' => args = args.copy(tableName = value)
        case _   => throw GraftError.InvalidArgument(display, "unknown option")
      }
      explicit += short
    }

    while (i < argv.length) {
      val a = argv(i)
      if (a.startsWith("--")) {
        val (name, inline) = a.drop(2).split("=", 2) match {
          case Array(n, v) => (n, Some(v))
          case Array(n)    => (n, None)
        }
        val short = longNames.getOrElse(name,
          throw GraftError.InvalidArgument(s"--$name", "unknown option"))
        if (flags(short)) {
          if (inline.isDefined)
            throw GraftError.InvalidArgument(s"--$name", "flag takes no value")
          setOpt(short, s"--$name", "")
        } else inline match {
          case Some(v) => setOpt(short, s"--$name", v)
          case None =>
            if (i + 1 >= argv.length)
              throw GraftError.InvalidArgument(s"--$name", "missing value")
            i += 1
            setOpt(short, s"--$name", argv(i))
        }
      } else if (a.length == 2 && a.charAt(0) == '-' && a != "-") {
        val short = a.charAt(1)
        if (!longNames.values.exists(_ == short))
          throw GraftError.InvalidArgument(a, "unknown option")
        if (flags(short)) setOpt(short, a, "")
        else {
          if (i + 1 >= argv.length)
            throw GraftError.InvalidArgument(a, "missing value")
          i += 1
          setOpt(short, a, argv(i))
        }
      } else {
        if (args.path.isDefined)
          throw GraftError.InvalidArgument(a, "FILE_PATH already given")
        args = args.copy(path = Some(a))
      }
      i += 1
    }

    // clap `requires` constraints: only explicitly-passed values count
    val needsPath = Seq('d' -> "--delimiter", 'f' -> "--force-string-cols",
      'n' -> "--null-values", 'q' -> "--query", 'r' -> "--regex")
    if (args.path.isEmpty)
      needsPath.collectFirst { case (c, n) if explicit(c) => n }.foreach { n =>
        throw GraftError.InvalidArgument(n, "requires FILE_PATH")
      }
    if (explicit('t') && !explicit('q'))
      throw GraftError.InvalidArgument("--table-name", "requires --query")
    args
  }

  /** `*`, or anchored `^...$` that compiles (reference args.rs:187-214). */
  def validateCliRegex(pattern: String, argName: String): String = {
    if (pattern == "*") return pattern
    if (!(pattern.startsWith("^") && pattern.endsWith("$")))
      throw GraftError.InvalidArgument(argName,
        "Pattern must be '*' or (start with '^' and end with '$')")
    try { pattern.r; pattern }
    catch {
      case e: java.util.regex.PatternSyntaxException =>
        throw GraftError.InvalidArgument(argName, s"Invalid regex syntax: ${e.getMessage}")
    }
  }
}

/** Minimal CLI entry point: parse args, load the file through the
  * sniffing reader, run the fixed-order pipeline, print shape + head.
  * (The reference opens an egui window here — GUI chrome is a declared
  * non-goal, SURVEY §7.5; the data path is identical.) */
object GraftCli {
  def main(argv: Array[String]): Unit = {
    val args = Arguments.parse(argv.toSeq)
    val path = args.path.getOrElse {
      System.err.println("usage: graft [OPTIONS] FILE_PATH"); sys.exit(2)
    }
    val spark = GraftSession.configure(
      org.apache.spark.sql.SparkSession.builder().master(
        sys.env.getOrElse("SPARK_MASTER", "local[*]"))).getOrCreate()
    try {
      val c = Container.load(spark, path, args.toReadConfig, args.toPipelineConfig)
      val (rows, cols) = c.shape
      c.detectedDelimiter.foreach(d => println(s"delimiter: '$d'"))
      println(s"shape: $rows rows x $cols cols")
      c.current.show(20, truncate = false)
      c.release()
    } finally spark.stop()
  }
}
