package graft

/** Typed errors mirroring the reference's error enum
  * (reference: src/error.rs — invalid regex format/syntax, type mismatch,
  * unique-name exhaustion). Kept as exceptions so they compose with
  * Spark's own AnalysisException flow.
  */
sealed abstract class GraftError(msg: String) extends RuntimeException(msg)

object GraftError {
  /** Regex not `*` and not `^...$` (reference drop.rs/normalize.rs format check). */
  final case class InvalidRegexFormat(pattern: String)
      extends GraftError(s"Invalid regex format (expected `*` or `^...$$`): $pattern")

  final case class InvalidRegexSyntax(pattern: String, cause: String)
      extends GraftError(s"Invalid regex syntax: $pattern ($cause)")

  /** Regex matched a column whose dtype is not allowed for the operator
    * (reference normalize.rs InvalidDataTypeForRegex). */
  final case class InvalidDataTypeForRegex(column: String, dtype: String)
      extends GraftError(s"Column `$column` has non-String dtype $dtype but matched a String-only regex")

  /** Unique-name resolution gave up after maxAttempts suffixes
    * (reference data_filter.rs resolve_unique_column_name MAX_ATTEMPTS=1000). */
  final case class UniqueNameExhausted(base: String, attempts: Int)
      extends GraftError(s"Could not find unique name for `$base` after $attempts attempts")

  final case class UnsupportedFileExtension(ext: String)
      extends GraftError(s"Unsupported file extension: $ext")

  final case class DelimiterNotDetected(path: String)
      extends GraftError(s"Could not detect a CSV delimiter for $path")

  /** Bad command-line argument (reference error.rs PolarsViewError::
    * InvalidArgument — carried arg name + reason). */
  final case class InvalidArgument(argName: String, reason: String)
      extends GraftError(s"Invalid argument $argName: $reason")
}
