package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability: a named DataFrame query builder plus (when
  * SQL-expressible) an equivalent ANSI SQL oracle the driver runs in
  * DuckDB over the same tables. Oracle-less entries get a weaker
  * rows-only check.
  *
  * Parity rules (SURVEY.md §5): identical column aliases on both
  * sides; floats rounded to a fixed precision in BOTH engines; DuckDB
  * decimal literals cast to DOUBLE; deterministic ORDER BY.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])
