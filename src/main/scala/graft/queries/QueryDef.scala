package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability exposed through the driver contract.
  *
  * @param name   stable key (shows up in CORRECTNESS/BENCH json)
  * @param build  DataFrame builder; second arg is the sf directory
  * @param sql    equivalent ANSI SQL for the DuckDB oracle over the same
  *               parquet tables; None when the op is not SQL-expressible
  *               (hash-seeded LSH, ML, …) — the driver then records a
  *               weaker rows-only check.
  *
  * Determinism contract (SURVEY §2.9): every query ends in a total
  * ORDER BY (unique tiebreakers, no nullable sort keys), floats are
  * ROUND()ed, timestamps rendered as UTC strings, and DuckDB-side types
  * are CAST to match the Spark output schema exactly.
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    sql: Option[String])
