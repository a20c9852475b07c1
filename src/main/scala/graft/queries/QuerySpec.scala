package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability, registered for the driver's correctness gate.
  *
  * @param name   stable key (appears in CORRECTNESS_r{N}.json / BENCH_r{N}.json)
  * @param fn     (session, sfDir) => result DataFrame. Column names MUST match
  *               the oracle's exactly (the driver sorts columns by name and
  *               hashes values).
  * @param oracle equivalent ANSI SQL for DuckDB over the same parquet tables
  *               (bare table names: lineitem, orders, events, documents, ...).
  *               None => the driver records a weaker rows-only check.
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QuerySpec {
  /** Registry assembled by SparkEntry; each module contributes a list. */
  def toMaps(specs: Seq[QuerySpec])
      : (Map[String, (SparkSession, String) => DataFrame], Map[String, String]) = {
    val qs = specs.map(s => s.name -> s.fn).toMap
    val os = specs.flatMap(s => s.oracle.map(s.name -> _)).toMap
    (qs, os)
  }
}
