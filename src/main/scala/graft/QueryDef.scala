package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry for the driver's correctness gate.
  *
  * @param name   stable key; appears in CORRECTNESS_r{N}.json
  * @param fn     the Spark implementation: (session, sfDir) => result
  * @param oracle equivalent ANSI SQL executed by DuckDB over the same
  *               parquet tables (bare table names). None => the driver
  *               records a weaker rows-only check (reserved for ops whose
  *               semantics are not SQL-expressible).
  *
  * Determinism contract (both sides):
  *  - every result has a total ORDER BY (unique tiebreak column);
  *  - column names identical between Spark and oracle;
  *  - double aggregates use the [[graft.functions.Exact]] decimal-sum
  *    pattern so aggregation order cannot perturb values.
  *
  * Most oracles are static SQL. An oracle that must reference run-time
  * state — s04's, which reads the corpus-fingerprinted IVF index dir the
  * query run itself published — supplies [[QueryDef.oracleLate]] instead:
  * Verify evaluates it with the sfDir it just ran, AFTER the queries
  * (so the referenced state exists).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    oracleLate: Option[String => String] = None)
