package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Cross-engine-deterministic aggregate arithmetic.
  *
  * Floating-point SUM/AVG are order-dependent: a Spark partial+final
  * hash aggregate and a DuckDB single-node aggregate fold doubles in
  * different orders and can differ in the last ulp — enough to break a
  * hash-match oracle, and at 1000-executor scale enough to make a job
  * non-reproducible between runs.
  *
  * The fix: sum in exact decimal (the test data's doubles carry ≤2
  * decimal places, so `CAST(x AS DECIMAL(18,2))` is lossless), then do a
  * single double division at the end. Decimal addition is associative and
  * commutative, so any shuffle/combine order yields the identical result
  * on any engine. This also scales: Spark decimal aggregation stays in
  * whole-stage codegen with partial (map-side) aggregation.
  */
object Exact {
  private val dec = DecimalType(18, 2)

  /** Exact SUM of a product a*(1-b) where both a and b carry ≤2 decimal
    * places. The operands are cast to decimal BEFORE multiplying — casting
    * the double product instead is a trap: a product's shortest decimal
    * repr often lands exactly on a .xx5 boundary, where Spark rounds
    * HALF_UP and DuckDB half-even, skewing a 60k-row sum by ~0.2. */
  def exactSumDiscounted(a: Column, b: Column): Column =
    sum(a.cast(dec) * (lit(1).cast(dec) - b.cast(dec))).cast(DoubleType)

  /** Exact SUM of a ≤2-decimal-place double column, returned as double.
    * Oracle mirror: `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`. */
  def exactSum(c: Column): Column =
    sum(c.cast(dec)).cast(DoubleType)

  /** Deterministic AVG: exact decimal sum, one double division.
    * Oracle mirror:
    * `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(x)`. */
  def exactAvg(c: Column): Column =
    sum(c.cast(dec)).cast(DoubleType) / count(c)
}
