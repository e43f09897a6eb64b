package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.Row

/** The schema-driven profiling API ([[Advanced.profile]]) over a table
  * the q33 gate does NOT cover — proves the operator is an API, not a
  * hardcoded orders query. Expected values cross-checked against DuckDB
  * on the same sf0.001 parquet. */
class ProfileSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def rowFor(rows: Array[Row], col: String): Row =
    rows.find(_.getString(0) == col)
      .getOrElse(fail(s"no profile row for $col"))

  test("profile(lineitem, subset): numeric-ness from schema, exact stats") {
    val out = Advanced.profile(Tables.lineitem(spark, sf),
      Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")).collect()
    assert(out.length == 4)
    assert(out.map(_.getString(0)).toSeq ==
      Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"),
      "output ordered by column_name")

    val qty = rowFor(out, "l_quantity")
    assert(qty.getLong(1) == 6000L)       // n_rows
    assert(qty.getLong(2) == 0L)          // n_nulls
    assert(qty.getDouble(4) == 1.0)       // min_num (double col -> numeric)
    assert(qty.getDouble(5) == 50.0)      // max_num

    val ok = rowFor(out, "l_orderkey")
    assert(ok.getLong(3) == 1473L)        // n_distinct (DuckDB cross-check)

    // string column: counted but NOT min/maxed (schema-derived)
    val rf = rowFor(out, "l_returnflag")
    assert(rf.getLong(3) == 3L)
    assert(rf.isNullAt(4) && rf.isNullAt(5))

    // timestamp column: not NumericType either
    val sd = rowFor(out, "l_shipdate")
    assert(sd.isNullAt(4) && sd.isNullAt(5))
  }

  test("profile with no column list profiles the full schema") {
    val df = Tables.lineitem(spark, sf)
    val out = Advanced.profile(df).collect()
    assert(out.length == df.schema.length)
    assert(out.map(_.getString(0)).toSet == df.schema.fields.map(_.name).toSet)
  }

  test("profile rejects unknown columns with a naming error") {
    val e = intercept[IllegalArgumentException] {
      Advanced.profile(Tables.lineitem(spark, sf), Seq("no_such_col"))
    }
    assert(e.getMessage.contains("no_such_col"))
  }

  test("profile counts nulls (dirty input)") {
    import org.apache.spark.sql.functions._
    val dirty = Tables.lineitem(spark, sf)
      .withColumn("qty_dirty",
        when(col("l_linenumber") === 1, lit(null)).otherwise(col("l_quantity")))
    val out = Advanced.profile(dirty, Seq("qty_dirty")).collect()
    val expectNulls = Tables.lineitem(spark, sf)
      .filter(col("l_linenumber") === 1).count()
    assert(out.head.getLong(2) == expectNulls)
    assert(out.head.getLong(1) == 6000L)
  }
}
