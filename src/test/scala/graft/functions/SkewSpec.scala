package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

class SkewSpec extends SparkSpec {

  test("salted two-phase aggregation equals direct aggregation exactly") {
    val sf = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, sf)
    val dec = DecimalType(18, 2)
    val direct = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(dec)).cast(DoubleType).as("s"))
      .orderBy(col("event_type")).collect().toSeq
    val salted = Skew.saltedAgg(ev, "event_type", col("event_id"), salts = 8)(
      "n" -> count(lit(1)),
      "s" -> sum(col("value").cast(dec)))
      .select(col("event_type"), col("n"),
        col("s").cast(DoubleType).as("s"))
      .orderBy(col("event_type")).collect().toSeq
    assert(salted == direct)
  }
}
