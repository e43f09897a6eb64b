package graft

/** The reference's API shape is SQL text (tabjolt_email.py:374-387); the
  * engine must accept the same style through spark.sql over registered
  * views and agree with the DataFrame programs. */
class ViewsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("SQL text equals the DataFrame program (pricing summary)") {
    Views.register(spark, sf)
    val sql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin).collect().toSeq
    val df = operators.Relational.q14.fn(spark, sf)
      .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
      .collect().toSeq
    assert(sql == df)
  }

  test("reference-style guarded SQL works verbatim (rlike + ilike + epoch)") {
    Views.register(spark, sf)
    val n = spark.sql(
      """SELECT event_id, CAST(regexp_extract(props, '[0-9]+', 0) AS INT) AS k
        |FROM events
        |WHERE props RLIKE '^\\{"k": [0-9]+\\}$'
        |  AND props ILIKE '%K%'
        |  AND timestamp_seconds(unix_millis(ts) / 1000) >= TIMESTAMP '2024-01-15 00:00:00'
        |ORDER BY event_id""".stripMargin).count()
    assert(n > 0)
  }

  test("native graft_dot is available to SQL after registration") {
    Views.register(spark, sf)
    val top = spark.sql(
      """SELECT a.vec_id, b.vec_id AS other,
        |       graft_dot(CAST(a.embedding AS ARRAY<DOUBLE>), CAST(b.embedding AS ARRAY<DOUBLE>)) AS dot
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |ORDER BY dot DESC, a.vec_id LIMIT 5""".stripMargin).collect()
    assert(top.length == 5)
    assert(top.forall(r => !r.isNullAt(2)))
  }
}
