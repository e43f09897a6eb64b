package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Package-placed shim (the [[GraftColumns]] convention):
  * `classic.SparkSession.internalCreateDataFrame` is `private[sql]`, and
  * the iterative-loop executor ([[graft.operators.LoopExec]]) needs to
  * re-host an already-materialized frame on a sibling session (same
  * SparkContext, different SQLConf) WITHOUT the public
  * `createDataFrame(df.rdd, schema)` round-trip — that path deserializes
  * every InternalRow to an external Row and back, a full copy of the
  * loop state per hop that exists only to satisfy the public signature.
  * Only Spark's public artifact is referenced. */
object GraftBridge {
  /** Wrap `rows` (InternalRow-encoded, e.g. `df.queryExecution.toRdd` of
    * a checkpointed frame) as a DataFrame planned on `target`. The RDD is
    * shared, not copied — callers must hand in rows that are stable
    * (checkpointed/cached), exactly like Spark's own checkpoint wrap. */
  def internalCreateDataFrame(target: SparkSession, rows: RDD[InternalRow],
                              schema: StructType): DataFrame =
    target.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rows, schema)
}
