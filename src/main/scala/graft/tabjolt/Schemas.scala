package graft.tabjolt

import org.apache.spark.sql.types._

/** Table schemas of the reference's four Vertica tables (SURVEY.md §1.2).
  *
  * All data columns are deliberately `StringType`: the reference stores
  * stringly-typed varchar and validates+casts at query time with
  * `REGEXP_LIKE(x,'^[0-9]+$')` guards (tabjolt_email.py:383-387), and that
  * behavior — e.g. the JTL header row entering the table as data and being
  * screened out by the numeric guards — is part of the query semantics
  * (SURVEY.md §1.3-1.4). Typing the read "helpfully" would change results.
  *
  * Every schema ends with the corrupt-record column `_rejected`, the
  * PERMISSIVE-mode landing spot for rows that fail arity/quoting — the
  * Spark analog of Vertica's `COPY ... REJECTED DATA` side file
  * (tabjolt_email.py:37).
  */
object Schemas {

  val Rejected = "_rejected"

  private def strings(names: String*): StructType =
    StructType(names.map(StructField(_, StringType)) :+
      StructField(Rejected, StringType))

  /** tabjolt.summary_line — per-run JMeter summary (summary_line.csv). */
  val summaryLine: StructType =
    strings("summary_metrix", "summary_value", "summary_timestamp")

  /** tabjolt.wincounter — Windows perfmon samples, 7 TSV cols
    * (wincounter.tsv). */
  val winCounter: StructType =
    strings("sample_epoch_ms", "host", "counter_category", "counter_name",
      "instance", "counter_value", "summary_timestamp")

  /** tabjolt.performance_samples — JMeter JTL rows, 13 CSV cols; the
    * header `t,lt,ts,s,lb,rc,rm,tn,dt,by,ng,na,` is loaded as data
    * (tabjolt_email.py:370, SURVEY.md §1.4). */
  val performanceSamples: StructType =
    strings("elapsed_time_ms", "latency_time_ms", "timestamp_ms",
      "success_indicator", "request_label", "response_code",
      "response_message", "thread_name", "data_type", "bytes_count",
      "grp_threads", "all_threads", "view_identity")

  /** tabjolt.thread_details — 6 TSV fields, loaded but never queried
    * (tabjolt_email.py:364; format at rejected.txt:1). */
  val threadDetails: StructType =
    strings("thread_id", "threads", "samples", "latency", "resp_time",
      "errors")
}
