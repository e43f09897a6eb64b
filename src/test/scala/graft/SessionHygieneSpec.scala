package graft

/** Pins the no-caller-session-mutation discipline as a regression gate.
  *
  * The landmine class this guards: a loader or operator calling
  * `session.conf.set(...)` on the CALLER's session leaks that setting
  * into every other plan the session runs — r8's `withStatePartitions`
  * narrowed concurrent queries' shuffle partitions, and the r07
  * output-timestamp near-miss flipped 12/114 oracle dumps (PLANS.md).
  * Round 11 removed the last two mutation sites (Tables.events,
  * EventsStream.source); this spec fails if any future operator
  * reintroduces one on the paths a catalog run exercises.
  *
  * Method: snapshot the session's full runtime conf, run the touchiest
  * operators (events load via every loader, a streaming drain, the
  * stats-writing r06/r07 maintenance ops), and assert the conf map is
  * byte-identical after. Child sessions (Drain, statsWriter) may set
  * their OWN conf at creation — that is the prescribed discipline and
  * invisible to this snapshot. */
class SessionHygieneSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def confSnapshot(): Map[String, String] = spark.conf.getAll

  test("table loaders never mutate the caller session's conf") {
    val before = confSnapshot()
    Tables.loaders.foreach { case (_, load) => load(spark, sf).count() }
    assert(confSnapshot() == before)
  }

  test("streaming drains never mutate the caller session's conf") {
    val before = confSnapshot()
    streaming.EventsStream.hourlyAgg(spark, sf).count()
    Lifecycle.release(spark)
    assert(confSnapshot() == before)
  }

  test("stats-writing maintenance ops never mutate the caller session's conf") {
    val before = confSnapshot()
    operators.SourcesStreaming.r06.fn(spark, sf).count()
    operators.SourcesStreaming.r07.fn(spark, sf).count()
    Lifecycle.release(spark)
    assert(confSnapshot() == before)
  }
}
