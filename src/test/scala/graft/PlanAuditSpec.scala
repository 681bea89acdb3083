package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent}
import org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart

/** The EXECUTING half of the global plan audit (see [[PlanAudit]]): every
  * query whose construction runs real jobs — streaming twins, iterative
  * graph loops, training collects, scratch writers — is executed here
  * under a SQL-execution listener, and EVERY physical plan the run emits
  * (inner jobs included: k-means training, CC rounds, foreachBatch
  * bodies) is asserted free of `CartesianProduct`, with
  * `BroadcastNestedLoopJoin` only for allowlisted scalar/bounded crosses.
  *
  * This is the automated form of the round-10 manual plan sweep that
  * caught the KMV cartesian fallback: a regression that re-plans any
  * inner join as a shuffled cartesian now fails `sbt test`, not a human
  * read of PLANS.md. */
class PlanAuditSpec extends SparkSpec {

  private val dir = testDataDir("0.01")

  /** Capture physicalPlanDescription of every SQL execution — fires for
    * batch actions AND streaming micro-batches, unlike
    * QueryExecutionListener. */
  private class PlanCapture extends SparkListener {
    val plans = new ConcurrentLinkedQueue[String]()
    override def onOtherEvent(event: SparkListenerEvent): Unit = event match {
      case e: SparkListenerSQLExecutionStart => plans.add(e.physicalPlanDescription); ()
      case _ => ()
    }
  }

  private def violations(name: String, plan: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    if (plan.contains("CartesianProduct"))
      out += s"$name: shuffled cartesian"
    if (!PlanAudit.bnljAllowed.contains(name) &&
        plan.contains("BroadcastNestedLoopJoin"))
      out += s"$name: unexpected nested-loop join"
    out.toSeq
  }

  /** Run one eager query under the capture listener and return every
    * violation across all plans it executed. */
  private def auditOne(name: String): Seq[String] = {
    val cap = new PlanCapture
    spark.sparkContext.addSparkListener(cap)
    try {
      val df = SparkEntry.queries(name)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      org.apache.spark.graft.ListenerFlush.flush(spark.sparkContext)
      import scala.jdk.CollectionConverters._
      cap.plans.asScala.toSeq.flatMap(p => violations(name, p)).distinct
    } finally spark.sparkContext.removeSparkListener(cap)
  }

  test("seeded regression: the audit predicate catches a genuine cartesian") {
    val cap = new PlanCapture
    spark.sparkContext.addSparkListener(cap)
    try {
      val a = spark.range(0, 2000).toDF("a")
      val b = spark.range(0, 2000).toDF("b")
      // a real unconditioned cross of two above-broadcast-threshold
      // frames — exactly the plan shape the audit exists to forbid
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try a.crossJoin(b).write.format("noop").mode("overwrite").save()
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      org.apache.spark.graft.ListenerFlush.flush(spark.sparkContext)
      import scala.jdk.CollectionConverters._
      val hits = cap.plans.asScala.toSeq.flatMap(p => violations("seeded", p))
      assert(hits.nonEmpty,
        "the audit predicate failed to flag a deliberate CartesianProduct — " +
          "the whole suite would be vacuous")
    } finally spark.sparkContext.removeSparkListener(cap)
  }

  test("eager set matches the harness: no query escapes both audit halves") {
    // every harness query is either lazily audited by PlanSpec's global
    // audit or executed here — a stale `eager` entry (renamed/removed
    // query) would silently shrink coverage
    val stale = PlanAudit.eager -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"PlanAudit.eager names unknown queries: $stale")
  }

  // one test per eager query: failures pinpoint the query, and the suite
  // can be -z filtered to a single offender while fixing it
  for (name <- PlanAudit.eager.toSeq.sorted)
    test(s"$name: executed plans free of cartesians / unexpected BNLJs") {
      val hits = auditOne(name)
      assert(hits.isEmpty, hits.mkString("; "))
    }
}
