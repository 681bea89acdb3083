package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart

/** Local-iteration sibling of [[PlanAuditSpec]]: execute the named
  * queries under the SQL-execution capture and DUMP the offending plan
  * fragments (context around each CartesianProduct /
  * BroadcastNestedLoopJoin) so the violating inner join can be located
  * and fixed. Usage: runMain graft.PlanProbe <sfDir> <query...> */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val plans = new ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onOtherEvent(event: SparkListenerEvent): Unit = event match {
        case e: SparkListenerSQLExecutionStart =>
          plans.add(e.physicalPlanDescription); ()
        case _ => ()
      }
    })
    args.drop(1).foreach { q =>
      plans.clear()
      SparkEntry.queries(q)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      org.apache.spark.graft.ListenerFlush.flush(spark.sparkContext)
      import scala.jdk.CollectionConverters._
      for (p <- plans.asScala; bad <- Seq("CartesianProduct", "BroadcastNestedLoopJoin")
           if p.contains(bad)) {
        println(s"===== $q : $bad =====")
        val lines = p.linesIterator.toArray
        lines.zipWithIndex.filter(_._1.contains(bad)).foreach { case (_, i) =>
          println(lines.slice(math.max(0, i - 6), math.min(lines.length, i + 7))
            .mkString("\n"))
          println("-----")
        }
      }
    }
    spark.stop()
  }
}
