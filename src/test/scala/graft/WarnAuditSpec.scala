package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.LoggerContext
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.LogEvent
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 brief #2: the bench tail must contain ZERO
  * `WindowExec: No Partition Defined` warns, so that any future warn
  * is a regression signal instead of known noise. This spec runs the
  * FULL query inventory with a log4j appender attached and fails on
  * the first unpartitioned window, naming the query that planned it.
  *
  * Round-8 verdict #2 extended the invariant: the inventory re-invokes
  * GraftExtensions.injectInto on one session (every SQL-declared query
  * calls it), which used to re-register the full dialect surface and
  * emit `replaced a previously registered function` WARNs in the bench
  * tail. Registration is now once-per-session and drop-before-register,
  * so this audit also fails on ANY function-replacement warn.
  */
class WarnAuditSpec extends AnyFunSuite {
  import TestSpark._

  test("no query plans an unpartitioned (single-task) window, no function-replacement warns") {
    // force session creation FIRST: Spark's Logging.initializeLogging
    // replaces a default log4j2 configuration with its own on first
    // use, which would silently drop an appender attached earlier
    spark.range(1).collect()
    val hits = ArrayBuffer[String]()
    @volatile var current = "<init>"
    val appender: AbstractAppender =
      new AbstractAppender("graft-warn-audit", null, null, true,
          Array.empty[org.apache.logging.log4j.core.config.Property]) {
        override def append(e: LogEvent): Unit =
          if (e.getLevel.isMoreSpecificThan(Level.WARN)) {
            val msg = e.getMessage.getFormattedMessage
            if (msg.contains("No Partition Defined"))
              hits.synchronized { hits += current }
            else if (msg.contains("replaced a previously registered function"))
              hits.synchronized { hits += s"$current[fn-replace]" }
            else if (msg.contains("is not supported in the query"))
              // round-12 verdict #1: HintErrorLogger silently drops
              // unsupported broadcast hints — the intended plan is NOT
              // what runs. Any drop is a regression.
              hits.synchronized { hits += s"$current[hint-drop]" }
          }
      }
    appender.start()
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    cfg.getRootLogger.addAppender(appender, Level.WARN, null)
    ctx.updateLoggers()
    try {
      // explicit double-injection probe: both calls must be silent
      // (first is drop-before-register, second is a per-session no-op)
      current = "injectInto-twice"
      GraftExtensions.injectInto(spark)
      GraftExtensions.injectInto(spark)
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        current = name
        fn(spark, sf).collect()
      }
    } finally {
      cfg.getRootLogger.removeAppender("graft-warn-audit")
      ctx.updateLoggers()
      appender.stop()
    }
    val byQuery = hits.synchronized { hits.toSeq }.groupBy(identity)
      .view.mapValues(_.size).toSeq.sortBy(-_._2)
    assert(byQuery.isEmpty,
      s"unpartitioned windows planned by: ${byQuery.mkString(", ")}")
  }
}
