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
  */
class WarnAuditSpec extends AnyFunSuite {
  import TestSpark._

  test("no query plans an unpartitioned (single-task) window") {
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
          if (e.getLevel.isMoreSpecificThan(Level.WARN) &&
              e.getMessage.getFormattedMessage.contains("No Partition Defined"))
            hits.synchronized { hits += current }
      }
    appender.start()
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    cfg.getRootLogger.addAppender(appender, Level.WARN, null)
    ctx.updateLoggers()
    try {
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
