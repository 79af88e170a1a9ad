package graft

import graft.operators.{CmsSketch, DecayedCounter, HllSketch, KmvSketch, SampleSketch}
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic laws of the round-10 mergeable sketches, checked over
  * random inputs — the properties that make them safe to shard and
  * stream: any partition of the input, folded per shard and merged,
  * must equal the single-pass result (exactly for KMV/CMS, within fp
  * tolerance for the half-life counter whose rescaling composes pow).
  */
class SketchPropertySpec extends AnyFunSuite {

  private def forSamples[A](gen: Gen[A], n: Int = 100)(check: A => Unit): Unit =
    (1 to n).foreach(_ => gen.sample.foreach(check))

  private val longSeqGen: Gen[List[Long]] =
    Gen.listOfN(60, Gen.chooseNum(0L, 1L << 52))

  test("KmvSketch: any sharding of any feed merges to the single-pass sketch") {
    val kmv = KmvSketch(16)
    forSamples(for {
      xs <- longSeqGen
      nShards <- Gen.chooseNum(1, 5)
    } yield (xs, nShards)) { case (xs, nShards) =>
      val single = xs.foldLeft(kmv.zero)(kmv.reduce)
      assert(single == xs.distinct.sorted.take(16))
      val sharded = xs.zipWithIndex.groupBy(_._2 % nShards).values
        .map(_.map(_._1).foldLeft(kmv.zero)(kmv.reduce))
        .foldLeft(kmv.zero)(kmv.merge)
      assert(sharded == single, s"shard-merge diverged for $xs")
      // estimate is exact below capacity
      if (xs.distinct.length < 16)
        assert(KmvSketch.estimate(single, 16) == xs.distinct.length.toDouble)
    }
  }

  test("HllSketch: any sharding of any feed max-merges to the single-pass registers") {
    val hll = HllSketch()
    forSamples(for {
      xs <- longSeqGen
      nShards <- Gen.chooseNum(1, 5)
    } yield (xs, nShards)) { case (xs, nShards) =>
      val single = xs.foldLeft(hll.zero)(hll.reduce)
      val sharded = xs.zipWithIndex.groupBy(_._2 % nShards).values
        .map(_.map(_._1).foldLeft(hll.zero)(hll.reduce))
        .foldLeft(hll.zero)(hll.merge)
      assert(sharded == single, s"shard-merge diverged")
      // idempotence: re-merging the result changes nothing (MAX law)
      assert(hll.merge(single, single) == single)
      // duplicates never change the registers
      val dup = (xs ++ xs).foldLeft(hll.zero)(hll.reduce)
      assert(dup == single)
      // rank bounds: every register in [0, 47]
      assert(single.forall(m => m >= 0 && m <= 47))
    }
  }

  test("SampleSketch: any sharding merges to the single-pass bottom-k sample") {
    val sk = SampleSketch(16)
    forSamples(for {
      xs <- longSeqGen
      nShards <- Gen.chooseNum(1, 5)
    } yield (xs, nShards)) { case (xs, nShards) =>
      val pairs = xs.map(h => (h, (h % 1000).toDouble))
      val single = pairs.foldLeft(sk.zero)(sk.reduce)
      assert(single == pairs.distinctBy(_._1).sortBy(_._1).take(16))
      val sharded = pairs.zipWithIndex.groupBy(_._2 % nShards).values
        .map(_.map(_._1).foldLeft(sk.zero)(sk.reduce))
        .foldLeft(sk.zero)(sk.merge)
      assert(sharded == single, "shard-merge diverged")
      // quantiles over the merged sample equal the single-pass ones
      if (single.nonEmpty)
        Seq(0.1, 0.5, 0.9).foreach { p =>
          assert(SampleSketch.quantile(sharded, p) == SampleSketch.quantile(single, p))
        }
    }
  }

  test("CmsSketch: cellwise shard merge equals single pass; estimates one-sided") {
    val cms = CmsSketch(d = 2, w = 32)
    val tokGen = Gen.listOfN(80, Gen.oneOf("a", "b", "c", "dd", "ee", "f", "g2"))
    forSamples(for {
      toks <- tokGen
      nShards <- Gen.chooseNum(1, 4)
    } yield (toks, nShards)) { case (toks, nShards) =>
      val single = toks.foldLeft(cms.zero)(cms.reduce)
      val sharded = toks.zipWithIndex.groupBy(_._2 % nShards).values
        .map(_.map(_._1).foldLeft(cms.zero)(cms.reduce))
        .foldLeft(cms.zero)(cms.merge)
      assert(sharded.toSeq == single.toSeq)
      // one-sided guarantee vs true counts, in every hash row
      toks.distinct.foreach { t =>
        val truth = toks.count(_ == t).toLong
        val est = cms.positions(t).zipWithIndex
          .map { case (c, i) => single(i * 32 + c) }.min
        assert(est >= truth, s"CMS under-counted $t: $est < $truth")
      }
      // total mass conservation per row
      (0 until 2).foreach { i =>
        assert(single.slice(i * 32, (i + 1) * 32).sum == toks.length.toLong)
      }
    }
  }

  test("DecayedCounter: shard merge matches direct computation within fp tolerance") {
    val h = 1000.0
    val ctr = DecayedCounter(h)
    val evGen = Gen.listOfN(40, for {
      t <- Gen.chooseNum(0L, 100000L)
      w <- Gen.chooseNum(1, 50)
    } yield (t, w.toDouble))
    forSamples(for {
      evs <- evGen
      nShards <- Gen.chooseNum(1, 4)
    } yield (evs, nShards)) { case (evs, nShards) =>
      if (evs.nonEmpty) {
        val tmax = evs.map(_._1).max
        def direct(es: Seq[(Long, Double)]): Double =
          es.map { case (t, w) => w * math.pow(2.0, -(tmax - t).toDouble / h) }.sum
        val truth = direct(evs)
        val single = ctr.finish(evs.foldLeft(ctr.zero)(ctr.reduce))
        val sRescaled = single._1 * math.pow(2.0, -(tmax - single._2).toDouble / h)
        assert(math.abs(sRescaled - truth) / math.max(truth, 1e-12) < 1e-9)
        val merged = evs.zipWithIndex.groupBy(_._2 % nShards).values
          .map(_.map(_._1).foldLeft(ctr.zero)(ctr.reduce))
          .foldLeft(ctr.zero)(ctr.merge)
        val mRescaled = merged._1 * math.pow(2.0, -(tmax - merged._2).toDouble / h)
        assert(math.abs(mRescaled - truth) / math.max(truth, 1e-12) < 1e-9,
          s"shard merge diverged: $mRescaled vs $truth")
      }
    }
  }
}
