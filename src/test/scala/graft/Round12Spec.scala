package graft

import graft.queries.Round12Queries
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12: the ANN-tier candidate contract is EXECUTABLE and proved
  * (VERDICT r11 ask #1).
  *
  * 1. On planted sides with true near neighbors, n_bitext_mining_ann's
  *    mutual-best pair set EQUALS the brute-force n_bitext_mining's —
  *    the claim the round-11 doc strings made in prose, now executed.
  * 2. On the synthetic corpus (whose cross-slice top pairs sit at
  *    cosine 0.10-0.41 — no near-neighbor signal), the candidate tier
  *    is measurably sub-cross-product and recall is REPORTED, not
  *    asserted: no sub-quadratic tier can reproduce brute force in
  *    that regime, and pretending otherwise would be a lie the planted
  *    test exists to avoid.
  */
class Round12Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Deterministic pseudo-random unit-ish vector for cluster `i`
    * (MD5-seeded, like every portable construction in the repo).
    */
  private def baseVec(i: Int): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until 64).map { d =>
      val h = md.digest(s"plant:$i:$d".getBytes("UTF-8"))
      val v = ((h(0) & 0xff) << 24) | ((h(1) & 0xff) << 16) |
        ((h(2) & 0xff) << 8) | (h(3) & 0xff)
      (Math.floorMod(v, 2001) - 1000) / 1000.0f
    }.toArray
  }

  /** 12 planted x/y pairs: x at vec_id=50i, y at 50i+25. Even pairs
    * are EXACT copies (identical signature, Hamming 0); odd pairs are
    * small perturbations (cosine ~0.999 — within the radius-2 probe
    * envelope). Clusters are mutually near-orthogonal random vectors,
    * so each side's true best partner is its own pair.
    *
    * For the label-noise vote, each cluster ALSO plants five exact
    * copies at 50i+1..50i+5 (ids ≢ 0,25 mod 50 — invisible to the
    * bitext x/y slices): a k=5 majority needs k same-label neighbors
    * to be guaranteed, because random 8-bit signatures collide within
    * Hamming≤2 at ~14.5% rate and a lone own-label vote can lose the
    * count-desc/label-asc tie-break to a chance two-cohabitant
    * cluster.
    */
  private lazy val plantedDir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_r12_planted").toString
    val rows = (0 until 12).flatMap { i =>
      val v = baseVec(i)
      val y =
        if (i % 2 == 0) v
        else {
          val p = baseVec(1000 + i)
          v.zip(p).map { case (a, b) => a + 0.02f * b }
        }
      Seq(Row(50L * i, v.toSeq, i), Row(50L * i + 25, y.toSeq, i)) ++
        (1 to 5).map(j => Row(50L * i + j, v.toSeq, i))
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r =>
          Row(r.get(0), r.getAs[Seq[Float]](1), r.get(2))), 2), schema)
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    tmp
  }

  private def mutualPairs(name: String, dir: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, dir)
      .filter(col("mutual") === 1)
      .select(col("xid"), col("yid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("planted near-duplicate sides: ANN mutual-best pairs EQUAL brute force") {
    val bf = mutualPairs("n_bitext_mining", plantedDir)
    val ann = mutualPairs("n_bitext_mining_ann", plantedDir)
    assert(bf.nonEmpty, "planted corpus produced no brute-force mutual pairs")
    assert(ann == bf, s"ANN mutual set $ann != brute force $bf")
    // and the planted pairs themselves are all mined
    val planted = (0 until 12).map(i => (50L * i, 50L * i + 25)).toSet
    assert(bf == planted, s"brute force mined $bf, expected the planted $planted")
  }

  test("corpus candidate tier is sub-cross-product; recall reported") {
    val dir = "/root/testdata/sf0.01"
    val e = T(spark, dir, "embeddings")
    val both = Round12Queries.withSig(
      e.filter(col("vec_id") % 50 === 0 || col("vec_id") % 50 === 25)
        .select(col("vec_id"), col("embedding")), "embedding")
    val xs = both.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("xid"), col("sig").as("xsig"))
    val ys = both.filter(col("vec_id") % 50 === 25)
      .select(col("vec_id").as("yid"), col("sig").as("ysig"))
    val nx = xs.count(); val ny = ys.count()
    val nCand = xs.withColumn("m", explode(typedLit(Round12Queries.probeMasks)))
      .select(col("xid"), col("xsig").bitwiseXOR(col("m")).as("psig"))
      .join(ys, col("psig") === col("ysig"))
      .select("xid", "yid").distinct().count()
    val ratio = nCand.toDouble / (nx * ny)
    assert(ratio < 0.5,
      s"candidate tier scored $nCand of ${nx * ny} pairs (ratio $ratio) - not sub-cross-product")
    val bf = mutualPairs("n_bitext_mining", dir)
    val ann = mutualPairs("n_bitext_mining_ann", dir)
    val recall = if (bf.isEmpty) 1.0 else (ann & bf).size.toDouble / bf.size
    info(f"sf0.01: candidates $nCand of ${nx * ny} (ratio $ratio%.3f); " +
      f"mutual-pair recall vs brute force $recall%.2f (${(ann & bf).size}/${bf.size}) " +
      "- low recall EXPECTED here: corpus cross-slice top pairs sit at cosine 0.10-0.41")
    // every ANN mutual pair must at least be a real candidate-scored pair
    assert(ann.forall { case (x, y) => x % 50 == 0 && y % 50 == 25 })
  }

  test("label-noise ANN vote: planted pairs vote their own label; corpus rollup is probe-complete") {
    // planted: each probe's bucket cohabitants include five exact
    // own-label copies (cosine 1.0 beats any chance collision), so
    // the k=5 vote is unanimous and no planted probe is flagged
    val planted = SparkEntry.queries("n_label_noise_ann")(spark, plantedDir).collect()
    assert(planted.length == 12)
    planted.foreach { r =>
      assert(r.getAs[Integer]("maj_label") == r.getAs[Integer]("label"),
        s"planted probe ${r.get(0)} voted ${r.get(2)} against own ${r.get(1)}")
      assert(!r.getAs[Boolean]("flagged"))
      assert(r.getAs[Long]("n_agree") == 5L,
        s"planted probe ${r.get(0)} vote not unanimous: ${r.getAs[Long]("n_agree")}")
    }
    // corpus: every probe surfaces (zero-cohabitant probes included),
    // votes bounded by k=5
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("n_label_noise_ann")(spark, dir).collect()
    val nProbes = T(spark, dir, "embeddings").filter(col("vec_id") % 50 === 0).count()
    assert(rows.length == nProbes)
    assert(rows.forall(r => r.getAs[Long]("n_agree") <= 5))
  }

  test("decontam ANN screen: flags are a subset of brute-force flags, counts consistent") {
    val dir = "/root/testdata/sf0.01"
    val bf = SparkEntry.queries("n_decontam_semantic")(spark, dir)
      .select("bid", "n_contaminated").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ann = SparkEntry.queries("n_decontam_semantic_ann")(spark, dir)
      .select("bid", "n_contaminated").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // a screen can only UNDER-flag relative to brute force, never over
    ann.foreach { case (bid, n) =>
      assert(n <= bf.getOrElse(bid, 0),
        s"bid $bid: ANN flagged $n > brute force ${bf.getOrElse(bid, 0)}")
    }
    val bfTotal = bf.values.sum; val annTotal = ann.values.sum
    info(s"decontam screen recall at sf0.01: $annTotal/$bfTotal flagged pairs captured")
  }
}
