package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation pipeline operators (PipelineQueries):
  * repetition gate, corpus chunk dedup, PII scrub, URL dedup, sequence
  * packing, language sampling, and the REAL WAV audio decoder.
  */
class PipelineSpec extends AnyFunSuite {
  import TestSpark._

  test("audio decode is REAL: javax.sound round-trips the synthetic WAVs") {
    // byte-level: encode then decode one payload and compare samples
    val wav = operators.AudioDecode.synthWav(5L)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val raw = ais.readAllBytes()
    val decoded = Array.tabulate(raw.length / 2)(i =>
      ((raw(2 * i + 1).toInt << 8) | (raw(2 * i) & 0xff)).toShort)
    assert(decoded.sameElements(operators.AudioDecode.synthSamples(5L)))
    // frame-level features from the distributed path match the formula
    val feats = SparkEntry.queries("m_audio_features")(spark, sf).collect()
    assert(feats.nonEmpty)
    feats.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Int]("n_samples") == (800 + id % 401).toInt)
      assert(r.getAs[Int]("sample_rate") == 8000)
      assert(r.getAs[Long]("peak") <= 1024L)
    }
    // the decoder really parses bytes: garbage must not decode
    intercept[Exception] {
      javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(Array[Byte](9, 9, 9)))
    }
  }

  test("frame sampling decodes ONLY sampled frames (skipped bytes never parsed)") {
    import spark.implicits._
    import operators.MediaDecode
    val video = MediaDecode.synthVideo(7L)
    // locate frame 1 (skipped at step=2) and trash its PNG bytes,
    // keeping the length prefix intact
    val buf = java.nio.ByteBuffer.wrap(video)
    buf.getInt() // frame count
    val len0 = buf.getInt(); buf.position(buf.position() + len0)
    val len1At = buf.position(); val len1 = buf.getInt()
    val corrupted = video.clone()
    java.util.Arrays.fill(corrupted, len1At + 4, len1At + 4 + len1, 0x5a.toByte)
    val out = MediaDecode.sampleFrames(
      Seq((7L, corrupted)).toDF("doc_id", "payload")).collect()
    // sampler never touched the corrupted frame: evens decode fine
    assert(out.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 2, 4))
    // but corrupting a SAMPLED frame fails loudly (it IS decoded)
    val len0At = 4
    val corrupted0 = video.clone()
    java.util.Arrays.fill(corrupted0, len0At + 4, len0At + 4 + len0, 0x5a.toByte)
    intercept[Exception] {
      MediaDecode.sampleFrames(
        Seq((7L, corrupted0)).toDF("doc_id", "payload")).collect()
    }
  }

  test("repetition gate: keep flag is exactly the threshold predicate") {
    val rows = SparkEntry.queries("n_repetition_filter")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // the gate is defined on the surfaced (rounded) metrics, so the
      // flag must be recomputable from the output columns alone
      val expected = r.getAs[Double]("top_word_frac") <= 0.12 &&
        r.getAs[Double]("dup_bigram_frac") <= 0.05
      assert(r.getAs[Boolean]("keep") == expected)
    }
  }

  test("corpus chunk dedup: every reported doc lost at least one chunk") {
    val rows = SparkEntry.queries("n_line_dedup")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("n_kept") < r.getAs[Int]("n_chunks"))
      assert(r.getAs[Int]("n_kept") >= 0)
      assert(r.getAs[String]("clean_digest").length == 32)
    }
  }

  test("PII scrub: counts found and the redaction removes every match") {
    val rows = SparkEntry.queries("n_pii_scrub")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("n_emails") >= 1)
      assert(r.getAs[Int]("n_phones") >= 1)
      assert(r.getAs[Int]("n_ips") >= 1)
    }
    // direct check that redaction is total on a sample string
    val red = java.util.regex.Pattern
      .compile("""[a-z0-9._]+@[a-z0-9.]+[a-z]""").matcher(
        "quick fox contact user7@mail.example.com or +1-555-0007 from 10.7.0.7"
          .replaceAll("""[a-z0-9._]+@[a-z0-9.]+[a-z]""", "<EMAIL>"))
    assert(!red.find())
  }

  test("URL dedup: normalization only ever collapses") {
    val rows = SparkEntry.queries("n_url_dedup")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_norm_distinct") <= r.getAs[Long]("n_raw_distinct"))
      val cr = r.getAs[Double]("collapse_ratio")
      assert(cr >= 0.0 && cr <= 1.0)
    }
    assert(rows.exists(_.getAs[Double]("collapse_ratio") > 0.0),
      "fixture should produce at least one actual collapse")
  }

  test("sequence packing: two-level cumsum ≡ naive global window") {
    val packed = SparkEntry.queries("n_seq_packing")(spark, sf).collect()
    assert(packed.nonEmpty)
    // naive single-window reference (fine at test scale, not at 100 TB)
    val d = T(spark, sf, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("t"))
    val g = Window.orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = d.withColumn("cum", sum(col("t")).over(g))
      .withColumn("bin_id", ((col("cum") - col("t")) / 2048L).cast("long"))
      .groupBy("bin_id").agg(count(lit(1)).as("n_docs"), sum(col("t")).as("sum_tokens"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    packed.foreach { r =>
      val (nd, st) = naive(r.getAs[Long]("bin_id"))
      assert(r.getAs[Long]("n_docs") == nd && r.getAs[Long]("sum_tokens") == st)
    }
    // all docs are packed exactly once
    assert(packed.map(_.getAs[Long]("n_docs")).sum == d.count())
  }

  test("language sampling: temperature shares form a distribution") {
    val rows = SparkEntry.queries("n_lang_sample")(spark, sf).collect()
    assert(rows.nonEmpty)
    val shares = rows.map(_.getAs[Double]("sample_share"))
    assert(math.abs(shares.sum - 1.0) < 1e-4)
    // alpha=0.5 flattens: no language's share exceeds its raw frequency
    // share unless it is a minority class
    val total = rows.map(_.getAs[Long]("n_docs")).sum.toDouble
    rows.foreach { r =>
      val rawShare = r.getAs[Long]("n_docs") / total
      val s = r.getAs[Double]("sample_share")
      if (rawShare > 1.0 / rows.length) assert(s < rawShare)
      else assert(s >= rawShare * 0.9)
    }
  }

  test("shard assignment is partitioning-invariant and balanced") {
    // the layout claim: shard ids derive from content only, so the same
    // docs land in the same shards no matter how the input is split
    val base = SparkEntry.queries("n_shard_assign")(spark, sf).collect()
      .map(r => r.getAs[Long]("shard") -> (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toMap
    val docs = T(spark, sf, "documents")
    Seq(1, 7).foreach { np =>
      val re = docs.repartition(np)
      re.createOrReplaceTempView("shard_probe")
      val again = spark.sql(
        """SELECT pmod(CAST(conv(substr(md5(text), 1, 8), 16, 10) AS BIGINT), 8) AS shard,
                  count(*) AS n_docs, CAST(sum(size(split(text, ' '))) AS BIGINT) AS n_tokens
           FROM shard_probe GROUP BY shard""").collect()
        .map(r => r.getAs[Long]("shard") -> (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toMap
      assert(again == base, s"shard histogram changed under repartition($np)")
    }
    // balance: 8 content-hash shards of a uniform corpus stay within 3x
    val counts = base.values.map(_._1)
    assert(counts.max <= 3 * math.max(1L, counts.min))
    // mixture weights: shares sum to 1, weights respect the 3x cap
    val mix = SparkEntry.queries("n_mixture_weights")(spark, sf).collect()
    assert(mix.nonEmpty)
    assert(math.abs(mix.map(_.getAs[Double]("token_share")).sum - 1.0) < 1e-4)
    mix.foreach(r => assert(r.getAs[Double]("resample_weight") <= 3.0))
  }
}
