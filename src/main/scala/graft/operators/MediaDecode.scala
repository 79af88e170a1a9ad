package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batched media decode / feature extraction over binary payload
  * columns (north-star multimodal plumbing).
  *
  * The decoder is REAL: payloads are PNG images decoded in-JVM via
  * `javax.imageio` (ships with the JDK — PNG/BMP/JPEG need no external
  * codecs). Audio/video remain out of scope in this container (no
  * codec libraries), but they would slot into the same partition-
  * batched shape: binary column in, fixed feature schema out.
  *
  * Fixture note: test payloads are synthesized per-row from `doc_id`
  * by [[synthPng]], a deterministic pixel formula. Because PNG is
  * lossless, decoding returns those exact pixels — which makes the
  * decoded width/height/channel-mean features SQL-expressible and
  * therefore ORACLE-CHECKABLE cross-engine (the DuckDB oracle reduces
  * the same formula with generate_series, no image library needed).
  */
object MediaDecode {

  // ImageIO defaults to a DISK-backed stream cache whose temp-file
  // creation serializes across threads — at 32 decode threads that
  // contention dominates the actual pixel work. In-memory caching is
  // strictly better for our byte-array payloads.
  javax.imageio.ImageIO.setUseCache(false)

  final case class ImageFeatures(
      doc_id: Long,
      width: Int,
      height: Int,
      channels: Int,
      mean_r: Double,
      mean_g: Double,
      mean_b: Double)

  /** Deterministic RGB test image for a doc id:
    * w = 8 + id%9, h = 8 + id%7, and channel values
    * r=(7·id+x+y)%256, g=(11·id+2x+3y)%256, b=(13·id+x+2y)%256 —
    * chosen so per-channel means are exactly reproducible in SQL.
    */
  def synthPng(docId: Long): Array[Byte] = {
    val w = (8 + docId % 9).toInt
    val h = (8 + docId % 7).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((docId * 7 + x + y) % 256).toInt
        val g = ((docId * 11 + 2 * x + 3 * y) % 256).toInt
        val b = ((docId * 13 + x + 2 * y) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  val synthPngUdf = udf(synthPng _)

  /** Real in-JVM decode of one PNG/BMP/JPEG payload. */
  def decodeImage(payload: Array[Byte]): BufferedImage =
    ImageIO.read(new ByteArrayInputStream(payload))

  /** Partition-batched decode + feature extraction: one pass per
    * partition, constant memory per task, fixed output schema (the
    * `mapInPandas`-equivalent batch shape in Scala). Input columns:
    * (doc_id, payload: binary).
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (docId, payload) =>
          val img = decodeImage(payload)
          val (w, h) = (img.getWidth, img.getHeight)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xff
              sg += (rgb >> 8) & 0xff
              sb += rgb & 0xff
              x += 1
            }
            y += 1
          }
          val n = (w * h).toDouble
          def r6(v: Double): Double = math.round(v * 1e6) / 1e6
          ImageFeatures(docId, w, h, img.getRaster.getNumBands,
            r6(sr / n), r6(sg / n), r6(sb / n))
        }
      }
      .toDF()
      .orderBy(col("doc_id").asc_nulls_last)
  }

  /** Deterministic per-frame RGB image for a (doc, frame) pair: the
    * video-fixture analog of [[synthPng]] — all frames of a doc share
    * dimensions, and every channel uses the same formula
    * v = (7·id + 11·frame + x + y) % 256 so per-frame means are exactly
    * reproducible in SQL.
    */
  def synthFramePng(docId: Long, frame: Int): Array[Byte] = {
    val w = (8 + docId % 9).toInt
    val h = (8 + docId % 7).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((docId * 7 + frame * 11 + x + y) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** A minimal multi-frame container ("video"): big-endian
    * [int32 frameCount][int32 len, PNG bytes]× — length-prefixed real
    * PNG frames, 4 + id%5 frames per doc.
    */
  def synthVideo(docId: Long): Array[Byte] = {
    val nFrames = (4 + docId % 5).toInt
    val frames = (0 until nFrames).map(f => synthFramePng(docId, f))
    val buf = java.nio.ByteBuffer.allocate(4 + frames.map(_.length + 4).sum)
    buf.putInt(nFrames)
    frames.foreach { b => buf.putInt(b.length); buf.put(b) }
    buf.array()
  }

  val synthVideoUdf = udf(synthVideo _)

  final case class FrameFeatures(
      doc_id: Long, frame_idx: Int, width: Int, height: Int, mean_px: Double)

  /** Frame sampling: walk the container index, decode ONLY every
    * `step`-th frame (the skipped frames' bytes are never parsed —
    * exactly how a production sampler avoids paying full-video decode),
    * and emit per-sampled-frame features. Partition-batched like the
    * other decoders.
    */
  def sampleFrames(media: DataFrame, step: Int = 2): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (docId, payload) =>
        val buf = java.nio.ByteBuffer.wrap(payload)
        val nFrames = buf.getInt()
        (0 until nFrames).flatMap { f =>
          val len = buf.getInt()
          if (f % step != 0) {
            buf.position(buf.position() + len) // skip without decoding
            None
          } else {
            val bytes = new Array[Byte](len)
            buf.get(bytes)
            val img = decodeImage(bytes)
            val (w, h) = (img.getWidth, img.getHeight)
            var s = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                s += img.getRGB(x, y) & 0xff // channels are identical
                x += 1
              }
              y += 1
            }
            Some(FrameFeatures(docId, f, w, h,
              math.round(s.toDouble / (w * h) * 1e6) / 1e6))
          }
        }
      }
      .toDF()
      .orderBy(col("doc_id").asc_nulls_last, col("frame_idx").asc_nulls_last)
  }

  /** Real resize: area-averaged thumbnail (tw×th) with floor-block
    * boxes — thumb pixel (i,j) averages source x∈[⌊i·w/tw⌋,⌊(i+1)·w/tw⌋).
    * Deterministic integer boxes (no interpolation engine variance);
    * emits the thumb's per-channel grand mean + a payload-shape column.
    */
  def resizeThumbs(media: DataFrame, tw: Int = 4, th: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (docId, payload) =>
          val img = decodeImage(payload)
          val (w, h) = (img.getWidth, img.getHeight)
          val thumb = Array.ofDim[Double](th, tw)
          var j = 0
          while (j < th) {
            var i = 0
            while (i < tw) {
              val (x0, x1) = (i * w / tw, (i + 1) * w / tw)
              val (y0, y1) = (j * h / th, (j + 1) * h / th)
              var s = 0L; var n = 0
              var y = y0
              while (y < y1) {
                var x = x0
                while (x < x1) {
                  val rgb = img.getRGB(x, y)
                  s += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
                  n += 3
                  x += 1
                }
                y += 1
              }
              thumb(j)(i) = s.toDouble / n
              i += 1
            }
            j += 1
          }
          val flat = thumb.flatten
          (docId, tw, th,
            math.round(flat.sum / flat.length * 1e6) / 1e6,
            math.round(flat.max * 1e6) / 1e6)
        }
      }
      .toDF("doc_id", "thumb_w", "thumb_h", "thumb_mean", "thumb_max")
      .orderBy(col("doc_id").asc_nulls_last)
  }

  /** Textured deterministic test image for the perceptual-hash fixture:
    * unlike [[synthPng]]'s linear gradient (which every dHash sees as
    * the same ramp), the per-id quadratic texture coefficients give
    * each id a DISTINCT block-mean profile (measured: nearest
    * cross-image Hamming 16 of 64 bits). Dimensions are multiples of
    * the 9x8 dHash grid so floor blocks aggregate exactly the same
    * source pixels at any integer scale — the property that makes the
    * 2x variant a Hamming-0 twin.
    *   w = 9*(1+id%3), h = 8*(1+id%2);
    *   r = (7id  + (id%13+2)x² + (id%11+3)y² + xy)  % 256
    *   g = (11id + (id%7+2)x²  + (id%17+1)y  + 2xy) % 256
    *   b = (13id + (id%5+3)y²  + (id%19+1)x  + xy)  % 256
    */
  def synthPngTextured(docId: Long, scale: Int = 1): Array[Byte] = {
    val w = (9 * (1 + docId % 3)).toInt * scale
    val h = (8 * (1 + docId % 2)).toInt * scale
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val sx = x / scale; val sy = y / scale
        val r = ((docId * 7 + (docId % 13 + 2) * sx * sx
          + (docId % 11 + 3) * sy * sy + sx * sy) % 256).toInt
        val g = ((docId * 11 + (docId % 7 + 2) * sx * sx
          + (docId % 17 + 1) * sy + 2 * sx * sy) % 256).toInt
        val b = ((docId * 13 + (docId % 5 + 3) * sy * sy
          + (docId % 19 + 1) * sx + sx * sy) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  val synthPngTexturedUdf = udf((id: Long) => synthPngTextured(id, 1))
  val synthPngTextured2xUdf = udf((id: Long) => synthPngTextured(id, 2))

  /** Fixed 16x16 textured image for the quality gate; `blur` replaces
    * every 2x2 block with its per-channel floor-average (a genuine
    * low-pass: sharpness drops, luma barely moves) — the blur twin a
    * quality screen must reject. Even dimensions keep the block
    * average SQL-mirrorable with no edge clamping.
    */
  def synthQualityPng(docId: Long, blur: Boolean): Array[Byte] = {
    val n = 16
    def ch(k: Int, x: Int, y: Int): Int = (k match {
      case 0 => (docId * 7 + (docId % 13 + 2) * x * x
        + (docId % 11 + 3) * y * y + x * y) % 256
      case 1 => (docId * 11 + (docId % 7 + 2) * x * x
        + (docId % 17 + 1) * y + 2 * x * y) % 256
      case _ => (docId * 13 + (docId % 5 + 3) * y * y
        + (docId % 19 + 1) * x + x * y) % 256
    }).toInt
    def chAt(k: Int, x: Int, y: Int): Int =
      if (!blur) ch(k, x, y)
      else {
        val (bx, by) = ((x / 2) * 2, (y / 2) * 2)
        (ch(k, bx, by) + ch(k, bx + 1, by) + ch(k, bx, by + 1)
          + ch(k, bx + 1, by + 1)) / 4
      }
    val img = new BufferedImage(n, n, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < n) {
      var x = 0
      while (x < n) {
        img.setRGB(x, y,
          (chAt(0, x, y) << 16) | (chAt(1, x, y) << 8) | chAt(2, x, y))
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  val synthQualityPngUdf = udf((id: Long) => synthQualityPng(id, blur = false))
  val synthQualityPngBlurUdf = udf((id: Long) => synthQualityPng(id, blur = true))

  final case class ImageQuality(
      doc_id: Long, n_px: Int, sum_g: Long, sum_g2: Long,
      lap_sum: Long, n_interior: Int)

  /** Image-quality statistics from REAL decode: per-pixel luma
    * g = r+g+b as exact integers, corpus-gate ingredients = luma
    * sum/sum-of-squares (brightness + RMS contrast) and the L1
    * Laplacian |4g − left − right − up − down| over interior pixels
    * (the variance-of-Laplacian blur detector's exact-integer L1
    * sibling). One pass per image, constant state.
    */
  def imageQuality(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (docId, payload) =>
          val img = decodeImage(payload)
          val (w, h) = (img.getWidth, img.getHeight)
          val g = Array.ofDim[Int](w, h)
          var sumG = 0L; var sumG2 = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val v = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              g(x)(y) = v
              sumG += v
              sumG2 += v.toLong * v
              x += 1
            }
            y += 1
          }
          var lap = 0L
          y = 1
          while (y < h - 1) {
            var x = 1
            while (x < w - 1) {
              lap += math.abs(
                4L * g(x)(y) - g(x - 1)(y) - g(x + 1)(y) - g(x)(y - 1) - g(x)(y + 1))
              x += 1
            }
            y += 1
          }
          ImageQuality(docId, w * h, sumG, sumG2, lap, (w - 2) * (h - 2))
        }
      }
      .toDF()
  }

  final case class DHashRow(doc_id: Long, w: Int, h: Int, h1: Long, h2: Long)

  /** Perceptual difference hash (dHash, the industry-standard cheap
    * image near-dup fingerprint): REAL decode, 9x8 floor-block
    * area-averaged grayscale grid (gray = r+g+b as an exact integer
    * sum), bit (j*8+i) = 1 iff block mean [j][i] > [j][i+1] — compared
    * as cross-multiplied integer rationals so unequal block sizes
    * never touch floating point — packed as TWO 32-bit halves (every
    * shift < 63; DuckDB's BIGINT << 63 errors, the Bloom-lane
    * precedent). Requires image width >= 9 so no grid column is empty.
    * Hamming distance = bit_count(h1 xor h1') + bit_count(h2 xor h2').
    */
  /** The dHash core over a decoded image: 9x8 floor-block grid of
    * exact-integer gray sums, cross-multiplied mean comparisons, two
    * 32-bit halves. Shared by the still-image and per-frame paths.
    */
  private def dhashOf(img: BufferedImage): (Long, Long) = {
    val (w, h) = (img.getWidth, img.getHeight)
    require(w >= 9 && h >= 8, s"dHash grid needs w>=9, h>=8; got ${w}x$h")
    val s = Array.ofDim[Long](8, 9)
    val n = Array.ofDim[Long](8, 9)
    var j = 0
    while (j < 8) {
      var i = 0
      while (i < 9) {
        val (x0, x1) = (i * w / 9, (i + 1) * w / 9)
        val (y0, y1) = (j * h / 8, (j + 1) * h / 8)
        var acc = 0L; var cnt = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            acc += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            cnt += 1
            x += 1
          }
          y += 1
        }
        s(j)(i) = acc; n(j)(i) = cnt
        i += 1
      }
      j += 1
    }
    var h1 = 0L; var h2 = 0L
    j = 0
    while (j < 8) {
      var i = 0
      while (i < 8) {
        // mean[j][i] > mean[j][i+1] as exact integer rationals
        if (s(j)(i) * n(j)(i + 1) > s(j)(i + 1) * n(j)(i)) {
          val bit = j * 8 + i
          if (bit < 32) h1 |= 1L << bit else h2 |= 1L << (bit - 32)
        }
        i += 1
      }
      j += 1
    }
    (h1, h2)
  }

  /** Square textured frame for the spectral-hash fixture: 32·scale ×
    * 32·scale with the same per-id quadratic texture as
    * [[synthPngTextured]] (sx = x/scale, so a scale-2 payload is the
    * pixel-doubled re-encode of the scale-1 image).
    */
  def synthPngTextured32(docId: Long, scale: Int): Array[Byte] = {
    val n = 32 * scale
    val img = new BufferedImage(n, n, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < n) {
      var x = 0
      while (x < n) {
        val sx = x / scale; val sy = y / scale
        val r = ((docId * 7 + (docId % 13 + 2) * sx * sx
          + (docId % 11 + 3) * sy * sy + sx * sy) % 256).toInt
        val g = ((docId * 11 + (docId % 7 + 2) * sx * sx
          + (docId % 17 + 1) * sy + 2 * sx * sy) % 256).toInt
        val b = ((docId * 13 + (docId % 5 + 3) * sy * sy
          + (docId % 19 + 1) * sx + sx * sy) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  val synthPngTextured32Udf = udf((id: Long) => synthPngTextured32(id, 1))
  val synthPngTextured32x2Udf = udf((id: Long) => synthPngTextured32(id, 2))

  final case class WhtHashRow(doc_id: Long, w: Int, h: Int, hw: Long)

  /** pHash-style SPECTRAL perceptual hash over the Walsh-Hadamard
    * transform (the exact-integer sibling of the DCT pHash — WHT is
    * what video-hashing standards use when they need a transform
    * without float drift): the decoded image block-SUM-downsamples to
    * a 32×32 integer grayscale grid (a k× pixel-doubled re-encode
    * scales every grid cell — and therefore every coefficient and
    * their median — by exactly k², leaving the sign pattern
    * invariant), the 8×8 low-frequency WHT coefficients
    * C(u,v) = Σ g(x,y)·(−1)^(popcount(x∧u)+popcount(y∧v)) are exact
    * integer sums, and bit i is coefficient-above-median over the 63
    * AC coefficients (median = 32nd smallest of 63 — an exact order
    * statistic, never interpolated).
    */
  def whtHashOf(img: BufferedImage): Long = {
    val n = 32
    val f = img.getWidth / n
    require(img.getWidth == n * f && img.getHeight == n * f,
      s"whtHash expects a square multiple of 32, got ${img.getWidth}x${img.getHeight}")
    val g = Array.ofDim[Long](n, n)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        g(y / f)(x / f) +=
          ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    val coeffs = new Array[Long](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0L
        var yy = 0
        while (yy < n) {
          var xx = 0
          while (xx < n) {
            val parity = (java.lang.Integer.bitCount(xx & u)
              + java.lang.Integer.bitCount(yy & v)) & 1
            s += (if (parity == 0) g(yy)(xx) else -g(yy)(xx))
            xx += 1
          }
          yy += 1
        }
        coeffs(u * 8 + v) = s
        v += 1
      }
      u += 1
    }
    val ac = coeffs.drop(1)
    val med = ac.sorted.apply(31)
    var hw = 0L
    var i = 0
    while (i < 63) {
      if (ac(i) > med) hw |= (1L << i)
      i += 1
    }
    hw
  }

  def whtHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (docId, payload) =>
          val img = decodeImage(payload)
          WhtHashRow(docId, img.getWidth, img.getHeight, whtHashOf(img))
        }
      }
      .toDF()
  }

  def dHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (docId, payload) =>
          val img = decodeImage(payload)
          val (h1, h2) = dhashOf(img)
          DHashRow(docId, img.getWidth, img.getHeight, h1, h2)
        }
      }
      .toDF()
  }

  /** Textured frame for the video-fingerprint fixture: same per-id
    * quadratic-texture idea as [[synthPngTextured]] with a
    * frame-content term, grid-aligned dims.
    *   gray channels (fc = frame content index):
    *   r = (7id  + 19fc + (id%13+2)x² + ((id+fc)%11+3)y² + xy)  % 256
    *   g = (11id + 23fc + (id%7+2)x²  + ((id+fc)%17+1)y  + 2xy) % 256
    *   b = (13id + 29fc + (id%5+3)y²  + ((id+fc)%19+1)x  + xy)  % 256
    */
  def synthTexturedFramePng(docId: Long, fc: Int): Array[Byte] = {
    val w = (9 * (1 + docId % 3)).toInt
    val h = (8 * (1 + docId % 2)).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((docId * 7 + 19L * fc + (docId % 13 + 2) * x * x
          + ((docId + fc) % 11 + 3) * y * y + x * y) % 256).toInt
        val g = ((docId * 11 + 23L * fc + (docId % 7 + 2) * x * x
          + ((docId + fc) % 17 + 1) * y + 2 * x * y) % 256).toInt
        val b = ((docId * 13 + 29L * fc + (docId % 5 + 3) * y * y
          + ((docId + fc) % 19 + 1) * x + x * y) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Textured video container: 6 + id%3 content frames; `rep` repeats
    * each frame (a frame-rate-doubled re-encode of the SAME video —
    * the distinct frame-hash SET is identical, which is what a
    * frame-set fingerprint must be invariant to).
    */
  def synthTexturedVideo(docId: Long, rep: Int = 1): Array[Byte] = {
    val nContent = (6 + docId % 3).toInt
    val frames = (0 until nContent * rep)
      .map(f => synthTexturedFramePng(docId, f / rep))
    val buf = java.nio.ByteBuffer.allocate(4 + frames.map(_.length + 4).sum)
    buf.putInt(frames.length)
    frames.foreach { b => buf.putInt(b.length); buf.put(b) }
    buf.array()
  }

  val synthTexturedVideoUdf = udf((id: Long) => synthTexturedVideo(id, 1))
  val synthTexturedVideo2xUdf = udf((id: Long) => synthTexturedVideo(id, 2))

  /** Scene-structured video container for the shot-boundary operator:
    * S = 3 + id%3 scenes of L = 2 + id%2 frames each; every frame in
    * a scene renders the SAME textured content (fc = scene·17 — the
    * stride keeps consecutive scenes' modular texture coefficients
    * apart), so within-scene consecutive frames hash identically and
    * scene boundaries are exactly the frame pairs whose dHashes
    * differ.
    */
  def synthSceneVideo(docId: Long): Array[Byte] = {
    val nScenes = (3 + docId % 3).toInt
    val sceneLen = (2 + docId % 2).toInt
    val frames = (0 until nScenes * sceneLen)
      .map(f => synthTexturedFramePng(docId, (f / sceneLen) * 17))
    val buf = java.nio.ByteBuffer.allocate(4 + frames.map(_.length + 4).sum)
    buf.putInt(frames.length)
    frames.foreach { b => buf.putInt(b.length); buf.put(b) }
    buf.array()
  }

  val synthSceneVideoUdf = udf(synthSceneVideo _)

  final case class FrameHash(doc_id: Long, frame_idx: Int, h1: Long, h2: Long)

  /** Per-frame dHash over the video container: walk the length-prefixed
    * index, decode every frame, emit (doc_id, frame_idx, h1, h2) — the
    * relation whose DISTINCT (h1, h2) set is the video's fingerprint.
    */
  def videoDHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (docId, payload) =>
        val buf = java.nio.ByteBuffer.wrap(payload)
        val nFrames = buf.getInt()
        (0 until nFrames).map { f =>
          val len = buf.getInt()
          val bytes = new Array[Byte](len)
          buf.get(bytes)
          val (h1, h2) = dhashOf(decodeImage(bytes))
          FrameHash(docId, f, h1, h2)
        }
      }
      .toDF()
  }
}
