package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Multimodal.MediaRow

/** Perceptual fingerprints for the non-text modalities, plus the one
  * generic join that makes them searchable: an EXACT 64-bit hamming
  * near-dup pair join with pigeonhole-complete banding.
  *
  * A multimodal training corpus dedups images and audio the same way
  * it dedups text — by a compact content fingerprint robust to benign
  * re-encoding — but the candidate generation must never be all-pairs.
  * For hamming radius r there is a classical exact scheme (the
  * multi-index-hashing pigeonhole): split the hash into r+1 disjoint
  * bands. ≤ r differing bits cannot touch all r+1 bands, so AT LEAST
  * ONE band matches exactly — a band-keyed equi-join finds every such
  * pair (no LSH misses), and an exact `bit_count(xor)` rescore removes
  * false candidates. Using EXACTLY r+1 bands (not a fixed 8) makes
  * each band as wide — and its value space as large — as the radius
  * allows: radius 3 over 64 bits gives 4 bands of 65 536 values, so at
  * N items the expected bucket is N/65 536 and candidate volume is
  * ~N²/65 536 instead of the N²/256 a byte-banded split would pay.
  * The join shuffles on (band_idx, band_value) only; degenerate bands
  * (the all-black thumbnail, digital silence) fall under the same
  * absolute hot-bucket cap as every other bucket join in the repo
  * ([[Dedup.dropHotBuckets]]).
  *
  * Fingerprint producers:
  *  - [[dHash64]] — image difference hash: 9×8 bilinear downscale to
  *    integer Rec.601 grayscale, bit(y·8+x) = gray(x+1,y) > gray(x,y).
  *    Invariant to uniform brightness/contrast scaling and resolution;
  *    flips few bits under small local edits.
  *  - [[audioFingerprint64]] — energy-contour hash: the PCM clip is
  *    cut into 65 equal frames, bit i = energy(i+1) > energy(i).
  *    Gain-invariant (energy comparisons are scale-free) and
  *    sample-rate tolerant at fixed duration.
  *
  * Both producers run as `mapPartitions` over executor-side JDK
  * decoders (imageio / javax.sound) with the corrupt-payload drop
  * policy of [[Multimodal]]; no driver row ever holds media bytes.
  *
  * Reference context: no media surface in the reference; training-
  * pipeline extension (SURVEY §7.5 multimodal).
  */
object Fingerprint {

  /** The disjoint band projections of a fingerprint column:
    * (id, h, pos, band) — one row per band, `nBands` bands splitting
    * the low `bits` bits into near-equal contiguous chunks (the low
    * bands get the extra bit when it doesn't divide evenly). The
    * probe/index frames of every hamming join, exposed so a standing
    * index can persist its band table once and let batches join
    * against it — the band scheme (nBands, bits) is part of a
    * persisted index's on-disk contract. */
  def bandsOf(hashes: DataFrame, idCol: String, hashCol: String,
      bits: Int = 64, nBands: Int = 8): DataFrame = {
    require(bits > 0 && bits <= 64, s"bits must be in 1..64, got $bits")
    require(nBands > 0 && nBands <= bits,
      s"need 1..$bits bands for a $bits-bit hash, got $nBands")
    val base = bits / nBands
    val rem = bits % nBands
    // band i covers width_i = base (+1 for the first `rem` bands) bits
    val offsets = (0 until nBands).scanLeft(0) { (off, i) =>
      off + base + (if (i < rem) 1 else 0)
    }
    val slices = (0 until nBands).map { i =>
      val w = offsets(i + 1) - offsets(i)
      val mask = if (w == 64) -1L else (1L << w) - 1
      shiftright(col("h"), offsets(i)).bitwiseAND(lit(mask))
    }
    hashes
      .select(col(idCol).cast("long").as("id"), col(hashCol).cast("long").as("h"))
      .select(col("id"), col("h"), posexplode(array(slices: _*)).as(Seq("pos", "band")))
  }

  /** Exact near-dup pairs among `bits`-bit fingerprints: every (id_a <
    * id_b) pair with hamming distance ≤ `maxHamming`, provably equal
    * to the brute-force O(n²) scan when no hot-bucket cap engages
    * (pigeonhole over maxHamming+1 disjoint bands). The band count
    * adapts to the radius so each band keeps the largest value space
    * the radius allows; `maxHamming` must leave bands at least one bit
    * wide (< `bits`). */
  def hammingNearDupPairs(hashes: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int = 6, maxBucket: Int = Dedup.MaxBucket,
      what: String = "hammingNearDup", bits: Int = 64): DataFrame = {
    require(maxHamming >= 0 && maxHamming < bits,
      s"radius must be in 0..${bits - 1} for a $bits-bit hash, got $maxHamming")
    // the (id, h) projection feeds the cap scan and BOTH sides of the
    // self-join; materialize it once (16 bytes/row) so an expensive
    // upstream hash derivation (simhash over text, an image decode)
    // never runs three times
    val slim = hashes
      .select(col(idCol).cast("long").as("id"), col(hashCol).cast("long").as("h"))
      .localCheckpoint(true)
    val capped = Dedup.dropHotBuckets(
      bandsOf(slim, "id", "h", bits, nBands = maxHamming + 1),
      Seq("pos", "band"), maxBucket, what)
    // hamming is computed and filtered BEFORE the dedup exchange (r18,
    // guide §2.3 shuffle fewer bytes): bit_count is codegen'd and
    // id-determined, so filtering first drops every over-radius
    // collision pre-shuffle and the distinct carries 3 narrow columns
    // of survivors instead of (id, hash)×2 of every band collision.
    capped.select(col("pos"), col("band"), col("id").as("id_a"), col("h").as("h_a"))
      .join(capped.select(col("pos"), col("band"), col("id").as("id_b"), col("h").as("h_b")),
        Seq("pos", "band"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("bit_count(h_a ^ h_b)").cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct() // a pair may collide in several bands; hamming is id-determined
  }

  /** Search a PERSISTED band index (the `bands/` table a
    * [[graft.streaming.DocStreams.mediaDedupIngest]] store maintains:
    * (id, h, pos, band) rows under a fixed radius+1 scheme) with a
    * batch of probe fingerprints: every (probe_id, id, hamming) hit
    * within `maxHamming`, exact under the index's band scheme. The
    * probe side is banded with the SAME scheme and the join shuffles
    * on (pos, band) only — per-query work scales with bucket sizes,
    * never the index; hot index buckets fall under the cap like every
    * other bucket join. This is the lookup half of the ingest loop,
    * exposed for batch dedup-against-index and serving. */
  def searchIndex(indexBands: DataFrame, probes: DataFrame,
      idCol: String, hashCol: String, maxHamming: Int,
      maxBucket: Int = Dedup.MaxBucket, bits: Int = 64,
      what: String = "fingerprintSearch"): DataFrame = {
    val pb = bandsOf(probes, idCol, hashCol, bits, nBands = maxHamming + 1)
    val ib = Dedup.dropHotBuckets(indexBands, Seq("pos", "band"),
      maxBucket, what)
    pb.select(col("pos"), col("band"), col("id").as("probe_id"), col("h").as("h_p"))
      .join(ib.select(col("pos"), col("band"), col("id"), col("h")), Seq("pos", "band"))
      .select(col("probe_id"), col("id"),
        expr("bit_count(h_p ^ h)").cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct() // filter-then-dedup: see hammingNearDupPairs (r18)
  }

  /** Difference hash of each decodable image payload: (doc_id, dhash).
    * Undecodable payloads are dropped. */
  def dHash64(spark: SparkSession, media: Dataset[MediaRow]): DataFrame = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        try {
          val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          if (src == null) None
          else {
            val dst = new java.awt.image.BufferedImage(
              9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = dst.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(src, 0, 0, 9, 8, null)
            g.dispose()
            val px = dst.getRGB(0, 0, 9, 8, null, 0, 9)
            // integer Rec.601 luma — deterministic across JVMs
            def gray(x: Int, y: Int): Int = {
              val rgb = px(y * 9 + x)
              (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
                114 * (rgb & 0xff)) / 1000
            }
            var h = 0L
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                if (gray(x + 1, y) > gray(x, y)) h |= 1L << (y * 8 + x)
                x += 1
              }
              y += 1
            }
            Some((r.doc_id, h))
          }
        } catch { case _: Exception => None }
      }
    }.toDF("doc_id", "dhash")
  }

  /** Energy-contour fingerprint of each decodable audio payload:
    * (doc_id, ahash). The clip is cut into 65 equal sample frames;
    * bit i compares adjacent frame energies. Clips with fewer than 65
    * samples are dropped (no stable contour). */
  def audioFingerprint64(spark: SparkSession, media: Dataset[MediaRow]): DataFrame = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.payload))
          try {
            val fmt = ais.getFormat
            val bits = fmt.getSampleSizeInBits
            val data = ais.readAllBytes()
            val big = fmt.isBigEndian
            val signed8 = fmt.getEncoding ==
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
            val samples: Array[Double] =
              if (bits == 16) {
                val n = data.length / 2
                val out = new Array[Double](n)
                var i = 0
                while (i < n) {
                  val lo = data(if (big) 2 * i + 1 else 2 * i) & 0xff
                  val hi = data(if (big) 2 * i else 2 * i + 1)
                  out(i) = ((hi << 8) | lo).toShort / 32768.0
                  i += 1
                }
                out
              } else {
                val out = new Array[Double](data.length)
                var i = 0
                while (i < data.length) {
                  out(i) = (if (signed8) data(i).toDouble
                            else (data(i) & 0xff) - 128.0) / 128.0
                  i += 1
                }
                out
              }
            if (samples.length < 65) None
            else {
              val energies = new Array[Double](65)
              var f = 0
              while (f < 65) {
                val from = (samples.length.toLong * f / 65).toInt
                val to = (samples.length.toLong * (f + 1) / 65).toInt
                var s = 0.0
                var i = from
                while (i < to) { s += samples(i) * samples(i); i += 1 }
                energies(f) = s
                f += 1
              }
              var h = 0L
              var i = 0
              while (i < 64) {
                if (energies(i + 1) > energies(i)) h |= 1L << i
                i += 1
              }
              Some((r.doc_id, h))
            }
          } finally ais.close()
        } catch { case _: Exception => None }
      }
    }.toDF("doc_id", "ahash")
  }
}
