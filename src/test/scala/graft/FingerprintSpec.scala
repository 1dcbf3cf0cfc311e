package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Fingerprint, Multimodal}

/** Perceptual-fingerprint dedup for images and audio: the 8-band
  * hamming join is EXACT (== brute force) to radius 7, dHash is
  * invariant under brightness scaling and analytic re-rendering at a
  * different resolution, the audio energy contour is gain-invariant,
  * and degenerate fingerprints fall under the hot-bucket cap. */
class FingerprintSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def bruteForce(hashes: Map[Long, Long], maxH: Int): Set[(Long, Long, Int)] = {
    val ids = hashes.keys.toSeq.sorted
    (for {
      i <- ids.indices; j <- (i + 1) until ids.size
      d = java.lang.Long.bitCount(hashes(ids(i)) ^ hashes(ids(j)))
      if d <= maxH
    } yield (ids(i), ids(j), d)).toSet
  }

  private def bandedPairs(hashes: Map[Long, Long], maxH: Int,
      maxBucket: Int = 100000): Set[(Long, Long, Int)] = {
    import spark.implicits._
    val df = hashes.toSeq.toDF("id", "h")
    Fingerprint.hammingNearDupPairs(df, "id", "h", maxH, maxBucket)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("adaptive-band hamming join equals brute force across radii") {
    val rnd = new scala.util.Random(42)
    // 40 random hashes + planted clusters at controlled distances
    val base = (0L until 40L).map(i => i -> rnd.nextLong()).toMap
    var next = 100L
    val planted = base.take(8).flatMap { case (_, h) =>
      (1 to 3).map { k =>
        var v = h
        // flip k random distinct bits
        rnd.shuffle((0 until 64).toList).take(k).foreach(b => v ^= 1L << b)
        next += 1; next -> v
      }
    }
    val all = base ++ planted ++ Map(200L -> base(0L), 201L -> base(0L)) // exact dupes
    // r+1 bands each time: 1 band (pure equality join) through 11
    for (r <- Seq(0, 3, 6, 7, 10)) {
      assert(bandedPairs(all, r) === bruteForce(all, r), s"radius $r")
    }
    assert(bruteForce(all, 0).nonEmpty) // the exact dupes
    // a radius that leaves no band a single bit is rejected
    intercept[IllegalArgumentException](
      Fingerprint.hammingNearDupPairs(
        spark.range(1).selectExpr("id", "id as h"), "id", "h", 64))
  }

  test("hot fingerprint buckets are capped like every other bucket join") {
    // 10 identical hashes: every band bucket is hot at cap 5 -> no pairs
    val pile = (0L until 10L).map(i => i -> 0x1234567890abcdefL).toMap
    // plus a clean near-dup pair away from the pile, which must survive
    val clean = Map(50L -> 0x0f0f0f0f0f0f0f0fL, 51L -> 0x0f0f0f0f0f0f0f1fL)
    val got = bandedPairs(pile ++ clean, 6, maxBucket = 5)
    assert(got === Set((50L, 51L, 1)))
  }

  private def pngBytes(w: Int, h: Int)(pix: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = pix(x, y) & 0xff
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("dHash: brightness-invariant, resolution-tolerant, exact copies collide") {
    import spark.implicits._
    // smooth horizontal gradient with steps large enough that halving
    // the brightness preserves every strict gray comparison
    def grad(w: Int)(x: Int, y: Int): Int = math.min(255, x * 256 / w)
    val media = Seq(
      Multimodal.MediaRow(1L, pngBytes(64, 64)(grad(64)), "image/png"),
      Multimodal.MediaRow(2L, pngBytes(64, 64)((x, y) => grad(64)(x, y) / 2), "image/png"),
      Multimodal.MediaRow(3L, pngBytes(128, 128)(grad(128)), "image/png"),
      Multimodal.MediaRow(4L, pngBytes(64, 64)(grad(64)), "image/png"), // exact copy of 1
      Multimodal.MediaRow(5L, "not an image".getBytes, "image/png"),    // dropped
      Multimodal.MediaRow(6L, pngBytes(64, 64)((x, y) => ((x * 37 + y * 91) % 251)), "image/png")
    ).toDS()
    val hashes = Fingerprint.dHash64(spark, media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes.keySet === Set(1L, 2L, 3L, 4L, 6L)) // corrupt payload dropped
    assert(hashes(1L) === hashes(4L)) // exact copy
    assert(hashes(1L) === hashes(2L)) // half brightness: same gradient signs
    assert(hashes(1L) === hashes(3L)) // same image analytically re-rendered at 2x
    assert(java.lang.Long.bitCount(hashes(1L) ^ hashes(6L)) > 7) // different content
  }

  test("image near-dup end-to-end: banded pairs equal brute force over real decodes") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def noise(seed: Int)(x: Int, y: Int): Int = {
      val r = new scala.util.Random(seed * 1000003 + x * 9176 + y * 31)
      r.nextInt(256)
    }
    val rows =
      (0 until 20).map(i => Multimodal.MediaRow(i.toLong, pngBytes(32, 32)(noise(i)), "image/png")) ++
      Seq(
        Multimodal.MediaRow(100L, pngBytes(32, 32)(noise(3)), "image/png"),  // copy of 3
        Multimodal.MediaRow(101L, pngBytes(32, 32)(noise(11)), "image/png")) // copy of 11
    val hashes = Fingerprint.dHash64(spark, rows.toDS())
    val hmap = hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Fingerprint.hammingNearDupPairs(hashes, "doc_id", "dhash", 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === bruteForce(hmap, 6))
    assert(got.contains((3L, 100L, 0)) && got.contains((11L, 101L, 0)))
  }

  test("searchIndex: probe-vs-index hits equal brute force; hot index buckets capped") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val organic = (0L until 50L).map(i => i -> rnd.nextLong()).toMap
    val pile = (100L until 112L).map(i => i -> 0L).toMap // degenerate, 12 copies
    val index = organic ++ pile
    // probes: perturbed copies of three organic entries + one probe at
    // the degenerate value (must see NO hits: its buckets are capped)
    def flip(h: Long, k: Int, seed: Int): Long = {
      val r = new scala.util.Random(seed)
      var v = h
      r.shuffle((0 until 64).toList).take(k).foreach(b => v ^= 1L << b)
      v
    }
    val probes = Map(1000L -> flip(organic(3L), 2, 1), 1001L -> flip(organic(7L), 3, 2),
      1002L -> organic(11L), 1003L -> 0L)
    val indexBands = graft.operators.Fingerprint.bandsOf(
      index.toSeq.toDF("id", "h"), "id", "h", 64, nBands = 4)
    val got = graft.operators.Fingerprint.searchIndex(
      indexBands, probes.toSeq.toDF("id", "h"), "id", "h",
      maxHamming = 3, maxBucket = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = (for {
      (pid, ph) <- probes.toSeq; (iid, ih) <- organic.toSeq
      d = java.lang.Long.bitCount(ph ^ ih) if d <= 3
    } yield (pid, iid, d)).toSet
    assert(got === brute)
    assert(got.map(_._2).intersect(pile.keySet).isEmpty)
    assert(got.contains((1002L, 11L, 0)) && got.exists(_._1 == 1000L))
  }

  test("streaming media dedup-at-ingest equals one-shot clustering; auto-maintenance compacts and vacuums") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    def noise(seed: Int)(x: Int, y: Int): Int =
      ((seed * 1000003 + x * 9176 + y * 31) % 256 + 256) % 256
    def img(id: Long, seed: Int) =
      (id, pngBytes(32, 32)(noise(seed)), "image/png")
    // batch 0: seeds 1,2,3 plus an exact copy of seed 1
    // batch 1: a cross-batch copy of seed 2, a fresh seed 9, junk
    val b0 = Seq(img(1L, 1), img(2L, 2), img(3L, 3), img(10L, 1))
    val b1 = Seq(img(20L, 2), img(21L, 9), (22L, "junk".getBytes, "image/png"))
    val tbl = java.nio.file.Files.createTempDirectory("graft_media_ingest").toString
    val mem = MemoryStream[(Long, Array[Byte], String)]
    val q = graft.streaming.DocStreams.mediaDedupIngest(
      mem.toDF().toDF("doc_id", "payload", "mime"), tbl,
      compactEvery = 1, vacuumKeep = 1)
    try {
      mem.addData(b0: _*); q.processAllAvailable()
      mem.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()
    val cur = graft.operators.Lakehouse.currentVersion(spark, tbl).get
    assert(cur == "v1c1") // every batch compacted copy-on-write
    // vacuum with keep=1 retired everything but the compacted head
    assert(graft.operators.Lakehouse.listVersions(spark, tbl) === Seq("v1c1"))
    val streamed = spark.read.parquet(s"$tbl/$cur/clusters")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // one-shot: hash the full corpus, exact hamming pairs, CC
    val media = (b0 ++ b1).map { case (id, p, m) =>
      Multimodal.MediaRow(id, p, m) }.toDS()
    val oneShotPairs = Fingerprint.hammingNearDupPairs(
      Fingerprint.dHash64(spark, media), "doc_id", "dhash", 6)
    val oneShot = graft.operators.Components
      .connectedComponents(oneShotPairs, "id_a", "id_b", edgesDistinct = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === oneShot)
    // the planted copies actually clustered (1,10) and (2,20)
    val byDoc = streamed.toMap
    assert(byDoc(1L) === byDoc(10L))
    assert(byDoc(2L) === byDoc(20L))
    assert(!byDoc.contains(22L)) // corrupt payload dropped
  }

  test("streaming fingerprint serving matches the batch index-search ranking") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val rnd = new scala.util.Random(123)
    val organic = (0L until 60L).map(i => i -> rnd.nextLong()).toMap
    val pile = (200L until 210L).map(i => i -> -1L).toMap // degenerate all-ones
    val index = (organic ++ pile).toSeq.toDF("id", "h")
    val indexBands = graft.operators.Fingerprint
      .bandsOf(index, "id", "h", 64, nBands = 4) // radius-3 scheme
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      indexBands.count()
      def flip(h: Long, k: Int, seed: Int): Long = {
        val r = new scala.util.Random(seed)
        var v = h
        r.shuffle((0 until 64).toList).take(k).foreach(b => v ^= 1L << b)
        v
      }
      val probes = Seq(
        1000L -> organic(5L),                // exact hit + maybe near ties
        1001L -> flip(organic(17L), 2, 4),   // 2-bit neighbor
        1002L -> flip(organic(17L), 3, 5),   // 3-bit neighbor of the same entry
        1003L -> -1L,                        // degenerate: capped, no hits
        1004L -> rnd.nextLong())             // likely no hits at all
      val mem = MemoryStream[(Long, Long)]
      val out = graft.streaming.VectorStreams.fingerprintServe(
        mem.toDF().toDF("id", "h"), indexBands, maxHamming = 3, k = 2, maxBucket = 5)
      val q = out.writeStream.outputMode("update")
        .format("memory").queryName("graft_fpserve_test").start()
      try {
        mem.addData(probes: _*)
        q.processAllAvailable()
        val streamed = spark.table("graft_fpserve_test").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
        // batch twin: same capped index search, ranked (hamming asc, id asc)
        val hits = graft.operators.Fingerprint.searchIndex(
            indexBands, probes.toDF("id", "h"), "id", "h", 3, maxBucket = 5)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        val batch = hits.groupBy(_._1).toSeq.flatMap { case (pid, hs) =>
          hs.sortBy(h => (h._3, h._2)).take(2).zipWithIndex.map {
            case ((_, cid, d), i) => (pid, (i + 1).toLong, cid, d)
          }.toSeq
        }.toSet
        assert(streamed === batch)
        assert(streamed.exists { case (p, _, c, d) => p == 1000L && c == 5L && d == 0 })
        assert(!streamed.exists(_._1 == 1003L)) // degenerate probe: capped away
      } finally q.stop()
    } finally indexBands.unpersist()
  }

  private def wavBytes(samples: Array[Short]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val data = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("audio fingerprint: gain-invariant, envelope-sensitive, banded join exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // per-frame square-wave amplitudes (all divisible by 4, so a 0.5x
    // gain is exact integer PCM and frame energies scale by exactly 1/4)
    def clip(seed: Int, gainShift: Int): Array[Short] = {
      val r = new scala.util.Random(seed)
      val amps = Array.fill(65)((r.nextInt(60) + 4) * 4)
      val out = new Array[Short](65 * 100)
      for (f <- 0 until 65; i <- 0 until 100) {
        val a = amps(f) >> gainShift
        out(f * 100 + i) = (if (i % 2 == 0) a else -a).toShort
      }
      out
    }
    val media = Seq(
      Multimodal.MediaRow(1L, wavBytes(clip(1, 0)), "audio/wav"),
      Multimodal.MediaRow(2L, wavBytes(clip(1, 1)), "audio/wav"), // same envelope, half gain
      Multimodal.MediaRow(3L, wavBytes(clip(2, 0)), "audio/wav"), // different envelope
      Multimodal.MediaRow(4L, wavBytes(Array.fill(10)(100.toShort)), "audio/wav"), // too short
      Multimodal.MediaRow(5L, "junk".getBytes, "audio/wav")
    ).toDS()
    val hashes = Fingerprint.audioFingerprint64(spark, media)
    val hmap = hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hmap.keySet === Set(1L, 2L, 3L))
    assert(hmap(1L) === hmap(2L)) // gain-invariant
    assert(hmap(1L) !== hmap(3L))
    val got = Fingerprint.hammingNearDupPairs(hashes, "doc_id", "ahash", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === bruteForce(hmap, 4))
    assert(got.contains((1L, 2L, 0)))
  }
}
