package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Knn, Multimodal}

/** Dedup / similarity / multimodal operator semantics on controlled
  * inputs (the fixture-corpus parity is covered by the oracle gate). */
class ExtensionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy cat"), // near dup
    (3L, "entirely different content about spark engines")
  ).toDF("doc_id", "text")

  test("exact dedup groups duplicates under one fingerprint") {
    val g = Dedup.exactGroups(docs, "text", "doc_id").collect()
    assert(g.length === 3)
    val dup = g.find(_.getAs[Long]("n") === 2L).get
    assert(dup.getAs[Long]("keep_id") === 0L)
  }

  test("jaccard: identical=1, near-dup high, disjoint low") {
    val sh = docs.withColumn("sh",
      expr(graft.functions.TextFunctions.shinglesSql("lower(text)", 3)))
    val a = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val j = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), Dedup.jaccardCol.as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((0L, 1L)) === 1.0)
    assert(j((0L, 2L)) > 0.7)
    assert(j((0L, 3L)) < 0.1)
  }

  test("minhash bands: identical docs share all bands; LSH finds the pair") {
    val bands = Dedup.minhashBands(docs, "text", "doc_id")
    val byDoc = bands.collect().groupBy(_.getAs[Long]("doc_id"))
      .map { case (k, v) => k -> v.map(r => (r.getAs[Int]("band"), r.getAs[Long]("band_hash"))).toSet }
    assert(byDoc(0L) === byDoc(1L))
    assert(byDoc.values.forall(_.size === Dedup.Bands))
    val pairs = Dedup.lshCandidatePairs(bands, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.contains((0L, 3L)))
  }

  test("simhash: identical equal; near-dup within small hamming distance") {
    val sh = Dedup.simhash(docs, "text", "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sh(0L) === sh(1L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(0L), sh(2L)) < hamming(sh(0L), sh(3L)))
  }

  test("brute-force knn returns the planted nearest neighbor") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.1f, 0.0f)), // closest to 0
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val top = Knn.bruteForceTopK(vecs.filter(col("vec_id") === 0), vecs, "vec_id", "embedding", 2)
      .orderBy("rnk").collect()
    assert(top.head.getAs[Long]("cand_id") === 1L)
    assert(top.head.getAs[Double]("cosine") > 0.99)
  }

  test("lsh knn: identical vectors land in the same bucket and match") {
    val vecs = (0L until 20L).map { i =>
      val base = Array.tabulate(8)(j => math.sin(i * 8 + j).toFloat)
      (i, base)
    }.toDF("vec_id", "embedding")
    val dup = Seq((100L, Array.tabulate(8)(j => math.sin(5 * 8 + j).toFloat)))
      .toDF("vec_id", "embedding")
    val res = Knn.lshTopK(dup, vecs.union(dup), "vec_id", "embedding", 8, 8, 1).collect()
    assert(res.length === 1)
    assert(res.head.getAs[Long]("cand_id") === 5L)
    assert(res.head.getAs[Double]("cosine") === 1.0)
  }

  test("multimodal: payload plumbing schema + deterministic stub decode") {
    val media = Multimodal.attachPayload(docs, "doc_id", "text")
    assert(media.schema.fieldNames.toSeq === Seq("doc_id", "payload", "meta"))
    val ds = media.select(col("doc_id"), col("payload"), lit("text/plain").as("mime"))
      .as[Multimodal.MediaRow]
    val f1 = Multimodal.decodeStub(spark, ds).collect().sortBy(_.doc_id)
    val f2 = Multimodal.decodeStub(spark, ds).collect().sortBy(_.doc_id)
    assert(f1.toSeq === f2.toSeq)
    assert(f1.head.n_bytes === docs.head().getAs[String]("text").length)
    assert(f1.forall(f => f.width >= 1 && f.width <= 640))
  }

  test("asof join: inclusive <= at equal times; unmatched lefts dropped") {
    val views = Seq((1L, 100L, 10L, 1.0), (1L, 200L, 11L, 2.0), (2L, 500L, 12L, 3.0))
      .toDF("user_id", "ts_ns", "event_id", "value")
    val clicks = Seq(
      (1L, 200L, 90L),  // equal ts -> matches view 11 (inclusive)
      (1L, 150L, 91L),  // between  -> matches view 10
      (1L, 50L, 92L),   // before all -> dropped
      (3L, 999L, 93L)   // no views for key -> dropped
    ).toDF("user_id", "ts_ns", "event_id")
    val out = graft.operators.AsofJoin.asof(clicks, views, "user_id", "ts_ns", Seq("event_id", "value"))
      .select(col("event_id"), col("asof_match.event_id").as("vid")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(90L -> 11L, 91L -> 10L))
  }

  test("LSH band index round-trips through storage (the 100 TB reuse path)") {
    // at scale the index is WRITTEN once and joined many times; the
    // operators take any bands frame, so a parquet round-trip must
    // produce identical candidate pairs to the in-memory path
    val bands = Dedup.minhashBands(docs, "text", "doc_id")
    val dir = java.nio.file.Files.createTempDirectory("graft_lsh_idx").toString + "/bands"
    bands.write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val live = Dedup.lshCandidatePairs(bands, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fromStore = Dedup.lshCandidatePairs(stored, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromStore === live)
    assert(fromStore.contains((0L, 1L)))
  }

  test("hot-bucket guard drops degenerate buckets without quadratic blowup") {
    // 50 docs share one degenerate band bucket (would emit 1225 pairs);
    // 2 docs share a healthy bucket. With the cap at 10, only the
    // healthy pair survives.
    val hot = (0L until 50L).map(i => (i, 0, 12345L))
    val ok = Seq((100L, 1, 777L), (101L, 1, 777L))
    val bands = (hot ++ ok).toDF("doc_id", "band", "band_hash")
    val pairs = Dedup.lshCandidatePairs(bands, "doc_id", maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((100L, 101L)))
    // default cap keeps everything on healthy data
    val all = Dedup.lshCandidatePairs(bands, "doc_id").count()
    assert(all === 1225 + 1)
  }

  test("shingle hashes equal polynomial hash of the joined window (incl. non-ASCII fallback)") {
    graft.functions.GraftFunctions.register(spark)
    val rows = Seq(
      (1L, Seq("the", "quick", "brown", "fox")),
      (2L, Seq("café", "naïve", "résumé", "x"))) // non-ASCII path
      .toDF("id", "toks")
      .select(col("id"), expr("graft_shingle_hashes(toks, 3)").as("hs"),
        expr("transform(sequence(0, size(toks) - 3), " +
          "i -> graft_poly(concat_ws(' ', slice(toks, i + 1, 3))))").as("expect"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2), s"row ${r.getLong(0)}")
    }
  }

  test("real image decode: dimensions, luminance, format; corrupt payloads dropped") {
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, png(4, 2, 0xff0000), "image/png"),   // solid red
      Multimodal.MediaRow(2L, png(3, 3, 0xffffff), "image/png"),   // solid white
      Multimodal.MediaRow(3L, Array[Byte](1, 2, 3), "image/png"))) // corrupt
      .repartition(2)
    val out = Multimodal.decodeImages(spark, media).collect()
      .map(f => f.doc_id -> f).toMap
    assert(out.keySet === Set(1L, 2L)) // corrupt payload dropped
    assert(out(1L).width === 4 && out(1L).height === 2 && out(1L).n_pixels === 8L)
    assert(out(1L).format === "png")
    assert(math.abs(out(1L).mean_luma - 76.25) < 0.3)  // 0.299 * 255
    assert(out(2L).mean_luma === 255.0)
  }

  test("real audio decode: format, duration, RMS; corrupt payloads dropped") {
    // 440 Hz sine, 0.25 s, 8 kHz mono 16-bit PCM WAV, amplitude 0.5
    def wav(amp: Double, hz: Double, secs: Double, rate: Float = 8000f): Array[Byte] = {
      val n = (rate * secs).toInt
      val pcm = new Array[Byte](n * 2)
      (0 until n).foreach { i =>
        val s = (amp * math.sin(2 * math.Pi * hz * i / rate) * 32767).toInt.toShort
        pcm(2 * i) = (s & 0xff).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, wav(0.5, 440, 0.25), "audio/wav"),
      Multimodal.MediaRow(2L, wav(1.0, 220, 0.5), "audio/wav"),
      Multimodal.MediaRow(3L, Array[Byte](9, 9, 9), "audio/wav"))) // corrupt
      .repartition(2)
    val out = Multimodal.decodeAudio(spark, media).collect()
      .map(f => f.doc_id -> f).toMap
    assert(out.keySet === Set(1L, 2L)) // corrupt payload dropped
    assert(out(1L).sample_rate === 8000 && out(1L).channels === 1 && out(1L).bits === 16)
    assert(out(1L).n_frames === 2000L && out(1L).duration_ms === 250L)
    // RMS of a sine at amplitude a is a/sqrt(2)
    assert(math.abs(out(1L).rms - 0.5 / math.sqrt(2)) < 0.01)
    assert(math.abs(out(2L).rms - 1.0 / math.sqrt(2)) < 0.01)
    // determinism: decoding twice gives identical features
    val again = Multimodal.decodeAudio(spark, media).collect()
      .map(f => f.doc_id -> f).toMap
    assert(again === out)
  }

  test("real MJPEG-AVI video decode: frames, dims, fps, luminance; corrupt dropped") {
    def jpeg(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    // minimal RIFF AVI: avih header (10 fps) + movi LIST of MJPEG frames
    def avi(fps: Int, frames: Array[Byte]*): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      def le32(v: Long): Array[Byte] = Array(
        (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
      def chunk(id: String, body: Array[Byte]): Array[Byte] =
        id.getBytes("US-ASCII") ++ le32(body.length) ++ body ++
          (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
      val avih = chunk("avih", le32(1000000L / fps) ++ new Array[Byte](52))
      val hdrl = chunk("LIST", "hdrl".getBytes("US-ASCII") ++ avih)
      val movi = chunk("LIST", "movi".getBytes("US-ASCII") ++
        frames.flatMap(f => chunk("00dc", f)).toArray)
      val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
      bos.write("RIFF".getBytes("US-ASCII")); bos.write(le32(body.length))
      bos.write(body)
      bos.toByteArray
    }
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, avi(10, jpeg(8, 6, 0xffffff), jpeg(8, 6, 0x000000)), "video/avi"),
      Multimodal.MediaRow(2L, avi(25, jpeg(4, 4, 0xffffff)), "video/avi"),
      Multimodal.MediaRow(3L, Array[Byte](82, 73, 70, 70, 1), "video/avi"))) // corrupt
      .repartition(2)
    val out = Multimodal.decodeVideoMjpeg(spark, media).collect()
      .map(f => f.doc_id -> f).toMap
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L).n_frames === 2 && out(1L).width === 8 && out(1L).height === 6)
    assert(out(1L).fps === 10.0)
    assert(out(2L).n_frames === 1 && out(2L).fps === 25.0)
    // white + black frames average near mid luminance; solid white near 255
    assert(out(1L).mean_luma > 100 && out(1L).mean_luma < 155)
    assert(out(2L).mean_luma > 240)
  }

  test("real image resize: bilinear scale, re-encoded payload chains into decode") {
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, png(16, 8, 0xff0000), "image/png"),  // solid red, downscale
      Multimodal.MediaRow(2L, png(2, 2, 0xffffff), "image/png"),   // solid white, upscale
      Multimodal.MediaRow(3L, Array[Byte](5, 5), "image/png")))    // corrupt
      .repartition(2)
    val out = Multimodal.resizeImages(spark, media, 4, 4).collect()
      .map(f => f.doc_id -> f).toMap
    assert(out.keySet === Set(1L, 2L)) // corrupt dropped
    assert(out(1L).width === 4 && out(1L).height === 4)
    // solid colors survive resampling exactly: luma preserved
    assert(math.abs(out(1L).mean_luma - 76.25) < 0.3)
    assert(out(2L).mean_luma === 255.0)
    // the output payload is a real image: chain back into the decoder
    val redecoded = Multimodal.decodeImages(spark, spark.createDataset(
      out.values.map(r => Multimodal.MediaRow(r.doc_id, r.payload, "image/png")).toSeq))
      .collect().map(f => f.doc_id -> f).toMap
    assert(redecoded(1L).width === 4 && redecoded(1L).n_pixels === 16L)
    assert(math.abs(redecoded(1L).mean_luma - out(1L).mean_luma) < 0.01)
  }

  test("video frame sampling decodes only every Nth container frame") {
    def jpeg(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    def avi(fps: Int, frames: Array[Byte]*): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      def le32(v: Long): Array[Byte] = Array(
        (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
      def chunk(id: String, body: Array[Byte]): Array[Byte] =
        id.getBytes("US-ASCII") ++ le32(body.length) ++ body ++
          (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
      val avih = chunk("avih", le32(1000000L / fps) ++ new Array[Byte](52))
      val hdrl = chunk("LIST", "hdrl".getBytes("US-ASCII") ++ avih)
      val movi = chunk("LIST", "movi".getBytes("US-ASCII") ++
        frames.flatMap(f => chunk("00dc", f)).toArray)
      val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
      bos.write("RIFF".getBytes("US-ASCII")); bos.write(le32(body.length))
      bos.write(body)
      bos.toByteArray
    }
    // 5 frames alternating white/black: sampling every 2nd keeps 0,2,4 (all white)
    val fiveFrames = avi(10,
      jpeg(4, 4, 0xffffff), jpeg(4, 4, 0x000000), jpeg(4, 4, 0xffffff),
      jpeg(4, 4, 0x000000), jpeg(4, 4, 0xffffff))
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, fiveFrames, "video/avi"),
      Multimodal.MediaRow(2L, Array[Byte](1, 2, 3), "video/avi"))) // corrupt
      .repartition(2)
    val out = Multimodal.sampleFrames(spark, media, 2).collect()
    assert(out.map(_.doc_id).toSet === Set(1L)) // corrupt dropped
    assert(out.map(_.frame_idx).sorted.toSeq === Seq(0, 2, 4))
    assert(out.forall(f => f.width === 4 && f.height === 4))
    assert(out.forall(_.mean_luma > 240)) // only the white frames were decoded
    // everyN=1 keeps every frame
    assert(Multimodal.sampleFrames(spark, media, 1).collect().length === 5)
  }

  test("CharWindows generator: exact coverage, stride arithmetic, short/null drop") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq((1L, "abcdefghij"), (2L, "abc"), (3L, " abcd "), (4L, null.asInstanceOf[String]))
      .toDF("id", "t")
    val got = df.select(col("id"), expr("graft_char_windows(t, 4, 3)").as(Seq("i", "w")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    // len 10, width 4, stride 3 → (10−4)/3+1 = 3 windows at 0,3,6
    assert(got.filter(_._1 == 1L).sortBy(_._2).toSeq ===
      Seq((1L, 0, "abcd"), (1L, 1, "defg"), (1L, 2, "ghij")))
    assert(!got.exists(_._1 == 2L)) // shorter than width → no rows
    assert(got.filter(_._1 == 3L).toSeq === Seq((3L, 0, "abcd"))) // trimmed, exact width
    assert(!got.exists(_._1 == 4L)) // null drops
    // parity with the transform+explode formulation it replaced
    val viaTransform = df.filter(length(trim(col("t"))) >= 4)
      .select(col("id"), explode(expr(
        "transform(sequence(1, length(trim(t)) - 3, 3), i -> substring(trim(t), i, 4))")).as("w"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got.map(r => (r._1, r._3)).toSet === viaTransform)
  }

  test("typed MinHashAgg produces the same signatures as the codegen'd min-agg path") {
    val exploded = Dedup.withShingleHashes(docs, "text")
      .filter(size(col("shingle_hashes")) > 0)
      .select(col("doc_id"), explode(col("shingle_hashes")).as("h"))
    val minhashUdaf = udaf(graft.operators.MinHashAgg)
    val typed = exploded.groupBy("doc_id")
      .agg(minhashUdaf(col("h")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val sqlAggs = (0 until Dedup.NumHashes).map(i =>
      min(expr(s"((2*$i + 3) * h + (7919*$i + 13)) % ${Dedup.MinhashP}L")).as(s"s$i"))
    val sql = exploded.groupBy("doc_id").agg(sqlAggs.head, sqlAggs.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to Dedup.NumHashes).map(r.getLong(_))).toMap
    assert(typed.keySet === sql.keySet)
    typed.foreach { case (k, v) => assert(v === sql(k), s"doc $k") }
  }

  test("chunking generator: windows, overlap, short/empty/null docs") {
    graft.functions.GraftFunctions.register(spark)
    // 10 tokens, size 4, overlap 2 (stride 2) → starts 0,2,4,6,8
    val docs2 = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),
      (2L, "a b"),           // single short chunk
      (3L, "   "),           // blank → no chunks
      (4L, null.asInstanceOf[String])) // null → no chunks
      .toDF("doc_id", "text")
    val out = docs2.select(col("doc_id"),
        expr("graft_chunk_tokens(text, 4, 2)").as(Seq("chunk_idx", "chunk")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val byDoc = out.groupBy(_._1)
    assert(byDoc(1L).sortBy(_._2).map(_._3).toSeq === Seq(
      "t0 t1 t2 t3", "t2 t3 t4 t5", "t4 t5 t6 t7", "t6 t7 t8 t9", "t8 t9"))
    assert(byDoc(2L).map(_._3).toSeq === Seq("a b"))
    assert(!byDoc.contains(3L) && !byDoc.contains(4L))
  }

  test("chunking invariants: full coverage, stride count, overlap (n = 1..200)") {
    val (size, overlap) = (16, 4)
    val stride = size - overlap
    (1 to 200).foreach { n =>
      val toks = (0 until n).map(i => s"t$i")
      val chunks = graft.functions.ChunkTokens(
        org.apache.spark.sql.catalyst.expressions.BoundReference(0,
          org.apache.spark.sql.types.StringType, nullable = true),
        size, overlap)
      val rows = chunks.eval(org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(toks.mkString(" "))))
        .iterator.toSeq
      assert(rows.size === (n + stride - 1) / stride, s"n=$n")
      val covered = rows.flatMap(r => r.getUTF8String(1).toString.split(" ")).toSet
      assert(covered === toks.toSet, s"n=$n") // every token appears in some chunk
    }
  }

  test("incremental components: fold equals full rebuild on random graphs and crafted cases") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def cc(edges: Seq[(Long, Long)]) = graft.operators.Components
      .connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def fold(old: Seq[(Long, Long)], batch: Seq[(Long, Long)]) = {
      val stored = graft.operators.Components
        .connectedComponents(old.toDF("a", "b"), "a", "b").localCheckpoint(true)
      graft.operators.Components
        .mergeIncremental(stored, batch.toDF("a", "b"), "a", "b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    // crafted: batch bridges two stored components, adds a fresh chain,
    // adds an internal (no-op) edge, and leaves component {8,9} untouched
    val old = Seq((1L, 2L), (3L, 4L), (8L, 9L))
    val batch = Seq((2L, 3L), (4L, 4L), (1L, 2L), (20L, 21L), (21L, 22L), (4L, 30L))
    assert(fold(old, batch) === cc(old ++ batch))
    // randomized: arbitrary graphs, arbitrary splits
    val rnd = new scala.util.Random(23)
    (0 until 4).foreach { trial =>
      val all = Seq.fill(60)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
        .filter(e => e._1 != e._2)
      val (o, b) = all.partition(_ => rnd.nextBoolean())
      assert(fold(o, b) === cc(all), s"trial $trial old=$o batch=$b")
      assert(fold(all, Seq.empty[(Long, Long)]) === cc(all), s"trial $trial empty batch")
    }
  }

  test("profile drift monitor fires each flag on a crafted corpus") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("graft_drift").toString
    // aa: batch mean doubles (drift); bb: baseline-only (gone);
    // cc: batch-only (new); dd: balanced (no flags)
    Seq(
      (0L, "x", "aa", "s", 100L), (2L, "x", "aa", "s", 100L),
      (1L, "x", "aa", "s", 200L), (3L, "x", "aa", "s", 200L),
      (4L, "x", "bb", "s", 50L),
      (5L, "x", "cc", "s", 50L),
      (6L, "x", "dd", "s", 80L), (7L, "x", "dd", "s", 80L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.SparkEntry.queries("profile_drift_lang")(spark, tmp)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4), r.getInt(5))).toMap
    assert(got("aa") === ((2L, 2L, 0, 0, 1))) // mean 100 → 200: drift
    assert(got("bb") === ((1L, 0L, 0, 1, 0))) // vanished from the batch
    assert(got("cc") === ((0L, 1L, 1, 0, 0))) // new in the batch
    assert(got("dd") === ((1L, 1L, 0, 0, 0))) // stable
  }

  test("streaming CMS grid matches the batch sketch cell-for-cell") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cmsstream").toString
    graft.sources.Tables(spark, "/root/testdata/sf0.001", "events")
      .drop("ts_ns").write.mode("overwrite").parquet(tmp)
    val stream = graft.streaming.EventStreams.cmsGrid(
      graft.streaming.EventStreams.readEventStream(spark, tmp))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("graft_cms_stream").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("graft_cms_stream").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      val batch = graft.streaming.EventStreams.cmsGrid(
          graft.sources.Tables(spark, "/root/testdata/sf0.001", "events"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming dedup ingest converges to the one-shot corpus clustering") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val src = java.nio.file.Files.createTempDirectory("graft_ingest_src").toString
    val tbl = java.nio.file.Files.createTempDirectory("graft_ingest_tbl").toString
    val docs = graft.sources.Tables(spark, d, "documents").select("doc_id", "text")
    // three ingest batches by doc_id tercile — separate files so the
    // file source replays them as three micro-batches
    Seq((0L, 170L), (170L, 340L), (340L, Long.MaxValue)).zipWithIndex.foreach {
      case ((lo, hi), i) =>
        docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
          .coalesce(1).write.mode("overwrite").parquet(s"$src/stage$i")
        val f = new java.io.File(s"$src/stage$i").listFiles()
          .find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(s"$src/batch$i.parquet"))
        Thread.sleep(1100) // file source orders batches by mtime
    }
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType))))
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", 1)
      .parquet(src)
    val q = graft.streaming.DocStreams.dedupIngest(stream, tbl)
    try q.processAllAvailable() finally q.stop()
    val ver = scala.io.Source.fromFile(s"$tbl/CURRENT").mkString.trim
    val streamed = spark.read.parquet(s"$tbl/$ver/clusters")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.SparkEntry.queries("dedup_components")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // the split served off the standing store == the batch
    // split_by_cluster query, including flips from cross-batch merges
    val servedSplit = graft.streaming.DocStreams.splitFromStore(spark, tbl, docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val batchSplit = graft.SparkEntry.queries("split_by_cluster")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(servedSplit === batchSplit)
  }

  test("dedup ingest: replay of an already-committed batch is a no-op, store intact") {
    // recovery semantics: a failure between the atomic CURRENT swing
    // and the streaming commit re-delivers the same batch id. The fold
    // must skip (CURRENT already names v<id>) — re-running would read
    // v<id> while overwriting it and wedge the standing index.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val tbl = java.nio.file.Files.createTempDirectory("graft_ingest_replay").toString
    val docs = Seq(
      (1L, "aaa bbb ccc ddd eee fff ggg hhh"),
      (2L, "aaa bbb ccc ddd eee fff ggg hhh"),
      (3L, "zzz yyy xxx www vvv uuu ttt sss"))
    val mem1 = MemoryStream[(Long, String)]
    val q1 = graft.streaming.DocStreams.dedupIngest(mem1.toDF().toDF("doc_id", "text"), tbl)
    try { mem1.addData(docs: _*); q1.processAllAvailable() } finally q1.stop()
    def current() =
      java.nio.file.Files.readString(java.nio.file.Paths.get(s"$tbl/CURRENT")).trim
    assert(current() == "v0")
    def clusters() = spark.read.parquet(s"$tbl/v0/clusters")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = clusters()
    assert(before.nonEmpty)
    // a fresh query over the same store re-delivers batch id 0 with the
    // same rows — exactly the post-swing replay shape
    val mem2 = MemoryStream[(Long, String)]
    val q2 = graft.streaming.DocStreams.dedupIngest(mem2.toDF().toDF("doc_id", "text"), tbl)
    try { mem2.addData(docs: _*); q2.processAllAvailable() } finally q2.stop()
    assert(current() == "v0")
    assert(clusters() === before)
  }

  test("streaming ANN serving matches the batch multi-table LSH top-k") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val d = "/root/testdata/sf0.001"
    val tmp = java.nio.file.Files.createTempDirectory("graft_annserve").toString
    val emb = graft.sources.Tables(spark, d, "embeddings")
    emb.filter(col("vec_id") < 32).select("vec_id", "embedding")
      .write.mode("overwrite").parquet(tmp)
    val (dim, tPlanes, nTables) = (64, 7, 16)
    val index = graft.operators.Knn
      .withLshTables(emb, "embedding", dim, tPlanes, nTables)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("tbl"), col("bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      index.count() // materialize once; the stream reads it per micro-batch
      val qstream = spark.readStream
        .schema(StructType(Seq(StructField("vec_id", LongType),
          StructField("embedding", ArrayType(FloatType)))))
        .parquet(tmp)
      val out = graft.streaming.VectorStreams.annServe(
        qstream, index, "vec_id", "embedding", dim, tPlanes, nTables, 3)
      val q = out.writeStream.outputMode("update")
        .format("memory").queryName("graft_annserve_test").start()
      try {
        q.processAllAvailable()
        val streamed = spark.table("graft_annserve_test").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
        val batch = graft.operators.Knn
          .lshTopKMultiTable(index, "vec_id", "embedding", col("vec_id") < 32, 3)
          .collect()
          .map(r => (r.getLong(0), r.getInt(3).toLong, r.getLong(1), r.getDouble(2))).toSet
        assert(streamed === batch)
        assert(streamed.nonEmpty)
      } finally q.stop()
    } finally index.unpersist()
  }

  test("minhash signature invariant under permutation and duplication of hashes") {
    val rnd = new scala.util.Random(7)
    (1 to 50).foreach { _ =>
      val hs = Array.fill(1 + rnd.nextInt(300))(rnd.nextLong().abs % graft.functions.MinHashSig.P)
      def sig(a: Array[Long]) = graft.functions.MinHashSig.sig(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(a)).toLongArray.toSeq
      val base = sig(hs)
      assert(sig(rnd.shuffle(hs.toSeq).toArray) === base)
      assert(sig(hs ++ hs) === base)
    }
  }

  test("streaming session windows match the batch sessionization") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sess").toString
    graft.sources.Tables(spark, "/root/testdata/sf0.001", "events")
      .drop("ts_ns").write.mode("overwrite").parquet(tmp)
    val stream = graft.streaming.EventStreams.sessionStats(
      graft.streaming.EventStreams.readEventStream(spark, tmp))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("graft_sess_test").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("graft_sess_test").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
      val batch = graft.queries.SimilarityStreamQueries.defs
        .find(_.name == "ev_sessionize").get
        .build(spark, "/root/testdata/sf0.001")
        .select("user_id", "n_events", "start_ts", "dur_s").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming KMV distinct sketch matches the batch sketch on the same data") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_kmvstream").toString
    graft.sources.Tables(spark, "/root/testdata/sf0.001", "events")
      .drop("ts_ns").write.mode("overwrite").parquet(tmp)
    val stream = graft.streaming.EventStreams.kmvDistinctCounts(
      graft.streaming.EventStreams.readEventStream(spark, tmp))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("graft_kmv_stream").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("graft_kmv_stream").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      // batch twin: same window + same Aggregator over the static frame
      val kmv = org.apache.spark.sql.functions.udaf(graft.functions.KmvAgg)
      val batch = graft.sources.Tables(spark, "/root/testdata/sf0.001", "events")
        .groupBy(org.apache.spark.sql.functions.window(
          org.apache.spark.sql.functions.col("ts"), "60 minutes").as("w"),
          org.apache.spark.sql.functions.col("event_type"))
        .agg(kmv(org.apache.spark.sql.functions.col("user_id").cast("long")).as("est_users"))
        .select(org.apache.spark.sql.functions.date_format(
          org.apache.spark.sql.functions.col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
          org.apache.spark.sql.functions.col("event_type"),
          org.apache.spark.sql.functions.col("est_users"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming quantile-sketch histogram matches the batch sketch on the same data") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_qskstream").toString
    graft.sources.Tables(spark, "/root/testdata/sf0.001", "events")
      .drop("ts_ns").write.mode("overwrite").parquet(tmp)
    val stream = graft.streaming.EventStreams.qsketchHistograms(
      graft.streaming.EventStreams.readEventStream(spark, tmp))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("graft_qsk_stream").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("graft_qsk_stream").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      // batch twin: same window/bucket grouping over the static frame
      import org.apache.spark.sql.functions._
      val batch = graft.sources.Tables(spark, "/root/testdata/sf0.001", "events")
        .withColumn("c", expr("greatest(CAST(floor(value * 100 + 0.5D) AS BIGINT), 1)"))
        .groupBy(window(col("ts"), "60 minutes").as("w"), col("event_type"),
          graft.operators.QSketch.bucket("c").as("bucket"))
        .agg(count(lit(1)).as("cnt"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
          col("event_type"), col("bucket"), col("cnt"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("stream-static as-of enrichment matches the batch as-of join") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val right = Seq((1L, 100L, 10L), (1L, 200L, 20L), (2L, 150L, 15L))
      .toDF("k", "t", "v")
    val leftRows = Seq((1L, 99L), (1L, 100L), (1L, 250L),
      (2L, 149L), (2L, 151L), (3L, 500L))

    val mem = MemoryStream[(Long, Long)]
    val out = graft.streaming.EventStreams.asofEnrichStatic(
      mem.toDF().toDF("k", "t"), right, "k", "t", "v")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("graft_asof_stream").start()
    val streamed =
      try {
        mem.addData(leftRows: _*)
        q.processAllAvailable()
        spark.table("graft_asof_stream").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      } finally q.stop()

    val batch = graft.operators.AsofJoin.asof(
        leftRows.toDF("k", "t"), right, "k", "t", Seq("v"))
      .select(col("k"), col("t"), col("asof_match.v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === batch)
    // inclusive boundary, latest-prior, and no-prior/no-key drops
    assert(streamed === Set((1L, 100L, 10L), (1L, 250L, 20L), (2L, 151L, 15L)))
  }

  test("as-of enrichment guard rejects an oversized static dimension") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val right = Seq((1L, 100L, 10L), (1L, 200L, 20L), (2L, 150L, 15L))
      .toDF("k", "t", "v")
    val mem = MemoryStream[(Long, Long)]
    val e = intercept[IllegalArgumentException] {
      graft.streaming.EventStreams.asofEnrichStatic(
        mem.toDF().toDF("k", "t"), right, "k", "t", "v", maxIndexRows = 2)
    }
    assert(e.getMessage.contains("asofEnrichStaticBatched"))
  }

  test("as-of enrichment shuffle fallback matches the broadcast-index path") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val right = Seq((1L, 100L, 10L), (1L, 200L, 20L), (2L, 150L, 15L),
      (2L, 150L, 14L)) // (key, time) tie: both paths must keep payload 15
      .toDF("k", "t", "v")
    val leftRows = Seq((1L, 99L), (1L, 100L), (1L, 250L),
      (2L, 149L), (2L, 151L), (3L, 500L))
    val got = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    val mem = MemoryStream[(Long, Long)]
    val q = graft.streaming.EventStreams.asofEnrichStaticBatched(
      mem.toDF().toDF("k", "t"), right, "k", "t", "v") { (df, _) =>
      got.synchronized {
        got ++= df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      }
      ()
    }
    try {
      mem.addData(leftRows: _*)
      q.processAllAvailable()
    } finally q.stop()
    // same rows AND the same tie resolution as the broadcast-index path
    val memB = MemoryStream[(Long, Long)]
    val bOut = graft.streaming.EventStreams.asofEnrichStatic(
      memB.toDF().toDF("k", "t"), right, "k", "t", "v")
    assert(bOut.columns.toSeq === Seq("k", "t", "asof_v"))
    val qb = bOut.writeStream.outputMode("append")
      .format("memory").queryName("graft_asof_bcast_twin").start()
    val viaBroadcast =
      try {
        memB.addData(leftRows: _*)
        qb.processAllAvailable()
        spark.table("graft_asof_bcast_twin").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      } finally qb.stop()
    assert(got.toSet === viaBroadcast)
    assert(got.toSet === Set((1L, 100L, 10L), (1L, 250L, 20L), (2L, 151L, 15L)))
  }

  test("shuffle-fallback dimension is scanned once across micro-batches, not per batch") {
    // the persisted deduped dim must materialize during the first batch
    // and be served from cache afterwards — per-batch re-scans of a
    // 10⁹-row reference table are the failure mode this pins down.
    // An accumulator-bearing UDF on the payload counts source-row
    // touches: one materialization of a 3-row dim = exactly 3 touches,
    // regardless of how many batches join against it.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val scans = spark.sparkContext.longAccumulator("graft_dim_row_touches")
    val touch = udf((v: Long) => { scans.add(1L); v })
    val right = Seq((1L, 100L, 10L), (1L, 200L, 20L), (2L, 150L, 15L))
      .toDF("k", "t", "v0")
      .withColumn("v", touch(col("v0"))).drop("v0")
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val mem = MemoryStream[(Long, Long)]
    val q = graft.streaming.EventStreams.asofEnrichStaticBatched(
      mem.toDF().toDF("k", "t"), right, "k", "t", "v") { (df, _) =>
      df.collect(); batches.incrementAndGet(); ()
    }
    try {
      mem.addData((1L, 150L)); q.processAllAvailable()
      mem.addData((2L, 200L)); q.processAllAvailable()
    } finally q.stop()
    assert(batches.get() >= 2, s"expected >=2 micro-batches, got ${batches.get()}")
    assert(scans.value == 3L,
      s"dim rows touched ${scans.value} times across ${batches.get()} batches — " +
        "expected exactly one 3-row materialization (cache miss on later batches?)")
  }

  test("streaming dedup drops in-window duplicates exactly once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = 1700000000L
    val mem = MemoryStream[(Long, Long, Long)] // (event_id, user_id, epoch_s)
    val df = mem.toDF().toDF("event_id", "user_id", "epoch_s")
      .withColumn("ts", expr("timestamp_seconds(epoch_s)"))
    val out = graft.streaming.EventStreams.dedupEvents(df)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("graft_dedup_stream").start()
    try {
      mem.addData((1L, 1L, t0), (2L, 1L, t0 + 10), (1L, 1L, t0 + 5)) // in-batch dup
      q.processAllAvailable()
      mem.addData((2L, 2L, t0 + 20), (3L, 1L, t0 + 30)) // cross-batch dup id 2
      q.processAllAvailable()
      val ids = spark.table("graft_dedup_stream").collect().map(_.getLong(0)).sorted
      assert(ids === Array(1L, 2L, 3L)) // each id exactly once
    } finally q.stop()
  }

  test("custom-state sessionizer (flatMapGroupsWithState) matches the batch sessionization") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_fmgws").toString
    val raw = graft.sources.Tables(spark, "/root/testdata/sf0.001", "events")
    raw.drop("ts_ns").coalesce(1).write.mode("overwrite").parquet(tmp)
    Thread.sleep(1100) // file-source orders batches by mtime
    // far-future sentinel: pushes the watermark past every real session
    val maxNs = raw.agg(max("ts_ns")).head.getLong(0)
    spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(
        -1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(0L,
          maxNs + 100L * 86400L * 1000000000L)),
        -1L, "sentinel", 0.0, "{}")),
      graft.streaming.EventStreams.rawSchema)
      .write.mode("append").parquet(tmp)
    val stream = graft.streaming.EventStreams.readEventStream(spark, tmp,
      maxFilesPerTrigger = Some(1))
    val out = graft.streaming.EventStreams.sessionStatsCustom(spark, stream)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("graft_fmgws_test").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("graft_fmgws_test").collect()
        .filter(_.getLong(0) >= 0) // drop the sentinel user
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
      val batch = graft.queries.SimilarityStreamQueries.defs
        .find(_.name == "ev_sessionize").get
        .build(spark, "/root/testdata/sf0.001")
        .select("user_id", "n_events", "start_ts", "dur_s").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("phrase_search agrees with the chained-adjacency formulation") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("phrase_search")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // independent formulation: len−1 chained positional self-joins
    val post = graft.sources.Tables(spark, d, "documents")
      .select(col("doc_id"),
        posexplode(expr(graft.functions.TextFunctions.tokensSql("text")))
          .as(Seq("pos", "tok")))
      .cache()
    val alt = Seq((1L, Seq("slow", "hash", "batch")), (2L, Seq("row", "column", "sort")),
      (3L, Seq("window", "fast", "query"))).flatMap { case (pid, ws) =>
      val first = post.filter(col("tok") === ws.head)
        .select(col("doc_id"), col("pos").as("anchor"))
      val matched = ws.zipWithIndex.tail.foldLeft(first) { case (acc, (w, i)) =>
        acc.join(post.filter(col("tok") === w)
            .select(col("doc_id"), (col("pos") - i).as("anchor")),
          Seq("doc_id", "anchor"))
      }
      matched.groupBy("doc_id").agg(count(lit(1)).as("n_occ"))
        .collect().map(r => (r.getLong(0), pid, r.getLong(1)))
    }.toSet
    post.unpersist()
    assert(got === alt)
    assert(got.nonEmpty || spark.read.parquet(s"$d/documents.parquet").count() == 0)
  }

  test("streaming cumulative-distinct matches the batch window query per event") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cumedist").toString
    graft.sources.Tables(spark, "/root/testdata/sf0.001", "events")
      .drop("ts_ns").write.mode("overwrite").parquet(tmp)
    val stream = graft.streaming.EventStreams.cumeDistinctTypes(spark,
      graft.streaming.EventStreams.readEventStream(spark, tmp))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("graft_cumedist_stream").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("graft_cumedist_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val batch = graft.SparkEntry.queries("window_cume_distinct")(
          spark, "/root/testdata/sf0.001")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming dyadic EWMA matches the batch lag-window query per event") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ewma").toString
    graft.sources.Tables(spark, "/root/testdata/sf0.001", "events")
      .drop("ts_ns").write.mode("overwrite").parquet(tmp)
    val stream = graft.streaming.EventStreams.ewmaDyadic(spark,
      graft.streaming.EventStreams.readEventStream(spark, tmp))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("graft_ewma_stream").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("graft_ewma_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      val batch = graft.SparkEntry.queries("ts_ewma_dyadic")(
          spark, "/root/testdata/sf0.001")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming anomaly flags match the batch trailing-z query exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_anom").toString
    graft.sources.Tables(spark, "/root/testdata/sf0.001", "events")
      .drop("ts_ns").write.mode("overwrite").parquet(tmp)
    val stream = graft.streaming.EventStreams.anomalyTrailingZ(spark,
      graft.streaming.EventStreams.readEventStream(spark, tmp))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("graft_anom_stream").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("graft_anom_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSet
      val batch = graft.SparkEntry.queries("anomaly_trailing_z")(
          spark, "/root/testdata/sf0.001")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty || batch.isEmpty)
    } finally q.stop()
  }

  test("streaming SCD2 maintainer converges to the batch interval table") {
    import org.apache.spark.sql.functions._
    val src = java.nio.file.Files.createTempDirectory("graft_scd2src").toString
    val tbl = java.nio.file.Files.createTempDirectory("graft_scd2tbl").toString
    val raw = graft.sources.Tables(spark, "/root/testdata/sf0.001", "events")
    // three time-ordered files → three in-order micro-batches
    val cuts = Seq(Long.MinValue) ++
      raw.stat.approxQuantile("ts_ns", Array(0.33, 0.66), 0.0).map(_.toLong) ++
      Seq(Long.MaxValue)
    cuts.sliding(2).zipWithIndex.foreach { case (Seq(lo, hi), i) =>
      raw.filter(col("ts_ns") >= lo && col("ts_ns") < hi).drop("ts_ns")
        .coalesce(1).write.mode("overwrite").parquet(s"$src/part$i")
      Thread.sleep(1100) // file source orders batches by mtime
    }
    // flatten: the file source watches one directory of parquet files
    val flat = java.nio.file.Files.createTempDirectory("graft_scd2flat").toString
    (0 until 3).foreach { i =>
      spark.read.parquet(s"$src/part$i").coalesce(1)
        .write.mode("overwrite").parquet(s"$flat/f$i")
      val f = new java.io.File(s"$flat/f$i").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(s"$flat/batch$i.parquet"))
      Thread.sleep(1100)
    }
    val stream = graft.streaming.EventStreams.readEventStream(spark, flat,
      maxFilesPerTrigger = Some(1))
    val q = graft.streaming.EventStreams.scd2Maintain(stream, tbl)
    try q.processAllAvailable() finally q.stop()
    val ver = scala.io.Source.fromFile(s"$tbl/CURRENT").mkString.trim
    val streamed = spark.read.parquet(s"$tbl/$ver")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    val batch = graft.SparkEntry.queries("scd2_intervals")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming sessions drop late events beyond the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = 1700000000L * 1000000000L // ns epoch base
    def ev(userId: Long, offsetS: Long): (Long, Long) = (userId, t0 + offsetS * 1000000000L)
    val mem = MemoryStream[(Long, Long)]
    val events = mem.toDF().toDF("user_id", "ts_ns")
      .withColumn("ts", expr("timestamp_micros(ts_ns div 1000)"))
    val out = graft.streaming.EventStreams.sessionStats(events, watermark = "10 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("graft_late_test").start()
    try {
      // session A: two events for user 1; one event for user 2
      mem.addData(ev(1L, 0L), ev(1L, 300L), ev(2L, 60L))
      q.processAllAvailable()
      // advance event time far ahead → watermark passes session A's end
      mem.addData(ev(9L, 100000L))
      q.processAllAvailable()
      // LATE: user-1 event inside session A but behind the watermark —
      // must be discarded, not create/extend a session
      mem.addData(ev(1L, 600L))
      q.processAllAvailable()
      // flush: advance watermark again so anything (incorrectly) kept emits
      mem.addData(ev(9L, 200000L))
      q.processAllAvailable()
      val got = spark.table("graft_late_test").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
      assert(got.contains((1L, 2L, 300L))) // session A: 2 events, 300 s — late event NOT added
      assert(got.contains((2L, 1L, 0L)))
      assert(got.count(_._1 == 1L) === 1) // no extra user-1 session from the late event
    } finally q.stop()
  }

  test("streaming CDC merge: upserts, tombstone deletes, delta semantics") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = new graft.sinks.InMemoryFhirStore
    val mem = MemoryStream[(String, String, String, Boolean)]
    val q = graft.streaming.EventStreams.cdcUpserts(
      mem.toDF().toDF("key", "id", "json", "deleted"), store, "Patient")
    try {
      mem.addData(("k1", "id-1", """{"v":1}""", false), ("k2", "id-2", """{"v":2}""", false))
      q.processAllAvailable()
      assert(store.data((("Patient", "k1"))) === (("id-1", """{"v":1}""")))
      assert(store.data.size === 2)
      // delta batch: update k1, tombstone k2, insert k3 — k1's absence
      // of other keys must NOT delete them
      mem.addData(("k1", "id-X", """{"v":9}""", false), ("k2", "id-2", null, true),
        ("k3", "id-3", """{"v":3}""", false))
      q.processAllAvailable()
      assert(store.data((("Patient", "k1")))._2 === """{"v":9}""")
      assert(store.data((("Patient", "k1")))._1 === "id-1") // store id carried into update
      assert(!store.data.contains(("Patient", "k2")))
      assert(store.data((("Patient", "k3"))) === (("id-3", """{"v":3}""")))
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch join on the same rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = 1700000000L
    def rows(kind: String) = Seq(
      // (user, offsetSeconds, eventId)
      (1L, 0L, 10L), (1L, 300L, 11L), (2L, 100L, 12L), (3L, 2000L, 13L))
      .map { case (u, off, id) => (u, t0 + off + (if (kind == "click") 30L else 0L), id) }
    def toDf(data: Seq[(Long, Long, Long)], mem: MemoryStream[(Long, Long, Long)]) = {
      mem.addData(data: _*)
      mem.toDF().toDF("user_id", "epoch_s", "event_id")
        .withColumn("ts", expr("timestamp_seconds(epoch_s)"))
    }
    val cMem = MemoryStream[(Long, Long, Long)]
    val vMem = MemoryStream[(Long, Long, Long)]
    val clicks = toDf(rows("click"), cMem)
    val views = toDf(rows("view"), vMem)
    val out = graft.streaming.EventStreams.clickViewIntervalJoin(clicks, views)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("graft_ssjoin_test").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("graft_ssjoin_test").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // batch twin on identical rows
      import spark.implicits._
      def bdf(kind: String) = rows(kind).toDF("user_id", "epoch_s", "event_id")
        .withColumn("ts", expr("timestamp_seconds(epoch_s)"))
      val batch = graft.streaming.EventStreams
        .clickViewIntervalJoin(bdf("click"), bdf("view")) // watermark is a no-op in batch
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed === batch)
      assert(streamed.contains((1L, 10L, 10L))) // view 30s before its click
      assert(streamed.contains((1L, 11L, 10L))) // earlier view within 10 min window
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming tumbling counts match the batch computation") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream").toString
    graft.sources.Tables(spark, "/root/testdata/sf0.001", "events")
      .drop("ts_ns").write.mode("overwrite").parquet(tmp)
    val stream = graft.streaming.EventStreams.tumblingCounts(
      graft.streaming.EventStreams.readEventStream(spark, tmp))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("graft_stream_test").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("graft_stream_test")
        .select("win_start", "event_type", "n", "sum_value").collect().toSet
      val batch = graft.queries.SimilarityStreamQueries.defs
        .find(_.name == "ev_window_tumbling").get
        .build(spark, "/root/testdata/sf0.001").collect().toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("stream-static broadcast enrichment matches the batch join") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream").toString
    graft.sources.Tables(spark, "/root/testdata/sf0.001", "events")
      .drop("ts_ns").write.mode("overwrite").parquet(tmp)
    val dim = Seq(("click", 3.0), ("view", 1.0), ("purchase", 10.0))
      .toDF("event_type", "weight")
    val stream = graft.streaming.EventStreams.enrichWithDim(
        graft.streaming.EventStreams.readEventStream(spark, tmp), dim)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum(col("value") * col("weight")), 2).as("wv"))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("graft_dim_test").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("graft_dim_test").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      val batch = graft.sources.Tables(spark, "/root/testdata/sf0.001", "events")
        .join(broadcast(dim), Seq("event_type"))
        .groupBy("event_type").agg(count(lit(1)).as("n")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("update output mode: last emitted row per key equals the batch aggregate") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val raw = graft.sources.Tables(spark, "/root/testdata/sf0.001", "events")
    raw.drop("ts_ns").repartition(3).write.mode("overwrite").parquet(tmp) // ≥3 micro-batches
    // update mode re-emits a key's row on every batch that changes it;
    // with maxFilesPerTrigger=1 keys repeat across batches, and the
    // LAST emission per key must equal the batch-computed final state
    val stream = graft.streaming.EventStreams.readEventStream(spark, tmp,
        maxFilesPerTrigger = Some(1))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"))
    val q = stream.writeStream.outputMode("update")
      .format("memory").queryName("graft_update_test").start()
    try {
      q.processAllAvailable()
      // memory sink in update mode appends each emission; last wins
      val lastPerKey = spark.table("graft_update_test").collect()
        .zipWithIndex
        .groupBy(_._1.getString(0))
        .map { case (k, rows) => k -> rows.maxBy(_._2)._1.getLong(1) }
      val batch = raw.groupBy("event_type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(lastPerKey === batch)
    } finally q.stop()
  }

  test("windowed aggregation state survives a checkpointed restart") {
    import org.apache.spark.sql.Row
    val src = java.nio.file.Files.createTempDirectory("graft_ckpt_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_st").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_ckpt_out").toString
    def ev(id: Long, sec: Long, typ: String) =
      Row(id, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec)),
        7L, typ, 1.0, "{}")
    def writeBatch(rows: Row*): Unit =
      spark.createDataFrame(java.util.List.of(rows: _*),
        graft.streaming.EventStreams.rawSchema).write.mode("append").parquet(src)

    def runOnce(): Unit = {
      val q = graft.streaming.EventStreams.tumblingCounts(
          graft.streaming.EventStreams.readEventStream(spark, src))
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", outDir).start()
      try q.processAllAvailable() finally q.stop()
    }

    // Run 1: window [0,300) gets 3 events, [300,600) gets 1 — the
    // watermark stays far behind, so NOTHING is emitted before stop:
    // the counts exist only in checkpointed state-store data.
    writeBatch(ev(1, 10, "click"), ev(2, 60, "click"), ev(3, 240, "click"),
      ev(4, 310, "click"))
    runOnce()
    assert(spark.read.schema("win_start string, event_type string, n long, sum_value double")
      .parquet(outDir).count() === 0)

    // Run 2 (fresh query, same checkpoint): one more event in [300,600)
    // plus a far-future sentinel that advances the watermark past both
    // windows. The [0,300) count of 3 was accumulated ENTIRELY before
    // the restart — emitting it now proves the state store recovered.
    Thread.sleep(1100) // file source orders batches by mtime
    writeBatch(ev(5, 320, "click"), ev(6, 7200, "sentinel"))
    runOnce()
    val got = spark.read.parquet(outDir)
      .filter(col("event_type") === "click")
      .select("win_start", "n").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === Set(("1970-01-01 00:00:00", 3L), ("1970-01-01 00:05:00", 2L)))
  }

  test("streaming sliding counts match the batch computation") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream").toString
    graft.sources.Tables(spark, "/root/testdata/sf0.001", "events")
      .drop("ts_ns").write.mode("overwrite").parquet(tmp)
    val stream = graft.streaming.EventStreams.slidingCounts(
      graft.streaming.EventStreams.readEventStream(spark, tmp))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("graft_slide_test").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("graft_slide_test")
        .select("win_start", "event_type", "n", "sum_value").collect().toSet
      val batch = graft.queries.SimilarityStreamQueries.defs
        .find(_.name == "ev_window_sliding").get
        .build(spark, "/root/testdata/sf0.001").collect().toSet
      assert(streamed === batch)
      // every event in 2 windows: sliding n-sum = 2x the tumbling n-sum
      val nSliding = streamed.toSeq.map(_.getLong(2)).sum
      val nTumbling = graft.queries.SimilarityStreamQueries.defs
        .find(_.name == "ev_window_tumbling").get
        .build(spark, "/root/testdata/sf0.001")
        .agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0)
      assert(nSliding === 2 * nTumbling)
    } finally q.stop()
  }

  test("split_by_cluster: zero cross-split near-dup pairs; singletons keep the doc-level split") {
    val d = "/root/testdata/sf0.001"
    val split = graft.SparkEntry.queries("split_by_cluster")(spark, d)
      .localCheckpoint(true)
    // the leakage-free property: both sides of every verified near-dup
    // pair land in the same split (impossible for the doc-level draw —
    // split_leakage_check exists because it leaks)
    val pairs = graft.SparkEntry.queries("dedup_neardup_pipeline")(spark, d)
      .select("id_a", "id_b")
    val leaked = pairs
      .join(split.select(col("doc_id").as("id_a"), col("split").as("sa")), "id_a")
      .join(split.select(col("doc_id").as("id_b"), col("split").as("sb")), "id_b")
      .filter(col("sa") =!= col("sb")).count()
    assert(leaked === 0L)
    assert(pairs.count() > 0L) // the property is non-vacuous at sf0.001
    // clustered docs exist AND some singleton would have drawn a
    // DIFFERENT split under its own id — proof the rep-draw is load-bearing
    val moved = split.filter(col("rep") =!= col("doc_id")).count()
    assert(moved > 0L)
    // singletons (rep == doc_id) must match split_train_val_test exactly
    val docLevel = graft.SparkEntry.queries("split_train_val_test")(spark, d)
    val mismatch = split.filter(col("rep") === col("doc_id"))
      .join(docLevel.withColumnRenamed("split", "doc_split"), "doc_id")
      .filter(col("split") =!= col("doc_split")).count()
    assert(mismatch === 0L)
    // full corpus covered, one row per doc
    val docs = graft.sources.Tables(spark, d, "documents").select("doc_id")
    assert(split.count() === docs.count())
  }

  test("mix_epoch_plan invariants: weights sum to ~1e6, plan reconstructs the target") {
    val rows = graft.SparkEntry.queries("mix_epoch_plan")(spark, "/root/testdata/sf0.001")
      .select("n_tokens", "weight_ppm", "target_tokens", "full_epochs", "rem_rate_ppm")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // per-language ppm weights sum to 1e6 up to one rounding ulp per language
    val wsum = rows.map(_._2).sum
    assert(math.abs(wsum - 1000000L) <= rows.length)
    rows.foreach { case (avail, wppm, target, epochs, rem) =>
      assert(target === wppm * 1000L) // 1e9-token budget in ppm units
      assert(epochs === target / avail)
      // remainder rate rounds within [0, 1e6]: a source above 2e6
      // tokens with remainder avail-1 legitimately rounds UP to 1e6
      assert(rem >= 0L && rem <= 1000000L)
      // epochs*avail + rem*avail/1e6 reconstructs target within rounding
      val approx = epochs * avail + (rem * avail) / 1000000L
      assert(math.abs(approx - target) <= avail / 1000000L + 1)
    }
  }
}
