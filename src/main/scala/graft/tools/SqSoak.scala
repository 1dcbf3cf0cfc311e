package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale soak for the SQ8 family: quantifies the PACKED codegen'd
  * ADC scan ([[graft.functions.Sq8AdcSum]] over (vec, codes) rows)
  * against the row-EXPLODED oracle shape ((vec, dim, code) ⋈ LUT join)
  * at ~250× the sf0.1 fixture. The exploded plan joins
  * |Q|·N·dim rows before its first aggregate (at 32 queries × 500k
  * vectors × 64 dims that is ~1e9 joined rows); the packed plan scores
  * |Q|·N rows with a 64-step tight loop each — the shape a 100 TB code
  * index needs. Asserts the two plans' top-3 are row-identical
  * (integer ADC sums are order-insensitive) and measures SQ8 recall@3
  * vs the exact full-precision L2 ranking on the same corpus. Prints
  * one JSON evidence line; recorded in BASELINE.md. */
object SqSoak {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    import graft.operators.Sq

    val nVecs = args.headOption.map(_.toLong).getOrElse(500000L)
    // front-loaded deterministic corpus (the MrlSoak generator)
    val vecs = SoakCorpus.frontLoaded(spark, nVecs)
    val probes = vecs.filter(col("vec_id") < 32).localCheckpoint(true)

    import SoakCorpus.timed
    def rank4(df: DataFrame) = SoakCorpus.rank4Long(df)

    val bounds = Sq.train(vecs, "embedding").localCheckpoint(true)
    val topk = udaf(graft.functions.TopKAgg.longs(3))
    def heap3(ranked: DataFrame): DataFrame = ranked
      .groupBy("query_id")
      .agg(topk((-col("adist_e6")).cast("double"), col("cand_id")).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("query_id"), col("e._2").as("cand_id"),
        (-col("e._1")).cast("long").as("adist_e6"),
        (col("pos") + 1).cast("int").as("rnk"))

    // index build walls (both layouts, checkpointed so scans don't retrain)
    val (codesLong, wEncLong) = timed {
      val c = Sq.encode(vecs, "vec_id", "embedding", bounds).localCheckpoint(true)
      c.count(); c
    }
    val (codesPacked, wEncPacked) = timed {
      val c = Sq.encodePacked(vecs, "vec_id", "embedding", bounds).localCheckpoint(true)
      c.count(); c
    }

    // EXPLODED scan (the oracle shape): |Q|·N·dim joined rows
    val lut = Sq.adcLut(probes, "vec_id", "embedding", bounds).localCheckpoint(true)
    val (exploded, wExploded) = timed(rank4(heap3(
      codesLong.select(col("vec_id").as("cand_id"), col("dim"), col("code"))
        .join(broadcast(lut), Seq("dim", "code"))
        .filter(col("cand_id") =!= col("query_id"))
        .groupBy("query_id", "cand_id").agg(sum("dq_e6").as("adist_e6")))))

    // PACKED scan: |Q|·N rows through the codegen'd kernel
    val lutP = Sq.adcLutPacked(probes, "vec_id", "embedding", bounds).localCheckpoint(true)
    val (packed, wPacked) = timed(rank4(heap3(
      codesPacked.select(col("vec_id").as("cand_id"), col("codes"))
        .crossJoin(broadcast(lutP))
        .filter(col("cand_id") =!= col("query_id"))
        .select(col("query_id"), col("cand_id"),
          expr("graft_sq8_adc(codes, lut)").as("adist_e6")))))

    val equal = packed == exploded

    // recall vs exact full-precision squared L2 (bounded heap)
    val ed = vecs.select(col("vec_id"),
      expr("transform(embedding, v -> CAST(v AS DOUBLE))").as("emb_d"))
    val exact = ed.select(col("vec_id").as("cand_id"), col("emb_d").as("c_emb"))
      .crossJoin(broadcast(ed.filter(col("vec_id") < 32)
        .select(col("vec_id").as("query_id"), col("emb_d").as("q_emb"))))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("dist_e6",
        expr("CAST(floor(graft_l2sq(q_emb, c_emb) * 1000000.0D) AS BIGINT)"))
      .groupBy("query_id")
      .agg(topk((-col("dist_e6")).cast("double"), col("cand_id")).as("tk"))
      .select(col("query_id"), explode(expr("transform(tk, e -> e._2)")).as("cand_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = packed.map(t => (t._1, t._2))
    val recall = (exact & got).size.toDouble / exact.size

    println(s"""{"soak":"sq8_packed_scan","n_vecs":$nVecs,"n_queries":32,"dim":64,"wall_encode_long":${f"$wEncLong%.1f"},"wall_encode_packed":${f"$wEncPacked%.1f"},"wall_exploded_scan":${f"$wExploded%.1f"},"wall_packed_scan":${f"$wPacked%.1f"},"plans_equal":$equal,"recall_at_3":${f"$recall%.4f"}}""")
    assert(equal, "packed and exploded SQ8 rankings diverged at soak scale")
    spark.stop()
  }
}
