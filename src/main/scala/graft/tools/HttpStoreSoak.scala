package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Volume soak for the HTTP FHIR store path ([[graft.sinks.HttpFhirStore]]
  * against [[graft.sinks.FhirFixtureServer]]): 50 000 patients through the
  * executor-side bundle sink, then the distributed offset pager, the
  * identifier-system-scoped snapshot, and a delete delta — every phase
  * checked against closed forms, not just timed:
  *
  *  - seed: 50 000 PUT upserts over 4 even partitions of 12 500 rows at
  *    bundleSize=100 ⇒ EXACTLY 500 transaction POSTs (the ⌈N/100⌉
  *    batching contract, vs the reference's one request per row —
  *    cnics_to_fhir.py:339-354);
  *  - snapshot: `_summary=count` + 50 offset pages fanned over >1
  *    partition ⇒ exactly the 50 000 (key, id) rows, all distinct;
  *  - scoped snapshot (`identifier=s-uw|`): even ids only ⇒ 25 000;
  *  - delta: DELETE every 4th id (12 500 bundles entries) ⇒ server
  *    holds 37 500, and the re-snapshot agrees.
  *
  * The server is in-JVM, so the numbers measure the protocol path
  * (bundle building, paging, JSON parse, executor fan-out) rather than
  * network bandwidth — which is the part this engine owns at scale.
  * Prints one JSON evidence line; recorded in BASELINE.md.
  */
object HttpStoreSoak {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val n = 50000L
    val srv = new graft.sinks.FhirFixtureServer()
    val port = srv.start()
    try {
      val store = new graft.sinks.HttpFhirStore(s"http://localhost:$port")

      // 4 even range slices of 12,500 rows -> ceil(12500/100) = 125
      // bundles each: the POST count has a closed form.
      val seed = spark.range(0, n, 1, 4)
        .select(
          concat(lit("p"), col("id")).as("key"),
          concat(lit("pat-"), col("id")).as("id"),
          concat(lit("""{"identifier":[{"system":"s-"""),
            when(col("id") % 2 === 0, "uw").otherwise("sea"),
            lit("""","value":"p"""), col("id"), lit(""""}]}""")).as("json"),
          lit("insert").as("merge_action"))
      val (seedCounts, tSeed) = timed(store.applyActions("Patient", seed))
      require(seedCounts == Map("insert" -> n), s"seed counts: $seedCounts")
      val postsSeed = srv.posts.get()
      require(postsSeed == 500, s"expected 500 seed bundles, got $postsSeed")

      val (snap, tSnap) = timed {
        val df = store.snapshot(spark, "Patient")
        val parts = df.rdd.getNumPartitions
        val rows = df.count()
        val keys = df.select("key").distinct().count()
        (parts, rows, keys)
      }
      require(snap._1 > 1, s"offset pager must fan out: ${snap._1} partition(s)")
      require(snap._2 == n && snap._3 == n, s"snapshot rows/keys: $snap")

      val (scoped, tScoped) = timed(
        store.snapshot(spark, "Patient", Some("s-uw")).count())
      require(scoped == n / 2, s"scoped snapshot: $scoped")

      val doomed = spark.range(0, n, 4, 4)
        .select(
          concat(lit("p"), col("id")).as("key"),
          concat(lit("pat-"), col("id")).as("id"),
          lit(null: String).as("json"),
          lit("delete").as("merge_action"))
      val (delCounts, tDelta) = timed(store.applyActions("Patient", doomed))
      require(delCounts == Map("delete" -> n / 4), s"delete counts: $delCounts")
      val survivors = srv.count("Patient")
      require(survivors == n - n / 4, s"survivors: $survivors")
      val resnap = store.snapshot(spark, "Patient").count()
      require(resnap == survivors, s"re-snapshot: $resnap vs $survivors")

      // incremental read path: 500 targeted keys out of 37,500 survivors
      // through snapshotForKeys — the wire cost must be the token-OR
      // batch count (ceil(500/100) = 5 searches), not a store walk.
      // one partition so the batch count has a closed form (in prod the
      // partitions ARE the fan-out; per-partition batching still holds)
      val dirty = spark.range(0, 500)
        .select(concat(lit("p"), col("id") * 100 + 1).as("key"))
        .coalesce(1)
      val gets0 = srv.gets.get()
      val (targeted, tKeys) = timed(
        store.snapshotForKeys(spark, "Patient", dirty, Some("s-sea")).count())
      val keyGets = srv.gets.get() - gets0
      require(targeted == 500, s"targeted snapshot: $targeted")
      require(keyGets == 5, s"expected 5 token-OR searches, got $keyGets")

      def f(d: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(d))
      println(s"""{"soak":"http_store","patients":$n,"seed_posts":$postsSeed,""" +
        s""""seed_s":${f(tSeed)},"snapshot_s":${f(tSnap)},""" +
        s""""scoped_snapshot_s":${f(tScoped)},"delete_delta_s":${f(tDelta)},""" +
        s""""keyed_snapshot_s":${f(tKeys)},"keyed_searches":$keyGets,""" +
        s""""snapshot_partitions":${snap._1},"survivors":$survivors}""")
    } finally {
      srv.stop()
      spark.stop()
    }
  }
}
