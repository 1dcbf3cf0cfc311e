package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.FileSourceScanExec

/** Storage-layout scale evidence: partition pruning and bucketed
  * co-located joins — the two layout levers a 100 TB deployment uses to
  * keep scans and joins from touching (or shuffling) the whole corpus.
  * The fixture corpus ships as single unpartitioned files, so these
  * tests materialize derived layouts in a temp dir and assert on the
  * resulting PLANS, not just results.
  */
class StorageLayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("JSONL ingest: declared schema, one-pass dead-letter split, no cache") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    val lines = Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en"}""",
      """{"doc_id": 2, "text": "bonjour", "lang": "fr", "extra": "dropped"}""",
      "",
      """{"doc_id": 3, "text": "missing lang"}""",
      """{"doc_id": broken json""",
      """[1, 2, 3]""",
      """"just a string"""")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/part-0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val (valid, quarantine) = graft.sources.Jsonl.read(spark, dir, schema)
    val good = valid.collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(good === Set(
      (1L, "hello world", Some("en")),
      (2L, "bonjour", Some("fr")),          // off-contract field dropped
      (3L, "missing lang", None)))          // missing field -> null
    val bad = quarantine.collect().map(_.getString(0)).toSet
    // malformed line AND well-formed non-objects are quarantined with
    // their raw text; the blank padding line is dropped entirely
    assert(bad === Set("""{"doc_id": broken json""", "[1, 2, 3]", "\"just a string\""))
    assert(quarantine.columns.toSeq === Seq("_raw", "_source_file"))
    assert(quarantine.collect().forall(_.getString(1).contains("part-0.jsonl")))
    // scale contract: the text scan reads ONE pruned column and the
    // split is a filter over it - no caching, no second format pass
    val plan = valid.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<value:string>"), plan)
    assert(!plan.contains("InMemoryTableScan"), plan)
  }

  test("JSONL composes into the streaming dedup ingest: crawl files -> parse -> standing index") {
    import org.apache.spark.sql.types._
    val src = java.nio.file.Files.createTempDirectory("graft_jsonl_stream").toString
    val tbl = java.nio.file.Files.createTempDirectory("graft_jsonl_tbl").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$src/crawl-0.jsonl"),
      Seq(
        """{"doc_id": 1, "text": "aaa bbb ccc ddd eee fff ggg hhh"}""",
        """{"doc_id": 2, "text": "aaa bbb ccc ddd eee fff ggg hhh"}""",
        """not json at all""",
        """{"doc_id": 3, "text": "zzz yyy xxx www vvv uuu ttt sss"}"""
      ).mkString("\n").getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val lines = spark.readStream.text(src)
      .select(col("value").as(graft.sources.Jsonl.RawCol))
    val (docs, _) = graft.sources.Jsonl.split(lines, schema)
    val q = graft.streaming.DocStreams.dedupIngest(docs, tbl)
    try q.processAllAvailable() finally q.stop()
    val clusters = graft.operators.Lakehouse.readCurrent(spark, tbl, "clusters")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // the two duplicate crawl docs clustered; the corrupt line never
    // reached the index; the distinct doc is not in any cluster
    assert(clusters(1L) === clusters(2L))
    assert(!clusters.contains(3L))
  }

  test("hive-style partition layout prunes partitions at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    graft.sources.Tables(spark, "/root/testdata/sf0.001", "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(dir)

    val q = spark.read.parquet(dir).filter(col("o_year") === 1997)
    val scan = q.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.get
    // partition filter reached the scan, and only 1997's files are read
    assert(scan.partitionFilters.nonEmpty, "no partition filters on scan")
    val read = scan.relation.location.listFiles(scan.partitionFilters, Nil)
    assert(read.size === 1, s"expected 1 pruned partition, read ${read.size}")
    assert(q.count() ===
      graft.sources.Tables(spark, "/root/testdata/sf0.001", "orders")
        .filter(year(col("o_orderdate")) === 1997).count())
  }

  test("schema evolution: mergeSchema unions columns across file generations") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evo").toString
    // generation 1: (id, v); generation 2 adds a column
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", 30.0), (4L, "d", 40.0)).toDF("id", "v", "score")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq === Seq("id", "score", "v"))
    // old-generation rows surface the new column as null
    val rows = merged.select("id", "score").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(rows === Map(1L -> None, 2L -> None, 3L -> Some(30.0), 4L -> Some(40.0)))
    // predicates on the evolved column still push down and work
    assert(merged.filter(col("score") > 35.0).select("id").collect()
      .map(_.getLong(0)).toSeq === Seq(4L))
  }

  test("ORC round-trip with predicate pushdown (multi-format source/sink)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val src = graft.sources.Tables(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir).filter(col("o_orderpriority") === "1-URGENT")
    val scan = back.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.get
    assert(scan.metadata.getOrElse("PushedFilters", "").contains("o_orderpriority"),
      s"no pushed filter on ORC scan: ${scan.metadata}")
    assert(back.count() ===
      src.filter(col("o_orderpriority") === "1-URGENT").count())
  }

  test("bucketed tables join without a shuffle exchange") {
    // DROP only clears the in-memory catalog entry; the warehouse
    // directory outlives the JVM and re-creation fails with
    // LOCATION_ALREADY_EXISTS — remove the locations too.
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    Seq("graft_bkt_orders", "graft_bkt_lineitem").foreach { tbl =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val dir = java.nio.file.Paths.get(wh, tbl)
      if (java.nio.file.Files.exists(dir)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    graft.sources.Tables(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("graft_bkt_orders")
    graft.sources.Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("graft_bkt_lineitem")

    val joined = spark.table("graft_bkt_orders")
      .join(spark.table("graft_bkt_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey").agg(sum("l_quantity").as("q"))
    // co-located bucket layout: the join itself needs no shuffle of
    // either side (broadcast is disabled to force the SMJ path)
    val noBcast = joined.hint("merge")
    val exchanges = noBcast.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty,
      s"bucketed join still shuffles:\n${noBcast.queryExecution.executedPlan}")
    // and the result matches the unbucketed computation
    val want = graft.sources.Tables(spark, "/root/testdata/sf0.001", "orders")
      .join(graft.sources.Tables(spark, "/root/testdata/sf0.001", "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey").agg(sum("l_quantity").as("q"))
      .as[(Long, Double)].collect().toSet
    assert(noBcast.as[(Long, Double)].collect().toSet === want)
  }

  test("z-ordered layout skips parquet row groups on a single-dimension predicate") {
    import scala.jdk.CollectionConverters._
    // The point of the Morton key (zorder_layout_key): ONE clustered
    // order serves selective predicates on EITHER dimension through
    // row-group min/max stats. Materialize the z-clustered layout with
    // deliberately small row groups, then prove BOTH halves of the
    // contract: (footers) some groups' xb windows exclude the
    // predicate entirely, and (behavior) Spark's scan reads no more
    // rows than the surviving groups hold.
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val withDims = graft.sources.Tables(spark, "/root/testdata/sf0.1", "part")
      .withColumn("xb", col("p_size").cast("long"))
      .withColumn("yb", floor(col("p_retailprice") / 100.0).cast("long"))
    val z = (0 until 8).map { i =>
      expr(s"(shiftright(xb, $i) & 1) * ${1L << (2 * i)} + " +
        s"(shiftright(yb, $i) & 1) * ${1L << (2 * i + 1)}")
    }.reduce(_ + _)
    withDims.withColumn("z", z)
      .select("p_partkey", "xb", "yb", "z")
      .repartitionByRange(2, col("z"))
      .sortWithinPartitions("z")
      .write.option("parquet.block.size", 8 * 1024)
      .mode("overwrite").parquet(dir)

    // footer stats: per-row-group (rows, xb_min, xb_max)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    val groups = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .flatMap { f =>
        val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f.getPath, conf))
        try rdr.getFooter.getBlocks.asScala.map { b =>
          val st = b.getColumns.asScala
            .find(_.getPath.toDotString == "xb").get.getStatistics
          (b.getRowCount,
            st.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
            st.genericGetMax.asInstanceOf[java.lang.Long].longValue())
        }.toSeq
        finally rdr.close()
      }
    assert(groups.length >= 8, s"layout produced too few row groups: ${groups.length}")
    val survives = (mn: Long, mx: Long) => mx >= 1L && mn <= 5L // xb BETWEEN 1 AND 5
    val skippable = groups.filter { case (_, mn, mx) => !survives(mn, mx) }
    assert(skippable.nonEmpty,
      s"z-clustering left no group skippable on xb alone:\n${groups.mkString("\n")}")
    val survivingRows = groups.collect { case (n, mn, mx) if survives(mn, mx) => n }.sum
    val totalRows = groups.map(_._1).sum

    // behavior: the scan's output is bounded by the surviving groups
    val q = spark.read.parquet(dir).filter(col("xb").between(1, 5))
      .agg(sum("z").as("sz"))
    q.collect()
    // after execution the scan sits inside AdaptiveSparkPlanExec's
    // final plan, which TreeNode.collect does not traverse
    def findScan(p: org.apache.spark.sql.execution.SparkPlan): Option[FileSourceScanExec] =
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          findScan(a.executedPlan)
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          findScan(qs.plan)
        case s: FileSourceScanExec => Some(s)
        case other => other.children.iterator.flatMap(findScan).nextOption()
      }
    val scan = findScan(q.queryExecution.executedPlan).get
    assert(scan.metadata.getOrElse("PushedFilters", "").contains("xb"),
      s"xb predicate not pushed: ${scan.metadata}")
    val read = scan.metrics("numOutputRows").value
    assert(read <= survivingRows,
      s"scan read $read rows but surviving groups hold only $survivingRows")
    assert(read < totalRows,
      s"no row groups skipped: read $read of $totalRows")
  }
}
