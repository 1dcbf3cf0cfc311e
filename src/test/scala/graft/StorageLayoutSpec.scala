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
}
