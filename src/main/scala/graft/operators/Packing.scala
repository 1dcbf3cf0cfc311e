package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sequence packing: assembling documents into fixed token-budget
  * training sequences — the last mile of an LLM data pipeline.
  *
  * Two policies:
  *  - [[withGlobalCumsum]] / offset packing: assign each doc to the bin
  *    its global running-token-offset starts in (`(cumsum - n) / budget`).
  *    Partition-independent and exactly oracle-able; bins can overflow
  *    by at most one document's tail.
  *  - [[packGreedy]]: true greedy reset packing (open a new sequence
  *    when the next doc would overflow the budget) per range partition.
  *    Bins never span partitions, so the scan is embarrassingly
  *    parallel; the policy is invariant-tested rather than oracled
  *    because bin boundaries depend on partitioning.
  *
  * The global cumsum is the classic two-phase distributed prefix sum,
  * Spark-shaped: range-partition on the order key (so partition i holds
  * strictly smaller keys than partition i+1), scan each partition once
  * to form local running sums — fully parallel, no single-partition
  * global window, no re-shuffle of already-laid-out data — and seed
  * each scan with its partition's broadcast prefix offset. Only the
  * per-partition TOTALS (one row per partition) ever reach the driver:
  * metadata, not data.
  *
  * Reference context: no packing surface in the reference; training-
  * pipeline extension (SURVEY §7.5).
  */
object Packing {

  /** Adds `cumsum` = inclusive running sum of `valCol` in global
    * `orderCol` order. Requires distinct order keys for a deterministic
    * result. Output also carries the input columns.
    *
    * The local cumsum is a per-partition linear scan (`mapPartitions`),
    * NOT a `Window.partitionBy(partition-id)` — the window would plan a
    * redundant Exchange+Sort onto data the range partition already laid
    * out; the scan reads the persisted layout in place, so the whole
    * prefix sum costs exactly one data shuffle (the range partition). */
  def withGlobalCumsum(
      spark: SparkSession,
      df: DataFrame,
      orderCol: String,
      valCol: String): DataFrame = {
    // ONE materialization: localCheckpoint the range-partitioned layout
    // itself, LAZILY — the blocks are written by the first job that
    // computes them, which is the totals scan below, so layout + totals
    // cost one job instead of two. The checkpoint (a) freezes the
    // sampling-derived range bounds so the __pid ↔ offset pairing below
    // can never be broken by a re-bucketing re-execution, (b) serves
    // both the totals scan and the cumsum scan from the same blocks,
    // and (c) is released by the ContextCleaner once the returned frame
    // is unreferenced — unlike persist(), whose CacheManager entry
    // lives for the session and accumulated across benchmark passes.
    // Round 4 wrote the data twice (persist + a second checkpoint of
    // the output); this writes it once, in-line with the totals job,
    // and leaves the cumsum a narrow re-scannable map.
    val parted = df
      .repartitionByRange(col(orderCol))
      .sortWithinPartitions(orderCol)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false)

    // one row per partition — driver-side metadata, not the data plane
    val totals = parted.groupBy("__pid")
      .agg(sum(col(valCol)).as("__t"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (pid, t) =>
      val off = acc; acc += t; (pid, off)
    }.toMap
    val bcOffsets = spark.sparkContext.broadcast(offsets)

    val schema = parted.schema
    val vIdx = schema.fieldIndex(valCol)
    val pIdx = schema.fieldIndex("__pid")
    val outSchema = schema.add("cumsum", org.apache.spark.sql.types.LongType)
    // Seed from the __pid COLUMN, not TaskContext.getPartitionId(): a
    // downstream coalesce() merges partitions into one task whose task
    // partition id is NOT the parent RDD partition — the column is
    // self-consistent with the totals above by construction, whatever
    // task composition the final plan chooses. Rows of one __pid block
    // stay contiguous and key-ordered (narrow ops preserve intra-
    // partition order; coalesce concatenates parents in index order).
    // The cumsum itself stays LAZY: it is a narrow linear scan over the
    // frozen checkpoint blocks, deterministic on every re-evaluation, so
    // a second materialization here would only duplicate the write.
    parted.mapPartitions { rows =>
      var curPid = Int.MinValue
      var acc = 0L
      rows.map { r =>
        val pid = r.getInt(pIdx)
        if (pid != curPid) { curPid = pid; acc = bcOffsets.value.getOrElse(pid, 0L) }
        acc += r.getLong(vIdx)
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ acc)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
      .drop("__pid")
  }

  /** Offset packing: (doc, n_tokens, seq_id) where seq_id is the bin
    * the doc's global token offset starts in. Deterministic, exactly
    * oracle-able; a bin may overflow by one document's tail. */
  def packByOffset(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      tokCol: String,
      budget: Long): DataFrame =
    withGlobalCumsum(spark, df, idCol, tokCol)
      .withColumn("seq_id", expr(s"(cumsum - `$tokCol`) div ${budget}L"))
      .drop("cumsum")

  /** Greedy reset packing per range partition: docs are taken in id
    * order; a sequence closes when the next doc would push it past the
    * budget (docs larger than the budget get a singleton sequence).
    * Sequences never span partitions; ids are (partition << 32 | seq).
    * Per-partition imperative state is exactly what `mapPartitions` is
    * for — this is not expressible as a window function. */
  def packGreedy(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      tokCol: String,
      budget: Long): DataFrame = {
    import spark.implicits._
    // Seed the sequence-id prefix from a spark_partition_id() COLUMN
    // frozen by an eager localCheckpoint — NOT TaskContext
    // .getPartitionId() inside mapPartitions. Under a downstream
    // coalesce() the merged task re-runs the closure once per parent
    // partition but reports ONE task partition id for all of them, so
    // (pid << 32 | seq) would collide and silently merge unrelated
    // sequences across parents (same hazard withGlobalCumsum documents;
    // the checkpoint pins ids assigned while partition ids were real).
    val parted = df.select(col(idCol).cast("long").as("doc_id"),
        col(tokCol).cast("long").as("n_tokens"))
      .repartitionByRange(col("doc_id"))
      .sortWithinPartitions("doc_id")
      .withColumn("__pid", spark_partition_id().cast("long"))
      .localCheckpoint(true)
    parted.as[(Long, Long, Long)]
      .mapPartitions { rows =>
        var curPid = Long.MinValue
        var seq = 0L
        var fill = 0L
        rows.map { case (id, n, pid) =>
          if (pid != curPid) { curPid = pid; seq = 0L; fill = 0L }
          if (fill > 0L && fill + n > budget) { seq += 1L; fill = 0L }
          fill += n
          (id, n, (pid << 32) | seq)
        }
      }
      .toDF("doc_id", "n_tokens", "seq_id")
  }
}
