package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.QSketch

class QSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference bucket/boundary in plain Scala for cross-checking
    * (overflow-free: sub-bucket via the exact divisor 2ᵉ/16). */
  private def refBucket(v: Long): Long = {
    val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
    val pow = 1L << e
    val sub = if (e >= 4) (v - pow) / (pow / 16) else (v - pow) * 16 / pow
    e.toLong * 16 + sub
  }
  private def refLower(b: Long): Long = {
    val pow = 1L << (b / 16)
    pow + (if (b / 16 >= 4) (b % 16) * (pow / 16) else (b % 16) * pow / 16)
  }

  test("bucket/lowerBound: est <= v and one-sided 1/16 bound for adversarial values") {
    graft.functions.GraftFunctions.register(spark)
    val vs = Seq(1L, 2L, 3L, 15L, 16L, 17L, 31L, 32L, 33L, 1000L,
      (1L << 40) - 1, 1L << 40, (1L << 40) + 1, (1L << 62) - 1, Long.MaxValue)
    val got = vs.toDF("v")
      .select(col("v"), QSketch.bucket("v").as("b"))
      .select(col("v"), col("b"), QSketch.lowerBound("b").as("lb"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (v, b, lb) =>
      assert(b == refBucket(v), s"bucket($v)")
      assert(lb == refLower(b), s"lowerBound($b)")
      assert(lb <= v, s"est > value for $v")
      // 16*(v - lb) <= lb + 16, avoiding overflow near Long.MaxValue
      assert((v - lb) <= lb / 16 + 1, s"bound violated for $v (lb=$lb)")
    }
  }

  test("quantiles read the lower boundary of the rank bucket (hand-computed)") {
    val df = (1L to 100L).map(("g", _)).toDF("grp", "v")
    val got = QSketch.quantiles(QSketch.histogram(df, "grp", "v"), Seq(50, 99))
      .collect().map(r => r.getInt(1) -> (r.getLong(2), r.getLong(3))).toMap
    // rank 50 -> v=50: e=5, sub=(50-32)*16/32=9, lb=32+9*32/16=50 (exact)
    assert(got(50) == (100L, 50L))
    // rank 99 -> v=99: e=6, sub=(99-64)*16/64=8, lb=64+8*64/16=96
    assert(got(99) == (100L, 96L))
  }

  test("weighted histogram: quantiles follow the weight mass, not the row count") {
    // rows (10,w=1), (20,w=1), (30,w=8): the count median is 20, but
    // 8 of the 10 units of weight sit at 30
    val df = Seq((10L, 1L), (20L, 1L), (30L, 8L)).toDF("v", "w")
      .withColumn("grp", lit("g"))
    val got = QSketch.quantiles(
        QSketch.histogramWeighted(df, "grp", "v", "w"), Seq(50))
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((50, 10L, 30L)))
  }

  test("histograms merge exactly: sum of halves == sketch of the union") {
    val all = (1L to 500L).map(i => ("g", i * i % 997 + 1)).toDF("grp", "v")
    val h1 = QSketch.histogram(all.filter(col("v") <= 300), "grp", "v")
    val h2 = QSketch.histogram(all.filter(col("v") > 300), "grp", "v")
    val merged = h1.unionAll(h2).groupBy("grp", "bucket").agg(sum("cnt").as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val direct = QSketch.histogram(all, "grp", "v")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged === direct)
    assert(merged.values.sum == 500L)
  }
}
