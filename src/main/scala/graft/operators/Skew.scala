package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted shuffle join for skewed keys.
  *
  * A shuffle hash/merge join routes every row of one key to ONE reduce
  * task; at 100 TB a single hot key (the null-ish user, the default
  * product, the empty document hash) turns into one straggler task
  * holding gigabytes while 999 executors idle. Salting splits each hot
  * key's rows across `salt` sub-partitions: the big side gets a random
  * salt in [0, salt), the small side is replicated once per salt value
  * (an `explode` of a literal sequence — `salt`× duplication of the
  * SMALL side only), and the join key becomes (key, salt). Join output
  * is IDENTICAL to the unsalted join — the salt only re-shapes the
  * shuffle — so the operator carries an exact oracle.
  *
  * This is the static form; AQE's skew-join split handles the same
  * problem adaptively for sort-merge joins when the skew is visible in
  * shuffle statistics — salting remains the tool when the skew is known
  * ahead of time, the join is hash-based, or the hot key must never
  * materialize in one task to begin with.
  *
  * Reference context: no join tuning surface in the reference (its
  * row-at-a-time loops cannot skew); training-pipeline extension
  * (SURVEY §7.5).
  */
object Skew {

  /** Inner equi-join of `big` with (much smaller, but not broadcast-
    * small) `small`, salted `salt` ways. Output = plain inner join. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    // rand() is seeded → deterministic plan; which salt a row draws is
    // irrelevant to the result, only to shuffle balance
    val bigSalted = big.withColumn("__salt", floor(rand(7L) * salt).cast("int"))
    // shuffle_hash hint: this operator exists for the case where the
    // build side is NOT broadcast-small — without the hint a small test
    // fixture would be broadcast and the salt would demonstrate nothing.
    // Hash (not merge) join keeps the big side streaming, build side =
    // the replicated small frame.
    val smallSalted = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
      .hint("shuffle_hash")
    bigSalted.join(smallSalted, Seq(key, "__salt")).drop("__salt")
  }
}
