package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed key distributions.
  *
  * When a handful of hot keys dominate the big side, a plain hash join
  * funnels each hot key into one reducer regardless of cluster size. Salting
  * spreads each key over `saltBuckets` sub-partitions: the big side gets a
  * deterministic row-content salt, the small side is replicated once per
  * bucket, and the join runs on (keys..., salt) — hot keys now occupy
  * `saltBuckets` reducers. AQE's skew-join split handles moderate skew
  * automatically; this utility is for planned-for skew (e.g. a known
  * power-law key) where replicating the small side is cheaper than runtime
  * re-splitting.
  *
  * The salt is `xxhash64(all big-side columns) mod saltBuckets` —
  * deterministic under task retries (unlike rand()), at the cost of leaving
  * fully-identical duplicate rows on one bucket (harmless unless the skew IS
  * duplicate rows).
  */
object SkewJoin {

  def saltedInnerJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0, s"saltBuckets must be positive, got $saltBuckets")
    val saltCol = "graft_salt"
    require(!big.columns.contains(saltCol) && !small.columns.contains(saltCol),
      s"inputs must not already carry a '$saltCol' column")
    val bigSalted = big.withColumn(saltCol,
      pmod(xxhash64(big.columns.map(col).toSeq: _*), lit(saltBuckets)))
    val smallReplicated = small.withColumn(saltCol,
      explode(array((0 until saltBuckets).map(i => lit(i.toLong)): _*)))
    bigSalted.join(smallReplicated, keys :+ saltCol)
      .drop(saltCol)
  }

  /** Column-level helper for manual salting in ad-hoc plans. */
  def saltOf(allCols: Seq[Column], saltBuckets: Int): Column =
    pmod(xxhash64(allCols: _*), lit(saltBuckets))
}
