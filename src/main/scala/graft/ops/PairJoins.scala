package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked triangle self-join — the scale-correct way to spend an
  * unavoidable O(n²) pair enumeration.
  *
  * Exact all-pairs operators (global top-k cosine, low-threshold set
  * similarity on a corpus with no similarity gap) cannot be made
  * sub-quadratic without losing exactness, but HOW the quadratic work is
  * laid out decides whether it runs at scale. A `a.id < b.id` theta join
  * plans as BroadcastNestedLoopJoin: one side must fit in (and be
  * broadcast to) every executor, and each task streams the whole other
  * side — the textbook 100 TB scale-killer. This helper instead assigns
  * every row a block `g = id mod B` and replicates it to the B tasks of
  * the block-pair triangle {(p,q) : p <= q, p = g or q = g}; pairs then
  * come out of a plain equi-join on (keys…, p, q):
  *
  *  - shuffle, not broadcast: rows move once, hashed by block pair; no
  *    executor ever holds more than two blocks (2n/B rows) — raise B as
  *    n grows and per-task memory stays constant;
  *  - even tasks: B(B+1)/2 independent block pairs spread over the
  *    cluster, immune to key skew (blocks are id-hash sized);
  *  - half the comparisons of a salted replicate-one-side layout: the
  *    triangle enumerates each unordered pair once (diagonal blocks
  *    deduplicate by id order, off-diagonal pairs are met exactly once).
  *
  * Every pair surfaces as two struct columns `a`/`b` with `a.id < b.id`,
  * so symmetric similarity kernels (dot product, popcount Jaccard) see
  * canonical order regardless of which block each row landed in.
  */
object PairJoins {

  /** All unordered row pairs of `df` (as structs `a`, `b` with
    * `a(idCol) < b(idCol)`), optionally restricted to rows that agree on
    * `keys`. `blocks` bounds per-task memory: each task joins two blocks
    * of ~n/blocks rows.
    */
  def trianglePairs(df: DataFrame, keys: Seq[String], idCol: String,
      blocks: Int): DataFrame = {
    val payload = struct(df.columns.map(col): _*)
    val base = df.withColumn("_g", pmod(col(idCol), lit(blocks)).cast("int"))
    val aRep = base.select(keys.map(col) ++ Seq(
      col("_g").as("_p"),
      explode(sequence(col("_g"), lit(blocks - 1))).as("_q"),
      payload.as("_a")): _*)
    val bRep = base.select(keys.map(col) ++ Seq(
      explode(sequence(lit(0), col("_g"))).as("_p"),
      col("_g").as("_q"),
      payload.as("_b")): _*)
    aRep.join(bRep, keys ++ Seq("_p", "_q"))
      // diagonal blocks see every in-block pair twice — keep id order;
      // off-diagonal pairs are met exactly once (possibly id-reversed)
      .filter(col("_p") =!= col("_q") || col("_a")(idCol) < col("_b")(idCol))
      .select(keys.map(col) ++ Seq(
        when(col("_a")(idCol) < col("_b")(idCol), col("_a")).otherwise(col("_b")).as("a"),
        when(col("_a")(idCol) < col("_b")(idCol), col("_b")).otherwise(col("_a")).as("b")): _*)
  }
}
