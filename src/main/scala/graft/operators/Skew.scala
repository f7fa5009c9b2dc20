package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Explicit skew mitigation: salted equi-join for keys too hot for AQE's
 * runtime skew split (AQE rebalances oversized partitions it can SPLIT, but a
 * single key's rows land in one hash partition regardless — salting is the
 * only way to spread ONE key over many reducers).
 */
object Skew {

  /**
   * Equi-join `probe ⋈ build` on `key`, with the hot-key shuffle spread over
   * `factor` reducers: probe rows get a deterministic salt
   * `pmod(hash(idCol), factor)`, the (smaller) build side replicates once per
   * salt value, and the join key becomes `(key, salt)`. Every probe row still
   * meets every matching build row exactly once, so the result is
   * row-identical to the plain join (pinned in SkewSpec) — the cost is
   * `factor`× the build side's shuffle volume, bought deliberately to break
   * the single-reducer bottleneck.
   */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 idCol: Column, factor: Int): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    // a fixed temp name would silently clobber (and then drop) a caller
    // column of the same name, breaking the row-identity contract
    var saltCol = "_graft_salt"
    while (probe.columns.contains(saltCol) || build.columns.contains(saltCol))
      saltCol += "_"
    val salted = probe.withColumn(saltCol, pmod(hash(idCol), lit(factor)))
    val replicated = build.withColumn(saltCol,
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, saltCol)).drop(saltCol)
  }
}
