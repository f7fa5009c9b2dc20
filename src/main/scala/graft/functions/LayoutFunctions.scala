package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Data-layout keys for multi-dimensional data skipping. A table
 * range-partitioned/sorted by a Z-order (Morton) key clusters rows that are
 * close in BOTH dimensions into the same files, so min/max file statistics
 * prune scans filtered on either dimension — the standard lakehouse layout
 * trick for two-predicate workloads where a single-column sort only helps one
 * predicate. At 100 TB: `df.repartitionByRange(col("z")).sortWithinPartitions
 * (col("z")).write...` and both `x` and `y` predicates prune files.
 *
 * Built from codegen'd shift/mask built-ins only — the same arithmetic is
 * expressible verbatim in the DuckDB oracle (q70).
 */
object LayoutFunctions {

  /**
   * Morton/Z-order key interleaving the low `bits` bits of `x` and `y`
   * (x in even positions, y in odd). Inputs must already be non-negative
   * integers that fit in `bits` bits — mask/scale them first; bits <= 31
   * keeps the key in a positive long.
   */
  def zorder(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "zorder needs 1 <= bits <= 31")
    (0 until bits).map { i =>
      (shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)): Column
    }.reduce(_ + _) // bit positions are disjoint: sum == bitwise OR
  }
}
