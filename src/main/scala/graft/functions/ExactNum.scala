package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Cross-engine-exact numeric aggregation helpers.
  *
  * Floating-point SUM is order-dependent, and a distributed engine cannot
  * promise the same accumulation order as a single-node oracle. Money-like
  * columns in the testdata carry 2-decimal values stored as doubles, so we
  * aggregate them as exact decimals (associative, order-independent) and cast
  * the final result back to double: every engine then produces the identical
  * bit pattern. This also holds on a 1000-executor cluster where partial
  * aggregates combine in arbitrary order — decimal sums make the answer
  * deterministic at any scale.
  */
object ExactNum {
  private val D = DecimalType(18, 2)
  // Tight widths for products: keeps double- and triple-factor products
  // well inside 38 digits in BOTH Spark and the DuckDB oracle, so neither
  // engine hits precision-loss rescaling and both stay bit-exact.
  private val DP = DecimalType(12, 2) // money/quantity (< 10^10)
  private val DS = DecimalType(4, 2)  // small rates: discount/tax (< 100)
  private val ONE = lit(1).cast(DecimalType(3, 2))

  /** The column rounded to an exact 2-decimal decimal. */
  def dec2(c: Column): Column = c.cast(D)

  /** Order-independent exact sum of a 2-decimal double column, as double. */
  def dsum(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** Exact sum of price*(1-discount), as double. */
  def dsumDisc(price: Column, discount: Column): Column =
    sum(price.cast(DP) * (ONE - discount.cast(DS))).cast(DoubleType)

  /** Exact sum of price*(1-discount)*(1+tax), as double. */
  def dsumDiscTax(price: Column, discount: Column, tax: Column): Column =
    sum(price.cast(DP) * (ONE - discount.cast(DS)) * (ONE + tax.cast(DS)))
      .cast(DoubleType)

  /** Deterministic average: exact decimal sum divided (in IEEE double) by
    * the count — reproducible on any engine, unlike avg() over doubles. */
  def davg(c: Column): Column =
    (sum(dec2(c)).cast(DoubleType) / count(c)).cast(DoubleType)
}
