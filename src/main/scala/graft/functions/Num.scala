package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Numeric discipline shared by every oracle-checked query.
  *
  * The reference carries quantities as Decimal quantized to 9 dp HALF_UP
  * (/root/reference/backend/utility.py:776-807) precisely because float
  * accumulation drifts. We go further: ALL aggregate arithmetic runs in
  * DecimalType so sums/products are exact and engine-independent (a double
  * sum is order-dependent and would diverge from any oracle under Spark's
  * parallel partial aggregation). Final outputs are cast back to double so
  * result schemas stay plain.
  *
  * At 100 TB this is also the right call: decimal sums are codegen'd and
  * partial-aggregated map-side exactly like double sums — exactness is free.
  */
object Num {
  /** Money/measure type: generated test data carries <= 2 dp; scale 4 gives
    * headroom so the double->decimal cast is unambiguous in both engines. */
  val Money: DecimalType = DecimalType(18, 4)

  /** Reference quantity type: 9 dp, HALF_UP on cast (Spark's default). */
  val Qty: DecimalType = DecimalType(38, 9)

  /** Cast to exact money decimal. */
  def dec(c: Column): Column = c.cast(Money)

  /** Cast to the reference's 9-dp quantity decimal (F5,
    * preserve_quantity_precision — utility.py:776-807). */
  def qty(c: Column): Column = c.cast(Qty)

  /** Final projection back to double for a stable output schema. */
  def d(c: Column): Column = c.cast(DoubleType)

  /** Exact decimal ONE for (1 - discount)-style arithmetic. */
  val one: Column = lit(1).cast(Money)
}
