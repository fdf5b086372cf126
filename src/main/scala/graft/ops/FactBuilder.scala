package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model.{Schemas, Scd2Spec}

/** C3: fact-table population (populate_fact.py:74-150).
  *
  * Reference shape: (1) staging = `Orders ⋈ OrderDetails` with
  * `TotalPrice = Price * Quantity` (populate_fact.py:109-112, J1+P2); (2) fact
  * insert = staging joined to the four dimensions on business keys, restricted
  * to current dimension versions (populate_fact.py:117-124, J2+J3).
  *
  * Spark-first differences (SURVEY.md §3.3, §4):
  *  - No physical staging table — one lazy Catalyst plan end-to-end; the
  *    reference materializes staging only because eager Redshift SQL forces it.
  *  - Dimensions are pre-filtered to current rows BEFORE the join (the
  *    reference filters after the 4-way join at populate_fact.py:124; Catalyst
  *    would push the predicate anyway, we state it explicitly) and broadcast —
  *    the fact-side table never shuffles for the star lookups. The only
  *    shuffle in the whole plan is the big-big `Orders ⋈ OrderDetails` join,
  *    and AQE handles its skew at scale.
  *  - Decimal fidelity: TotalPrice is computed in decimal and cast back to
  *    DECIMAL(8,2) to match the sink DDL (populate_fact.py:100-101),
  *    SURVEY.md §7.5.3.
  */
object FactBuilder {

  /** fact_orders(orderid, customerkey, storekey, productkey, quantity,
    * unitprice, totalprice, orderdateid) — populate_fact.py:117. */
  def build(
      orders: DataFrame, orderDetails: DataFrame,
      dimCustomers: DataFrame, dimStores: DataFrame, dimProducts: DataFrame,
      dimDates: DataFrame,
      custSpec: Scd2Spec = Schemas.dimCustomers,
      storeSpec: Scd2Spec = Schemas.dimStores,
      prodSpec: Scd2Spec = Schemas.dimProducts,
      totalPriceType: String = "decimal(8,2)"): DataFrame = {

    // Stage: Orders ⋈ OrderDetails (J1) + TotalPrice arithmetic (P2). The
    // sink type defaults to the reference DDL's DECIMAL(8,2)
    // (populate_fact.py:101); callers with wider prices widen it — under
    // ANSI mode (Spark 4 default) an overflow is an error, not a NULL.
    val staged = orders
      .join(orderDetails, Seq("orderid"))
      .select(
        col("orderid"), col("customerid"), col("storeid"), col("productid"),
        col("quantity"), col("unitprice"), col("orderdate"),
        (col("unitprice") * col("quantity")).cast(totalPriceType).as("totalprice"))

    // Current-version dim slices, broadcast (J2+J3).
    def current(dim: DataFrame, spec: Scd2Spec) = broadcast(
      Scd2Upsert.currentRows(dim, spec)
        .select(col(spec.businessKey), col(spec.surrogateKey)))

    staged
      .join(current(dimCustomers, custSpec), Seq(custSpec.businessKey))
      .join(current(dimStores, storeSpec), Seq(storeSpec.businessKey))
      .join(current(dimProducts, prodSpec), Seq(prodSpec.businessKey))
      .join(broadcast(dimDates.select(col("date"), col("datekey"))),
        col("orderdate") === col("date"))
      .select(
        col("orderid"),
        col(custSpec.surrogateKey), col(storeSpec.surrogateKey), col(prodSpec.surrogateKey),
        col("quantity"), col("unitprice"), col("totalprice"),
        col("datekey").as("orderdateid"))
  }
}
