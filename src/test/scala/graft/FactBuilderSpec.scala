package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.io.Sources
import graft.model.Schemas
import graft.ops.{DateDimension, FactBuilder, Scd2Upsert}

/** C3 semantics (populate_fact.py:74-150) on the reference-shaped fixtures. */
class FactBuilderSpec extends SparkSpec {

  private val d1 = Date.valueOf("2024-01-01")

  private lazy val fact = {
    val orders = Sources.csv(spark, fixture("orders.csv"), Schemas.orders)
    val details = Sources.csv(spark, fixture("orderdetails.csv"), Schemas.orderdetails)
    val dimC = Scd2Upsert.initialLoad(
      Sources.csv(spark, fixture("customers.csv"), Schemas.customers), Schemas.dimCustomers, d1)
    val dimS = Scd2Upsert.initialLoad(
      Sources.csv(spark, fixture("stores.csv"), Schemas.stores), Schemas.dimStores, d1)
    val dimP = Scd2Upsert.initialLoad(
      Sources.csv(spark, fixture("products.csv"), Schemas.products), Schemas.dimProducts, d1)
    val dates = DateDimension.build(spark, Date.valueOf("2024-01-01"), Date.valueOf("2024-01-31"))
    FactBuilder.build(orders, details, dimC, dimS, dimP, dates).cache()
  }

  test("row count = |Orders ⋈ OrderDetails| (J1 cardinality)") {
    assert(fact.count() == 6)
  }

  test("TotalPrice = UnitPrice × Quantity as DECIMAL(8,2) (P2/F11)") {
    val bad = fact.filter(col("totalprice") =!= (col("unitprice") * col("quantity")).cast("decimal(8,2)"))
    assert(bad.count() == 0)
    val order1000 = rows(fact.filter(col("orderid") === 1000).select("totalprice"))
      .flatten.map(_.toString).sorted
    assert(order1000 == Seq("19.98", "24.50")) // 2×9.99, 1×24.50
  }

  test("surrogate keys resolve against current dim versions (J2/J3)") {
    // Every FK resolves (inner joins preserve all staged rows here)
    assert(fact.filter(col("customerkey").isNull || col("storekey").isNull ||
      col("productkey").isNull || col("orderdateid").isNull).count() == 0)
    // order 1000: customer 1 → key 1, store 100 → key 1
    val r = rows(fact.filter(col("orderid") === 1000).select("customerkey", "storekey")).head
    assert(r == Seq(1L, 1L))
  }

  test("orderdateid joins through the date dimension (C4/J2)") {
    // 2024-01-05 is day 5 of the January range → datekey 5
    val r = rows(fact.filter(col("orderid") === 1000).select("orderdateid")).head
    assert(r == Seq(5L))
  }

  test("after an SCD2 re-run the fact resolves to the new current keys") {
    val orders = Sources.csv(spark, fixture("orders.csv"), Schemas.orders)
    val details = Sources.csv(spark, fixture("orderdetails.csv"), Schemas.orderdetails)
    val custV1 = Sources.csv(spark, fixture("customers.csv"), Schemas.customers)
    val dim1 = Scd2Upsert.initialLoad(custV1, Schemas.dimCustomers, d1)
    val dim2 = Scd2Upsert.run(custV1, dim1, Schemas.dimCustomers, Date.valueOf("2024-06-01"))
    val dimS = Scd2Upsert.initialLoad(
      Sources.csv(spark, fixture("stores.csv"), Schemas.stores), Schemas.dimStores, d1)
    val dimP = Scd2Upsert.initialLoad(
      Sources.csv(spark, fixture("products.csv"), Schemas.products), Schemas.dimProducts, d1)
    val dates = DateDimension.build(spark, Date.valueOf("2024-01-01"), Date.valueOf("2024-01-31"))
    val f2 = FactBuilder.build(orders, details, dim2, dimS, dimP, dates)
    // all customer keys must come from the re-versioned range (> 4)
    assert(rows(f2.select("customerkey")).flatten.map(_.asInstanceOf[Long]).forall(_ > 4))
  }
}
