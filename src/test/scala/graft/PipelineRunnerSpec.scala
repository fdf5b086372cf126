package graft

import java.nio.file.Files
import java.sql.Date
import org.apache.spark.sql.functions._
import graft.catalog.Catalog
import graft.model.Schemas
import graft.ops.Validator.ValidationException
import graft.run.{PipelineRunner, RunConfig}

/** C5 end-to-end: the reference's four workflow runs (load+validate → SCD2
  * dims → fact) replayed through the dispatch surface on CSV fixtures. */
class PipelineRunnerSpec extends SparkSpec {

  private val d1 = Date.valueOf("2024-01-01")

  test("full pipeline: loads, dims, dates, fact") {
    val cat = new Catalog(spark, Files.createTempDirectory("graft-run").toString)
    val runner = new PipelineRunner(spark, cat)
    runner.run(RunConfig("customers", fixture("customers.csv"), d1))
    runner.run(RunConfig("products", fixture("products.csv"), d1))
    runner.run(RunConfig("stores", fixture("stores.csv"), d1))
    runner.run(RunConfig("orders", fixture("orders.csv"), d1))
    runner.run(RunConfig("orderdetails", fixture("orderdetails.csv"), d1))

    assert(cat.read("dim_customers").count() == 4)
    assert(cat.read("dim_products").count() == 3)
    assert(cat.read("dim_stores").count() == 2)
    assert(cat.read("dim_dates").count() == 731)
    assert(cat.read("fact_orders").count() == 6)
    // star integrity: every fact FK resolves in its dimension
    val fact = cat.read("fact_orders")
    val dimC = cat.read("dim_customers").select(col("customerkey"))
    assert(fact.join(dimC, Seq("customerkey"), "left_anti").count() == 0)
  }

  test("dispatch: invalid table name rejected (validate_data.py:57-59)") {
    val cat = new Catalog(spark, Files.createTempDirectory("graft-run").toString)
    val runner = new PipelineRunner(spark, cat)
    val e = intercept[IllegalArgumentException](
      runner.run(RunConfig("Nope", fixture("customers.csv"), d1)))
    assert(e.getMessage.contains("nope"))
  }

  test("validation failure aborts before any write (C1 fail-fast)") {
    val cat = new Catalog(spark, Files.createTempDirectory("graft-run").toString)
    val runner = new PipelineRunner(spark, cat)
    intercept[ValidationException](
      runner.run(RunConfig("customers", fixture("customers_nulls.csv"), d1)))
    assert(!cat.exists("customers"))
    assert(!cat.exists("dim_customers"))
  }

  test("second run versions the dimension (SCD2 through the runner)") {
    val cat = new Catalog(spark, Files.createTempDirectory("graft-run").toString)
    val runner = new PipelineRunner(spark, cat)
    runner.run(RunConfig("customers", fixture("customers.csv"), d1))
    runner.run(RunConfig("customers", fixture("customers_v2.csv"), Date.valueOf("2024-06-01")))
    val dim = cat.read("dim_customers")
    assert(dim.count() == 7)
    assert(dim.filter(col("enddate") === lit(Schemas.HighDate)).count() == 5)
  }

  test("appendFact reproduces the reference's INSERT INTO accumulation (populate_fact.py:117)") {
    val cat = new Catalog(spark, Files.createTempDirectory("graft-run").toString)
    val runner = new PipelineRunner(spark, cat, appendFact = true)
    runner.run(RunConfig("customers", fixture("customers.csv"), d1))
    runner.run(RunConfig("products", fixture("products.csv"), d1))
    runner.run(RunConfig("stores", fixture("stores.csv"), d1))
    runner.run(RunConfig("orders", fixture("orders.csv"), d1))
    runner.run(RunConfig("orderdetails", fixture("orderdetails.csv"), d1))
    assert(cat.read("fact_orders").count() == 6)
    // rerunning the orderdetails workflow APPENDS — duplicate fact rows, as-is
    runner.run(RunConfig("orderdetails", fixture("orderdetails.csv"), d1))
    assert(cat.read("fact_orders").count() == 12)
    // the default (rebuild) runner stays idempotent on the same catalog
    new PipelineRunner(spark, cat).run(RunConfig("orderdetails", fixture("orderdetails.csv"), d1))
    assert(cat.read("fact_orders").count() == 6)
  }
}
