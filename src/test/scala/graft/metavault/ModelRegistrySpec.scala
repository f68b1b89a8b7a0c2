package graft.metavault

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ModelRegistrySpec extends SparkSpec {
  import spark.implicits._

  private val yaml =
    """version: 2
      |
      |models:
      |  - name: hub_customer
      |    description: "Customer hub"
      |    columns:
      |      - name: customer_hash_key
      |      - name: load_date
      |  - name: satellite_customer_details
      |    description: per-customer attributes
      |    columns:
      |      - name: customer_hash_key
      |      - name: Customer Name
      |  - name: link_order_customer
      |""".stripMargin

  test("parses dbt-subset YAML: names, descriptions, columns, taxonomy") {
    val models = ModelRegistry.parseModelYaml(yaml)
    assert(models.map(_.name) ===
      Seq("hub_customer", "satellite_customer_details", "link_order_customer"))
    assert(models.head.description === "Customer hub")
    assert(models.head.columns.map(_.name) === Seq("customer_hash_key", "load_date"))
    assert(models(1).columns.map(_.name) === Seq("customer_hash_key", "customer_name"))
    assert(models.map(_.entityType) === Seq("hub", "satellite", "link"))
    assert(models(2).columns.isEmpty)
  }

  test("syncEntities applies add/delete/reused lifecycle to the registry") {
    val models = ModelRegistry.toDF(spark, ModelRegistry.parseModelYaml(yaml))
    val empty = Seq.empty[(String, String, Int, String, String)]
      .toDF("model_name", "entity_type", "active_status", "retire_date", "load_date")
    val (reg1, ch1) = ModelRegistry.syncEntities(empty, models, "2024-01-01")
    assert(reg1.count() === 3 && ch1.filter(col("change_type") === "add").count() === 3)
    // drop one model → it retires; re-add → reused
    val fewer = models.filter(col("model_name") =!= "link_order_customer")
    val (reg2, ch2) = ModelRegistry.syncEntities(reg1, fewer, "2024-01-02")
    assert(reg2.filter(col("active_status") === 0).count() === 1)
    assert(ch2.as[(String, String, String)].collect().toSet ===
      Set(("link_order_customer", "link", "delete")))
    val (reg3, ch3) = ModelRegistry.syncEntities(reg2, models, "2024-01-03")
    assert(reg3.filter(col("active_status") === 0).count() === 0)
    assert(ch3.as[(String, String, String)].collect()
      .toSet === Set(("link_order_customer", "link", "reused")))
  }

  test("conceptHub builds the concept registry with vault hash keys") {
    val models = ModelRegistry.toDF(spark, ModelRegistry.parseModelYaml(yaml))
    val hub = ModelRegistry.conceptHub(models, "2024-01-01")
    assert(hub.select("concept").as[String].collect().toSet ===
      Set("hub", "link", "satellite"))
    assert(hub.columns.contains("hub_concept_hash_key"))
  }
}
