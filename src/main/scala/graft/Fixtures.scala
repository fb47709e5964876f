package graft

/** Sample tables matching the reference's test fixture
  * (`create_sample_tables` + `insert_sample_data`, reference
  * catalog.py:429-497 + catalog.py:2489-2562; schemas in FIXTURES.md):
  * `expenses` (partitioned by month(date)), `health`, `notes`.
  */
object Fixtures {

  def createSampleTables(lh: Lakehouse): Unit = {
    lh.catalog.createTable("default.expenses", Seq(
      "id" -> "long", "date" -> "date", "category" -> "string",
      "description" -> "string", "amount" -> "double", "currency" -> "string"),
      partitions = Seq("month(date)"), properties = Map.empty)
    lh.catalog.createTable("default.health", Seq(
      "id" -> "long", "timestamp" -> "timestamp", "metric_type" -> "string",
      "value" -> "double", "unit" -> "string", "source" -> "string"),
      partitions = Nil, properties = Map.empty)
    lh.catalog.createTable("default.notes", Seq(
      "id" -> "long", "created_at" -> "timestamp", "title" -> "string",
      "content" -> "string", "source" -> "string", "tags" -> "string"),
      partitions = Nil, properties = Map.empty)
  }

  def insertSampleData(lh: Lakehouse): Unit = {
    lh.dml.insertRows("default.expenses", Seq(
      Map("id" -> 1, "date" -> "2025-11-15", "category" -> "groceries",
        "description" -> "Weekly shopping", "amount" -> 85.5, "currency" -> "USD"),
      Map("id" -> 2, "date" -> "2025-11-20", "category" -> "transport",
        "description" -> "Uber ride", "amount" -> 15.99, "currency" -> "USD"),
      Map("id" -> 3, "date" -> "2025-11-28", "category" -> "entertainment",
        "description" -> "Cinema tickets", "amount" -> 30.0, "currency" -> "USD"),
      Map("id" -> 4, "date" -> "2025-12-01", "category" -> "utilities",
        "description" -> "Electricity bill", "amount" -> 120.0, "currency" -> "USD"),
      Map("id" -> 5, "date" -> "2025-12-05", "category" -> "groceries",
        "description" -> "More shopping", "amount" -> 64.25, "currency" -> "USD")))
    lh.dml.insertRows("default.health", Seq(
      Map("id" -> 1, "timestamp" -> "2025-12-08T08:00:00", "metric_type" -> "weight",
        "value" -> 72.5, "unit" -> "kg", "source" -> "scale"),
      Map("id" -> 2, "timestamp" -> "2025-12-08T22:00:00", "metric_type" -> "steps",
        "value" -> 8500.0, "unit" -> "count", "source" -> "watch"),
      Map("id" -> 3, "timestamp" -> "2025-12-09T07:30:00", "metric_type" -> "sleep_hours",
        "value" -> 7.5, "unit" -> "hours", "source" -> "watch"),
      Map("id" -> 4, "timestamp" -> "2025-12-09T08:00:00", "metric_type" -> "weight",
        "value" -> 72.3, "unit" -> "kg", "source" -> "scale")))
    lh.dml.insertRows("default.notes", Seq(
      Map("id" -> 1, "created_at" -> "2025-12-01T10:00:00", "title" -> "Research ideas",
        "content" -> "Look into lakehouse formats", "source" -> "manual",
        "tags" -> """["research", "data"]"""),
      Map("id" -> 2, "created_at" -> "2025-12-03T15:30:00", "title" -> "Meeting notes",
        "content" -> "Discussed quarterly goals", "source" -> "manual",
        "tags" -> """["work"]""")))
  }
}
