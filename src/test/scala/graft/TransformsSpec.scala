package graft

import graft.config.TransformConfig
import graft.transforms.Transforms
import org.apache.spark.sql.Row

class TransformsSpec extends SparkSpec {
  import spark.implicits._

  private def sample = Seq(
    ("  alice  ", "A", 1), ("bob", "", 2), ("  ", "C", 3), (null: String, "D", 4)
  ).toDF("name", "tag", "id")

  test("DataCleansing trims every string column") {
    val out = Transforms.DataCleansing(sample, Map("trimWhitespace" -> true))
    assert(out.select("name").collect().map(_.getString(0)).toSeq ==
      Seq("alice", "bob", "", null))
  }

  test("DataCleansing removeEmptyStrings maps empty -> NULL after trim") {
    val out = Transforms.DataCleansing(sample,
      Map("trimWhitespace" -> true, "removeEmptyStrings" -> true))
    val rows = out.orderBy("id").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("alice", "bob", null, null))
    assert(rows.map(_.getString(1)).toSeq == Seq("A", null, "C", "D"))
  }

  test("DataCleansing leaves non-string columns untouched") {
    val out = Transforms.DataCleansing(sample, Map("trimWhitespace" -> true))
    assert(out.select("id").collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3, 4))
  }

  test("DataValidation passes when required columns exist (case-insensitive)") {
    val out = Transforms.DataValidation(sample, Map("requiredColumns" -> List("NAME", "id")))
    assert(out.count() == 4)
  }

  test("DataValidation throws on missing required column") {
    val e = intercept[IllegalArgumentException] {
      Transforms.DataValidation(sample, Map("requiredColumns" -> List("nope")))
    }
    assert(e.getMessage.contains("nope"))
  }

  test("DataValidation email filter keeps valid + null emails") {
    val df = Seq(("a@b.com", 1), ("bad", 2), (null: String, 3)).toDF("email", "id")
    val out = Transforms.DataValidation(df,
      Map("validateEmail" -> true, "emailColumn" -> "email", "requiredColumns" -> List("email")))
    assert(out.select("id").collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 3))
  }

  test("ColumnMapping renames via config map") {
    val out = Transforms.ColumnMapping(sample,
      Map("mappings" -> Map("name" -> "full_name", "tag" -> "category")))
    assert(out.columns.toSeq == Seq("full_name", "category", "id"))
  }

  test("DateFormat formats timestamp columns to strings") {
    val df = Seq(java.sql.Timestamp.valueOf("2024-03-05 10:30:00")).toDF("ts")
    val out = Transforms.DateFormat(df, Map("columns" -> List("ts"), "format" -> "yyyy/MM/dd"))
    assert(out.collect()(0).getString(0) == "2024/03/05")
  }

  test("DataMasking full and partial modes") {
    val df = Seq(("1234567890", 1), (null: String, 2)).toDF("acct", "id")
    val full = Transforms.DataMasking(df, Map("columns" -> List("acct")))
    assert(full.orderBy("id").collect().map(_.getString(0)).toSeq ==
      Seq("***MASKED***", null))
    val partial = Transforms.DataMasking(df,
      Map("columns" -> List("acct"), "maskType" -> "partial", "keepLast" -> "4"))
    assert(partial.orderBy("id").collect()(0).getString(0) == "***7890")
  }

  test("applyAll honors enabled, order, and environment gates") {
    val steps = Seq(
      TransformConfig("ColumnMapping", order = 2,
        config = Map("mappings" -> Map("name_t" -> "final_name"))),
      TransformConfig("ColumnMapping", order = 1,
        config = Map("mappings" -> Map("name" -> "name_t"))),
      TransformConfig("ColumnMapping", order = 3, enabled = false,
        config = Map("mappings" -> Map("final_name" -> "never"))),
      TransformConfig("ColumnMapping", order = 4, environments = Seq("Development"),
        config = Map("mappings" -> Map("final_name" -> "dev_only"))))
    val out = Transforms.applyAll(sample, steps, environment = "Production")
    assert(out.columns.contains("final_name"))
    assert(!out.columns.contains("never") && !out.columns.contains("dev_only"))
  }

  test("NullSentinels compat mode fills reference sentinel values") {
    val df = Seq[(java.lang.Integer, String)]((null, "x"), (5, null))
      .toDF("n", "s")
    val out = Transforms.NullSentinels(df, Map.empty)
    val rows = out.collect().toSeq
    assert(rows.contains(Row(0, "x"))) // numeric null -> 0
    assert(rows.contains(Row(5, null))) // strings keep NULL
  }
}
