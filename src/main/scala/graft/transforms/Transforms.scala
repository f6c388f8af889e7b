package graft.transforms

import graft.config.TransformConfig
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** The reference's transformation surface (`ITransformationStep`,
  * `/root/reference/src/Core/Interfaces/Transformation/ITransformation.cs:5-16`)
  * re-expressed Spark-first: a step is a pure `DataFrame => DataFrame` built from a
  * per-dataset config map, i.e. exactly `Dataset.transform` material.
  *
  * Where the reference loops row-by-row over a materialized DataTable
  * (`DataCleansingStep.cs:33-58`), every step here stays declarative: a single
  * `select` of Catalyst column expressions, so the whole chain fuses into one
  * whole-stage-codegen pass over the scan and scales to any number of executors —
  * no driver-side materialization, no defensive copy (`TransformationEngine.cs:26`
  * is pointless under immutable DataFrames).
  */
trait TransformStep {
  def name: String
  def apply(df: DataFrame, config: Map[String, Any]): DataFrame
}

object Transforms {

  /** Trim whitespace on every string column; optionally empty-string→NULL.
    * Reference: `DataCleansingStep.cs:24-63` (config keys `trimWhitespace`,
    * `removeEmptyStrings` at `:26-27`, trim `:43-46`, empty→null `:48-51`). */
  object DataCleansing extends TransformStep {
    val name = "DataCleansing"
    def apply(df: DataFrame, config: Map[String, Any]): DataFrame = {
      val doTrim = flag(config, "trimWhitespace", default = true)
      val emptyToNull = flag(config, "removeEmptyStrings", default = false)
      if (!doTrim && !emptyToNull) df
      else {
        val cols = df.schema.fields.map { f =>
          if (f.dataType != StringType) col(f.name)
          else {
            val trimmed = if (doTrim) trim(col(f.name)) else col(f.name)
            val cleaned =
              if (emptyToNull) when(length(trimmed) === 0, lit(null: String)).otherwise(trimmed)
              else trimmed
            cleaned.alias(f.name)
          }
        }
        df.select(cols.toIndexedSeq: _*)
      }
    }
  }

  /** Schema assertion: fail the run if a required column is missing
    * (`DataValidationStep.cs:32-39`). The reference declares email validation but
    * never implemented it (`:41-45`); we implement it as declared: rows failing the
    * format check are dropped when `validateEmail` + `emailColumn` are set. */
  object DataValidation extends TransformStep {
    val name = "DataValidation"
    private val emailRe = "^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$"
    def apply(df: DataFrame, config: Map[String, Any]): DataFrame = {
      val required = stringSeq(config, "requiredColumns")
      val missing = required.filterNot(r =>
        df.columns.exists(_.equalsIgnoreCase(r)))
      if (missing.nonEmpty)
        throw new IllegalArgumentException(
          s"DataValidation: required columns missing: ${missing.mkString(", ")}")
      val emailCol = config.get("emailColumn").map(_.toString)
      if (flag(config, "validateEmail", default = false) && emailCol.nonEmpty)
        df.filter(col(emailCol.get).rlike(emailRe) || col(emailCol.get).isNull)
      else df
    }
  }

  /** Rename columns from a config map — the README-documented `ColumnMappingStep`
    * (`README.md:1693-1749`; no code in the reference repo). */
  object ColumnMapping extends TransformStep {
    val name = "ColumnMapping"
    def apply(df: DataFrame, config: Map[String, Any]): DataFrame = {
      val mapping = config.get("mappings") match {
        case Some(m: Map[_, _]) => m.map { case (k, v) => k.toString -> v.toString }
        case _ => Map.empty[String, String]
      }
      df.withColumnsRenamed(mapping)
    }
  }

  /** Reformat timestamp/date columns to strings — README `DateFormatStep`
    * (`README.md:1268-1339`). Config: `columns: [..]`, `format: "yyyy-MM-dd"`. */
  object DateFormat extends TransformStep {
    val name = "DateFormat"
    def apply(df: DataFrame, config: Map[String, Any]): DataFrame = {
      val fmt = config.getOrElse("format", "yyyy-MM-dd").toString
      stringSeq(config, "columns").foldLeft(df)((d, c) =>
        d.withColumn(c, date_format(col(c), fmt)))
    }
  }

  /** Mask sensitive columns — README `DataMaskingStep` (`README.md:1531-1597`).
    * `maskType`: "full" → literal mask; "partial" → keep last `keepLast` chars. */
  object DataMasking extends TransformStep {
    val name = "DataMasking"
    def apply(df: DataFrame, config: Map[String, Any]): DataFrame = {
      val maskType = config.getOrElse("maskType", "full").toString
      val keepLast = config.get("keepLast").map(_.toString.toInt).getOrElse(4)
      def masked(c: Column): Column = maskType match {
        case "partial" => concat(lit("***"), substring(c, -keepLast, keepLast))
        case _ => lit("***MASKED***")
      }
      stringSeq(config, "columns").foldLeft(df)((d, c) =>
        d.withColumn(c, when(col(c).isNotNull, masked(col(c)))))
    }
  }

  /** Compat mode for the reference's null-sentinel behavior
    * (`ParquetWriterService.cs:183-262`): numeric NULL→0, bool→false,
    * timestamp→0001-01-01 (DateTime.MinValue); strings keep NULL (`:264-285`).
    * Off by default — SURVEY §7.4(1). */
  object NullSentinels extends TransformStep {
    val name = "NullSentinels"
    def apply(df: DataFrame, config: Map[String, Any]): DataFrame = {
      import org.apache.spark.sql.types._
      df.schema.fields.foldLeft(df) { (d, f) =>
        f.dataType match {
          case _: NumericType => d.withColumn(f.name,
            coalesce(col(f.name), lit(0).cast(f.dataType)))
          case BooleanType => d.withColumn(f.name, coalesce(col(f.name), lit(false)))
          case TimestampType => d.withColumn(f.name,
            coalesce(col(f.name), to_timestamp(lit("0001-01-01 00:00:00"))))
          case _ => d
        }
      }
    }
  }

  /** Step registry — the Spark-side equivalent of the reference's reflection-based
    * factory keyed by class name minus "Step"
    * (`TransformationStepFactory.cs:72-129`). Explicit registration, idiomatic Scala. */
  val registry: Map[String, TransformStep] =
    Seq(DataCleansing, DataValidation, ColumnMapping, DateFormat, DataMasking,
      NullSentinels).map(s => s.name.toLowerCase -> s).toMap

  /** Fold the enabled, order-sorted, environment-gated steps over the frame —
    * `TransformationEngine.ApplyTransformationsAsync` (`TransformationEngine.cs:21-56`;
    * env gate `:58-69`; order/enabled filter `DataIngestionJob.cs:186-188`). */
  def applyAll(df: DataFrame, steps: Seq[TransformConfig],
               environment: String = "Production"): DataFrame =
    steps.filter(_.enabled)
      .filter(s => s.environments.isEmpty ||
        s.environments.exists(_.equalsIgnoreCase(environment)))
      .sortBy(_.order)
      .foldLeft(df) { (d, s) =>
        val step = registry.getOrElse(s.`type`.toLowerCase,
          throw new IllegalArgumentException(s"Unknown transformation step: ${s.`type`}"))
        step(d, s.config)
      }

  // -- config helpers (reference config values arrive as the coercion ladder's
  //    String/Long/Double/Boolean/List, `DatasetConfigurationService.cs:104-123`) --
  private def flag(config: Map[String, Any], key: String, default: Boolean): Boolean =
    config.get(key) match {
      case Some(b: Boolean) => b
      case Some(s: String) => s.equalsIgnoreCase("true")
      case _ => default
    }
  private def stringSeq(config: Map[String, Any], key: String): Seq[String] =
    config.get(key) match {
      case Some(l: Seq[_]) => l.map(_.toString)
      case Some(s: String) => s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      case _ => Nil
    }
}
