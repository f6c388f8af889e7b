package graft.sources

import graft.config.SourceConfig
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import java.sql.{Connection, DriverManager, ResultSet, ResultSetMetaData, Types}
import scala.collection.mutable.ArrayBuffer

/** JDBC extraction — the reference's actual job: pulling result sets out of a
  * live SQL Server / Oracle (`/root/reference/src/Infrastructure/DataExtraction/
  * SqlServerDataSource.cs:20-91`, `OracleDataSource.cs:19-193`), re-expressed
  * Spark-first.
  *
  * Two paths, chosen by extraction type:
  *
  *  - **Text queries** (`Query`, or a "procedure name" the prefix sniff reveals
  *    to be SQL text — `SqlServerDataSource.cs:78-91`) go through Spark's JDBC
  *    relation (`spark.read.format("jdbc").option("query", ...)`). This is the
  *    scale path: Spark pushes projections/filters into the remote DB, streams
  *    the result through executors with `fetchsize`, and can parallelize the
  *    read via `partitionColumn`/`numPartitions` options. `commandTimeout`
  *    propagates as `queryTimeout` (the reference declares it and then
  *    hardcodes 600 s — `SqlServerDataSource.cs:59`; we honor the declared
  *    semantics, SURVEY §7.4(6)).
  *
  *  - **Stored procedures / Oracle packages** (`StoredProcedure` / `Package`)
  *    have no DataSource relation: a procedure call is an opaque server-side
  *    program producing one result set. They run through a driver-side
  *    `CallableStatement` and materialize, exactly as the reference drains the
  *    cursor into a `DataTable` on its single node (`OracleDataSource.cs:103-108`).
  *    This matches the reference's memory contract; result sets too large for
  *    one node should be re-homed as text queries (the reference has the same
  *    constraint, only harder).
  *
  * Parameter binding: the reference binds `@Name` (SQL Server, Dapper) /
  * `:Name` (Oracle, `OracleDynamicParameters.cs:78-134`). Spark's JDBC relation
  * has no bind-parameter surface, so text-query parameters substitute as typed,
  * escaped SQL literals; callable parameters bind positionally in declaration
  * order (`OracleDataSource.cs:66-92` binds its dictionary in order).
  */
object Jdbc {

  /** `java.sql.Types` code Oracle's driver uses for `SYS_REFCURSOR` OUT params
    * (`oracle.jdbc.OracleTypes.CURSOR`). A plain constant so no Oracle driver is
    * needed on the classpath until a real Oracle URL is used. */
  val OracleCursorType: Int = -10

  /** Reference prefix sniff (`SqlServerDataSource.cs:78-91`): a "query" that
    * starts with a statement keyword executes as text, anything else is treated
    * as a procedure name. */
  def isStatementText(q: String): Boolean = {
    val head = q.trim.takeWhile(!_.isWhitespace).toUpperCase
    Set("SELECT", "WITH", "EXEC", "INSERT", "UPDATE", "DELETE").contains(head)
  }

  /** Render a parameter value as a SQL literal — the coercion ladder of
    * `OracleDynamicParameters.cs:78-134` (string / int / long / decimal /
    * bool / date / null), with single-quote escaping for strings. */
  def renderLiteral(v: Any): String = v match {
    case null => "NULL"
    case None => "NULL"
    case Some(x) => renderLiteral(x)
    case s: String => "'" + s.replace("'", "''") + "'"
    case b: Boolean => if (b) "TRUE" else "FALSE"
    case n: Byte => n.toString
    case n: Short => n.toString
    case n: Int => n.toString
    case n: Long => n.toString
    case n: Float => n.toString
    case n: Double => n.toString
    case n: BigDecimal => n.toString
    case n: java.math.BigDecimal => n.toString
    case d: java.sql.Date => s"DATE '$d'"
    case t: java.sql.Timestamp => s"TIMESTAMP '$t'"
    case other =>
      throw new IllegalArgumentException(
        s"Unsupported JDBC parameter type: ${other.getClass.getName}")
  }

  /** Substitute `@Name` / `:Name` placeholders with rendered literals. Longest
    * names first so `@Start` never clobbers `@StartDate`. */
  def substituteParams(sql: String, params: Map[String, Any]): String =
    params.toSeq.sortBy(-_._1.length).foldLeft(sql) { case (acc, (k, v)) =>
      val lit = java.util.regex.Matcher.quoteReplacement(renderLiteral(v))
      acc.replaceAll(s"[@:]\\Q$k\\E\\b", lit)
    }

  /** Text-query read through Spark's JDBC relation — the scale path.
    * `extraOptions` passes through Spark JDBC tuning (`fetchsize`,
    * `partitionColumn`/`lowerBound`/`upperBound`/`numPartitions`, ...). */
  def readQuery(spark: SparkSession, url: String, sql: String,
                params: Map[String, Any] = Map.empty,
                timeoutSec: Int = 300,
                extraOptions: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("query", substituteParams(sql, params))
      .option("queryTimeout", timeoutSec)
      .options(extraOptions)
      .load()

  /** Range-partitioned table read — the parallel-extraction scale path. Spark
    * issues `numPartitions` concurrent range queries (`WHERE col >= lo AND col
    * < hi`), so a 100 TB extract streams through every executor instead of one
    * connection; `dbtable` (not `query`) because Spark's JDBC relation only
    * splits table-shaped sources. Bounds don't filter — rows outside them all
    * land in the edge partitions — so callers may pass loose bounds. */
  def readTablePartitioned(spark: SparkSession, url: String, table: String,
                           partitionColumn: String, lowerBound: Long, upperBound: Long,
                           numPartitions: Int, timeoutSec: Int = 300,
                           extraOptions: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .option("queryTimeout", timeoutSec)
      .options(extraOptions)
      .load()

  /** Callable read: `{call name(?, ...)}` on the driver, first result set
    * materialized. `refCursorType = Some(code)` appends the reference's
    * hardcoded-last `p_cursor` OUT parameter and reads the cursor from it
    * (`OracleDataSource.cs:85-92`); `None` takes the statement's dynamic
    * result set (SQL Server / Derby style). */
  def readCallable(spark: SparkSession, url: String, procName: String,
                   params: Map[String, Any] = Map.empty,
                   timeoutSec: Int = 300,
                   refCursorType: Option[Int] = None): DataFrame = {
    val conn = DriverManager.getConnection(url)
    try {
      val nIn = params.size
      val nAll = nIn + (if (refCursorType.isDefined) 1 else 0)
      val call = s"{call $procName(${Seq.fill(nAll)("?").mkString(", ")})}"
      val stmt = conn.prepareCall(call)
      try {
        stmt.setQueryTimeout(timeoutSec)
        // bind inputs in declaration order (OracleDataSource.cs:66-82)
        params.values.zipWithIndex.foreach { case (v, i) => bindParam(stmt, i + 1, v) }
        val rs = refCursorType match {
          case Some(code) =>
            stmt.registerOutParameter(nAll, code)
            stmt.execute()
            stmt.getObject(nAll).asInstanceOf[ResultSet]
          case None =>
            stmt.execute()
            val r = stmt.getResultSet
            if (r == null) throw new IllegalStateException(
              s"procedure $procName produced no result set")
            r
        }
        resultSetToDataFrame(spark, rs)
      } finally stmt.close()
    } finally conn.close()
  }

  private def bindParam(stmt: java.sql.CallableStatement, idx: Int, v: Any): Unit =
    v match {
      case null => stmt.setNull(idx, Types.NULL)
      case s: String => stmt.setString(idx, s)
      case b: Boolean => stmt.setBoolean(idx, b)
      case n: Int => stmt.setInt(idx, n)
      case n: Long => stmt.setLong(idx, n)
      case n: Double => stmt.setDouble(idx, n)
      case n: Float => stmt.setFloat(idx, n)
      case n: java.math.BigDecimal => stmt.setBigDecimal(idx, n)
      case d: java.sql.Date => stmt.setDate(idx, d)
      case t: java.sql.Timestamp => stmt.setTimestamp(idx, t)
      case other => stmt.setObject(idx, other)
    }

  /** `ResultSetMetaData` → Spark schema: the JDBC-type analogue of the
    * reference's CLR→Parquet map (`ParquetWriterService.cs:123-151`; SURVEY
    * §1.2), including its catch-all string fallback (`:149`). */
  def schemaFor(md: ResultSetMetaData): StructType =
    StructType((1 to md.getColumnCount).map { i =>
      val dt = md.getColumnType(i) match {
        case Types.VARCHAR | Types.CHAR | Types.LONGVARCHAR |
             Types.NVARCHAR | Types.NCHAR | Types.LONGNVARCHAR | Types.CLOB => StringType
        case Types.INTEGER => IntegerType
        case Types.BIGINT => LongType
        case Types.SMALLINT => ShortType
        case Types.TINYINT => ByteType
        case Types.BOOLEAN | Types.BIT => BooleanType
        case Types.REAL => FloatType
        case Types.FLOAT | Types.DOUBLE => DoubleType
        case Types.DECIMAL | Types.NUMERIC =>
          val p = md.getPrecision(i); val s = md.getScale(i)
          if (p > 0 && p <= 38 && s >= 0 && s <= p) DecimalType(p, s)
          else DecimalType(38, 18)
        case Types.DATE => DateType
        case Types.TIMESTAMP | Types.TIMESTAMP_WITH_TIMEZONE => TimestampType
        case Types.BINARY | Types.VARBINARY | Types.LONGVARBINARY | Types.BLOB => BinaryType
        case _ => StringType // reference fallback: anything else via ToString
      }
      StructField(md.getColumnLabel(i), dt, nullable = true)
    })

  /** Drain a result set into a local DataFrame (the reference's
    * `DataTable.Load(reader)` — driver-side by contract, see class doc). */
  def resultSetToDataFrame(spark: SparkSession, rs: ResultSet): DataFrame = {
    val schema = schemaFor(rs.getMetaData)
    val rows = ArrayBuffer.empty[Row]
    while (rs.next()) {
      val vals = schema.fields.zipWithIndex.map { case (f, i0) =>
        val i = i0 + 1
        val v: Any = f.dataType match {
          case StringType => rs.getString(i)
          case IntegerType => rs.getInt(i)
          case LongType => rs.getLong(i)
          case ShortType => rs.getShort(i)
          case ByteType => rs.getByte(i)
          case BooleanType => rs.getBoolean(i)
          case FloatType => rs.getFloat(i)
          case DoubleType => rs.getDouble(i)
          case _: DecimalType => rs.getBigDecimal(i)
          case DateType => rs.getDate(i)
          case TimestampType => rs.getTimestamp(i)
          case BinaryType => rs.getBytes(i)
          case _ => rs.getString(i)
        }
        if (rs.wasNull()) null else v
      }
      rows += Row(vals.toIndexedSeq: _*)
    }
    spark.createDataFrame(new java.util.ArrayList[Row](
      scala.jdk.CollectionConverters.BufferHasAsJava(rows).asJava), schema)
  }

  /** Config-driven extraction dispatch — the Spark analogue of
    * `DataIngestionJob.cs:84-112` query construction +
    * `DataSourceFactory.cs:19-27`. `connectionString` is a JDBC URL with any
    * `{vault:...}` placeholders already resolved. */
  def extract(spark: SparkSession, src: SourceConfig,
              connectionString: String): DataFrame = {
    val timeout = src.commandTimeout
    val isOracle = src.`type`.equalsIgnoreCase("oracle") ||
      connectionString.startsWith("jdbc:oracle")
    src.extractionType.toLowerCase match {
      case "query" =>
        val sql =
          if (src.sqlText.nonEmpty) src.sqlText
          else scala.io.Source.fromFile(src.sqlFilePath).mkString
        readQuery(spark, connectionString, sql, src.parameters, timeout)
      case "storedprocedure" =>
        // the reference runs a "procedure" that is really SQL text as text
        // (SqlServerDataSource.cs:47-59 after the :78-91 sniff)
        if (isStatementText(src.procedureName))
          readQuery(spark, connectionString, src.procedureName, src.parameters, timeout)
        else
          readCallable(spark, connectionString, src.procedureName, src.parameters,
            timeout, refCursorType = if (isOracle) Some(OracleCursorType) else None)
      case "package" =>
        // "PKG.PROC" (DataIngestionJob.cs:105-108); REF CURSOR appended last
        val name =
          if (src.packageName.nonEmpty && !src.procedureName.contains("."))
            s"${src.packageName}.${src.procedureName}"
          else src.procedureName
        readCallable(spark, connectionString, name, src.parameters, timeout,
          refCursorType = Some(OracleCursorType))
      case other =>
        throw new UnsupportedOperationException(s"JDBC extractionType=$other")
    }
  }
}
