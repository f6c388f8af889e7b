package graft

import graft.sinks.{CtlManifest, ParquetSink}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col

import java.nio.file.Files
import java.time.{ZoneOffset, ZonedDateTime}

class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir() = graft.util.Scratch.dir("graft-sink").toString

  test("writeSingleFile produces exactly one parquet file with the given name") {
    val dir = tmpDir()
    val df = Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v")
    val res = ParquetSink.writeSingleFile(df, dir, "out.parquet")
    assert(res.path.endsWith("/out.parquet"))
    val files = new java.io.File(dir).listFiles().filterNot(_.getName.startsWith("."))
    assert(files.map(_.getName).toSeq == Seq("out.parquet"))
    assert(spark.read.parquet(res.path).count() == 3)
  }

  test("writeSingleFile honors overwriteExisting=false") {
    val dir = tmpDir()
    val df = Seq((1, "a")).toDF("id", "v")
    ParquetSink.writeSingleFile(df, dir, "out.parquet")
    intercept[IllegalStateException] {
      ParquetSink.writeSingleFile(df, dir, "out.parquet", overwrite = false)
    }
  }

  test("compression codec config is honored (gzip vs snappy file bytes differ)") {
    val dir1 = tmpDir(); val dir2 = tmpDir()
    val df = Seq.tabulate(1000)(i => (i, s"value-$i")).toDF("id", "v")
    val a = ParquetSink.writeSingleFile(df, dir1, "a.parquet", compression = "Snappy")
    val b = ParquetSink.writeSingleFile(df, dir2, "b.parquet", compression = "Gzip")
    assert(a.bytes != b.bytes)
    assert(spark.read.parquet(b.path).count() == 1000)
  }

  test("CTL record matches reference contract: count, checksum, name, CSV shape") {
    val dir = tmpDir()
    val df = Seq((1, "x"), (2, "y")).toDF("id", "v")
    val res = ParquetSink.writeSingleFile(df, dir, "data.parquet")
    val now = ZonedDateTime.of(2026, 8, 12, 10, 0, 0, 0, ZoneOffset.UTC)
    val rec = CtlManifest.forFile(spark, res.path, 2, "ds1", "Parquet", now)
    assert(rec.recordCount == 2)
    assert(rec.datasetName == "ds1_20260812100000")
    // both RefDate and Timestamp carry the reference's ISO-8601 round-trip ("o")
    // shape (CtlGenerationHandler.cs:70-72): 7 fractional digits, UTC 'Z'
    assert(rec.refDate == "2026-08-12T10:00:00.0000000Z")
    assert(rec.timestamp == "2026-08-12T10:00:00.0000000Z")
    // checksum equals an independently computed SHA-256 of the file bytes
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(res.path.stripPrefix("file:")))
    val md = java.security.MessageDigest.getInstance("SHA-256")
    assert(rec.checksum == md.digest(bytes).map("%02x".format(_)).mkString)
    val csv = CtlManifest.toCsv(rec)
    val lines = csv.split("\r\n")
    assert(lines(0) == "RecordCount,RefDate,Checksum,Timestamp,DatasetName,Source")
    assert(lines(1).startsWith("2,2026-08-12T10:00:00.0000000Z,"))
  }

  test("CTL CSV escaping is RFC-4180") {
    val rec = CtlManifest.CtlRecord(1, "2026-01-01", "abc", "t", "name,with\"quote", "s")
    val csv = CtlManifest.toCsv(rec)
    assert(csv.contains("\"name,with\"\"quote\""))
  }

  test("CTL write is atomic and lands next to the data") {
    val dir = tmpDir()
    val rec = CtlManifest.CtlRecord(5, "2026-01-01", "h", "ts", "n", "s")
    val p = CtlManifest.write(spark, dir, "data.ctl", rec)
    assert(new java.io.File(dir, "data.ctl").exists())
    assert(Files.readString(java.nio.file.Paths.get(p.stripPrefix("file:")))
      .startsWith("RecordCount"))
  }

  test("partitioned write + directory manifest aggregates all part files") {
    val dir = tmpDir() + "/out"
    val df = Seq.tabulate(100)(i => (i, i % 5)).toDF("id", "bucket").repartition(4)
    val res = ParquetSink.writePartitioned(df, dir)
    assert(res.files.size > 1)
    val rec = CtlManifest.forDirectory(spark, dir, 100, "ds", "Parquet")
    assert(rec.recordCount == 100)
    assert(rec.checksum.length == 64)
    // deterministic: recompute equals
    val rec2 = CtlManifest.forDirectory(spark, dir, 100, "ds", "Parquet")
    assert(rec.checksum == rec2.checksum)
  }

  test("listPartFiles skips _SUCCESS and hidden files") {
    val dir = tmpDir() + "/out"
    Seq((1, "a")).toDF("id", "v").write.parquet(dir)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = ParquetSink.listPartFiles(fs, new Path(dir))
    assert(files.nonEmpty)
    assert(files.forall(f => !f.getName.startsWith("_") && !f.getName.startsWith(".")))
  }

  test("compact collapses a many-small-files directory, preserving the data") {
    val dir = graft.util.Scratch.dir("graft-compact").toString + "/t"
    val df = spark.read.parquet(s"$sf0001/orders.parquet")
    df.repartition(20).write.parquet(dir)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = ParquetSink.listPartFiles(fs, new Path(dir)).size
    assert(before == 20)
    val res = ParquetSink.compact(spark, dir, targetBytes = 1L << 30)
    assert(res.files.size < before, s"still ${res.files.size} files")
    val after = spark.read.parquet(dir)
    assert(after.count() == df.count())
    assert(after.exceptAll(df).isEmpty && df.exceptAll(after).isEmpty)
  }

  test("compact preserves hive partition layout — pruning still works after") {
    val dir = graft.util.Scratch.dir("graft-compact-part").toString + "/t"
    val df = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    // 3 small increments per partition value -> many files under each p=dir
    (1 to 3).foreach { _ =>
      df.write.mode("append").partitionBy("o_orderpriority").parquet(dir)
    }
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(ParquetSink.partitionColumnsOf(fs, new Path(dir)) == Seq("o_orderpriority"))
    val res = ParquetSink.compact(spark, dir, targetBytes = 1L << 30)
    // layout survived: k=v subdirectories still exist...
    val subdirs = fs.listStatus(new Path(dir))
      .filter(_.isDirectory).map(_.getPath.getName).filter(_.contains("="))
    assert(subdirs.nonEmpty, "partition directories flattened away")
    assert(subdirs.forall(_.startsWith("o_orderpriority=")), subdirs.mkString(","))
    // ...rows intact (3x the base: three appends)...
    val after = spark.read.parquet(dir)
    assert(after.count() == df.count() * 3)
    // ...and a partition-value predicate still prunes at planning time
    val q = after.where(col("o_orderpriority") === "1-URGENT")
    assert(q.count() ==
      df.where(col("o_orderpriority") === "1-URGENT").count() * 3)
    val scan = q.queryExecution.executedPlan.collectLeaves()
      .find(_.nodeName.contains("Scan")).get.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("o_orderpriority"), scan)
  }

  test("partitionColumnsOf fails loudly on a mixed k=v / stray-dir directory") {
    val root = new Path(tmpDir(), "mixed")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(root, "k=a"))
    fs.mkdirs(new Path(root, "strayDir"))
    val ex = intercept[IllegalArgumentException] {
      ParquetSink.partitionColumnsOf(fs, root)
    }
    assert(ex.getMessage.contains("strayDir"), ex.getMessage)
    // inconsistent keys at one level also fail loudly
    val root2 = new Path(tmpDir(), "twokeys")
    fs.mkdirs(new Path(root2, "k=a"))
    fs.mkdirs(new Path(root2, "j=b"))
    val ex2 = intercept[IllegalArgumentException] {
      ParquetSink.partitionColumnsOf(fs, root2)
    }
    assert(ex2.getMessage.contains("Inconsistent"), ex2.getMessage)
  }

  test("compact keeps numeric-looking string partition values verbatim (k=0250)") {
    val dir = tmpDir() + "/t"
    Seq(("0250", 1L), ("0250", 2L), ("9", 3L)).toDF("k", "v")
      .write.partitionBy("k").parquet(dir)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    ParquetSink.compact(spark, dir, targetBytes = 1L << 30)
    val subdirs = fs.listStatus(new Path(dir))
      .filter(_.isDirectory).map(_.getPath.getName).toSet
    // without inference disabled, the rewrite would re-render k=0250 as k=250
    assert(subdirs == Set("k=0250", "k=9"), subdirs.mkString(","))
  }
}
