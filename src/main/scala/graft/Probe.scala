package graft

import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timing of the text near-dup operators. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = graft.sources.Lake.table(spark, sfDir, "documents")

    val shingled = docs.select(col("doc_id").as("id"),
        array_distinct(T.wordShingles(col("text"), 3)).as("shingles"))
      .filter(size(col("shingles")) > 0)
    time("shingle+count")(println(shingled.count()))
    time("avg shingles")(shingled.select(avg(size(col("shingles")))).show())

    val sigs = shingled.withColumn("sig", T.minhashSignature(col("shingles"), 64))
    time("minhash sigs")(println(sigs.select(col("sig")).filter(size(col("sig")) > 0).count()))

    val banded = sigs.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(15)),
        b => xxhash64(concat_ws(",", slice(col("sig"), b * 4 + 1, lit(4)))))))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bandHash"))
    val left = banded.withColumnsRenamed(Map("id" -> "id_a"))
    val right = banded.withColumnsRenamed(Map("id" -> "id_b"))
    val candidates = left.join(right, Seq("band", "bandHash"))
      .filter(col("id_a") < col("id_b")).select("id_a", "id_b").distinct()
    time("band join candidates")(println(candidates.count()))

    // d05 inverted-index candidates
    val postings = shingled.select(col("id"), explode(col("shingles")).as("shingle"))
      .select(col("id"), xxhash64(col("shingle")).as("sh"))
    val dfreq = postings.groupBy("sh").agg(count(lit(1)).as("df"))
    time("df distribution")(
      dfreq.select(count(lit(1)).as("n_shingles"), max(col("df")), avg(col("df")),
        sum(col("df") * col("df")).as("sum_df2")).show())
    spark.stop()
  }
}
