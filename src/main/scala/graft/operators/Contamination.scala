package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection: find corpus documents sharing verbatim
  * word n-grams with an evaluation/benchmark set, the decontamination sweep a
  * training pipeline runs before a corpus ships (GPT-3 appendix C uses 13-gram
  * overlap; the n is a knob here because signal depends on vocabulary size).
  *
  * Shape at scale: the eval side is always small (benchmarks are thousands of
  * documents, the corpus is billions), so eval shingle hashes BROADCAST and the
  * corpus side never shuffles — explode corpus docs to (doc, gram-hash), hash
  * semi-match via broadcast inner join, re-aggregate per doc. The only wide op
  * is the final per-doc count, keyed by 8-byte doc id. Gram matching uses
  * xxhash64 of the gram (8 bytes broadcast per eval gram, not the string);
  * a hash collision could at worst over-count one gram — acceptable for a
  * screening operator (and absent at verify scale, where the oracle matches on
  * the gram strings themselves).
  */
object Contamination {

  /** Corpus docs sharing at least one word `n`-gram with any eval doc
    * (self-pairs excluded by doc id). Output:
    * `(doc_id, n_shared_grams)` — distinct shared grams per corpus doc. */
  def overlap(corpus: DataFrame, eval: DataFrame, idCol: String, textCol: String,
              n: Int): DataFrame = {
    val grams = (df: DataFrame) => df.select(
      col(idCol),
      explode(array_distinct(
        transform(TextFunctions.wordShingles(col(textCol), n), g => xxhash64(g))))
        .as("gram_h"))
    val evalGrams = grams(eval).withColumnRenamed(idCol, "eval_id")
    grams(corpus)
      .join(broadcast(evalGrams), Seq("gram_h"))
      .where(col(idCol) =!= col("eval_id"))
      .groupBy(idCol)
      .agg(count_distinct(col("gram_h")).as("n_shared_grams"))
  }
}
