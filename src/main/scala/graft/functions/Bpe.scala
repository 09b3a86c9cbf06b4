package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Byte-pair-encoding tokenizer (Sennrich et al., "Neural Machine
  * Translation of Rare Words with Subword Units", ACL 2016 — the
  * GPT-2-family training/encode algorithm), fully implemented: this is the
  * REAL model behind the token-counting seam, not a stub. The reference
  * pipeline counts tokens with an external tokenizer service; here the
  * tokenizer itself is a fitted, persistable artifact like Categorify
  * dictionaries.
  *
  * Scale design — the standard two-level split:
  *  - the CORPUS-level work is one partial-aggregated shuffle: word →
  *    frequency, capped at `maxVocabWords` by frequency (the tail
  *    contributes negligible pair mass — this is how production BPE
  *    trainers bound memory too);
  *  - merge TRAINING is driver-side over that bounded dict with an
  *    inverted pair→words index, so each merge step touches only the
  *    words containing the merged pair (amortized far below
  *    O(vocab · merges));
  *  - ENCODE is distributed and embarrassingly parallel: broadcast merge
  *    ranks + a per-partition word→tokens memo (Zipf makes the memo hit
  *    rate high), zero shuffles.
  *
  * Tokens carry an end-of-word marker `\u0001` as their final symbol so
  * detokenization is exact: concat(tokens).replace(marker, " ") restores
  * the whitespace-normalized text — q91 oracle-checks that losslessness
  * over the full fit+encode+detok path.
  */
object Bpe {

  /** End-of-word marker appended to each word's symbol sequence. Control
    * character: never appears in the text corpora this engine targets. */
  val Eow = "\u0001"

  /** Ranked merge rules; rank = training order (lower merges first). */
  case class Model(merges: Seq[(String, String)]) {
    lazy val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap
  }

  /** Fit `numMerges` merge rules on a text corpus. Deterministic: pair
    * selection is (max frequency, then lexicographic pair), and the word
    * dict cap is (frequency desc, word asc). */
  def fit(corpus: DataFrame, text: Column, numMerges: Int,
      maxVocabWords: Int = 50000): Model = {
    val wordFreq: Array[(String, Long)] = corpus
      .select(explode(TextOps.tokens(text)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w"))
      .limit(maxVocabWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    Model(trainMerges(wordFreq, numMerges))
  }

  /** The driver-side trainer: classic indexed BPE over a (word, freq)
    * dict. Words are symbol vectors (chars + Eow); each step merges the
    * globally most frequent adjacent pair and updates counts only for the
    * words that contained it. */
  private def trainMerges(wordFreq: Array[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    val words: Array[mutable.ArrayBuffer[String]] = wordFreq.map { case (w, _) =>
      mutable.ArrayBuffer.from(w.map(_.toString)) += Eow
    }
    val freqs = wordFreq.map(_._2)
    val pairCounts = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    def addWord(i: Int, sign: Long): Unit = {
      val s = words(i)
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        val c = pairCounts.getOrElse(p, 0L) + sign * freqs(i)
        if (c <= 0L) pairCounts.remove(p) else pairCounts(p) = c
        if (sign > 0) pairWords.getOrElseUpdate(p, mutable.Set.empty) += i
        j += 1
      }
    }
    words.indices.foreach(addWord(_, 1L))
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var n = 0
    while (n < numMerges && pairCounts.nonEmpty) {
      // deterministic argmax: frequency desc, then lexicographic pair
      val best = pairCounts.foldLeft(((("", "")), Long.MinValue)) {
        case (acc @ (bp, bc), (p, c)) =>
          if (c > bc || (c == bc && (p._1 < bp._1 || (p._1 == bp._1 && p._2 < bp._2))))
            (p, c)
          else acc
      }._1
      merges += best
      val affected = pairWords.getOrElse(best, mutable.Set.empty).toArray
      val merged = best._1 + best._2
      affected.foreach { i =>
        addWord(i, -1L) // retract this word's old pair contributions
        val s = words(i)
        var j = 0
        while (j < s.length - 1) {
          if (s(j) == best._1 && s(j + 1) == best._2) {
            s(j) = merged; s.remove(j + 1)
          } else j += 1
        }
        addWord(i, 1L)
      }
      pairWords.remove(best)
      n += 1
    }
    merges.toSeq
  }

  /** Encode one word to its BPE tokens (greedy lowest-rank merge — the
    * GPT-2 encode loop). Exposed for specs; the distributed path is
    * [[encode]]. */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    val s = mutable.ArrayBuffer.from(word.map(_.toString)) += Eow
    var done = false
    while (!done && s.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var j = 0
      while (j < s.length - 1) {
        ranks.get((s(j), s(j + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestAt = j }
        }
        j += 1
      }
      if (bestAt < 0) done = true
      else {
        // merge EVERY occurrence of the best-ranked pair in this word
        val (l, rgt) = (s(bestAt), s(bestAt + 1))
        var k = 0
        while (k < s.length - 1) {
          if (s(k) == l && s(k + 1) == rgt) { s(k) = l + rgt; s.remove(k + 1) }
          else k += 1
        }
      }
    }
    s.toSeq
  }

  /** Distributed encode: (idCol, tokens array<string>) with the merge
    * ranks broadcast and a per-partition word→tokens memo. Zero shuffles —
    * a pure mapPartitions over the input's partitioning. */
  def encode(df: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model.ranks)
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ranks = bc.value
        // bounded memo: Zipf gives a high hit rate at vocabulary size, and
        // the cap keeps an adversarial all-unique-words partition from
        // growing executor state without limit
        val memo = mutable.HashMap.empty[String, Seq[String]]
        def toksOf(w: String): Seq[String] = memo.get(w) match {
          case Some(t) => t
          case None =>
            val t = encodeWord(w, ranks)
            if (memo.size < 200000) memo(w) = t
            t
        }
        it.map { case (id, text) =>
          val toks = Option(text).getOrElse("").trim.split("\\s+").iterator
            .filter(_.nonEmpty)
            .flatMap(toksOf)
            .toSeq
          (id, toks)
        }
      }
      .toDF(idCol, "tokens")
  }

  /** Exact inverse of [[encode]] for the whitespace-normalized text:
    * concat tokens, turn each end-of-word marker back into a space. */
  def detokenize(tokens: Column): Column =
    trim(regexp_replace(concat_ws("", tokens), Eow, " "))

  /** Persist the fitted merges as parquet (rank, left, right) — same
    * artifact philosophy as Categorify dictionaries and Pq codebooks. */
  def save(spark: org.apache.spark.sql.SparkSession, model: Model,
      path: String): Unit = {
    import spark.implicits._
    model.merges.zipWithIndex.map { case ((l, r), i) => (i, l, r) }
      .toDF("rank", "left", "right").repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Inverse of [[save]]: reload a fitted tokenizer with no refit. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model =
    Model(spark.read.parquet(path).orderBy(col("rank"))
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq)
}
