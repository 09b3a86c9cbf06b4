package graft.queries

import org.apache.spark.sql.functions._
import graft.dedup.TextDedup
import graft.functions.{LangId, TextOps}
import QueryHelpers._

/** Text-analysis + dedup extension coverage over `documents` (BASELINE.json
  * scope: dedup exact/MinHash/SimHash/Jaccard, token counting, quality
  * scoring, fingerprinting, language-ID).
  */
object TextQueries {

  private val shingleN = 8

  val defs: Map[String, QueryFn] = Map(
    // Token counting + quality scoring (lengths, lexical diversity,
    // stopword ratio) — all int-derived doubles, cross-engine exact.
    "q30_token_stats" -> { (s, d) =>
      val docs = table(s, d, "documents")
      val toks = TextOps.tokens(col("text"))
      docs.select(
          col("doc_id"),
          size(toks).as("n_tokens"),
          size(array_distinct(toks)).as("n_distinct"),
          TextOps.typeTokenRatio(toks).as("ttr"),
          (TextOps.totalTokenLength(toks).cast("double") / size(toks)).as("avg_token_len"),
          TextOps.stopwordRatio(toks, Seq("the", "a")).as("stopword_ratio"))
        .orderBy(col("doc_id"))
    },

    // Document fingerprinting + BPE-ish token counting.
    "q31_fingerprint" -> { (s, d) =>
      table(s, d, "documents")
        .select(col("doc_id"),
          TextOps.fingerprint(col("text")).as("fp"),
          TextOps.bpeTokenCount(col("text")).as("bpe_tokens"))
        .orderBy(col("doc_id"))
    },

    // Exact dedup groups by fingerprint (hash-groupBy; one shuffle).
    "q32_exact_dedup" -> { (s, d) =>
      TextDedup.exactDupGroups(table(s, d, "documents"), "doc_id", "text")
        .orderBy(col("fp"))
    },

    // MinHash signatures (8 hashes) over 8-gram word shingles.
    "q33_minhash_sig" -> { (s, d) =>
      val docs = table(s, d, "documents")
        .filter(size(TextOps.tokens(col("text"))) >= shingleN)
      TextDedup.minhashSignatures(docs, "doc_id",
          TextOps.wordShingles(TextOps.tokens(col("text")), shingleN), 8)
        .orderBy(col("doc_id"))
    },

    // Exact n-gram Jaccard over pairs sharing a shingle (verification-scale
    // all-pairs; the LSH path below is the discovery path at scale).
    "q34_shingle_jaccard" -> { (s, d) =>
      val docs = table(s, d, "documents")
      TextDedup.jaccardPairs(docs, "doc_id",
          TextOps.wordShingles(TextOps.tokens(col("text")), shingleN))
        .orderBy(col("a"), col("b"))
    },

    // SimHash (rows-only check: engine-specific 64-bit hash).
    "q35_simhash" -> { (s, d) =>
      TextDedup.simhash64(table(s, d, "documents"), "doc_id",
          TextOps.tokens(col("text")))
        .orderBy(col("doc_id"))
    },

    // Language-ID heuristic: fit trigram profiles on the labeled corpus,
    // predict per doc (rows-only check; accuracy asserted in LangIdSpec).
    "q36_langid" -> { (s, d) =>
      val docs = table(s, d, "documents")
      val profiles = LangId.fitProfiles(docs, "text", "lang")
      LangId.predict(docs, "doc_id", "text", profiles)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("predicted_lang"))
        .orderBy(col("doc_id"))
    },

    // MinHash-LSH candidate pairs (16 hashes, 8 bands of 2) verified with
    // exact Jaccard — the scale path for near-dup discovery.
    "q37_lsh_neardup" -> { (s, d) =>
      val docs = table(s, d, "documents")
        .filter(size(TextOps.tokens(col("text"))) >= shingleN)
      val shingles = TextOps.wordShingles(TextOps.tokens(col("text")), shingleN)
      val sig = TextDedup.minhashSignatures(docs, "doc_id", shingles, 16)
      val cand = TextDedup.lshCandidatePairs(
        TextDedup.lshBands(sig, "doc_id", 16, 2), "doc_id")
      val jac = TextDedup.jaccardPairs(docs, "doc_id", shingles)
      cand.join(jac, Seq("a", "b"))
        .select(col("a"), col("b"), col("jaccard"))
        .orderBy(col("a"), col("b"))
    })

  val oracles: Map[String, String] = Map(
    "q30_token_stats" ->
      """SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_tokens,
         CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS INT) AS n_distinct,
         CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS DOUBLE)
           / len(string_split_regex(trim(text), '\s+')) AS ttr,
         CAST(list_sum(list_transform(string_split_regex(trim(text), '\s+'), x -> len(x))) AS DOUBLE)
           / len(string_split_regex(trim(text), '\s+')) AS avg_token_len,
         CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x IN ('the', 'a'))) AS DOUBLE)
           / len(string_split_regex(trim(text), '\s+')) AS stopword_ratio
         FROM documents ORDER BY doc_id""",
    "q31_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
         CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS INT) AS bpe_tokens
         FROM documents ORDER BY doc_id""",
    "q32_exact_dedup" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
         MIN(doc_id) AS canonical_id, COUNT(*) AS n_dups
         FROM documents GROUP BY 1 ORDER BY fp""",
    "q33_minhash_sig" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') w FROM documents),
         sh AS (SELECT doc_id, unnest(list_transform(range(len(w)-7), i -> array_to_string(w[i+1:i+8], ' '))) s
                FROM t WHERE len(w) >= 8)
         SELECT doc_id,
           min(md5('0:'||s)) AS sig_0, min(md5('1:'||s)) AS sig_1,
           min(md5('2:'||s)) AS sig_2, min(md5('3:'||s)) AS sig_3,
           min(md5('4:'||s)) AS sig_4, min(md5('5:'||s)) AS sig_5,
           min(md5('6:'||s)) AS sig_6, min(md5('7:'||s)) AS sig_7
         FROM sh GROUP BY doc_id ORDER BY doc_id""",
    "q34_shingle_jaccard" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') w FROM documents),
         sh AS (SELECT DISTINCT doc_id, unnest(list_transform(range(len(w)-7), i -> array_to_string(w[i+1:i+8], ' '))) s
                FROM t WHERE len(w) >= 8),
         sizes AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY 1),
         pairs AS (SELECT l.doc_id a, r.doc_id b, COUNT(*) common
                   FROM sh l JOIN sh r ON l.s = r.s AND l.doc_id < r.doc_id GROUP BY 1, 2)
         SELECT a, b, common,
           CAST(common AS DOUBLE) / (sa.n + sb.n - common) AS jaccard
         FROM pairs JOIN sizes sa ON a = sa.doc_id JOIN sizes sb ON b = sb.doc_id
         ORDER BY a, b""")
}
