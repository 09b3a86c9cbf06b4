package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.VectorOps
import graft.sim.Knn
import QueryHelpers._

/** Similarity-search extension coverage over `embeddings` (BASELINE.json
  * scope): vector norms, brute-force cosine top-k (exact baseline),
  * embedding-cosine near-dup pairs, and SRP-LSH ANN (scale path; the IVF
  * scale path is benched as q61 and specced in IvfSpec).
  *
  * All scoring uses the sequential-fold dot semantics that are
  * bit-identical to DuckDB's list_sum evaluation — via VectorOps' HOF
  * kernel or the codegen DotF32/L2NormalizeF32 forms (parity asserted in
  * DotF32Spec), so every query here hash-matches the oracle.
  */
object VectorQueries {

  private val dim = 64

  val defs: Map[String, QueryFn] = Map(
    // Symmetric int8 scalar quantization (the faiss-SQ8 memory path
    // beside PQ): per-vector maxabs + codes floor(x·127/maxabs + 0.5),
    // emitted exploded so every code is an oracle-checkable exact
    // integer (the maxabs double is one IEEE max of exact widened
    // floats). Int8 top-k recall vs the exact KNN baseline is spec-land
    // (ScalarQuantSpec — scoring rides the codegen DotF32 kernel on
    // float-exact integer codes).
    "q149_int8_quant" -> { (s, d) =>
      val enc = graft.sim.ScalarQuant.encode(
        table(s, d, "embeddings"), "vec_id", "embedding")
      enc.select(col("vec_id"), col("maxabs"),
          posexplode(col("codes")).as(Seq("i", "code")))
        .orderBy(col("vec_id"), col("i"))
    },

    // Content-based user-profile retrieval — the two-tower-lite path:
    // each user's profile is the exact decimal-mean of their purchased
    // items' embeddings (vec_id = item id), every unseen item scored by
    // the decimal-summed profile·item dot, top-3 per user. The whole
    // chain is the exploded relational form, so profile means, scores,
    // and ranks all hash-replay (the q45 centroid device extended
    // through the dot product).
    "q158_user_profiles" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val inter = table(s, d, "events")
        .filter(col("event_type") === "purchase" && col("user_id") < 24)
        .select(col("user_id"),
          get_json_object(col("props"), "$.k").cast("int").as("item"))
        .distinct()
      val itemx = table(s, d, "embeddings")
        .select(col("vec_id").cast("int").as("item"),
          posexplode(col("embedding")).as(Seq("pos", "x")))
      val prof = inter.join(itemx, Seq("item"))
        .groupBy(col("user_id"), col("pos"))
        .agg((dsum(col("x").cast("double"), 8) / count(lit(1))).as("m"))
      val scores = prof.join(itemx, Seq("pos"))
        .groupBy(col("user_id"), col("item"))
        .agg(dsum(col("m") * col("x").cast("double"), 12).as("score"))
        .join(inter, Seq("user_id", "item"), "left_anti")
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("score").desc, col("item").asc)
      scores.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
        .select(col("user_id"), col("rk"), col("item"), col("score"))
        .orderBy(col("user_id"), col("rk"))
    },

    // Embedding-space outlier QA (mislabel / corrupt-vector detection):
    // per-label centroid (exact decimal means), squared distance of
    // every vector to its label's centroid (decimal-summed products),
    // outlier = dist² above the label's exact 95th percentile (the q107
    // threshold device, per group). The whole card — centroids,
    // distances, thresholds, flags — hash-replays.
    "q168_embedding_outliers" -> { (s, d) =>
      val x = table(s, d, "embeddings").select(col("label"), col("vec_id"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
      val cent = x.groupBy(col("label"), col("pos"))
        .agg((dsum(col("x").cast("double"), 8) / count(lit(1))).as("m"))
      val dev = col("x").cast("double") - col("m")
      val d2 = x.join(cent, Seq("label", "pos"))
        .groupBy(col("vec_id"), col("label"))
        .agg(dsum(dev * dev, 12).as("dist2"))
      val thr = d2.groupBy(col("label"))
        .agg(percentile(col("dist2"), lit(0.95)).as("thr"))
      d2.join(broadcast(thr), Seq("label"))
        .select(col("vec_id"), col("label"), col("dist2"), col("thr"),
          (col("dist2") > col("thr")).as("is_outlier"))
        .orderBy(col("vec_id"))
    },

    // L2 norms + dims (F8 surface).
    "q40_vector_norms" -> { (s, d) =>
      table(s, d, "embeddings")
        .select(col("vec_id"), size(col("embedding")).as("dim"),
          VectorOps.norm2(col("embedding")).as("l2"))
        .orderBy(col("vec_id"))
    },

    // Fused serving kernel vs the DuckDB replay (sim.Retrieval /
    // sql.TopKDotF32, round 11): top-5 raw-dot retrieval of 48 query
    // vectors over the whole catalog, a deterministic (q+c)%11 "seen" set
    // excluded ROW-LOCALLY inside the kernel — the oracle replays it as a
    // join predicate and must produce the identical ranked rows.
    "q180_fused_retrieval" -> { (s, d) =>
      val emb = table(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 48)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      val seen = queries.select(col("q_id"))
        .crossJoin(emb.select(col("vec_id")))
        .filter((col("q_id") + col("vec_id")) % 11 === 0)
      graft.sim.Retrieval.topKDot(queries, "q_id", "qv", emb, "vec_id",
          "embedding", 5, seen = Some(seen)).get
        .orderBy(col("q_id"), col("rk"))
    },

    // Brute-force cosine top-5 for a small query set (exact ANN baseline).
    "q41_knn_exact" -> { (s, d) =>
      val emb = table(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 32)
      Knn.bruteForceTopK(queries, emb, "vec_id", "embedding", 5)
        .select(col("query_id"), col("rk"), col("neighbor_id"), col("cos"))
        .orderBy(col("query_id"), col("rk"))
    },

    // Margin-based bitext mining (Artetxe & Schwenk 2019): best de match
    // per en doc, scored by cosine over the mean of both sides' 4-NN
    // cosines — the hubness-cancelling criterion CCMatrix mines parallel
    // corpora with. Embeddings keyed by vec_id = doc_id; decimal-summed
    // means + one identical-association double chain keep every column
    // on the hash surface.
    "q143_bitext_margin" -> { (s, d) =>
      val emb = table(s, d, "embeddings")
      val byLang = table(s, d, "documents").select(col("doc_id"), col("lang"))
        .join(emb, col("doc_id") === col("vec_id"))
      def side(l: String) = byLang.filter(col("lang") === l)
        .select(col("doc_id"), col("embedding"))
      graft.sim.BitextMine.mine(side("en"), side("de"), "doc_id", "embedding",
          k = 4)
        .orderBy(col("src_id"))
    },

    // Semantic decontamination (embedding leg of the q72 n-gram probe):
    // per-corpus-row max cosine against the broadcast benchmark vectors
    // (label 0 plays the eval set) — catches paraphrased benchmark
    // leakage n-grams miss. MAX over doubles is order-independent, so
    // max_cos sits on the hash surface.
    "q131_semantic_decontam" -> { (s, d) =>
      val emb = table(s, d, "embeddings")
      graft.dedup.Decontaminate.semanticContamination(
          emb.filter(col("label") =!= 0), "vec_id", "embedding",
          emb.filter(col("label") === 0), "embedding")
        .orderBy(col("vec_id"))
    },

    // Hybrid retrieval via Reciprocal Rank Fusion (Cormack & Clarke 2009):
    // the BM25 keyword top-50 and the embedding-cosine top-50 (query =
    // doc 7's embedding; vec_id aligns with doc_id in the fixture) fused
    // by Σ 1/(60+rank) — exact rationals of integer ranks composed in a
    // fixed order, so the fused score ITSELF sits on the hash surface (no
    // transcendental in the fusion; ln/cos only order the input lists,
    // where q122's boundary-gap argument applies).
    "q123_hybrid_rrf" -> { (s, d) =>
      import graft.functions.{Bm25, TextOps}
      import graft.rank.Rrf
      val docs = table(s, d, "documents")
        .select(col("doc_id"), TextOps.tokens(col("text")).as("__toks"))
      val bmTop = Bm25.topK(docs, "doc_id", col("__toks"),
        Seq("stream", "table", "query"), 50)
      val bm = Rrf.rankBy(bmTop, Seq(col("score").desc, col("doc_id")))
      val emb = table(s, d, "embeddings")
      val knTop = Knn.bruteForceTopK(emb.filter(col("vec_id") === 7),
          emb, "vec_id", "embedding", 50)
        .withColumnRenamed("neighbor_id", "doc_id")
        .withColumnRenamed("rk", "rank")
      Rrf.fuseTopK(Seq(bm, knTop), "doc_id", "rank", 20)
        .select(col("doc_id"), col("rank_0").as("bm25_rank"),
          col("rank_1").as("knn_rank"), col("rrf"))
        .orderBy(col("doc_id"))
    },

    // Embedding-cosine near-duplicate pairs within a label block
    // (blocking keeps the pair space linear-ish; threshold from data range).
    // Vectors are L2-normalized once per row, so the pair score is a single
    // codegen'd dot product.
    "q42_cosine_neardup" -> { (s, d) =>
      graft.sql.GraftFunctions.register(s)
      val emb = table(s, d, "embeddings")
        .select(col("label"), col("vec_id"),
          graft.sql.GraftFunctions.l2NormalizeF32(col("embedding")).as("nv"))
      val a = emb.select(col("label"), col("vec_id").as("a"), col("nv").as("na"))
      val b = emb.select(col("label"), col("vec_id").as("b"), col("nv").as("nb"))
      a.join(b, Seq("label"))
        .filter(col("a") < col("b"))
        .select(col("a"), col("b"),
          graft.sql.GraftFunctions.dotF32(col("na"), col("nb")).as("cos"))
        .filter(col("cos") > 0.3)
        .orderBy(col("a"), col("b"))
    },

    // Per-label, per-dimension embedding centroids (cluster-summary QA —
    // the positional form of VecCentroidAgg, exact-decimal means so the
    // doubles hash-match the oracle; one shuffle on (label, pos)).
    "q45_label_centroids" -> { (s, d) =>
      table(s, d, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("label"), col("pos"))
        .agg((dsum(col("x").cast("double"), 8) / count(lit(1))).as("mean_x"))
        .orderBy(col("label"), col("pos"))
    },

    // Blocked near-dup with hot-block SRP splitting (the operator form of
    // the q42 composition): blocks over maxBlock rows are subdivided by the
    // low bits of a deterministic SRP bucket, smallest power-of-two split
    // that bounds the expected sub-block at maxBlock. Fully oracle-checked —
    // hyperplanes AND the split ladder are engine-independent constants.
    "q46_blocked_neardup" -> { (s, d) =>
      graft.sim.BlockedNearDup.pairs(table(s, d, "embeddings"),
          "vec_id", "embedding", "label",
          maxBlock = blockedMaxBlock, threshold = 0.3, dim = dim,
          maxSplitBits = blockedSplitBits)
        .orderBy(col("label"), col("a"), col("b"))
    },

    // End-to-end embedding near-dup REMOVAL (the vector q38): blocked pair
    // generation (with hot-block SRP splitting) → drop the larger id of
    // every pair at/above threshold → anti join. Output: surviving rows.
    "q48_drop_vector_neardups" -> { (s, d) =>
      graft.sim.BlockedNearDup.dropNearDuplicates(table(s, d, "embeddings"),
          "vec_id", "embedding", "label",
          maxBlock = blockedMaxBlock, threshold = 0.4, dim = dim,
          maxSplitBits = blockedSplitBits)
        .select(col("vec_id"), col("label"))
        .orderBy(col("vec_id"))
    },

    // Semantic dedup (SemDeDup): quantizer cell assignment (plan-constant
    // centroids, the q47 technique) → within-cell cosine pruning with
    // hot-cell SRP splitting → keep the smallest id of each near-dup
    // group. The composition IS the paper's pipeline; every stage is
    // engine-reproducible, so it's fully oracle-checked end to end.
    "q96_semantic_dedup" -> { (s, d) =>
      graft.sim.SemDedup.dropSemanticDuplicates(
          table(s, d, "embeddings").select(col("vec_id"), col("embedding")),
          "vec_id", "embedding", ivfCentroids, threshold = 0.4,
          maxCell = blockedMaxBlock, dim = dim,
          maxSplitBits = blockedSplitBits)
        .select(col("vec_id"), col("cell"))
        .orderBy(col("vec_id"))
    },

    // IVF ANN top-5 against a plan-constant quantizer — the FULL pipeline
    // (cell assignment via IvfProbeF32, nprobe probing, exact cosine
    // rerank) oracle-checked: with the centroid matrix a deterministic
    // constant in both engines, assignment/probing is an exact-double
    // argmin any SQL engine reproduces (the k-means fit stays spec-checked
    // in IvfSpec — the search path is what serves queries).
    "q47_ivf_ann" -> { (s, d) =>
      graft.sim.Ivf.topKWithCentroids(table(s, d, "embeddings"),
          "vec_id", "embedding", k = 5, centroids = ivfCentroids, nprobe = 2)
        .select(col("query_id"), col("rk"), col("neighbor_id"), col("cos"))
        .orderBy(col("query_id"), col("rk"))
    },

    // The ANN-served retrieval leg end-to-end (sim.Retrieval.topKAnn,
    // round 12): 48 query vectors probe their 2 nearest of 16 synthetic
    // cells, score ONLY those cells' rows with the raw DotF32 dot, and
    // exclude a deterministic (q+c)%11 "seen" set row-locally — q180's
    // serving contract through the IVF index instead of the dense
    // kernel. The oracle replays cell assignment (exact-double argmin,
    // ties → lower cid, the q47 technique), the probe set, the seen
    // predicate, and the (score desc, id asc) ranking.
    "q181_ann_retrieval" -> { (s, d) =>
      val emb = table(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 48)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      val seen = queries.select(col("q_id"))
        .crossJoin(emb.select(col("vec_id")))
        .filter((col("q_id") + col("vec_id")) % 11 === 0)
      val index = graft.sim.Retrieval.annIndex(emb, "vec_id", "embedding",
        ivfCentroids)
      graft.sim.Retrieval.topKAnn(queries, "q_id", "qv", index, "vec_id",
          "embedding", ivfCentroids, k = 5, nprobe = 2, seen = Some(seen))
        .orderBy(col("q_id"), col("rk"))
    },

    // Multi-table SRP-LSH ANN top-5 — fully oracle-checked: the ±1
    // hyperplane coefficients are plan-time constants embedded in BOTH the
    // Spark plan and the DuckDB oracle SQL, so the bucketing (and thus the
    // approximate result) is engine-independent. Recall vs the exact
    // baseline is additionally asserted in KnnSpec.
    "q43_knn_lsh" -> { (s, d) =>
      Knn.lshTopK(table(s, d, "embeddings"), "vec_id", "embedding", dim,
          bits = srpBits, k = 5, tables = srpTables)
        .select(col("query_id"), col("rk"), col("neighbor_id"))
        .orderBy(col("query_id"), col("rk"))
    },

    // Product-quantization encode + asymmetric-distance scoring against a
    // plan-constant codebook and query (same oracle philosophy as q47:
    // with books/query/lut deterministic constants in both engines, the
    // per-subspace argmin and the fixed-order lookup sum are exact-double
    // computations any SQL engine reproduces; the k-means codebook FIT is
    // spec-checked in PqSpec).
    "q82_pq_adc" -> { (s, d) =>
      val enc = graft.sim.Pq.encode(table(s, d, "embeddings"),
        "vec_id", "embedding", pqBooks)
      enc.select((col("vec_id") +:
          (0 until pqM).map(i => col("code").getItem(i).as(s"c$i"))) :+
          graft.sim.Pq.adcScore(col("code"),
            graft.sim.Pq.lutFor(pqQuery, pqBooks)).as("adc"): _*)
        .orderBy(col("vec_id"))
    })

  private val srpBits = 4
  private val srpTables = 8
  private val blockedMaxBlock = 16
  private val blockedSplitBits = 8
  private val ivfNlist = 16

  /** Deterministic synthetic quantizer (the shared Ivf.syntheticCentroids
    * definition, so the q62-bench/scale-experiment/oracle correspondence
    * can't drift) — float values, widened exactly to double for the
    * oracle's literals. */
  private lazy val ivfCentroids: Array[Array[Float]] =
    graft.sim.Ivf.syntheticCentroids(ivfNlist, dim)

  private val pqM = 4
  private val pqK = 8
  private lazy val pqBooks: Array[Array[Array[Float]]] =
    graft.sim.Pq.syntheticCodebooks(pqM, pqK, dim / pqM)
  private lazy val pqQuery: Array[Float] = graft.sim.Pq.syntheticQuery(dim)

  /** Shared q46/q48 oracle CTEs: per-row normalized vector, SRP bucket from
    * the same hyperplane constants as the Spark plan (srpSigns is tabulated
    * per plane index, so the first blockedSplitBits rows of the q43 table
    * ARE these planes), and the per-block power-of-two split ladder. */
  private lazy val blockedSubCtes: String = {
    val bucketSql = (0 until blockedSplitBits).map { p =>
      s"(CASE WHEN ${dot("embedding", srpSignLists(p))} >= 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")
    val ladder = (0 until blockedSplitBits).map { s =>
      s"WHEN bn <= ${blockedMaxBlock.toLong << s} THEN ${1L << s}"
    }.mkString(" ")
    s"""n AS (SELECT label, vec_id,
              list_transform(embedding,
                x -> CAST(CAST(x AS DOUBLE) / sqrt(${dot("embedding", "embedding")}) AS REAL)) ne,
              $bucketSql AS bucket,
              COUNT(*) OVER (PARTITION BY label) AS bn
            FROM embeddings),
          s AS (SELECT label, vec_id, ne,
              bucket % (CASE $ladder ELSE ${1L << blockedSplitBits} END) AS sub
            FROM n)"""
  }

  private lazy val srpSignLists: IndexedSeq[String] =
    Knn.srpSigns(srpTables * srpBits, dim).toIndexedSeq
      .map(_.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]"))

  private val dotSql =
    """CAST(list_sum(list_transform(list_zip(%s, %s),
       z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) AS DOUBLE)"""

  private def dot(x: String, y: String) = dotSql.format(x, y)

  val oracles: Map[String, String] = Map(
    "q168_embedding_outliers" ->
      """WITH x AS (SELECT label, vec_id, CAST(i AS INT) pos,
             CAST(embedding[i + 1] AS DOUBLE) x
           FROM (SELECT label, vec_id, embedding,
                 unnest(range(len(embedding))) i FROM embeddings)),
         cent AS (SELECT label, pos,
             CAST(SUM(CAST(x AS DECIMAL(18,8))) AS DOUBLE) / COUNT(*) m
           FROM x GROUP BY label, pos),
         d2 AS (SELECT x.vec_id, x.label,
             CAST(SUM(CAST((x.x - c.m) * (x.x - c.m) AS DECIMAL(18,12))) AS DOUBLE) dist2
           FROM x JOIN cent c ON x.label = c.label AND x.pos = c.pos
           GROUP BY x.vec_id, x.label),
         th AS (SELECT label, quantile_cont(dist2, 0.95) thr FROM d2 GROUP BY label)
         SELECT d2.vec_id, d2.label, d2.dist2, th.thr,
           d2.dist2 > th.thr AS is_outlier
         FROM d2 JOIN th USING (label) ORDER BY d2.vec_id""",
    "q158_user_profiles" ->
      """WITH inter AS (SELECT DISTINCT user_id, CAST(props->>'$.k' AS INT) item
           FROM events WHERE event_type = 'purchase' AND user_id < 24),
         itemx AS (SELECT CAST(vec_id AS INT) item, CAST(i AS INT) pos,
             CAST(embedding[i + 1] AS DOUBLE) x
           FROM (SELECT vec_id, embedding, unnest(range(len(embedding))) i
                 FROM embeddings)),
         prof AS (SELECT n.user_id, x.pos,
             CAST(SUM(CAST(x.x AS DECIMAL(18,8))) AS DOUBLE) / COUNT(*) m
           FROM inter n JOIN itemx x ON n.item = x.item
           GROUP BY n.user_id, x.pos),
         sc AS (SELECT p.user_id, x.item,
             CAST(SUM(CAST(p.m * x.x AS DECIMAL(18,12))) AS DOUBLE) score
           FROM prof p JOIN itemx x ON p.pos = x.pos
           GROUP BY p.user_id, x.item),
         unseen AS (SELECT sc.* FROM sc
           LEFT JOIN inter n ON sc.user_id = n.user_id AND sc.item = n.item
           WHERE n.item IS NULL),
         ranked AS (SELECT user_id, item, score, ROW_NUMBER() OVER
             (PARTITION BY user_id ORDER BY score DESC, item) rk
           FROM unseen)
         SELECT user_id, CAST(rk AS INT) rk, item, score FROM ranked
         WHERE rk <= 3 ORDER BY user_id, rk""",
    "q149_int8_quant" ->
      """WITH m AS (SELECT vec_id, embedding,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) maxabs
           FROM embeddings),
         x AS (SELECT vec_id, maxabs, embedding, unnest(range(len(embedding))) i FROM m)
         SELECT vec_id, maxabs, CAST(i AS INT) AS i,
           CASE WHEN maxabs = 0 THEN 0
                ELSE CAST(floor(CAST(embedding[i+1] AS DOUBLE) * 127.0 / maxabs + 0.5) AS INT)
           END AS code
         FROM x ORDER BY vec_id, i""",
    "q45_label_centroids" ->
      s"""SELECT label, CAST(p.i AS INT) AS pos,
         CAST(SUM(CAST(CAST(embedding[p.i + 1] AS DOUBLE) AS DECIMAL(18,8))) AS DOUBLE) / COUNT(*) AS mean_x
         FROM embeddings CROSS JOIN (SELECT unnest(range($dim)) i) p
         GROUP BY label, p.i ORDER BY label, pos""",
    "q40_vector_norms" ->
      s"""SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
          sqrt(${dot("embedding", "embedding")}) AS l2
          FROM embeddings ORDER BY vec_id""",
    "q131_semantic_decontam" ->
      s"""WITH b AS (SELECT embedding bv FROM embeddings WHERE label = 0),
          c AS (SELECT vec_id, embedding cv FROM embeddings WHERE label <> 0),
          m AS (SELECT vec_id,
              MAX(${dot("cv", "bv")} / (sqrt(${dot("cv", "cv")}) * sqrt(${dot("bv", "bv")}))) AS max_cos
            FROM c, b GROUP BY vec_id)
          SELECT c.vec_id, m.max_cos FROM c LEFT JOIN m ON c.vec_id = m.vec_id
          ORDER BY c.vec_id""",
    "q123_hybrid_rrf" ->
      s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') w FROM documents),
         d AS (SELECT doc_id, CAST(len(w) AS DOUBLE) dl, w FROM t),
         stats AS (SELECT CAST(COUNT(*) AS DOUBLE) n,
             CAST(SUM(CAST(CAST(len(w) AS DOUBLE) AS DECIMAL(18,4))) AS DOUBLE) sdl FROM t),
         tf AS (SELECT doc_id, dl, tok AS term, CAST(COUNT(*) AS DOUBLE) tf
                FROM (SELECT doc_id, dl, unnest(w) tok FROM d) u
                WHERE tok IN ('stream', 'table', 'query') GROUP BY 1, 2, 3),
         dft AS (SELECT term, CAST(COUNT(*) AS DOUBLE) dft FROM tf GROUP BY 1),
         per AS (SELECT f.doc_id, f.term,
             ln((s.n - d2.dft + CAST(0.5 AS DOUBLE)) / (d2.dft + CAST(0.5 AS DOUBLE))
                + CAST(1.0 AS DOUBLE))
             * (f.tf * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE))
                / (f.tf + CAST(1.2 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
                   + CAST(0.75 AS DOUBLE) * (f.dl / (s.sdl / s.n))))) sc
           FROM tf f JOIN dft d2 ON f.term = d2.term, stats s),
         tot AS (SELECT doc_id,
             ((CAST(0.0 AS DOUBLE)
               + COALESCE(MAX(CASE WHEN term = 'query' THEN sc END), CAST(0.0 AS DOUBLE)))
               + COALESCE(MAX(CASE WHEN term = 'stream' THEN sc END), CAST(0.0 AS DOUBLE)))
               + COALESCE(MAX(CASE WHEN term = 'table' THEN sc END), CAST(0.0 AS DOUBLE)) AS score
           FROM per GROUP BY doc_id),
         bm AS (SELECT doc_id, r0 FROM (
             SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) r0 FROM tot)
           WHERE r0 <= 50),
         qv AS (SELECT embedding v FROM embeddings WHERE vec_id = 7),
         kn AS (SELECT doc_id, r1 FROM (
             SELECT vec_id doc_id, ROW_NUMBER() OVER (ORDER BY
                 ${dot("qv.v", "embedding")} / (sqrt(${dot("qv.v", "qv.v")}) * sqrt(${dot("embedding", "embedding")})) DESC,
                 vec_id) r1
               FROM embeddings, qv WHERE vec_id <> 7)
           WHERE r1 <= 50),
         fused AS (SELECT COALESCE(b.doc_id, k.doc_id) doc_id, b.r0, k.r1,
             (COALESCE(CAST(1.0 AS DOUBLE) / (60 + b.r0), CAST(0.0 AS DOUBLE))
              + COALESCE(CAST(1.0 AS DOUBLE) / (60 + k.r1), CAST(0.0 AS DOUBLE))) rrf
           FROM bm b FULL OUTER JOIN kn k ON b.doc_id = k.doc_id),
         sel AS (SELECT * FROM fused ORDER BY rrf DESC, doc_id LIMIT 20)
         SELECT doc_id, r0 AS bm25_rank, r1 AS knn_rank, rrf FROM sel ORDER BY doc_id""",
    "q143_bitext_margin" ->
      s"""WITH e AS (SELECT d.doc_id, d.lang, emb.embedding
            FROM documents d JOIN embeddings emb ON emb.vec_id = d.doc_id),
          s AS (SELECT doc_id sid, embedding sv FROM e WHERE lang = 'en'),
          t AS (SELECT doc_id tid, embedding tv FROM e WHERE lang = 'de'),
          p AS (SELECT sid, tid,
              ${dot("sv", "tv")} / (sqrt(${dot("sv", "sv")}) * sqrt(${dot("tv", "tv")})) AS cos
            FROM s JOIN t ON TRUE),
          fw AS (SELECT sid, tid, cos,
              ROW_NUMBER() OVER (PARTITION BY sid ORDER BY cos DESC, tid) rk FROM p),
          bw AS (SELECT sid, tid, cos,
              ROW_NUMBER() OVER (PARTITION BY tid ORDER BY cos DESC, sid) rk FROM p),
          ms AS (SELECT sid, CAST(SUM(CAST(cos AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) m_src
            FROM fw WHERE rk <= 4 GROUP BY sid),
          mt AS (SELECT tid, CAST(SUM(CAST(cos AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) m_tgt
            FROM bw WHERE rk <= 4 GROUP BY tid),
          sc AS (SELECT f.sid, f.tid, f.cos,
              f.cos / ((ms.m_src + mt.m_tgt) / 2.0) AS margin
            FROM fw f JOIN ms USING (sid) JOIN mt USING (tid) WHERE f.rk <= 4),
          bm AS (SELECT sid, tid, cos, margin,
              ROW_NUMBER() OVER (PARTITION BY sid ORDER BY margin DESC, tid) mrk
            FROM sc)
          SELECT sid AS src_id, tid AS tgt_id, cos, margin
          FROM bm WHERE mrk = 1 ORDER BY src_id""",
    "q180_fused_retrieval" ->
      s"""WITH q AS (SELECT vec_id q_id, embedding qv FROM embeddings WHERE vec_id < 48),
          scored AS (
            SELECT q_id, vec_id, ${dot("qv", "embedding")} AS score
            FROM q JOIN embeddings ON (q_id + vec_id) % 11 <> 0),
          ranked AS (
            SELECT q_id, vec_id, score,
              CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS INT) AS rk
            FROM scored)
          SELECT q_id, rk, vec_id, score FROM ranked WHERE rk <= 5
          ORDER BY q_id, rk""",
    "q181_ann_retrieval" -> {
      val cvals = ivfCentroids.zipWithIndex.map { case (cv, i) =>
        s"($i, ${cv.map(_.toDouble.toString).mkString("[", ", ", "]")})"
      }.mkString(",\n              ")
      s"""WITH c(cid, cv) AS (VALUES
              $cvals),
          dist AS (SELECT e.vec_id, c.cid,
              CAST(list_sum(list_transform(c.cv, x -> x * x)) AS DOUBLE)
                - 2 * ${dot("e.embedding", "c.cv")} AS dd
            FROM embeddings e CROSS JOIN c),
          rankedc AS (SELECT vec_id, cid,
              ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dd, cid) rn FROM dist),
          assigned AS (SELECT vec_id, cid FROM rankedc WHERE rn = 1),
          probes AS (SELECT vec_id q_id, cid FROM rankedc
            WHERE rn <= 2 AND vec_id < 48),
          cand AS (SELECT p.q_id, a.vec_id
            FROM probes p JOIN assigned a USING (cid)
            WHERE (p.q_id + a.vec_id) % 11 <> 0),
          scored AS (SELECT cand.q_id, cand.vec_id,
              ${dot("qe.embedding", "ne.embedding")} AS score
            FROM cand JOIN embeddings qe ON qe.vec_id = cand.q_id
                      JOIN embeddings ne ON ne.vec_id = cand.vec_id),
          ranked AS (SELECT q_id, vec_id, score,
              CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                ORDER BY score DESC, vec_id) AS INT) AS rk
            FROM scored)
          SELECT q_id, rk, vec_id, score FROM ranked WHERE rk <= 5
          ORDER BY q_id, rk"""
    },
    "q41_knn_exact" ->
      s"""WITH q AS (SELECT vec_id qid, embedding qv FROM embeddings WHERE vec_id < 32),
          scored AS (
            SELECT qid AS query_id, vec_id AS neighbor_id,
              ${dot("qv", "embedding")} / (sqrt(${dot("qv", "qv")}) * sqrt(${dot("embedding", "embedding")})) AS cos
            FROM q JOIN embeddings ON vec_id <> qid),
          ranked AS (
            SELECT query_id, neighbor_id, cos,
              CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT) AS rk
            FROM scored)
          SELECT query_id, rk, neighbor_id, cos FROM ranked WHERE rk <= 5
          ORDER BY query_id, rk""",
    "q42_cosine_neardup" ->
      s"""WITH n AS (SELECT label, vec_id,
              list_transform(embedding,
                x -> CAST(CAST(x AS DOUBLE) / sqrt(${dot("embedding", "embedding")}) AS REAL)) ne
            FROM embeddings)
          SELECT x.vec_id a, y.vec_id b, ${dot("x.ne", "y.ne")} AS cos
          FROM n x JOIN n y ON x.label = y.label AND x.vec_id < y.vec_id
          WHERE ${dot("x.ne", "y.ne")} > 0.3
          ORDER BY a, b""",
    "q47_ivf_ann" -> {
      // centroid matrix as literal rows; Float→Double widening is exact and
      // Double.toString round-trips, so both engines score identical values
      val cvals = ivfCentroids.zipWithIndex.map { case (cv, i) =>
        s"($i, ${cv.map(_.toDouble.toString).mkString("[", ", ", "]")})"
      }.mkString(",\n              ")
      s"""WITH c(cid, cv) AS (VALUES
              $cvals),
          n AS (SELECT vec_id, embedding,
              list_transform(embedding,
                x -> CAST(CAST(x AS DOUBLE) / sqrt(${dot("embedding", "embedding")}) AS REAL)) ne
            FROM embeddings),
          dist AS (SELECT n.vec_id, c.cid,
              CAST(list_sum(list_transform(c.cv, x -> x * x)) AS DOUBLE)
                - 2 * ${dot("n.embedding", "c.cv")} AS dd
            FROM n CROSS JOIN c),
          rankedc AS (SELECT vec_id, cid,
              ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dd, cid) rn FROM dist),
          assigned AS (SELECT vec_id, cid FROM rankedc WHERE rn = 1),
          probes AS (SELECT vec_id, cid FROM rankedc WHERE rn <= 2),
          cand AS (SELECT p.vec_id query_id, a.vec_id neighbor_id
            FROM probes p JOIN assigned a USING (cid) WHERE p.vec_id <> a.vec_id),
          scored AS (SELECT cand.query_id, cand.neighbor_id,
              ${dot("qn.ne", "nn.ne")} AS cos
            FROM cand JOIN n qn ON qn.vec_id = cand.query_id
                      JOIN n nn ON nn.vec_id = cand.neighbor_id),
          ranked AS (SELECT query_id, neighbor_id, cos,
              CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cos DESC, neighbor_id) AS INT) rk
            FROM scored)
          SELECT query_id, rk, neighbor_id, cos FROM ranked WHERE rk <= 5
          ORDER BY query_id, rk"""
    },
    "q46_blocked_neardup" ->
      s"""WITH $blockedSubCtes
          SELECT x.label, x.vec_id a, y.vec_id b, ${dot("x.ne", "y.ne")} AS cos
          FROM s x JOIN s y ON x.label = y.label AND x.sub = y.sub AND x.vec_id < y.vec_id
          WHERE ${dot("x.ne", "y.ne")} >= 0.3
          ORDER BY x.label, a, b""",
    "q48_drop_vector_neardups" ->
      s"""WITH $blockedSubCtes,
          dups AS (SELECT DISTINCT y.vec_id AS b
            FROM s x JOIN s y ON x.label = y.label AND x.sub = y.sub AND x.vec_id < y.vec_id
            WHERE ${dot("x.ne", "y.ne")} >= 0.4)
          SELECT e.vec_id, e.label FROM embeddings e
          WHERE e.vec_id NOT IN (SELECT b FROM dups)
          ORDER BY e.vec_id""",
    "q96_semantic_dedup" -> {
      // q47's plan-constant centroid assignment + the q46/q48 blocked-sub
      // ladder, with the assigned cell as the block key
      val cvals = ivfCentroids.zipWithIndex.map { case (cv, i) =>
        s"($i, ${cv.map(_.toDouble.toString).mkString("[", ", ", "]")})"
      }.mkString(",\n              ")
      val bucketSql = (0 until blockedSplitBits).map { p =>
        s"(CASE WHEN ${dot("embedding", srpSignLists(p))} >= 0 THEN ${1L << p} ELSE 0 END)"
      }.mkString(" + ")
      val ladder = (0 until blockedSplitBits).map { s =>
        s"WHEN bn <= ${blockedMaxBlock.toLong << s} THEN ${1L << s}"
      }.mkString(" ")
      s"""WITH c(cid, cv) AS (VALUES
              $cvals),
          n AS (SELECT vec_id, embedding,
              list_transform(embedding,
                x -> CAST(CAST(x AS DOUBLE) / sqrt(${dot("embedding", "embedding")}) AS REAL)) ne
            FROM embeddings),
          dist AS (SELECT n.vec_id, c.cid,
              CAST(list_sum(list_transform(c.cv, x -> x * x)) AS DOUBLE)
                - 2 * ${dot("n.embedding", "c.cv")} AS dd
            FROM n CROSS JOIN c),
          assigned AS (SELECT vec_id, cid FROM (
              SELECT vec_id, cid,
                ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dd, cid) rn
              FROM dist) WHERE rn = 1),
          a AS (SELECT n.vec_id, n.ne, g.cid,
              $bucketSql AS bucket,
              COUNT(*) OVER (PARTITION BY g.cid) AS bn
            FROM n JOIN assigned g USING (vec_id)),
          s AS (SELECT vec_id, ne, cid,
              bucket % (CASE $ladder ELSE ${1L << blockedSplitBits} END) AS sub
            FROM a),
          dups AS (SELECT DISTINCT y.vec_id AS b
            FROM s x JOIN s y ON x.cid = y.cid AND x.sub = y.sub AND x.vec_id < y.vec_id
            WHERE ${dot("x.ne", "y.ne")} >= 0.4)
          SELECT s.vec_id, CAST(s.cid AS INT) AS cell FROM s
          WHERE s.vec_id NOT IN (SELECT b FROM dups)
          ORDER BY s.vec_id"""
    },
    "q43_knn_lsh" -> {
      def bucketSql(t: Int): String = (0 until srpBits).map { b =>
        s"(CASE WHEN ${dot("embedding", srpSignLists(t * srpBits + b))} >= 0 THEN ${1L << b} ELSE 0 END)"
      }.mkString(" + ")
      val bucketAliases = (0 until srpTables).map(t => s"${bucketSql(t)} AS bt$t").mkString(", ")
      val tList = (0 until srpTables).mkString("[", ", ", "]")
      val btList = (0 until srpTables).map(t => s"bt$t").mkString("[", ", ", "]")
      s"""WITH b0 AS (SELECT vec_id, embedding,
              list_transform(embedding,
                x -> CAST(CAST(x AS DOUBLE) / sqrt(${dot("embedding", "embedding")}) AS REAL)) ne,
              $bucketAliases FROM embeddings),
          b AS (SELECT vec_id, ne, unnest($tList) t, unnest($btList) bucket FROM b0),
          scored AS (SELECT q.vec_id query_id, c.vec_id neighbor_id,
              MAX(${dot("q.ne", "c.ne")}) cos
            FROM b q JOIN b c ON q.t = c.t AND q.bucket = c.bucket AND q.vec_id <> c.vec_id
            GROUP BY 1, 2),
          ranked AS (SELECT query_id, neighbor_id,
              CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT) rk
            FROM scored)
          SELECT query_id, rk, neighbor_id FROM ranked WHERE rk <= 5 ORDER BY query_id, rk"""
    },
    "q82_pq_adc" -> {
      // codebook rows + per-(sub,cid) lut values as literals: Float→Double
      // widening is exact and Double.toString round-trips, so both engines
      // see identical constants (the q47 technique)
      val luts = graft.sim.Pq.lutFor(pqQuery, pqBooks)
      // lv MUST be CAST AS DOUBLE: a bare decimal literal in VALUES types
      // the column DECIMAL and DuckDB would sum the lookups in decimal
      // arithmetic (measured: last-2-digit drift on every row)
      val cbVals = (for (s <- 0 until pqM; c <- 0 until pqK) yield
        s"($s, $c, ${pqBooks(s)(c).map(_.toDouble.toString).mkString("[", ", ", "]")}, " +
          s"CAST('${luts(s)(c)}' AS DOUBLE))")
        .mkString(",\n              ")
      val subDim = dim / pqM
      val codeJoins = (0 until pqM).map(s =>
        s"JOIN code s$s ON s$s.vec_id = v.vec_id AND s$s.sub = $s").mkString("\n            ")
      s"""WITH cb(sub, cid, cv, lv) AS (VALUES
              $cbVals),
          sl AS (SELECT vec_id, cb.sub, cb.cid, cb.lv,
              CAST(list_sum(list_transform(cb.cv, x -> x * x)) AS DOUBLE)
                - 2 * ${dot(s"embedding[(cb.sub*$subDim+1):(cb.sub*$subDim+$subDim)]", "cb.cv")} AS dd
            FROM embeddings CROSS JOIN cb),
          ranked AS (SELECT vec_id, sub, cid, lv,
              ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY dd, cid) rn FROM sl),
          code AS (SELECT vec_id, sub, cid, lv FROM ranked WHERE rn = 1)
          SELECT v.vec_id,
            ${(0 until pqM).map(s => s"CAST(s$s.cid AS INT) AS c$s").mkString(", ")},
            ${(0 until pqM).map(s => s"s$s.lv").mkString(" + ")} AS adc
          FROM embeddings v
            $codeJoins
          ORDER BY v.vec_id"""
    })

  /** Recall@10 of the PQ/IVFADC serving leg (`Retrieval.topKAnnPq` — the
    * storage-scale ANN path: probed cells, ADC longlist, exact rerank)
    * against the exact dense kernel on the same corpus — the round-13
    * verdict task-5 gauge, carried in every bench artifact beside
    * `ann_recall_at10` so codebook-width / nprobe / overfetch changes
    * show their recall price next to the wall they buy. Model is FIT
    * here (deterministic k-means) at the PRODUCTION code width (q83's
    * m=16 × 256 codewords over dim 64), nprobe 8/16: reads ~0.80 at
    * sf0.1 — on the sloped part of BOTH axes (exhaustive probing lifts
    * it to ~0.98, so probe misses carry ~0.17 and ADC ordering ~0.02;
    * the round-14 decomposition sweep, SCALE.md). NOT a MIPS/L2 probe
    * hole: widening nprobe at a coarse code moved recall 0.298→0.286 —
    * unlike the two-tower catalog, this corpus's norms don't starve the
    * L2 probe, and the gap was code width. Queries are a deterministic
    * 1-in-17 id sample. */
  def annPqRecallAt10(s: org.apache.spark.sql.SparkSession, d: String): Double =
    pqServeRecall(s, d, nlist = 16, m = 16, k = 256, nprobe = 8, overfetch = 4)

  /** The gauge's engine, parameterized so specs can read the recall curve
    * along each axis (probe width / code width / overfetch) — the same
    * decomposition that localized the round-13 TwoTower recall hole to
    * the probe stage. */
  private[queries] def pqServeRecall(s: org.apache.spark.sql.SparkSession,
      d: String, nlist: Int, m: Int, k: Int, nprobe: Int,
      overfetch: Int): Double = {
    graft.sql.GraftFunctions.register(s)
    val emb = table(s, d, "embeddings").select(col("vec_id"), col("embedding"))
    val q = emb.filter(pmod(col("vec_id"), lit(17)) === 0)
      .select(col("vec_id").as("qid"), col("embedding"))
    val model = graft.sim.IvfPq.fit(emb, "vec_id", "embedding",
      nlist = nlist, m = m, k = k, iters = 3)
    val encoded = graft.sim.IvfPq.index(emb, "vec_id", "embedding", model)
    val served = graft.sim.Retrieval.topKAnnPq(q, "qid", "embedding",
        encoded, "vec_id", model, rerank = emb, rVec = "embedding",
        k = 10, nprobe = nprobe, overfetch = overfetch)
      .select(col("qid"), col("vec_id"))
    val exact = graft.sim.Retrieval.topKDot(q, "qid", "embedding",
        emb, "vec_id", "embedding", k = 10)
      .getOrElse(throw new IllegalStateException(
        "embeddings corpus exceeds the dense kernel's float budget — " +
          "resize the gauge's exact baseline"))
      .select(col("qid"), col("vec_id")).localCheckpoint()
    val denom = exact.count()
    val recall =
      if (denom == 0L) 0.0
      else served.join(exact, Seq("qid", "vec_id"), "left_semi")
        .count().toDouble / denom
    graft.operators.Checkpoints.free(exact)
    recall
  }
}
