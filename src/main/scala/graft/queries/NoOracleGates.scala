package graft.queries

/** Minimum driver-side gates for the query entries WITHOUT a value
  * oracle (the approximate/sketch/trainer/real-codec family): the
  * DuckDB compare can't hash their values, but it can still pin two
  * things per entry — the OUTPUT SCHEMA (exact Spark DDL, so silent
  * schema drift fails the gate instead of sailing through as
  * `rows-only`) and a ROW-COUNT INVARIANT evaluated by DuckDB over the
  * same input tables (exact where the count is a deterministic
  * function of the data — most entries: fixed top-k widths, per-row
  * terminals, query-set multiples — and an [lo, hi] envelope where the
  * count depends on the algorithm itself, with `lo` a provable floor
  * such as the exact-duplicate pair census and `hi` the linearity
  * budget, e.g. "a survivor terminal never emits more rows than the
  * corpus").
  *
  * Each SQL returns ONE row with BIGINT columns `lo, hi` (inclusive);
  * the checker asserts lo <= spark_rows <= hi and DDL equality.
  * ContractSpec pins that these two maps cover EXACTLY the no-oracle
  * entries, so a new query can't silently land ungated.
  */
object NoOracleGates {

  private val AnnDdl =
    "q_id BIGINT,rnk INT NOT NULL,n_id BIGINT,n_label INT,cos_micro BIGINT"
  // One result row per (query vector, neighbor rank): 10 neighbors for
  // every vec_id % 100 == 0 query. Exact: every ANN variant must fill
  // all k slots on this corpus — a thinner result is a recall bug, not
  // noise.
  private val AnnRows =
    "SELECT 10 * count(*) AS lo, 10 * count(*) AS hi FROM embeddings WHERE vec_id % 100 = 0"

  // Provable floor for near-dup PAIR counts: documents with literally
  // identical text always collide (identical shingles => identical
  // signatures => same bands / distance 0), so the exact-duplicate
  // pair census is a lower bound. Ceiling = corpus size: the blocked
  // pair census of this workload stays linear in the corpus; a
  // quadratic pair explosion is the failure this gate is for.
  private val PairFloor =
    "(SELECT COALESCE(SUM(CASE WHEN c > 1 THEN c * (c - 1) // 2 ELSE 0 END), 0) " +
      "FROM (SELECT count(*) AS c FROM documents GROUP BY text) t)"
  private val DocCount = "(SELECT count(*) FROM documents)"

  val rowBoundSql: Map[String, String] = Map(
    "ann_lsh" -> AnnRows,
    "ann_ivf" -> AnnRows,
    "ann_sq8" -> AnnRows,
    "ann_ivf_sq8" -> AnnRows,
    "ann_pq" -> AnnRows,
    "ann_ivf_pq" -> AnnRows,
    "ann_ivf_stored" -> AnnRows,
    "ann_ivf_stream" -> AnnRows,
    "ann_pq_stored" -> AnnRows,
    // One classification row per vec_id % 50 == 0 query vector.
    "knn_classify_lsh" ->
      "SELECT count(*) AS lo, count(*) AS hi FROM embeddings WHERE vec_id % 50 = 0",
    "knn_classify_ivf" ->
      "SELECT count(*) AS lo, count(*) AS hi FROM embeddings WHERE vec_id % 50 = 0",
    // Fixed top-k / LIMIT widths — deterministic on any corpus with at
    // least k candidates (all gate SFs).
    "dedup_embedding_lsh" -> "SELECT 20 AS lo, 20 AS hi",
    "dedup_semantic" -> "SELECT 20 AS lo, 20 AS hi",
    "mm_phash_dedup" -> "SELECT 20 AS lo, 20 AS hi",
    "mm_audio_fp_dedup" -> "SELECT 20 AS lo, 20 AS hi",
    "text_term_freq_cms" -> "SELECT 20 AS lo, 20 AS hi",
    "text_bpe_vocab" -> "SELECT 16 AS lo, 16 AS hi",
    "vec_cluster_stats" -> "SELECT 16 AS lo, 16 AS hi",
    // Data-dependent pair censuses: exact-dup floor, linear ceiling.
    "dedup_minhash" -> s"SELECT $PairFloor AS lo, $DocCount AS hi",
    "dedup_simhash" -> s"SELECT $PairFloor AS lo, $DocCount AS hi",
    // Survivor/label terminals: every doc whose text repeats is
    // necessarily labeled (floor); at most one row per document
    // (ceiling — the linearity contract of a survivor terminal).
    "dedup_survivors_minhash_inc" ->
      ("SELECT (SELECT COALESCE(SUM(CASE WHEN c > 1 THEN c ELSE 0 END), 0) " +
        "FROM (SELECT count(*) AS c FROM documents GROUP BY text) t) AS lo, " +
        s"$DocCount AS hi"),
    // EXACT: one row per media in a near-dup component, and on this
    // generator EVERY media is in one — each doc_id % 40 group has
    // >= 2 members at every gate SF (N/40 >= 2 for N >= 80), the
    // brightness shift is dHash/fingerprint-invariant by construction,
    // and the two damaged pixels (resp. damaged windows) flip at most
    // 4 signature bits < the pairing maxDist of 6, so every same-group
    // sibling pair is recovered (MultimodalSpec pins recovery and
    // cross-group separation; merging components never changes the
    // one-row-per-member count).
    "mm_phash_survivors" -> s"SELECT $DocCount AS lo, $DocCount AS hi",
    "mm_audio_fp_survivors" -> s"SELECT $DocCount AS lo, $DocCount AS hi",
    // Sketch aggregates grouped on low-cardinality keys: one row per
    // group, group sets exactly derivable.
    "q_distinct_approx" ->
      ("SELECT count(DISTINCT l_returnflag) AS lo, " +
        "count(DISTINCT l_returnflag) AS hi FROM lineitem"),
    "q_distinct_hll_sketch" ->
      ("SELECT count(DISTINCT o_orderpriority) AS lo, " +
        "count(DISTINCT o_orderpriority) AS hi FROM orders"),
    // Stored-sketch serving twins: same exact group-set row counts as
    // their inline twins (the stored split never changes the groups).
    "q_distinct_hll_inc" ->
      ("SELECT count(DISTINCT o_orderpriority) AS lo, " +
        "count(DISTINCT o_orderpriority) AS hi FROM orders"),
    "q_distinct_hll_stream" ->
      ("SELECT count(DISTINCT o_orderpriority) AS lo, " +
        "count(DISTINCT o_orderpriority) AS hi FROM orders"),
    // Exactly 10: candidate pool = per-month exact top-32, >= 10
    // distinct keys on every gate corpus.
    "q_heavy_hitters_stored" -> "SELECT 10 AS lo, 10 AS hi",
    // Stored KLL serve: one row per priority, exactly like the HLL
    // serves (the stored split never changes the group set).
    "q_percentiles_stored" ->
      ("SELECT count(DISTINCT o_orderpriority) AS lo, " +
        "count(DISTINCT o_orderpriority) AS hi FROM orders"),
    "q_percentiles_approx" ->
      ("SELECT count(DISTINCT c_mktsegment) AS lo, count(DISTINCT c_mktsegment) AS hi " +
        "FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey"),
    // approx_top_k caps at 10; the sketch may return fewer under
    // budget pressure — emptiness is still a failure.
    "q_heavy_hitters_approx" -> "SELECT 1 AS lo, 10 AS hi",
    // Per-document terminals: exactly one row per document.
    "text_bpe_encode" -> s"SELECT $DocCount AS lo, $DocCount AS hi",
    "text_compress_ratio" -> s"SELECT $DocCount AS lo, $DocCount AS hi",
    "text_quality_classifier" -> s"SELECT $DocCount AS lo, $DocCount AS hi",
    // Stored-model serve: exactly one row per delta-batch document.
    "text_quality_stored" ->
      ("SELECT count(*) AS lo, count(*) AS hi FROM documents " +
        "WHERE doc_id % 16 = 0"),
    // 8 principal components per embedding row.
    "vec_pca" ->
      "SELECT 8 * count(*) AS lo, 8 * count(*) AS hi FROM embeddings")

  val expectedSchema: Map[String, String] = Map(
    "ann_lsh" -> AnnDdl,
    "ann_ivf" -> AnnDdl,
    "ann_sq8" -> AnnDdl,
    "ann_ivf_sq8" -> AnnDdl,
    "ann_pq" -> AnnDdl,
    "ann_ivf_pq" -> AnnDdl,
    "ann_ivf_stored" -> AnnDdl,
    "ann_ivf_stream" -> AnnDdl,
    "ann_pq_stored" -> AnnDdl,
    "knn_classify_lsh" -> "q_id BIGINT,predicted_label INT,votes BIGINT NOT NULL",
    "knn_classify_ivf" -> "q_id BIGINT,predicted_label INT,votes BIGINT NOT NULL",
    "dedup_embedding_lsh" -> "id1 BIGINT,id2 BIGINT,cos_micro BIGINT",
    "dedup_semantic" -> "cid INT,id1 BIGINT,id2 BIGINT,cos_micro BIGINT",
    "dedup_minhash" -> "id1 BIGINT,id2 BIGINT,jaccard_bp BIGINT",
    "dedup_simhash" -> "id1 BIGINT,id2 BIGINT,hamming BIGINT",
    "dedup_survivors_minhash_inc" -> "doc_id BIGINT,canonical BIGINT",
    "mm_phash_dedup" ->
      "id1 BIGINT NOT NULL,id2 BIGINT NOT NULL,hamming BIGINT NOT NULL",
    "mm_audio_fp_dedup" ->
      "id1 BIGINT NOT NULL,id2 BIGINT NOT NULL,hamming BIGINT NOT NULL",
    "mm_phash_survivors" ->
      "media_id BIGINT NOT NULL,survivor_id BIGINT NOT NULL,cluster_size BIGINT NOT NULL",
    "mm_audio_fp_survivors" ->
      "media_id BIGINT NOT NULL,survivor_id BIGINT NOT NULL,cluster_size BIGINT NOT NULL",
    "q_distinct_approx" ->
      "l_returnflag STRING,n_parts_approx BIGINT NOT NULL,n_supps_approx BIGINT NOT NULL",
    "q_distinct_hll_sketch" ->
      "o_orderpriority STRING,approx_custs BIGINT NOT NULL,n_months BIGINT NOT NULL",
    "q_distinct_hll_inc" ->
      "o_orderpriority STRING,approx_custs BIGINT NOT NULL,n_months BIGINT NOT NULL",
    "q_distinct_hll_stream" ->
      "o_orderpriority STRING,approx_custs BIGINT NOT NULL,n_months BIGINT NOT NULL",
    // Nullable since the r11 in-plan serve: the columns flow from the
    // parquet candidate scan + cms_estimate instead of a driver-built
    // local Seq (which stamped synthetic NOT NULLs).
    "q_heavy_hitters_stored" -> "custkey BIGINT,est_orders BIGINT",
    "q_percentiles_stored" ->
      ("o_orderpriority STRING,p50_cents BIGINT,p90_cents BIGINT," +
        "p99_cents BIGINT,n_months BIGINT NOT NULL"),
    "q_percentiles_approx" -> "c_mktsegment STRING,p50_cents BIGINT,p90_cents BIGINT",
    "q_heavy_hitters_approx" -> "custkey BIGINT,n_orders BIGINT NOT NULL",
    "text_bpe_encode" ->
      "doc_id BIGINT,n_words BIGINT NOT NULL,n_bpe_tokens BIGINT NOT NULL",
    "text_bpe_vocab" ->
      "rank BIGINT NOT NULL,left STRING,right STRING,merged STRING,pair_count BIGINT NOT NULL",
    "text_compress_ratio" ->
      "doc_id BIGINT,n_bytes BIGINT,deflate_len BIGINT,ratio_bp BIGINT",
    "text_quality_classifier" ->
      "doc_id BIGINT,label_heur BIGINT,p_micro BIGINT,pred BIGINT",
    "text_quality_stored" ->
      "doc_id BIGINT,label_heur BIGINT,p_micro BIGINT,pred BIGINT",
    "text_term_freq_cms" ->
      "term STRING,topk_count BIGINT NOT NULL,cms_count BIGINT NOT NULL",
    "vec_cluster_stats" ->
      ("cid INT,n_vecs BIGINT,n_labels BIGINT NOT NULL,dom_label INT," +
        "dom_share_bp BIGINT,mean_cos_micro BIGINT,min_cos_micro BIGINT"),
    "vec_pca" -> "vec_id BIGINT,comp INT NOT NULL,proj_micro BIGINT")
}
