package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming document-pipeline operators — the incremental face of the
  * batch LLM-dedup surface (queries/LlmQueries.scala). The reference has
  * no streaming at all (SURVEY §2.9); a 100 TB training-data pipeline
  * ingests continuously, so exact dedup also ships as a streaming
  * operator with bounded state.
  */
object DocStreams {

  /** Streaming exact dedup (l01's hash-key dedup, incremental): keep the
    * first document per content hash, dropping re-observations that
    * arrive within the event-time watermark horizon. State is one entry
    * per distinct hash seen within the horizon and is evicted as the
    * watermark passes — bounded by ingest rate × horizon, not by corpus
    * size (a plain dropDuplicates would pin every hash ever seen).
    *
    * Input must carry an event-time `ts` column alongside `doc_id`/`text`.
    */
  def dedupedDocs(docs: DataFrame, horizon: String = "1 hour"): DataFrame =
    docs
      .withColumn("k", md5(lower(col("text"))))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("k")
      .drop("k")

  /** Streaming decontamination gate (l22's incremental face): drop every
    * arriving document sharing an `n`-gram with the static eval corpus.
    * The eval grams are distilled ONCE into a bloom blob (a few MB —
    * collected like a broadcast dim) that rides the plan as a binary
    * literal; each doc's grams probe it inside a stateless per-row
    * filter — no stream-static join, no shuffle, no state to bound.
    *
    * The gate is CONSERVATIVE: a bloom has no false negatives, so no
    * truly contaminated document ever passes; a clean document is
    * over-dropped when ANY of its G grams false-positives — the per-doc
    * false-drop rate is ~G·fpp, NOT the per-probe fpp (a 100-gram doc
    * against a 2.1%-fpp bloom would be ~88% false-drop). Unlike batch
    * l22 there is no exact-confirm join here to recover over-dropped
    * docs, so size `bloom_build`'s num_bits to eval-gram count × typical
    * doc-gram count (the 16M-bit default holds per-doc false-drop to a
    * few percent for ≤1M eval grams and ~100-gram docs; see
    * BloomFunctions' sizing rule). The asymmetry itself is the one
    * decontamination wants — letting eval data leak into training is
    * the unrecoverable failure.
    */
  /** The l28 DSIR weight table distilled to ONE broadcastable value: a
    * 1024-slot array of micro-unit (1e-6) fixed-point log-likelihood
    * ratios, indexed by token bucket. Buckets unseen in the static corpus
    * get the smoothed default ln((rt+1024)/(tt+1024)) — the add-1 value
    * a zero-count bucket would have had. Requires the `documents` view
    * (the static reference corpus the weights train on).
    *
    * Micro-units keep the streaming fold EXACT: summing longs is
    * order-independent and bit-identical to the batch entry's
    * DECIMAL(18,6) Sum, so streaming == batch is an equality, not a
    * tolerance.
    */
  def dsirWeightsMicro(spark: org.apache.spark.sql.SparkSession,
                       targetLang: String = "en"): Seq[Long] =
    spark.sql(
      s"""WITH tok AS (
         |  SELECT doc_id, lang, w
         |  FROM documents LATERAL VIEW explode(split(text, ' ')) t AS w
         |  WHERE w <> ''
         |), feat AS (
         |  SELECT doc_id, lang,
         |    CAST(conv(substr(md5(w), 1, 12), 16, 10) AS BIGINT) % 1024 AS b
         |  FROM tok
         |), raw AS (
         |  SELECT b, count(*) AS r FROM feat GROUP BY b
         |), tgt AS (
         |  SELECT b, count(*) AS t FROM feat WHERE lang = '$targetLang' GROUP BY b
         |), tots AS (
         |  SELECT CAST(sum(CASE WHEN lang = '$targetLang' THEN 1 ELSE 0 END) AS DOUBLE) AS tt,
         |    CAST(count(*) AS DOUBLE) AS rt
         |  FROM feat
         |), allb AS (
         |  SELECT explode(sequence(0, 1023)) AS b
         |), full AS (
         |  SELECT allb.b,
         |    coalesce(
         |      CAST(round(ln(((coalesce(t, 0) + 1.0) / (tt + 1024.0))
         |        / ((r + 1.0) / (rt + 1024.0))), 6) AS DECIMAL(18,6)),
         |      CAST(round(ln((rt + 1024.0) / (tt + 1024.0)), 6) AS DECIMAL(18,6)))
         |      AS lw
         |  FROM allb
         |  LEFT JOIN raw ON allb.b = raw.b
         |  LEFT JOIN tgt ON allb.b = tgt.b
         |  CROSS JOIN tots
         |)
         |SELECT transform(array_sort(collect_list(struct(b, lw))),
         |  x -> CAST(x.lw * 1000000 AS BIGINT)) AS lws
         |FROM full""".stripMargin)
      .head().getSeq[Long](0)

  /** Streaming DSIR scoring: each arriving document's importance is the
    * mean log-likelihood ratio of its token buckets against the trained
    * weight array — a pure stateless map (the 8 KB weight array rides as
    * a literal, like the decontamination bloom blob): no join, no
    * shuffle, no state. The identical column serves batch frames, and
    * the micro-unit fixed-point fold makes streaming == batch an exact
    * equality (see [[dsirWeightsMicro]]).
    */
  def dsirScore(docs: DataFrame, weightsMicro: Seq[Long]): DataFrame =
    docs
      .withColumn("graft_lws", typedLit(weightsMicro))
      .withColumn("graft_toks", expr("filter(split(text, ' '), w -> w <> '')"))
      .withColumn("n_tok", size(col("graft_toks")).cast("long"))
      .withColumn("imp", expr(
        """round(CAST(CAST(aggregate(transform(graft_toks, w ->
          |  element_at(graft_lws,
          |    CAST(CAST(conv(substr(md5(w), 1, 12), 16, 10) AS BIGINT) % 1024
          |      AS INT) + 1)),
          |  CAST(0 AS BIGINT), (acc, x) -> acc + x) AS DECIMAL(38,0))
          |  * CAST(0.000001 AS DECIMAL(7,6)) AS DOUBLE) / n_tok, 6)""".stripMargin))
      .drop("graft_lws", "graft_toks")

  /** The l30 bigram model collapsed to ONE broadcastable row: the bigram
    * and unigram count maps plus the vocabulary size — the KenLM-binary
    * analogy (CCNet ships its LM to every worker the same way). Requires
    * the `documents` view (the trusted training slice is lang='en').
    */
  def lmModelRow(spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.sql(
      """WITH w AS (
        |  SELECT filter(split(text, ' '), x -> x <> '') AS ws
        |  FROM documents WHERE lang = 'en'
        |), big AS (
        |  SELECT bg FROM w
        |  LATERAL VIEW explode(transform(sequence(1, size(ws) - 1),
        |    i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))) t AS bg
        |  WHERE size(ws) >= 2
        |), bgc AS (
        |  SELECT bg, count(*) AS c FROM big GROUP BY bg
        |), unic AS (
        |  SELECT element_at(split(bg, ' '), 1) AS w1, count(*) AS c1
        |  FROM big GROUP BY 1
        |)
        |SELECT
        |  (SELECT map_from_entries(collect_list(struct(bg, c))) FROM bgc) AS bgm,
        |  (SELECT map_from_entries(collect_list(struct(w1, c1))) FROM unic) AS unim,
        |  (SELECT CAST(count(*) AS DOUBLE) FROM unic) AS nv""".stripMargin)

  /** Streaming perplexity-proxy scoring: arriving documents score against
    * the broadcast model row with a stateless in-row fold — bigrams
    * assemble from the split array, each looks its counts up in the
    * broadcast maps, and the 6-dp summands fold as micro-unit longs
    * (the dsirScore fixed-point discipline), so streaming == batch l30
    * per-doc means is an exact equality. No stream aggregation, no
    * state, no shuffle.
    */
  def lmScore(docs: DataFrame, model: DataFrame): DataFrame =
    docs.crossJoin(broadcast(model))
      .withColumn("graft_ws", expr("filter(split(text, ' '), x -> x <> '')"))
      .withColumn("graft_bgs", expr(
        """CASE WHEN size(graft_ws) >= 2 THEN
          |  transform(sequence(1, size(graft_ws) - 1),
          |    i -> concat(element_at(graft_ws, i), ' ',
          |                element_at(graft_ws, i + 1)))
          |ELSE array() END""".stripMargin))
      .withColumn("n_big", size(col("graft_bgs")).cast("long"))
      .withColumn("mean_lp", expr(
        """round(CAST(CAST(aggregate(transform(graft_bgs, bg ->
          |  CAST(round(ln((coalesce(element_at(bgm, bg), 0) + 1.0)
          |    / (coalesce(element_at(unim, element_at(split(bg, ' '), 1)), 0)
          |       + nv)), 6) * 1000000 AS BIGINT)),
          |  CAST(0 AS BIGINT), (acc, x) -> acc + x) AS DECIMAL(38,0))
          |  * CAST(0.000001 AS DECIMAL(7,6)) AS DOUBLE) / n_big, 6)""".stripMargin))
      .drop("graft_ws", "graft_bgs", "bgm", "unim", "nv")

  /** Streaming content-defined chunker — l31's incremental face:
    * arriving documents segment with the SAME boundary fold (shared
    * expression, so streaming and batch boundaries cannot drift) and
    * emit (doc_id, n_chunks, chunk hash array) statelessly; the chunk
    * hashes feed downstream dedup exactly like the batch entry.
    */
  def chunkedDocs(docs: DataFrame): DataFrame = {
    graft.functions.WinnowFunctions.register(docs.sparkSession)
    docs
      .withColumn("graft_len", length(col("text")))
      .withColumn("graft_starts", expr(
        graft.queries.LlmQueries.cdcStartsExpr("text")))
      .withColumn("chunk_hashes", expr(
        """transform(sequence(1, size(graft_starts)),
          |  k -> md5(substr(text, element_at(graft_starts, k),
          |    IF(k < size(graft_starts), element_at(graft_starts, k + 1),
          |       graft_len + 1) - element_at(graft_starts, k))))""".stripMargin))
      .withColumn("n_chunks", size(col("chunk_hashes")))
      .drop("graft_len", "graft_starts")
  }

  def decontaminationGate(docs: DataFrame, evalDocs: DataFrame,
                          n: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    graft.functions.NGramFunctions.register(spark)
    graft.functions.BloomFunctions.register(spark)
    val blob = evalDocs
      .selectExpr(s"explode(array_distinct(word_ngrams(text, $n))) AS g")
      .selectExpr("bloom_build(xxhash64(g)) AS b")
      .head().getAs[Array[Byte]](0)
    // an empty eval corpus aggregates to a NULL blob: nothing can be
    // contaminated, so the gate is a no-op (a null literal would instead
    // NULL the whole predicate and silently drop every doc)
    if (blob == null) return docs
    // no array_distinct on the probe side: exists() short-circuits on the
    // first hit, so dedup would be pure per-row waste. coalesce keeps
    // NULL-text docs (zero grams -> never contaminated), matching the
    // batch l22 semantics where explode simply emits nothing for them
    docs.filter(coalesce(
      !exists(
        expr(s"word_ngrams(text, $n)"),
        g => graft.functions.BloomFunctions.bloomProbe(lit(blob), xxhash64(g))),
      lit(true)))
  }

  /** The l44b quality classifier distilled to ONE scoring expression
    * (its incremental face): GD training AND the z-score standardization
    * moments are batch-time artifacts — a stream cannot standardize
    * against moments it hasn't seen — so both freeze at distillation
    * time and ride the plan as double literals. The driver-side moment
    * math mirrors the batch CTE op-for-op (decimal→double cast, then
    * IEEE divide/multiply/sqrt), so a frozen-scorer score over a row
    * equals the batch SQL's score over the same row BIT-EXACTLY — the
    * spec asserts equality, not tolerance. Requires the `documents`
    * view (the training corpus).
    */
  def qualityScoreExpr(spark: org.apache.spark.sql.SparkSession): String = {
    import graft.queries.LlmQueries
    import LlmQueries.QualityLr
    val (_, w) = LlmQueries.qualityLrTrain(spark)
    // frozen standardization moments, same ops as the f CTE's
    // CAST(st.sj AS DOUBLE)/st.n and sqrt(q/n - m*m)
    val r = spark.sql(
      s"""WITH ${QualityLr.featuresCte(spark = true)}
         |SELECT * FROM st""".stripMargin).head()
    val n = r.getLong(8).toDouble
    val xs = (0 until 4).map { j =>
      val m = r.getDecimal(2 * j).doubleValue / n
      val sd = math.sqrt(r.getDecimal(2 * j + 1).doubleValue / n - m * m)
      s"((${QualityLr.rawFeatureExprs(j)}) - $m) / $sd"
    }
    QualityLr.pExprOver(
      LlmQueries.round9(w._1).toString,
      Seq(w._2, w._3, w._4, w._5).map(x => LlmQueries.round9(x).toString),
      xs)
  }

  /** Stateless streaming scoring with the distilled expression: no
    * state, no shuffle, no watermark — the model rides every task as
    * literals, the 100 TB shape of model-based corpus filtering.
    */
  def scoredDocs(docs: DataFrame, scoreExpr: String,
                 threshold: Double = 0.5): DataFrame =
    docs
      .withColumn("p", expr(scoreExpr))
      .withColumn("keep", col("p") >= threshold)

  /** Streaming chunk-level dedup (l46's incremental face): each arriving
    * document is split into K=8-word chunks, chunks repeated WITHIN the
    * horizon are dropped (first observation wins, exactly l46's rule
    * scoped to the watermark window), and the document is reassembled
    * from its surviving chunks — emitting the same per-doc census
    * columns as the batch entry.
    *
    * Shape: two chained stateful operators, the pair Spark supports in
    * append mode — dropDuplicatesWithinWatermark on the chunk hash
    * (state: one entry per distinct chunk within the horizon, evicted by
    * the watermark — bounded by ingest rate × horizon, never corpus
    * size), then a windowed per-doc aggregation that re-gathers the
    * survivors once the watermark closes the doc's window.
    *
    * Arrival-order precondition: CROSS-document duplicate resolution
    * inside one micro-batch follows arrival/shuffle order, not the batch
    * min-(doc_id, position) rule — streaming matches batch exactly only
    * when documents sharing an eligible chunk arrive in doc_id order
    * across micro-batches (the replay/backfill case; the spec feeds
    * conflict waves for this reason). Within that precondition, two
    * design points keep the remaining races out:
    *   - intra-doc repeats are resolved BEFORE the stateful dedup by a
    *     deterministic array filter (min chunk index wins), so the
    *     cross-doc state race can never pick a non-minimal occurrence
    *     from within one document;
    *   - short tail chunks (< 4 words, never dedup-eligible per l46) get
    *     a per-occurrence synthetic key, so they ride the same pipeline
    *     without ever colliding — no second stream, no union.
    */
  def chunkDedupedDocs(docs: DataFrame, horizon: String = "1 hour",
                       docWindow: String = "1 second"): DataFrame =
    docs
      .withColumn("ws", split(col("text"), " "))
      .withColumn("chs", expr(
        """transform(sequence(0, CAST(ceil(size(ws) / 8.0) AS INT) - 1),
          |  i -> named_struct('ci', CAST(i AS BIGINT),
          |    'chunk', concat_ws(' ', slice(ws, i * 8 + 1, 8))))""".stripMargin))
      .withColumn("chs", expr(
        """filter(transform(chs, x -> named_struct('ci', x.ci,
          |    'chunk', x.chunk,
          |    'elig', size(split(x.chunk, ' ')) >= 4)),
          |  x -> NOT x.elig OR NOT exists(chs,
          |    y -> size(split(y.chunk, ' ')) >= 4
          |      AND y.chunk = x.chunk AND y.ci < x.ci))""".stripMargin))
      // a per-doc NULL-chunk marker rides the pipeline (synthetic key,
      // never deduped, excluded from counts and the rebuild by NULL
      // semantics) so a document whose every chunk is dropped still
      // emits its census row — the batch side's LEFT JOIN equivalent
      .withColumn("chs", expr(
        """concat(chs, array(named_struct('ci', CAST(-1 AS BIGINT),
          |  'chunk', CAST(NULL AS STRING), 'elig', false)))""".stripMargin))
      .withColumn("n_chunks", expr(
        "CAST(ceil(size(ws) / 8.0) AS BIGINT)"))
      .selectExpr("doc_id", "ts", "n_chunks", "inline(chs)")
      .withColumn("h", expr(
        """CASE WHEN elig THEN md5(chunk)
          |ELSE md5(concat(CAST(doc_id AS STRING), '#', CAST(ci AS STRING)))
          |END""".stripMargin))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("h")
      .groupBy(window(col("ts"), docWindow), col("doc_id"))
      .agg(
        max(col("n_chunks")).as("n_chunks"),
        count(col("chunk")).as("kept_chunks"),
        expr("""array_join(transform(
          |  array_sort(collect_list(named_struct('ci', ci, 'chunk', chunk))),
          |  x -> x.chunk), ' ')""".stripMargin).as("rebuilt"))
      .selectExpr("doc_id", "n_chunks", "kept_chunks",
        "n_chunks - kept_chunks AS dropped_chunks",
        "md5(rebuilt) AS rebuilt_md5",
        "CAST(length(rebuilt) AS BIGINT) AS rebuilt_len")
}
