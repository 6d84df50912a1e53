package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.LlmQueries

/** Skew-safety checks for the LSH dedup path: a boilerplate-heavy corpus
  * (many byte-identical documents) lands in one (band, sig) bucket whose
  * pair explosion is O(n²); the bucket cap must bound the explode and
  * surface the dropped buckets in the output instead of silently running
  * them.
  */
class LlmQueriesSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private def registerCorpus(): Unit = {
    import spark.implicits._
    graft.functions.NGramFunctions.register(spark)
    val boiler = (0L until 100L).map(i =>
      (i, "spam spam spam boilerplate text here we go again", "en", "web", 48L))
    val near = Seq(
      (200L, "unique text alpha beta gamma delta epsilon", "en", "web", 42L),
      (201L, "unique text alpha beta gamma delta epsilon", "en", "web", 42L))
    (boiler ++ near).toDF("doc_id", "text", "lang", "source", "n_chars")
      .createOrReplaceTempView("l02_spec_docs")
  }

  test("l02 bucket cap drops mega-buckets and bounds the pair explosion") {
    registerCorpus()
    val capped = spark.sql(LlmQueries.minhashLshSql(16, "l02_spec_docs"))
      .collect()(0)
    // 100 identical docs -> one bucket of 100 per band, both dropped; the
    // two near-dup docs share a bucket of 2 per band -> 2 pairs, 1 distinct.
    assert(capped.getAs[Long]("n_dropped_buckets") === 2L)
    assert(capped.getAs[Long]("n_candidate_pairs") === 2L)
    assert(capped.getAs[Long]("n_distinct_pairs") === 1L)
    assert(capped.getAs[Long]("n_multi_buckets") === 2L)
  }

  test("without the cap the same corpus explodes quadratically") {
    registerCorpus()
    val uncapped = spark.sql(LlmQueries.minhashLshSql(1000, "l02_spec_docs"))
      .collect()(0)
    // 2 bands x C(100,2) mega-bucket pairs + 2 near-dup pairs.
    assert(uncapped.getAs[Long]("n_candidate_pairs") === 2L * 4950L + 2L)
    assert(uncapped.getAs[Long]("n_dropped_buckets") === 0L)
  }

  test("production cap leaves the real sf0.001 corpus untouched") {
    val df = SparkEntry.queries("l02_minhash_lsh")(spark, SparkTestSession.sf)
    val row = df.collect()(0)
    // the driver testdata has no boilerplate mega-bucket at this SF
    assert(row.getAs[Long]("n_dropped_buckets") === 0L)
    assert(row.getAs[Long]("n_candidate_pairs") > 0L)
  }

  test("l11b band keys scale: 4×16-bit cardinality dwarfs the 8-bit toy") {
    // the production claim under test: the banded 64-bit fingerprint's
    // join key space must be orders of magnitude larger than l11's
    // 256-value 8-bit simhash, or mega-buckets return at scale
    Tables.registerAll(spark, SparkTestSession.sf)
    // reuse the template's CTE chain, swap the final select
    val row = spark.sql(LlmQueries.simhash64Sql(spark = true, finalSelect =
      """SELECT count(DISTINCT concat(band, ':', sig)) AS band_keys,
        |  count(DISTINCT CASE WHEN band = 0 THEN sig END) AS b0_sigs
        |FROM bands""".stripMargin)).head()
    val bandKeys = row.getAs[Long]("band_keys")
    assert(bandKeys > 256L * 4,
      s"only $bandKeys distinct band keys — no better than the 8-bit toy")
    assert(row.getAs[Long]("b0_sigs") > 256L,
      "a single band alone must exceed the whole 8-bit key space")
  }

  test("l12 quantizer training converges: assignments settle round over round") {
    Tables.registerAll(spark, SparkTestSession.sf)
    graft.functions.VectorFunctions.register(spark)
    val row = spark.sql(LlmQueries.ivfSql(spark = true, finalSelect =
      """SELECT
        |  (SELECT count(*) FROM a0 x JOIN a1 y
        |     ON x.vec_id = y.vec_id AND x.cell <> y.cell) AS moved01,
        |  (SELECT count(*) FROM a1 x JOIN assigned y
        |     ON x.vec_id = y.vec_id AND x.cell <> y.cell) AS moved12,
        |  (SELECT count(*) FROM embeddings) AS n,
        |  (SELECT count(*) FROM c2) AS k,
        |  (SELECT count(*) FROM c0 JOIN c2 USING (cid)
        |     WHERE c0.ce <> c2.ce) AS trained_cells""".stripMargin)).head()
    val (moved01, moved12) =
      (row.getAs[Long]("moved01"), row.getAs[Long]("moved12"))
    val n = row.getAs[Long]("n")
    // Lloyd's on a fixed corpus: each round moves fewer vectors than the
    // last, and round 2 only touches a small tail
    assert(moved12 <= moved01,
      s"assignment churn must not grow: round1 moved $moved01, round2 moved $moved12")
    assert(moved12 < n / 4, s"round 2 still moved $moved12 of $n vectors")
    assert(row.getAs[Long]("k") === 8L, "all 8 cells must survive training")
    assert(row.getAs[Long]("trained_cells") > 0L,
      "training must actually move centroids off their seeds")
  }

  test("l14 propagation converges on a 12-link chain — past the old " +
    "4-round bound (VERDICT r7 #3)") {
    import spark.implicits._
    // a near-dup chain of diameter 12: under a fixed 4-round propagation
    // the far end never learns the min label and the chain under-merges
    // into several clusters; run-to-convergence must yield exactly one
    val chain = (0L until 12L).map(i => (i, i + 1))
    val hist = LlmQueries.resolveClusters(spark, chain.toDF("a", "b"))
      .collect()
    assert(hist.length === 1, s"expected one cluster size, got ${hist.toSeq}")
    assert(hist.head.getAs[Long]("sz") === 13L)
    assert(hist.head.getAs[Long]("n_clusters") === 1L)
    // the same chain capped below its diameter must hand off to star
    // contraction and still return the EXACT answer — never under-merge
    val handed = LlmQueries.resolveClusters(spark, chain.toDF("a", "b"), cap = 4)
      .collect()
    assert(handed.length === 1)
    assert(handed.head.getAs[Long]("sz") === 13L)
    assert(handed.head.getAs[Long]("n_clusters") === 1L)
  }

  test("l14 propagation early-stops: disjoint pairs converge in 2 rounds, " +
    "far below the cap") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (10L, 11L), (20L, 21L))
    // cap = 3 only succeeds if the loop detects the fixpoint itself —
    // pairs converge in round 1 and prove it in round 2
    val hist = LlmQueries.resolveClusters(spark, pairs.toDF("a", "b"), cap = 3)
      .collect()
    assert(hist.length === 1)
    assert(hist.head.getAs[Long]("sz") === 2L)
    assert(hist.head.getAs[Long]("n_clusters") === 3L)
  }

  test("l14 high-diameter handoff: a 200-link chain under a cap of 8 " +
    "resolves exactly via star contraction, not a thrown error") {
    import spark.implicits._
    // propagation would need 201 rounds; the cap hands off to
    // large-star/small-star which needs O(log n)
    val chain = (0L until 200L).map(i => (i, i + 1))
    val hist = LlmQueries.resolveClusters(spark, chain.toDF("a", "b"), cap = 8)
      .collect()
    assert(hist.length === 1, s"got ${hist.toSeq}")
    assert(hist.head.getAs[Long]("sz") === 201L)
    assert(hist.head.getAs[Long]("n_clusters") === 1L)
  }

  test("starContract labels equal propagation labels on a mixed graph " +
    "(chain + clique + pairs + shared-min star)") {
    import spark.implicits._
    val chain = (100L to 110L).map(i => (i, i + 1))
    val clique = for (i <- 0L until 5L; j <- i + 1 until 5L) yield (i, j)
    val pairs = Seq((300L, 301L), (400L, 401L))
    val star = (1L to 4L).map(i => (500L, 500L + i))
    val edges = (chain ++ clique ++ pairs ++ star).toDF("a", "b")
    val viaStar = LlmQueries.starContract(spark, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaProp = {
      edges.createOrReplaceTempView("sc_spec_edges")
      spark.sql(
        """WITH bi AS (SELECT a, b FROM sc_spec_edges
          |  UNION ALL SELECT b, a FROM sc_spec_edges)
          |SELECT DISTINCT a AS node FROM bi""".stripMargin)
        .collect().map(_.getLong(0))
        .map { n =>
          // brute-force component min on the small fixture
          n -> Iterator.iterate(Set(n)) { s =>
            s ++ (chain ++ clique ++ pairs ++ star).collect {
              case (x, y) if s(x) => y
              case (x, y) if s(y) => x
            }
          }.drop(12).next().min
        }.toMap
    }
    assert(viaStar === viaProp)
  }

  test("l11b mega-bucket cap bounds the band-join explosion and reports " +
    "drops in the sentinel row (round-8 scale probe)") {
    registerCorpus()
    // 100 byte-identical boilerplate docs share all four band sigs: at
    // cap 16 those four buckets are dropped and REPORTED; the two
    // near-dup docs sit in buckets of 2, stay, and still pair at hd=0
    val rows = spark.sql(LlmQueries.simhash64Sql(
      spark = true, table = "l02_spec_docs", cap = 16)).collect()
    val dropped = rows.find(_.getInt(0) == -1).map(_.getLong(1))
    assert(dropped === Some(4L), s"got ${rows.toSeq}")
    val hd0 = rows.find(_.getInt(0) == 0).map(_.getLong(1))
    assert(hd0 === Some(1L),
      "the kept 2-doc bucket must still produce its hd=0 pair")
  }

  test("l11b default cap leaves the fixture corpus untouched — sentinel " +
    "row reports zero drops") {
    Tables.registerAll(spark, SparkTestSession.sf)
    graft.functions.SimhashFunctions.register(spark)
    val rows = SparkEntry.queries("l11b_simhash64_banded")(
      spark, SparkTestSession.sf).collect()
    assert(rows.find(_.getInt(0) == -1).map(_.getLong(1)) === Some(0L),
      s"fixture should drop no buckets at cap 512: ${rows.toSeq}")
  }

  test("l09b mega-bucket cap drops concentrated sign-LSH buckets and " +
    "reports them; near-dups in small buckets still pair") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    // 100 identical vectors concentrate all 4 band buckets (dropped at
    // cap 16); two other near-identical vectors (opposite sign pattern,
    // so different buckets from the clump) stay and pair at sim ~1
    val clump = (0L until 100L).map(i => (i, Array.fill(64)(1.0f)))
    val near = Seq(
      (200L, Array.tabulate(64)(d => if (d % 2 == 0) -1.0f else -0.9f)),
      (201L, Array.tabulate(64)(d => if (d % 2 == 0) -1.0f else -0.95f)))
    (clump ++ near).toDF("vec_id", "embedding")
      .createOrReplaceTempView("l09b_spec_vecs")
    // the cap contract must hold at BOTH ends of the width dial: the
    // fixture 4-bit bands and the 16-bit production width (all 64 dims)
    for (bits <- Seq(4, 16)) {
      val row = spark.sql(LlmQueries.signLshBandedSql(
        spark = true, table = "l09b_spec_vecs", cap = 16,
        bitsPerBand = bits)).head()
      assert(row.getAs[Long]("n_dropped_buckets") === 4L,
        s"bits=$bits: the 100-vector clump should drop one bucket per band: $row")
      assert(row.getAs[Long]("n_neardup_pairs") === 1L,
        s"bits=$bits: the kept near-dup pair must survive the cap: $row")
      assert(row.getAs[Double]("max_sim") > 0.99)
    }
  }

  test("decontamination chooser picks exact below the broadcast threshold, " +
    "bloom beyond it, and obeys the forced-arm conf (VERDICT r7 next #4)") {
    Tables.registerAll(spark, SparkTestSession.sf)
    graft.functions.NGramFunctions.register(spark)
    val est = LlmQueries.estimatedEvalGramBytes(spark, 3)
    assert(est > 0L, "fixture eval side must be non-empty")
    // fixture gram estimate is far below the default 10 MB threshold
    assert(LlmQueries.decontaminationShape(spark, 3) === "exact")
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // a threshold below the estimate models the production regime where
      // the eval corpus can't broadcast — the chooser must flip to bloom
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (est - 1).toString)
      assert(LlmQueries.decontaminationShape(spark, 3) === "bloom")
      // forced arms override the probe in BOTH directions
      spark.conf.set("graft.decontamination", "exact")
      assert(LlmQueries.decontaminationShape(spark, 3) === "exact")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.conf.set("graft.decontamination", "bloom")
      assert(LlmQueries.decontaminationShape(spark, 3) === "bloom")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.conf.unset("graft.decontamination")
    }
  }

  test("both decontamination arms return identical results — the chooser " +
    "can never change the answer") {
    Tables.registerAll(spark, SparkTestSession.sf)
    graft.functions.NGramFunctions.register(spark)
    graft.functions.BloomFunctions.register(spark)
    val exact = spark.sql(LlmQueries.decontaminationSql(spark, 3, bloom = false))
      .collect().toSeq
    val bloom = spark.sql(LlmQueries.decontaminationSql(spark, 3, bloom = true))
      .collect().toSeq
    assert(exact === bloom)
    assert(exact.nonEmpty)
  }

  test("l24 SemDeDup census equals a brute-force in-Scala dedup over the " +
    "same assignments — and dropping is genuinely cluster-scoped") {
    Tables.registerAll(spark, SparkTestSession.sf)
    graft.functions.VectorFunctions.register(spark)
    val cells = spark.sql(LlmQueries.semDedupAssignSql(spark = true))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vecs = spark.table("embeddings")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def dot(x: Array[Float], y: Array[Float]) =
        x.indices.foldLeft(0.0)((acc, i) => acc + x(i).toDouble * y(i).toDouble)
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    def simOk(i: Long, j: Long): Boolean =
      BigDecimal(cos(vecs(i), vecs(j)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP) >= BigDecimal("0.4")
    val ids = vecs.keys.toSeq.sorted
    val droppedBrute = ids.filter(j =>
      ids.exists(i => i < j && cells(i) == cells(j) && simOk(i, j)))
    val census = spark.sql(LlmQueries.semDedupSql(spark = true))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = ids.groupBy(cells).toSeq.sortBy(_._1).map { case (c, vs) =>
      (c, vs.size.toLong, vs.count(droppedBrute.contains).toLong)
    }
    assert(census.toSeq === expect)
    assert(droppedBrute.nonEmpty, "fixture must exercise the drop rule")
    // cluster scoping is load-bearing: at least one cross-cell pair sits
    // above the threshold yet neither side is dropped for it
    val crossPair = ids.combinations(2).map { case Seq(i, j) => (i, j) }
      .find { case (i, j) =>
        cells(i) != cells(j) && simOk(i, j) &&
          !droppedBrute.contains(j) && !droppedBrute.contains(i)
      }
    assert(crossPair.nonEmpty,
      "expected an undropped above-threshold cross-cell pair")
  }

  test("l25 span dedup: exact span lengths on a constructed corpus, " +
    "mod-stride displacement caveat, and the boilerplate cap sentinel") {
    import spark.implicits._
    // one distinct repeated letter per doc: two different docs' fillers
    // can never share a 40-char window (a sequence-generator filler can —
    // shifted arithmetic sequences coincide)
    def filler(c: Char, n: Int) = c.toString * n
    val region = ('A' to 'Z').mkString * 7 // 182 chars, take 160
    val shared = region.take(160)
    // A@20 and B@50: displacement 30 ≡ 0 (mod 10) → detected, span 160
    val a = filler('q', 20) + shared + filler('r', 60)
    val b = filler('s', 50) + shared + filler('t', 30)
    // C@20 and D@27: displacement 7 → undetectable by stride-10 windows
    val c = filler('u', 20) + shared + filler('v', 60)
    val d = filler('w', 27) + shared + filler('x', 30)
    Seq((1L, a), (2L, b), (3L, c), (4L, d))
      .toDF("doc_id", "text").createOrReplaceTempView("l25_spec_docs")
    val rows = spark.sql(LlmQueries.substringSpanSql(
        spark = true, src = "l25_spec_docs"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // sentinel clean; exactly the aligned pair, at exactly the region size
    assert(rows.contains((-1L, -1L, 0L, 0L)))
    val pairs = rows.filter(_._1 >= 0)
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L), (1L, 3L),
      (2L, 3L)),
      s"aligned pairs only (A,B,C share the region at mod-10 offsets): " +
        s"${pairs.mkString(",")}")
    assert(pairs.forall(_._3 === 160L), "span must equal the region length")
    assert(!pairs.exists(p => p._2 == 4L || p._1 == 4L),
      "displacement 7 must be invisible to stride-10 windows (documented)")

    // cap: the same 40-char window in 5 docs with capDocs=3 → dropped,
    // counted once in the sentinel, and no pairs survive
    val boiler = "Z" * 40
    (10L to 14L).map(i => (i, boiler + filler(('a' + i).toChar, 60).toString))
      .toDF("doc_id", "text").createOrReplaceTempView("l25_cap_docs")
    val capped = spark.sql(LlmQueries.substringSpanSql(
        spark = true, capDocs = 3, src = "l25_cap_docs"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(capped.toSeq === Seq((-1L, -1L, 0L, 1L)),
      "only the sentinel survives, counting the one dropped window hash")
  }

  test("l26 PQ: codes bounded, duplicates share codes, ADC result sane") {
    graft.Tables.registerAll(spark, SparkTestSession.sf)
    graft.functions.VectorFunctions.register(spark)
    // the code table: every vector gets exactly M=4 codes, each in 0..3
    val codes = spark.sql(LlmQueries.pqCodesSql(spark = true))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val perVec = codes.groupBy(_._1)
    assert(perVec.values.forall(_.map(_._2).sorted.toSeq == Seq(0, 1, 2, 3)),
      "every vector must carry one code per subspace")
    assert(codes.forall(c => c._3 >= 0 && c._3 <= 3), "codes are 2-bit")

    // the served result: 5 rows, sims in [-1,1], exact-rerank descending
    val res = SparkEntry.queries("l26_ann_pq")(spark, SparkTestSession.sf).collect()
    assert(res.length == 5)
    val sims = res.map(_.getDouble(2)).toSeq
    assert(sims == sims.sorted.reverse)
    assert(sims.forall(s => s >= -1.0001 && s <= 1.0001))
  }

  test("l27 packing: every window except the last holds exactly 512 tokens " +
       "and totals are conserved") {
    graft.Tables.registerAll(spark, SparkTestSession.sf)
    val rows = SparkEntry.queries("l27_sequence_packing")(spark, SparkTestSession.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(rows.nonEmpty)
    // window ids are contiguous from 0
    assert(rows.map(_._1).toSeq == rows.indices.map(_.toLong))
    // contiguous fill ⇒ all windows full except possibly the final one
    rows.init.foreach { case (id, _, toks) =>
      assert(toks == 512L, s"window $id must be full, had $toks")
    }
    assert(rows.last._3 >= 1L && rows.last._3 <= 512L)
    // conservation: window totals == corpus token count
    val total = spark.sql(
      """SELECT CAST(sum(size(regexp_extract_all(text, '[a-z0-9]+', 0))) AS BIGINT)
        |FROM documents""".stripMargin).head().getLong(0)
    assert(rows.map(_._3).sum == total)
  }

  test("l39 framed BPE merge is boundary-safe and greedy left-to-right") {
    // after a t+h merge the corpus holds '|th|e|'; an UNdelimited 'h e'
    // replace would corrupt it to 'the' even though 'h' is no longer a
    // symbol — the '|' frame makes that match impossible
    val r = spark.sql(
      """SELECT replace('|t|h|e|', '|t|h|', '|th|') AS m1,
        |  replace(replace('|t|h|e|', '|t|h|', '|th|'), '|h|e|', '|he|') AS m2,
        |  replace('|a|a|a|', '|a|a|', '|aa|') AS m3""".stripMargin).head()
    assert(r.getString(0) == "|th|e|")
    assert(r.getString(1) == "|th|e|",
      "a merged symbol's interior must be unmatchable")
    // overlapping runs merge greedily left-to-right, the BPE convention
    assert(r.getString(2) == "|aa|a|")
  }

  test("l39 merges are adjacent symbol pairs with positive corpus counts") {
    graft.Tables.registerAll(spark, SparkTestSession.sf)
    val rows = SparkEntry.queries("l39_bpe_merges")(spark, SparkTestSession.sf)
      .collect()
    assert(rows.length == 3)
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 1, 2))
    rows.foreach { r =>
      val parts = r.getString(1).split(" ")
      assert(parts.length == 2 && parts.forall(_.nonEmpty),
        s"merge must be a two-symbol pair: '${r.getString(1)}'")
      assert(r.getLong(2) > 0)
    }
    // round N+1's winner count cannot exceed round N's: the winner was
    // the global max, and a merge never increases any other pair's count
    // beyond the previous maximum (new pairs inherit from consumed ones)
    assert(rows.map(_.getLong(2)).toSeq ==
      rows.map(_.getLong(2)).sorted.reverse.toSeq)
  }

  test("l42 BPE encode: token counts bounded by chars below and words " +
    "above, and merges strictly save symbols") {
    graft.Tables.registerAll(spark, SparkTestSession.sf)
    val rows = SparkEntry.queries("l42_bpe_encode")(spark, SparkTestSession.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, words, chars, toks) =>
      assert(toks <= chars, s"$src: merges can only shrink symbol count")
      assert(toks >= words, s"$src: every word is at least one token")
    }
    // the learned merges actually fire somewhere in the corpus
    assert(rows.map(r => r._3 - r._4).sum > 0,
      "3 learned merges must save symbols corpus-wide")
  }

  test("l38 canonical pick: survivor is the longest member, drops add up") {
    graft.Tables.registerAll(spark, SparkTestSession.sf)
    graft.functions.NGramFunctions.register(spark)
    val rows = SparkEntry.queries("l38_canonical_pick")(spark, SparkTestSession.sf)
      .collect()
    assert(rows.nonEmpty, "fixture must contain at least one dup cluster")
    rows.foreach { r =>
      val (cluster, kept, members, dropped) =
        (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4))
      assert(members > 1 && dropped == members - 1)
      // the cluster label is the component's min doc_id, so it can never
      // exceed the surviving member's id
      assert(cluster <= kept)
    }
    // every multi-member cluster appears exactly once
    val cl = rows.map(_.getLong(0))
    assert(cl.distinct.length == cl.length)
  }

  test("m05 joint near-dup: an identical image+caption pair lands in the " +
    "(found-by-both, confirmed-both) census bucket") {
    import spark.implicits._
    graft.functions.NGramFunctions.register(spark)
    // docs 3 and 6 share text AND doc_id mod 3, so the rendered PNGs are
    // byte-identical and the captions minhash identically — the joint
    // bucket MUST fire. doc 7 is unrelated.
    val docs = Seq(
      (3L, "alpha beta gamma delta epsilon zeta eta theta"),
      (6L, "alpha beta gamma delta epsilon zeta eta theta"),
      (7L, "completely different words about entirely other topics here"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("m05_spec_docs")
    graft.operators.MultimodalOps.imageHashes(spark, docs)
      .toDF().createOrReplaceTempView("m05_hashes")
    val rows = spark.sql(
      LlmQueries.jointNeardupSql(spark = true, src = "m05_spec_docs"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))
    assert(rows.contains((1, 1, 1, 1, 1L)),
      s"the 3~6 pair must be found by both arms and confirmed on both:\n" +
        rows.mkString("\n"))
  }

  test("l40 nprobe tuner: recall non-decreasing in nprobe, full probe is " +
    "exact, chosen = cheapest config meeting the target") {
    graft.Tables.registerAll(spark, SparkTestSession.sf)
    graft.functions.VectorFunctions.register(spark)
    val rows = SparkEntry.queries("l40_ann_nprobe_tuner")(spark, SparkTestSession.sf)
      .collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 4, 8))
    val recalls = rows.map(_.getDouble(2))
    // probing more cells can only add candidates — recall is monotone
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall must be non-decreasing in nprobe: ${recalls.toSeq}")
    // nprobe=8 probes every cell of the 8-centroid quantizer: the
    // candidate set IS the corpus, so retrieved == truth exactly
    assert(recalls.last == 1.0)
    val chosen = rows.filter(_.getInt(3) == 1)
    assert(chosen.length == 1)
    val qualifying = rows.filter(_.getDouble(2) >= 0.9).map(_.getInt(0))
    if (qualifying.nonEmpty)
      assert(chosen.head.getInt(0) == qualifying.min,
        "chosen must be the SMALLEST nprobe meeting the recall target")
  }
}
