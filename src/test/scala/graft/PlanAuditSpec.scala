package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Regression net over the committed plan snapshots in `plans/` (written by
  * Verify into `target/plans/`, blessed by committing them): regenerating
  * every query's formatted plan at the snapshot SF must not introduce a
  * CartesianProduct or increase the shuffle-exchange count. Intentional
  * plan changes are re-blessed by copying `target/plans/` over `plans/` in
  * the same commit (`scripts/bless_plans.sh`).
  */
class PlanAuditSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val snapDir = Paths.get("plans")
  // snapshots are produced by the sf0.01 Verify run — regenerate at the
  // same SF so file-size-driven choices (broadcast thresholds) compare
  // apples to apples
  private val sfDir = "/root/testdata/sf0.01"

  /** Distinct shuffle exchanges across ALL plan trees in the snapshot —
    * the main tree AND every `===== Subqueries =====` tree after the
    * operator-detail section (scalar-subquery plans have their own
    * exchanges; stopping at the first detail line missed them). Counting
    * raw `(N) Exchange` detail lines (the r1-r5 counter) double-counts
    * cached subtrees: a formatted plan renders an InMemoryRelation's AQE
    * plan once per InMemoryTableScan consumer, and each rendering repeats
    * the same exchange under `== Final Plan ==` (same id) AND
    * `== Initial Plan ==` (a different id) — l13's r5 "7 -> 8 regression"
    * was exactly that artifact, while its real at-execution shuffle count
    * went DOWN. So: match only tree-form `Exchange (id)` nodes (detail
    * headers are `(id) Exchange`, which the pattern does not match), skip
    * `== Initial Plan ==` regions (indentation-delimited), and dedupe by
    * operator id so a reused/cached exchange counts once.
    */
  private def shuffles(plan: String): Int = {
    val ex = """(?<![A-Za-z])Exchange \((\d+)\)""".r
    val ids = scala.collection.mutable.Set.empty[String]
    var skipIndent = -1
    plan.linesIterator.foreach { l =>
      val indent = l.indexWhere(!_.isWhitespace) match {
        case -1 => Int.MaxValue; case i => i
      }
      // the Initial-Plan subtree's lines are all indented DEEPER than its
      // `+- == Initial Plan ==` marker, so the first line back at (or
      // above) the marker's own indent ends the region. `<` alone never
      // fires for a marker at indent 0 (an executed top-level
      // AdaptiveSparkPlan) and would silently skip the rest of the file,
      // Subqueries section included
      if (skipIndent >= 0 && indent <= skipIndent) skipIndent = -1
      if (skipIndent < 0) {
        if (l.contains("== Initial Plan ==")) skipIndent = indent
        else ex.findAllMatchIn(l).foreach(m => ids += m.group(1))
      }
    }
    ids.size
  }
  private def cartesian(plan: String): Boolean = plan.contains("CartesianProduct")

  /** Per-base-relation `Scan parquet` node counts — the audit hole that
    * let r13's l49 (63 corpus scans) and l40 (38) land green (VERDICT r13
    * #4). Counting discipline mirrors [[shuffles]]: tree-form nodes only,
    * `== Initial Plan ==` regions skipped, deduped by operator id (a
    * cached subtree renders once per consumer with the same id); each
    * surviving id maps to its relation via the detail section's
    * `Location ... [.../<name>.parquet...]` line.
    */
  private def scanCounts(plan: String): Map[String, Int] = {
    val node = """Scan parquet[^()]*\((\d+)\)""".r
    val ids = scala.collection.mutable.Set.empty[String]
    var skipIndent = -1
    plan.linesIterator.foreach { l =>
      val indent = l.indexWhere(!_.isWhitespace) match {
        case -1 => Int.MaxValue; case i => i
      }
      if (skipIndent >= 0 && indent <= skipIndent) skipIndent = -1
      if (skipIndent < 0) {
        if (l.contains("== Initial Plan ==")) skipIndent = indent
        else node.findAllMatchIn(l).foreach(m => ids += m.group(1))
      }
    }
    // detail blocks: `(id) Scan parquet ...` then a Location line
    val rel = """(?s)\((\d+)\) Scan parquet[^\n]*\n(.*?)(?=\n\(\d+\) |\z)""".r
    val loc = """([A-Za-z0-9_.\-]+\.parquet)""".r
    val idRel = rel.findAllMatchIn(plan).flatMap { m =>
      loc.findFirstIn(m.group(2)).map(m.group(1) -> _)
    }.toMap
    ids.toSeq.flatMap(idRel.get).groupBy(identity)
      .map { case (k, v) => k -> v.size }
  }

  test("no query plan grew a cartesian product or extra shuffles vs plans/") {
    assume(Files.isDirectory(snapDir), "no committed snapshots to audit")
    val outDir = Paths.get("target/plans-audit")
    Files.createDirectories(outDir)
    val regressions = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val snap = snapDir.resolve(s"$name.txt")
        if (!Files.exists(snap)) Nil
        else {
          val old = Files.readString(snap)
          val now = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(outDir.resolve(s"$name.txt"), now)
          val cart =
            if (cartesian(now) && !cartesian(old))
              Seq(s"$name: NEW CartesianProduct") else Nil
          val ex =
            if (shuffles(now) > shuffles(old))
              Seq(s"$name: shuffle exchanges ${shuffles(old)} -> ${shuffles(now)}")
            else Nil
          cart ++ ex
        }
    }
    assert(regressions.isEmpty,
      s"\nplan regressions (re-bless via scripts/bless_plans.sh if intended):\n  ${regressions.mkString("\n  ")}")
  }

  test("no query plan grew base-table scans vs plans/ (scan-count " +
    "budget, VERDICT r13 #4)") {
    assume(Files.isDirectory(snapDir), "no committed snapshots to audit")
    val outDir = Paths.get("target/plans-audit")
    val regressions = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val snap = snapDir.resolve(s"$name.txt")
      val fresh = outDir.resolve(s"$name.txt")
      // reuse the plans regenerated by the shuffle-audit test when
      // present; regenerate only if running standalone
      if (!Files.exists(snap)) Nil
      else {
        val now =
          if (Files.exists(fresh)) Files.readString(fresh)
          else SparkEntry.queries(name)(spark, sfDir)
            .queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
        val oldC = scanCounts(Files.readString(snap))
        val newC = scanCounts(now)
        newC.flatMap { case (rel, n) =>
          if (n > oldC.getOrElse(rel, 0))
            Some(s"$name: $rel scans ${oldC.getOrElse(rel, 0)} -> $n")
          else None
        }
      }
    }
    assert(regressions.isEmpty,
      s"\nscan-count regressions (re-bless via scripts/bless_plans.sh if intended):\n  ${regressions.mkString("\n  ")}")
  }

  test("staged solver/tuner entries read their checkpoints, not the " +
    "corpus: ZERO base-table scans in the final plan (VERDICT r13 #2/#3)") {
    val budgets = Seq(
      "l49_epoch_budget" -> "documents.parquet",
      "l50_curriculum_phases" -> "documents.parquet",
      "l40_ann_nprobe_tuner" -> "embeddings.parquet")
    budgets.foreach { case (name, rel) =>
      val now = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      val n = scanCounts(now).getOrElse(rel, 0)
      assert(n === 0,
        s"$name: the final plan re-derives from $rel ($n scans) instead " +
          "of reading the materialized stage")
    }
  }

  test("scanCounts self-test: a deliberately regressed plan IS caught") {
    def fakePlan(scanIds: Seq[Int]): String = {
      val tree = scanIds.map(i => s"   +- Scan parquet t ($i)").mkString("\n")
      val details = scanIds.map(i =>
        s"($i) Scan parquet t\nLocation: InMemoryFileIndex " +
          "[file:/data/documents.parquet]").mkString("\n")
      s"== Physical Plan ==\n$tree\n\n$details\n"
    }
    val old = fakePlan(Seq(1))
    val bad = fakePlan(Seq(1, 2, 7))
    assert(scanCounts(old) === Map("documents.parquet" -> 1))
    assert(scanCounts(bad) === Map("documents.parquet" -> 3))
    assert(scanCounts(bad)("documents.parquet") >
      scanCounts(old)("documents.parquet"),
      "the budget rule must flag the regressed plan")
    // Initial-Plan regions and repeated renderings of a cached subtree
    // must NOT count
    val aqe = """== Physical Plan ==
                |AdaptiveSparkPlan (9)
                |+- == Final Plan ==
                |   +- Scan parquet t (1)
                |+- == Initial Plan ==
                |   +- Scan parquet t (8)
                |
                |(1) Scan parquet t
                |Location: InMemoryFileIndex [file:/data/documents.parquet]
                |(8) Scan parquet t
                |Location: InMemoryFileIndex [file:/data/documents.parquet]
                |""".stripMargin
    assert(scanCounts(aqe) === Map("documents.parquet" -> 1),
      "Initial Plan scans must not inflate the count")
  }

  test("l13 scoring join broadcasts the n_langs profile side, never SMJ/" +
    "Cartesian (VERDICT r9 next #5)") {
    val now = SparkEntry.queries("l13_langid_trigram")(spark, sfDir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    queries.LlmQueries.releaseShared()
    // The doc-grams × language-profile cross join: the profile side is
    // bounded by n_langs rows (data-independent), so the only sane shape
    // at ANY corpus size is a broadcast nested-loop — a shuffle of the
    // corpus-sized gram side against a ~dozen-row relation is the
    // 100×-scale killer, and a CartesianProduct (what the planner picked
    // unhinted on the 30x probe) is worse.
    assert(now.contains("BroadcastNestedLoopJoin Cross BuildRight"),
      "profile scoring join must be BroadcastNestedLoopJoin BuildRight")
    assert(!cartesian(now), "l13 must never plan a CartesianProduct")
    // The final documents ⋈ best join is corpus × corpus on doc_id — SMJ
    // is the correct scale shape THERE, but it must be the only one.
    val smj = "SortMergeJoin".r.findAllIn(
      now.split("===== Subqueries =====")(0).linesIterator
        .filter(_.contains("SortMergeJoin (")).mkString("\n")).size
    assert(smj <= 1, s"expected at most the doc_id LEFT JOIN as SMJ, got $smj")
  }

  test("l12b serves from stored centroids: ONE corpus scan, no training " +
    "subtree, no vec_id shuffle (VERDICT r7 weak #1)") {
    val now = SparkEntry.queries("l12b_ann_ivf_served")(spark, sfDir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    val scanBlocks = now.split("\n\\(\\d+\\) ").filter(_.startsWith("Scan parquet"))
    val embScans = scanBlocks.filter(_.contains("embeddings.parquet"))
    // the corpus scan carries the pushed vec_id<>0 exclusion; the only
    // other embeddings scans allowed are pushed vec_id=0 point lookups
    // for the query vector
    val corpus = embScans.filter(_.contains("Not(EqualTo(vec_id,0))"))
    assert(corpus.size === 1,
      s"expected exactly one full-corpus embeddings scan, got ${corpus.size}")
    assert(embScans.filterNot(_.contains("Not(EqualTo(vec_id,0))"))
      .forall(_.contains("EqualTo(vec_id,0)")),
      "every other embeddings scan must be a pushed query-vector point lookup")
    assert(now.contains("graft-ivf-centroids"),
      "serving must read the persisted centroid table")
    assert(shuffles(now) <= 1,
      "the only exchange allowed is the 8-row centroid pivot — the corpus " +
        "path must be shuffle-free")
  }

  test("l24b serves SemDeDup from stored centroids: no training subtree, " +
    "assignment map-side, only cell-keyed corpus exchanges") {
    val now = SparkEntry.queries("l24b_semdedup_served")(spark, sfDir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    // the inline-Lloyd's l24 plan carries row_number assignment Windows;
    // the served plan must have none
    assert(!now.contains("Window ("),
      "a Window node means a training/assignment subtree leaked into serving")
    assert(now.contains("graft-ivf-centroids"),
      "serving must read the persisted centroid store")
    assert(!cartesian(now))
    // every corpus exchange is keyed by the SemDeDup cell (the pair join's
    // inherent shuffle) — a hashpartitioning on vec_id alone would mean
    // the assignment joined back to the corpus instead of running map-side
    val parts = """hashpartitioning\(([^)]*)\)""".r
      .findAllMatchIn(now).map(_.group(1)).toSeq
    assert(parts.nonEmpty && parts.forall(_.contains("cell")),
      s"non-cell-keyed exchange in serving plan: $parts")
  }

  test("l34 serves composed IVF-PQ from the stored index: corpus path is " +
    "one map-side scan of the (cell, codes) table") {
    val now = SparkEntry.queries("l34_ann_ivfpq_served")(spark, sfDir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(!now.contains("Window ("),
      "a Window node means a training/assignment subtree leaked into serving")
    assert(!cartesian(now))
    val scanBlocks = now.split("\n\\(\\d+\\) ").filter(_.startsWith("Scan parquet"))
    assert(scanBlocks.exists(_.contains("graft-pq-ivfpq")),
      "serving must scan the composed (vec_id, cell, codes) index table")
    assert(scanBlocks.exists(_.contains("graft-ivf-centroids")),
      "qcells must come from the persisted centroid store")
    assert(scanBlocks.exists(_.contains("graft-pq-codebook")),
      "the LUT must come from the persisted codebook")
    val embScans = scanBlocks.filter(_.contains("embeddings.parquet"))
    assert(embScans.count(!_.contains("EqualTo(vec_id,0)")) <= 1,
      s"expected at most one non-point embeddings scan (the rerank fetch):\n" +
        embScans.mkString("\n---\n"))
    // the only exchanges allowed are the tiny LUT/centroid pivots — the
    // ivfpq_index scan must flow map-side into the top-k
    val parts = """hashpartitioning\(([^)]*)\)""".r
      .findAllMatchIn(now).map(_.group(1)).toSeq
    assert(parts.forall(p => p.contains("sub") || p.contains("cid")),
      s"corpus-keyed exchange in serving plan: $parts")
  }

  test("l26b serves PQ from the stored index: no training subtree, no " +
    "corpus-keyed shuffle, codes scan + one rerank fetch only") {
    val now = SparkEntry.queries("l26b_ann_pq_served")(spark, sfDir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    // training is windows (row_number assignment passes); serving has none
    assert(!now.contains("Window ("),
      "a Window node means a training/assignment subtree leaked into serving")
    val scanBlocks = now.split("\n\\(\\d+\\) ").filter(_.startsWith("Scan parquet"))
    assert(scanBlocks.exists(_.contains("graft-pq-codes")),
      "serving must scan the persisted code table")
    assert(scanBlocks.exists(_.contains("graft-pq-codebook")),
      "serving must read the persisted codebook")
    val embScans = scanBlocks.filter(_.contains("embeddings.parquet"))
    // allowed embeddings reads: pushed vec_id=0 query-vector lookups plus
    // exactly one rerank fetch of the 20 ADC candidates
    assert(embScans.count(!_.contains("EqualTo(vec_id,0)")) <= 1,
      s"expected at most one non-point embeddings scan (the rerank fetch):\n" +
        embScans.mkString("\n---\n"))
    // the LUT pivot (16 rows) may exchange; the codes corpus path may not
    assert(shuffles(now) <= 3,
      "corpus ADC path must be map-side: only tiny LUT-pivot exchanges allowed")
  }

  test("l36 filtered ANN pushes the metadata predicate INTO the labeled " +
    "index scan (composite index, not post-filter)") {
    val now = SparkEntry.queries("l36_ann_filtered")(spark, sfDir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(!cartesian(now))
    val scanBlocks = now.split("\n\\(\\d+\\) ").filter(_.startsWith("Scan parquet"))
    val idx = scanBlocks.filter(_.contains("graft-pq-ivfpql"))
    assert(idx.nonEmpty, "serving must scan the persisted LABELED index store")
    // the label predicate must reach the parquet reader of the index scan —
    // a Filter above the scan (post-filter) under-fills k and reads the
    // whole index; a semi-join against the metadata table shuffles the
    // corpus. The composite store makes it a pushed scan predicate.
    assert(idx.exists(_.contains("EqualTo(label,4)")),
      s"label=4 must be in the index scan's PushedFilters:\n${idx.mkString("\n")}")
    assert(!now.contains("Window ("),
      "a Window node means a training/assignment subtree leaked into serving")
  }

  test("l37 hybrid RRF: both arms are TakeOrdered heaps and every rank " +
    "Window runs over an already-limited 50-row input") {
    val now = SparkEntry.queries("l37_hybrid_rrf")(spark, sfDir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(!cartesian(now))
    // each `Window (id)` tree node must have a GlobalLimit/TakeOrdered
    // strictly below it (deeper indent, later line) — i.e. the rank
    // assignment happens AFTER the top-50 heap, never over the corpus
    val lines = now.linesIterator.toVector.takeWhile(!_.startsWith("====="))
    def indentOf(l: String) = l.indexWhere(c => c.isLetter)
    lines.zipWithIndex.filter(_._1.contains("Window (")).foreach {
      case (wl, i) =>
        val wi = indentOf(wl)
        val below = lines.drop(i + 1).takeWhile(l => indentOf(l) > wi)
        assert(below.exists(l =>
          l.contains("TakeOrderedAndProject") || l.contains("GlobalLimit")),
          s"rank Window at line $i has no limit below it (corpus-sized rank):\n$wl")
    }
    // the 50x50 fuse must not shuffle: FULL OUTER over two tiny relations
    // is fine as SMJ locally, but neither arm may exchange on doc_id/vec_id
    // above its heap — the heaps collapse to a single partition already.
    // tree-form nodes only (`SortMergeJoin FullOuter (52)`) — the detail
    // section repeats each node as `(52) SortMergeJoin`
    val smj = """SortMergeJoin \w+ \(\d+\)""".r.findAllIn(now).size
    assert(smj <= 1, s"only the 50x50 fuse may sort-merge, got $smj")
  }
}
