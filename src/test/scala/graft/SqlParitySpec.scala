package graft

import org.apache.spark.sql.DataFrame

import graft.queries.Relational
import graft.sql.GraftSql

/** The SQL-text surface must be the DataFrame catalog, verbatim: for
  * every relational query, the Spark-SQL twin in [[GraftSql.texts]]
  * returns the same schema (names AND types — the driver's hash is
  * dtype-sensitive) and the same rows as the catalog's DataFrame
  * builder. This is a second differential on the whole relational
  * family: the two forms resolve through different front ends
  * (parser vs DSL), so an analyzer/optimizer divergence or a wrong
  * SQL text fails here even though both run on one engine.
  */
class SqlParitySpec extends SparkSpecBase {

  private val dir = sf("sf0.001")

  private lazy val catalog =
    Relational.queries.map(q => q.name -> q).toMap

  test("every relational catalog query has a SQL twin") {
    val missing = catalog.keySet -- GraftSql.texts.keySet
    assert(missing.isEmpty, s"catalog queries without SQL text: $missing")
    val orphaned = GraftSql.texts.keySet -- catalog.keySet
    assert(orphaned.isEmpty, s"SQL texts naming no catalog query: $orphaned")
    // the pipeline sample must name real catalog queries too
    val bad = GraftSql.pipelineTexts.keySet -- SparkEntry.queries.keySet
    assert(bad.isEmpty, s"pipeline SQL texts naming no catalog query: $bad")
  }

  test("every temporal catalog query has a SQL twin") {
    // the as-of / sessionization / funnel family is precisely what an
    // analytics user types as SQL — none may lack a twin
    val temporal = graft.queries.TemporalQueries.queries.map(_.name).toSet
    val twinned = GraftSql.texts.keySet ++ GraftSql.pipelineTexts.keySet
    val missing = temporal -- twinned
    assert(missing.isEmpty, s"temporal catalog queries without SQL twins: $missing")
  }

  test("every reference-parity and changelog catalog query has a SQL twin") {
    // the p-family IS the reference's query set (SURVEY §2.10 writes
    // p1/p2/p3 as SQL; p4's rank-before-filter line numbering is §3.1)
    // and the c-family is textbook warehouse window SQL — none may
    // lack a twin
    val families = (graft.queries.Parity.queries ++
      graft.queries.ChangelogQueries.queries).map(_.name).toSet
    val twinned = GraftSql.texts.keySet ++ GraftSql.pipelineTexts.keySet
    val missing = families -- twinned
    assert(missing.isEmpty, s"p/c-family catalog queries without SQL twins: $missing")
  }

  test("the set-shaped dedup rows (exact dedup, decontamination) have " +
    "SQL twins") {
    // d1 is GROUP BY + min-keep, d7/d11 are shingle-join/EXISTS SQL —
    // exactly what a warehouse user types; none may lack a twin. (The
    // rest of the d-family — iterative clustering, MinHash banding,
    // budgeted waves — is defensibly non-single-statement SQL.)
    val twinned = GraftSql.texts.keySet ++ GraftSql.pipelineTexts.keySet
    val want = Set("d1_exact_dedup", "d7_decontamination",
      "d11_bloom_decontamination")
    val missing = want -- twinned
    assert(missing.isEmpty, s"set-shaped dedup rows without SQL twins: $missing")
  }

  /** Round-16 family enforcement: a NEW d/t/s/x catalog query cannot
    * ship twin-less — every member must either carry a SQL twin or
    * appear in the explicit exemption list below with a structural
    * reason. The exemptions are closed-world: adding a query to a
    * family forces a decision here.
    */
  private val twinExempt: Map[String, String] = Map(
    // iterative min-label fixpoints: Spark 4.1 recursive CTEs reject
    // UNION-distinct recursion and UNION ALL diverges on cyclic pair
    // graphs — each carries a fragment twin locking its SQL-shaped
    // input contract instead (d8_pair_relation, d10_quality_scores)
    "d8_dedup_clusters" -> "iterative components (fragment twin)",
    "d10_cluster_canonical" -> "iterative components (fragment twin)",
    // the edit-distance join family is defined by its PHYSICAL forms
    // (q-gram prefix filter, blocked waves, candidate-budget breaker);
    // the only single-statement SQL form is the quadratic cartesian
    // levenshtein join, which is not a surface this engine ships
    "d12_edit_distance_join" -> "qgram/wave physical operator",
    "d12b_edit_distance_join_blocked" -> "qgram/wave physical operator",
    "d12c_edit_distance_join_stratified" -> "qgram/wave physical operator",
    "d12d_edit_distance_join_autowaved" -> "qgram/wave physical operator",
    // JVM-seeded hyperplane RNG (scala.util.Random) is not
    // reproducible from SQL; s3 covers the LSH family's SQL surface
    "s2_ann_lsh_topk" -> "seeded hyperplane RNG",
    "s8_ann_recall_calibration" -> "seeded hyperplane RNG",
    // index-at-rest builds (k-means training, cell/codebook layouts
    // written to disk) are multi-job programs, not statements
    "s4_ann_ivf_topk" -> "IVF index-at-rest build",
    "s7_semantic_dedup" -> "IVF index-at-rest build",
    "s9_pq_adc_topk" -> "PQ index-at-rest build")

  test("every d/t/s/x catalog query is twinned or structurally exempt") {
    val twinned = GraftSql.texts.keySet ++ GraftSql.pipelineTexts.keySet
    val family = SparkEntry.queries.keys.filter(n =>
      n.matches("^[dtsx][0-9].*")).toSet
    val missing = family -- twinned -- twinExempt.keySet
    assert(missing.isEmpty,
      s"d/t/s/x catalog queries with neither a SQL twin nor an " +
        s"exemption reason: $missing")
    val stale = twinExempt.keySet -- family
    assert(stale.isEmpty, s"exemptions naming no catalog query: $stale")
    val both = twinExempt.keySet.intersect(twinned)
    assert(both.isEmpty, s"exempt queries that actually have twins: $both")
  }

  /** Canonical form mirroring the driver's compare: columns sorted by
    * name (types kept), rows value-stringified and sorted.
    */
  private def canon(df: DataFrame): (Seq[(String, String)], Seq[String]) = {
    val fields = df.schema.fields.toSeq
      .map(f => f.name -> f.dataType.simpleString).sortBy(_._1)
    val order = df.schema.fieldNames.zipWithIndex.sortBy(_._1).map(_._2).toSeq
    val rows = df.collect().toSeq
      .map(r => order.map(i => String.valueOf(r.get(i))).mkString("\u0000"))
      .sorted
    (fields, rows)
  }

  private def assertParity(name: String, sqlText: String): Unit = {
    GraftSql.registerViews(spark, dir)
    val (dfFields, dfRows) = canon(SparkEntry.queries(name)(spark, dir))
    val (sqlFields, sqlRows) = canon(spark.sql(sqlText))
    assert(sqlFields == dfFields,
      s"schema mismatch: sql=$sqlFields df=$dfFields")
    assert(sqlRows.size == dfRows.size,
      s"row count: sql=${sqlRows.size} df=${dfRows.size}")
    val diffs = sqlRows.zip(dfRows).filter { case (a, b) => a != b }
    assert(diffs.isEmpty,
      s"${diffs.size} differing rows; first: ${diffs.headOption}")
  }

  GraftSql.texts.keys.foreach { name =>
    test(s"$name: SQL text equals the DataFrame form, schema included") {
      assertParity(name, GraftSql.texts(name))
    }
  }

  // the pipeline sample — two of these call the native expression
  // family (rolling_hash, token_count) by SQL name, so a broken
  // extension registration for SQL users fails here
  GraftSql.pipelineTexts.keys.foreach { name =>
    test(s"$name: pipeline SQL twin equals the DataFrame form") {
      assertParity(name, GraftSql.pipelineTexts(name))
    }
  }

  test("g8_pair_relation: the bounded co-purchase slice contract is " +
    "locked by a SQL fragment twin") {
    // g8's CC iteration is non-SQL, but the pair relation its scale
    // argument depends on (partkey < 500 into both scans, support >= 2
    // on the aggregate) is plain SQL — parity here pins the contract
    GraftSql.registerViews(spark, dir)
    val (dfFields, dfRows) =
      canon(graft.queries.GraphQueries.g8PairRelation(spark, dir))
    val (sqlFields, sqlRows) =
      canon(spark.sql(GraftSql.fragmentTexts("g8_pair_relation")))
    assert(sqlFields == dfFields,
      s"schema mismatch: sql=$sqlFields df=$dfFields")
    assert(sqlRows == dfRows)
    assert(dfRows.nonEmpty, "fixture slice must produce pairs")
  }

  test("d8_pair_relation: the component loop's input contract is " +
    "locked by a SQL fragment twin") {
    // d8's min-label iteration is non-SQL (no UNION-distinct
    // recursion); the pair relation it consumes — d2's thresholded
    // Jaccard pairs with the exact n/maxDf/threshold constants — is
    // plain SQL, and parity here pins that contract
    GraftSql.registerViews(spark, dir)
    val d = graft.core.Tables(spark, dir).documents
    val (dfFields, dfRows) = canon(
      graft.operators.Dedup.ngramJaccardPairs(d, "doc_id", "text",
          n = 3, threshold = 0.8, maxDf = 100)
        .select(org.apache.spark.sql.functions.col("i"),
          org.apache.spark.sql.functions.col("j")))
    val (sqlFields, sqlRows) =
      canon(spark.sql(GraftSql.fragmentTexts("d8_pair_relation")))
    assert(sqlFields == dfFields,
      s"schema mismatch: sql=$sqlFields df=$dfFields")
    assert(sqlRows == dfRows)
    assert(dfRows.nonEmpty, "fixture corpus must produce near-dup pairs")
  }

  test("d10_quality_scores: the exemplar argmax key is locked by a " +
    "SQL fragment twin") {
    GraftSql.registerViews(spark, dir)
    val d = graft.core.Tables(spark, dir).documents
    val (dfFields, dfRows) = canon(
      graft.operators.TextAnalysis.qualityScore(d, "doc_id", "text")
        .select(org.apache.spark.sql.functions.col("doc"),
          org.apache.spark.sql.functions.col("quality").as("score")))
    val (sqlFields, sqlRows) =
      canon(spark.sql(GraftSql.fragmentTexts("d10_quality_scores")))
    assert(sqlFields == dfFields,
      s"schema mismatch: sql=$sqlFields df=$dfFields")
    assert(sqlRows == dfRows)
    assert(dfRows.nonEmpty)
  }

  test("referencedTables matches whole identifiers, not substrings") {
    // 'part' must not fire on PARTITION BY or l_partkey; every FROM /
    // JOIN reference in the catalog texts must be found (missing one
    // would fail analysis at run time)
    assert(GraftSql.referencedTables(
      "SELECT l_partkey, row_number() OVER (PARTITION BY l_suppkey " +
        "ORDER BY l_partkey) FROM lineitem") == Seq("lineitem"))
    assert(GraftSql.referencedTables(GraftSql.texts("q3_revenue_by_nation"))
      == Seq("nation", "customer", "orders", "lineitem"))
    assert(GraftSql.referencedTables(GraftSql.texts("q12_events_hourly"))
      == Seq("events"))
  }

  /** Round 7's failure mode: eager all-table registration meant a
    * single unreadable events file killed all 31 non-events SQL
    * queries. [[GraftSql.run]] now registers per-query, so a query's
    * failure domain is exactly the tables it reads — proven here by
    * pointing events.parquet at garbage.
    */
  test("a broken events table cannot fail SQL queries that never read it") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sqliso").toString
    for (t <- GraftSql.tableNames if t != "events") {
      java.nio.file.Files.createSymbolicLink(
        java.nio.file.Paths.get(s"$dir/$t.parquet"),
        java.nio.file.Paths.get(s"${sf("sf0.001")}/$t.parquet"))
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      "not a parquet file".getBytes)
    assert(GraftSql.run(spark, dir, "q1_pricing_summary").count() > 0)
    assertThrows[Exception] {
      GraftSql.run(spark, dir, "q12_events_hourly").count()
    }
  }
}
