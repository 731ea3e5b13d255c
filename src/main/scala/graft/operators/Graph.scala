package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph analytics beyond the connected-components family in
  * [[Dedup]]: fixed-iteration PageRank in exact integer arithmetic.
  *
  * Every quantity is a long in "rank units" (10^12 total mass), every
  * division is truncating integer division — so the recurrence is a
  * deterministic function of the edge set that a SQL oracle replays
  * exactly, with no float-summation order sensitivity. That is the
  * same integral-domain discipline the rest of the engine uses for
  * money (cents), idf (micro-idf) and NLL (micronats).
  */
object Graph {

  /** Fixed-iteration PageRank over a directed edge list `(src, dst)`.
    *
    * Recurrence (all integer ops, values non-negative):
    * {{{
    *   R0(v)   = T div N                 T = 10^12, N = |nodes|
    *   base    = (dampNumComplement * (T div N)) div dampDen
    *   S_i(v)  = Σ_{u→v} ( R_{i-1}(u) div outdeg(u) )
    *   R_i(v)  = base + (dampNum * S_i(v)) div dampDen
    * }}}
    * with dampNumComplement = dampDen - dampNum (0.85 damping is
    * dampNum=85, dampDen=100). Dangling mass (nodes with no
    * out-edges) is deliberately NOT redistributed: the use-case is
    * RANKING, truncating division already leaks up to outdeg-1 units
    * per node per hop, and skipping the redistribution keeps each
    * iteration free of a global aggregate barrier. The recurrence is
    * stated in the oracle and replayed there, so the choice is part of
    * the verified contract, not an approximation.
    *
    * Plan shape per iteration: one equi-join of the rank relation to
    * the degree-annotated edge list on `src`, one hash aggregate on
    * `dst` (map-side partial sum), one left join back to the node set
    * — the canonical distributed PageRank step. The edge list joins
    * by `src` every iteration, so it is repartitioned by `src` ONCE
    * and persisted; ranks arrive already hashed on the same key, so
    * AQE plans the per-iteration join without re-shuffling the edges.
    * Iteration count is a fixed small constant (the caller's
    * convergence budget); each iteration's lineage is cut by the
    * persisted rank relation to keep plans constant-size.
    */
  def pageRank(edges: DataFrame, iters: Int,
               dampNum: Long = 85L, dampDen: Long = 100L,
               totalMass: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && dampNum >= 0 && dampNum <= dampDen)
    val spark = edges.sparkSession
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .distinct()
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val edgesDeg = e.join(deg, "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    val r0 = totalMass / n
    val base = (dampDen - dampNum) * r0 / dampDen
    var ranks = nodes.withColumn("rank", lit(r0))
    var prev: Option[DataFrame] = None
    for (_ <- 1 to iters) {
      // `div`, not `/`: Spark's `/` on longs is DOUBLE division, and a
      // quotient whose fraction is close enough to 1 rounds UP past the
      // integer the oracle's integer division produces. `div` is true
      // 64-bit integer division — bit-equal to DuckDB's `//` here
      // (all values non-negative).
      val contribs = edgesDeg
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst"), expr("rank div outdeg").as("c"))
        .groupBy("dst")
        .agg(sum(col("c")).as("s"))
      val next = nodes
        .join(contribs.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          expr(s"${base}L + ($dampNum * coalesce(s, 0L)) div $dampDen")
            .cast("long").as("rank"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize before unpersisting the previous rank
      prev.foreach(_.unpersist())
      prev = Some(next)
      ranks = next
    }
    ranks
  }

  /** Per-node triangle participation counts over an undirected graph
    * given as a (possibly directed, possibly duplicated) edge list.
    *
    * The naive wedge join — every node joins its full neighbor list
    * against itself — explodes quadratically on hub nodes (a degree-d
    * hub emits C(d, 2) wedges; one celebrity node in a social graph is
    * the whole job). This is the DEGREE-ORDERED orientation instead
    * (the node-iterator++ / Cohen MR formulation, public literature):
    * orient every edge from its (degree, id)-smaller endpoint to the
    * larger, so each triangle has exactly ONE vertex with two
    * out-edges (its minimum) and is generated as exactly one wedge.
    * Out-degrees under this orientation are bounded by O(√m) on ANY
    * graph — a hub's wedges are generated by its low-degree
    * neighbors, not by the hub — so wedge volume is O(m^1.5) worst
    * case instead of Σd², and a 100 TB power-law graph keeps working.
    *
    * Plan: canonicalize + distinct (one shuffle), degree aggregate,
    * two equi-joins (wedge build on the common endpoint, wedge close
    * against the canonical edge set), explode each triangle to its 3
    * corners, count. No cartesian anywhere; the orientation join keys
    * are plain equality.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    // canonical undirected edge set: (a < b), self-loops dropped,
    // duplicates collapsed — persisted: wedge build and wedge close
    // both read it
    val und = edges
      .select(least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = und.select(col("a").as("n"))
      .unionAll(und.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    // orient each edge toward the (degree, id)-larger endpoint
    val oriented = und
      .join(deg.select(col("n").as("a"), col("d").as("__da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("__db")), "b")
      .select(
        when(col("__da") < col("__db") ||
            (col("__da") === col("__db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v")))
          .otherwise(struct(col("b").as("u"), col("a").as("v")))
          .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // wedges at each triangle's (degree, id)-minimum vertex; the pair
    // (x, y) is kept in id order so closing it is one equi-join on
    // the canonical edge set
    val wedges = oriented.select(col("u"), col("v").as("x"))
      .join(oriented.select(col("u"), col("v").as("y")), "u")
      .filter(col("x") < col("y"))
    val triangles = wedges
      .join(und, col("x") === col("a") && col("y") === col("b"))
      .select(col("u"), col("x"), col("y"))
    triangles
      .select(explode(array(col("u"), col("x"), col("y"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_triangles"))
  }
}
