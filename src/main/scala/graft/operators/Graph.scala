package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Graph analytics over relational link structure. Connected components
  * already live in the dedup family ([[Dedup.connectedComponents]] —
  * min-label propagation with the alternating-star fallback); this adds
  * rank propagation.
  *
  * Reference tie: the reference's data model is an entity graph
  * (ProtoModel relations; protolib/src/bundles/flow wires object
  * references), and link-analysis over entity graphs (importance
  * ranking, influence propagation) is the standard analytics ask a
  * relational engine can't express in one query. Spark-first shape:
  * bounded-iteration joins + aggregations — the PREGEL recipe without
  * the framework.
  */
object Graph {

  /** PageRank with EXACT integer arithmetic: ranks live at a fixed
    * scale (default 1e12) and every division floors, so the result is
    * bit-identical across engines and partitionings — no float
    * summation-order drift — while agreeing with float PageRank to
    * ~12 significant digits. Per iteration: one join of the edge list
    * against the current ranks (AQE-sized; the rank side is
    * node-grain, typically broadcastable against a fact-grain edge
    * list) and one hash agg on dst — the Pregel step as plain
    * DataFrame ops. `iters` is bounded metadata, so the lineage stays
    * a k-deep chain; an unbounded fixpoint would checkpoint per round
    * like the components loop.
    *
    * Nodes are DEFINED by edge endpoints (the usual link-graph
    * contract); pass a symmetrized edge list for undirected semantics
    * — then no node dangles and the 0.85 mass conserves exactly up to
    * the per-edge floor.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, scale: Long = 1000000000000L): DataFrame = {
    // The edge list stays LAZY deliberately. Measured at sf10 (120M
    // symmetrized fact-grain edges, default 8g heap): caching it —
    // in-memory checkpoint AND disk-only persist both — starves the
    // per-iteration hash aggs into UNABLE_TO_ACQUIRE_MEMORY, while the
    // lazy plan (which recomputes the upstream join+distinct per round)
    // completes in 67 s, 6.5× at 10× data. k is small and bounded, so
    // k redundant scans beat k aggs competing with pinned blocks at
    // fixed local memory; on a real cluster the edge list would be a
    // bucketed TABLE (write once, zero-exchange reads per iteration),
    // which is the durable analog of the checkpoint, not a cache.
    val e = edges.select(col(srcCol).cast("bigint").as("src"),
      col(dstCol).cast("bigint").as("dst"))
    val nodes = e.select(col("src").as("node")).distinct()
    // N is ONE driver-side long (the formula constant), not a collect
    val n = nodes.count()
    require(n > 0, "pageRank over an empty edge list")
    val base = scale * 15 / (100 * n)
    val deg = e.groupBy("src").agg(count(lit(1)).as("d"))
    var r = nodes.withColumn("r", lit(scale / n))
    (1 to iters).foreach { _ =>
      // per-src weight at NODE grain first (one narrow join), then the
      // fact-grain edge join; the explicit dst repartition puts the
      // rank agg in its OWN stage — pipelining it behind the
      // sort-merge join's buffers measured UNABLE_TO_ACQUIRE_MEMORY at
      // sf10/8g (32 concurrent tasks × sort + high-cardinality agg map)
      val w = r.join(deg, col("node") === col("src"))
        .select(col("src"), expr("(r * 85) div (100 * d)").as("c"))
      r = e.join(w, "src")
        .select(col("dst"), col("c"))
        .repartition(col("dst"))
        .groupBy(col("dst").as("node"))
        .agg((sum(col("c")) + base).as("r"))
        .select(col("node"), col("r"))
    }
    r.withColumnRenamed("r", "rank")
  }

  /** Exact triangle counting with DEGREE ORIENTATION — the standard
    * skew bound. Input: canonical undirected edges (a < b, distinct).
    *
    * Naive wedge enumeration pays Σ deg(v)² — a power-law heavy hitter
    * (the supplier in every order) alone generates a quadratic wedge
    * set. Orienting every edge from the (degree, id)-SMALLER endpoint
    * to the larger makes the graph a DAG whose out-degrees are capped
    * at O(√(2m)) (a node with out-degree k has k neighbors of degree
    * ≥ its own, so k² ≤ 2m): wedges become Σ outdeg(v)² = O(m^1.5)
    * WORST-case, independent of skew — the heavy hitter RECEIVES its
    * edges and emits no wedge pairs. Each triangle then appears exactly
    * once, as (u → lo, u → hi) closed by the oriented edge lo → hi.
    *
    * Shape: two node-grain joins to attach degrees (broadcastable —
    * node grain vs edge grain), one edge×edge self-join on src (the
    * bounded wedge set), one semi-shaped equi-join against the edge
    * list to close, then a node-grain agg. No iteration, no driver
    * state. Output: every node with its degree and triangle count.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val e = edges.select(col("a").cast("bigint").as("a"),
      col("b").cast("bigint").as("b"))
    val deg = e.select(col("a").as("node"))
      .unionByName(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    // attach both endpoint degrees, then orient by (degree, id)
    val withDeg = e
      .join(deg.select(col("node").as("a"), col("degree").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("degree").as("db")), "b")
    val oriented = withDeg.select(
      when(col("da") < col("db") ||
           (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("src"), col("b").as("dst"), col("db").as("dk")))
      .otherwise(
        struct(col("b").as("src"), col("a").as("dst"), col("da").as("dk")))
      .as("o")).select(col("o.src"), col("o.dst"), col("o.dk"))
    // wedge heads ordered by the SAME (degree, id) total order, so the
    // closing edge is oriented lo → hi by construction
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.src") === col("e2.src") &&
          (col("e1.dk") < col("e2.dk") ||
            (col("e1.dk") === col("e2.dk") && col("e1.dst") < col("e2.dst"))))
      .select(col("e1.src").as("u"), col("e1.dst").as("lo"),
        col("e2.dst").as("hi"))
    val triangles = wedges.join(oriented,
        col("lo") === col("src") && col("hi") === col("dst"))
      .select("u", "lo", "hi")
    val perNode = triangles.select(col("u").as("node"))
      .unionByName(triangles.select(col("lo").as("node")))
      .unionByName(triangles.select(col("hi").as("node")))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
  }

  /** Supplier co-occurrence edges: two suppliers are linked when they
    * ship lineitems of the SAME order — the co-supply projection of the
    * order↔supplier bipartite graph (the trade graph itself is
    * bipartite and triangle-free). Canonical a < b, distinct; the
    * projection is sparse because order groups are small (a handful of
    * lineitems each), so the pair fan-out is a bounded per-order
    * combination, not a cross join. */
  def coSupplyEdges(s: SparkSession, d: String): DataFrame = {
    val sl = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o"), col("l_suppkey").as("sk"))
      .distinct()
    sl.as("x").join(sl.as("y"),
        col("x.o") === col("y.o") && col("x.sk") < col("y.sk"))
      .select(col("x.sk").as("a"), col("y.sk").as("b"))
      .distinct()
  }

  /** The customer↔supplier trade graph: who transacted with whom, one
    * (distinct) edge per trading pair, symmetrized. Even node ids =
    * customers (custkey·2), odd = suppliers (suppkey·2+1). */
  def tradeGraph(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.orders(s, d).select("o_orderkey", "o_custkey")
      .join(Tables.lineitem(s, d).select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
    pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // 3 exact-integer PageRank rounds over the trade graph — influence
    // ranking over the entity graph, the Pregel step as join+agg
    "graph_pagerank" -> ((s, d) =>
      pageRank(tradeGraph(s, d), "src", "dst", iters = 3)
        .withColumn("node_type",
          when(col("node") % 2 === 0, lit("customer")).otherwise(lit("supplier")))
        .select("node", "node_type", "rank")
        .orderBy("node")),

    // exact per-supplier triangle census over the co-supply graph —
    // local clustering structure (degree + closed wedges) with the
    // orientation bound doing the 100 TB work
    "graph_triangles" -> ((s, d) =>
      triangleCounts(coSupplyEdges(s, d))
        .withColumnRenamed("node", "suppkey")
        .orderBy("suppkey"))
  )

  val oracles: Map[String, String] = Map(
    // the same 3 rounds unrolled; integer floors make summation order
    // irrelevant, so the replay is exact with no float detour
    "graph_pagerank" -> {
      val scale = "1000000000000"
      // ::BIGINT per round: DuckDB's sum(BIGINT) widens to HUGEINT,
      // which the compare would read as float
      def round(prev: String, out: String): String =
        s"""$out AS (SELECT e.dst AS node, ((SELECT ($scale * 15) // (100 * count(*)) FROM n) + sum(($prev.r * 85) // (100 * deg.d)))::BIGINT AS r FROM e JOIN $prev ON e.src = $prev.node JOIN deg ON e.src = deg.src GROUP BY e.dst)"""
      s"""WITH e0 AS (SELECT DISTINCT o.o_custkey * 2 AS a, l.l_suppkey * 2 + 1 AS b FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey), e AS (SELECT a AS src, b AS dst FROM e0 UNION ALL SELECT b AS src, a AS dst FROM e0), n AS (SELECT DISTINCT src AS node FROM e), deg AS (SELECT src, count(*) AS d FROM e GROUP BY src), r0 AS (SELECT node, $scale // (SELECT count(*) FROM n) AS r FROM n), ${round("r0", "r1")}, ${round("r1", "r2")}, ${round("r2", "r3")} SELECT node, CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type, r AS rank FROM r3 ORDER BY node"""
    },

    // GROUND-TRUTH triangle semantics — the definitional a<b<c triple
    // enumeration over canonical edges, NOT a replay of the engine's
    // degree orientation: if the oriented wedge algebra over- or
    // under-counts anywhere, the hash fails
    "graph_triangles" ->
      """WITH sl AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS sk FROM lineitem),
        |e AS (SELECT DISTINCT x.sk AS a, y.sk AS b FROM sl x JOIN sl y ON x.o = y.o AND x.sk < y.sk),
        |deg AS (SELECT node, count(*) AS degree FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY node),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
        |tn AS (SELECT node, count(*) AS triangles FROM (SELECT x AS node FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri) GROUP BY node)
        |SELECT d.node AS suppkey, d.degree, CAST(COALESCE(tn.triangles, 0) AS BIGINT) AS triangles
        |FROM deg d LEFT JOIN tn ON tn.node = d.node ORDER BY suppkey""".stripMargin
  )
}
