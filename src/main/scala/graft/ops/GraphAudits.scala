package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Q, Tables, r6n}
import graft.llm.{PairGraph, TextDedup}

/** Round-9 structural graph audits over the near-dup similarity graph
  * — all three READ the persisted pair-graph store ([[graft.llm.PairGraph]])
  * instead of re-deriving the inverted-index join, so each audit costs
  * a store scan plus graph-sized work:
  *
  *  - k-core (q302): the dense backbone a keep-one dedup should treat
  *    as one template family;
  *  - degree assortativity (q303): do hubs attach to hubs? (positive
  *    ⇒ a dense template core exists; negative ⇒ star-shaped
  *    boilerplate around singleton docs);
  *  - modularity (q304): how community-like the single-linkage
  *    components actually are — the global companion to q278's
  *    per-size chaining density.
  */
object GraphAudits {

  private val CoreK = 2
  private val CoreRounds = 8

  val queries: Map[String, Q] = Map(

    /** 2-core of the ≥ 0.5-Jaccard graph by distributed peeling
      * ([[KCore]] — RDD rounds, per-round materialization): nodes
      * surviving repeated deletion of degree < 2 members — the
      * cycle-bound backbone (every 2-core member sits on a cycle, so
      * its near-dup membership is corroborated by at least two
      * independent paths; tree-like chains peel away), with the
      * within-core degree. The core is the "everything here is a
      * within-core degree. Unlike a component (one bridge merges two
      * families) or a triangle count (structure without membership),
      * core membership survives chain removal. The
      * peel budget (8 rounds) is mirrored by the oracle's unrolled
      * CTE depth and the fixpoint is CHECKED, so a deeper corpus
      * fails loud on both sides. */
    "q302_kcore" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val edges = PairGraph.jaccard(s, dir, 0.5)
        .select(col("d1"), col("d2")).as[(Long, Long)].rdd
      KCore.coreDegrees(edges, CoreK, CoreRounds)
        .toDF("doc_id", "core_deg")
        .orderBy(col("doc_id"))
    }),

    /** Degree assortativity of the near-dup graph — the one-number
      * wiring diagnostic: Pearson correlation between endpoint
      * degrees over the directed edge list. Positive (hubs with
      * hubs) means a dense template core the k-core will isolate;
      * negative means star-shaped boilerplate radiating from hub
      * documents, where keep-one dedup must keep the CENTER. Degree
      * sums are exact integers folded once (doubles before products —
      * the ANSI overflow stance), constant-degree degeneracy yields
      * NULL via nullif instead of a corr() divide-by-zero throw. */
    "q303_assortativity" -> ((s: SparkSession, dir: String) => {
      val p = PairGraph.jaccard(s, dir, 0.5).select(col("d1"), col("d2"))
      val sym = p.union(p.select(col("d2").as("d1"), col("d1").as("d2"))).cache()
      val deg = sym.groupBy(col("d1").as("n")).agg(count(lit(1)).as("deg"))
      val cd = (c: org.apache.spark.sql.Column) => c.cast("double")
      val ed = sym
        .join(deg.select(col("n").as("d1"), col("deg").as("dx")), "d1")
        .join(deg.select(col("n").as("d2"), col("deg").as("dy")), "d2")
      ed.agg(count(lit(1)).as("m"),
          sum(cd(col("dx"))).as("sx"), sum(cd(col("dy"))).as("sy"),
          sum(cd(col("dx")) * cd(col("dy"))).as("sxy"),
          sum(cd(col("dx")) * cd(col("dx"))).as("sx2"),
          sum(cd(col("dy")) * cd(col("dy"))).as("sy2"))
        .select((col("m") / 2).cast("long").as("n_edges"),
          r6n((cd(col("m")) * col("sxy") - col("sx") * col("sy")) /
            nullif(sqrt((cd(col("m")) * col("sx2") - col("sx") * col("sx")) *
              (cd(col("m")) * col("sy2") - col("sy") * col("sy"))), lit(0.0)))
            .as("assortativity"))
    }),

    /** Newman modularity of the single-linkage near-dup components —
      * "are the components actually communities?": Q = Σ_c (e_c/m −
      * (d_c/2m)²). High Q certifies that keep-one dedup per component
      * deletes genuinely related documents; Q near 0 with many
      * components means chaining glued unrelated docs (the q278
      * signal, globalized). Components via the distributed
      * star-contraction CC; e_c / d_c / m all fold from ONE
      * community-keyed aggregate (m = Σd_c/2 — every endpoint is in
      * exactly one community, so no separate edge count, no 1-row
      * broadcast). Integer counts until the nudged Q. */
    /** See [[dedupSavings]]. */
    "q314_dedup_savings" -> ((s: SparkSession, dir: String) =>
      dedupSavings(s, dir)),

    "q304_modularity" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val pairs = PairGraph.jaccard(s, dir, 0.5)
        .select(col("d1"), col("d2")).cache()
      val labels = ConnectedComponents.labels(pairs.as[(Long, Long)].rdd)
        .toDF("doc_id", "cid")
      val sym = pairs.union(pairs.select(col("d2").as("d1"), col("d1").as("d2")))
      val deg = sym.groupBy(col("d1").as("doc_id")).agg(count(lit(1)).as("deg"))
      val withC = deg.join(labels, "doc_id")
      val intra = pairs
        .join(labels.withColumnRenamed("doc_id", "d1")
          .withColumnRenamed("cid", "c1"), "d1")
        .join(labels.withColumnRenamed("doc_id", "d2")
          .withColumnRenamed("cid", "c2"), "d2")
        .filter(col("c1") === col("c2"))
        .groupBy(col("c1").as("cid")).agg(count(lit(1)).as("ec"))
      val perC = withC.groupBy(col("cid")).agg(sum(col("deg")).as("dc"))
        .join(intra, Seq("cid"), "left")
        .select(col("cid"), col("dc"), coalesce(col("ec"), lit(0L)).as("ec"))
      perC.agg(count(lit(1)).as("n_communities"),
          sum(col("ec")).as("se"), sum(col("dc")).as("sd"),
          sum(col("dc").cast("double") * col("dc").cast("double")).as("sd2"))
        .select(col("n_communities"), expr("sd DIV 2").as("n_edges"),
          r6n(col("se").cast("double") / (col("sd").cast("double") / 2.0) -
            col("sd2") / (col("sd").cast("double") * col("sd").cast("double")))
            .as("modularity"))
    }),

    /** Cluster DIAMETER census of the ≥ 0.8 dedup graph — the direct
      * measure of the chaining q367 infers from wedge closure: per
      * cluster, the BFS eccentricity from the min-id representative
      * (0-hop = the rep alone, 1 = a star, ≥ 2 = chains a pairwise
      * threshold never endorsed), histogrammed as (ecc, clusters,
      * docs). Distributed BFS in the [[KCore]]/[[ConnectedComponents]]
      * style — keyed-RDD frontier rounds with per-round
      * materialization, never a growing DataFrame lineage — with a
      * 16-hop budget mirrored by the oracle's depth-bounded recursive
      * CTE. The oracle side can only truncate silently (unreached
      * nodes drop out of its dist join), so the loud guard lives
      * in-plan HERE: if the frontier would still grow past MaxHops,
      * the Spark side raises instead of returning an under-counted
      * census the two engines would silently agree on. Reads the
      * persisted pair store. */
    "q375_cluster_diameter" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val MaxHops = 16L
      val pairs = PairGraph.jaccard(s, dir, 0.8)
        .select(col("d1"), col("d2")).as[(Long, Long)].rdd
      val sym = pairs.flatMap(p => Iterator(p, p.swap))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      sym.count()
      val lab = ConnectedComponents.labels(pairs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      lab.count()
      var dist = lab.filter { case (doc, cid) => doc == cid }
        .map { case (doc, _) => (doc, 0L) }
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      dist.count()
      var frontier = dist
      var depth = 0L
      var growing = true
      while (growing && depth < MaxHops) {
        val nxt = frontier.join(sym)
          .map { case (_, (_, v)) => (v, depth + 1) }
          .reduceByKey((a, _) => a)
          .subtractByKey(dist)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        if (nxt.count() == 0) { nxt.unpersist(false); growing = false }
        else {
          val nd = dist.union(nxt)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          nd.count()
          dist.unpersist(false)
          dist = nd; frontier = nxt; depth += 1
        }
      }
      if (growing) {
        // budget exhausted with a live frontier: probe one more hop and
        // refuse to emit a truncated census (the oracle CANNOT raise —
        // its recursive CTE truncates silently — so the guard is here)
        val leftover = frontier.join(sym)
          .map { case (_, (_, v)) => (v, depth + 1) }
          .reduceByKey((a, _) => a)
          .subtractByKey(dist)
          .count()
        require(leftover == 0L,
          s"q375: $MaxHops-hop BFS budget exhausted with $leftover nodes " +
            "unreached; raise MaxHops AND the oracle CTE depth in lockstep")
      }
      dist.toDF("doc_id", "dist")
        .join(lab.toDF("doc_id", "cid"), "doc_id")
        .groupBy(col("cid"))
        .agg(max(col("dist")).as("ecc"), count(lit(1)).as("sz"))
        .groupBy(col("ecc"))
        .agg(count(lit(1)).as("n_clusters"), sum(col("sz")).as("n_docs"))
        .orderBy(col("ecc"))
    })
  )

  // MATERIALIZED at every level: a plain CTE chain referencing its
  // predecessor twice re-EVALUATES it per reference in DuckDB — 2^8
  // scans of the base join by round 8, observed as fd exhaustion
  /** Dedup-savings forecast across thresholds (q314) — the curation
    * economics table behind choosing a Jaccard cutoff: at each
    * candidate threshold, keep-one dedup over the connected
    * components would remove HOW MANY documents and HOW MANY TOKENS?
    * Three CC runs over store-served pair sets (cheap — the pair
    * graph is read, not re-derived); corpus token total is one
    * driver-side scalar (control-plane, the q295 stance). */
  private def dedupSavings(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val toks = Tables(s, dir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        expr("CAST(size(filter(split(text, ' '), w -> length(w) > 0)) AS BIGINT)")
          .as("nt")).cache()
    val total = toks.agg(sum(col("nt"))).head.getLong(0)
    // the three thresholds' component computations are INDEPENDENT
    // eager RDD loops (ConnectedComponents runs per-round jobs) — run
    // them on driver threads (§2.6, round-17) so one loop's round tail
    // back-fills with the others' rounds instead of serializing three
    // multi-round iterations; toks is materialized above (the `total`
    // fold), so the branches read the cache, never race it
    val thresholds = Seq(0.5, 0.7, 0.9)
    val rows = new Array[org.apache.spark.sql.DataFrame](thresholds.length)
    graft.llm.StateStores.inParallel(thresholds.zipWithIndex.map {
      case (t, i) => () => {
        val labels = ConnectedComponents.labels(
          PairGraph.jaccard(s, dir, t).select(col("d1"), col("d2"))
            .as[(Long, Long)].rdd)
          .toDF("doc_id", "cid")
        val removed = labels
          .join(labels.groupBy(col("cid")).agg(min(col("doc_id")).as("keep")), "cid")
          .filter(col("doc_id") =!= col("keep"))
          .join(toks, "doc_id")
        rows(i) = removed
          .agg(coalesce(countDistinct(col("cid")), lit(0L)).as("n_clusters"),
            count(lit(1)).as("n_docs_removed"),
            coalesce(sum(col("nt")), lit(0L)).as("tokens_removed"))
          .select(lit(t).as("threshold"), col("n_clusters"),
            col("n_docs_removed"), col("tokens_removed"),
            r6n(col("tokens_removed").cast("double") / lit(total.toDouble))
              .as("token_share"))
        ()
      }
    }: _*)
    rows.reduce(_ unionAll _).orderBy(col("threshold"))
  }

  private def duckPeel(prev: String, nodes: String, out: String): String =
    s"""$nodes AS MATERIALIZED (
       |  SELECT u FROM $prev GROUP BY u HAVING count(*) >= $CoreK),
       |$out AS MATERIALIZED (
       |  SELECT u, v FROM $prev
       |  WHERE u IN (SELECT u FROM $nodes) AND v IN (SELECT u FROM $nodes))""".stripMargin

  private def duckClosure: String =
    s"""p AS (SELECT d1, d2 FROM (${TextDedup.duckJaccard("0.5")})),
       |edges2(u, v) AS (SELECT d1, d2 FROM p UNION ALL SELECT d2, d1 FROM p),
       |walk(node, reach) AS (
       |  SELECT u, u FROM (SELECT DISTINCT u FROM edges2)
       |  UNION
       |  SELECT w.node, e.v FROM walk w JOIN edges2 e ON e.u = w.reach),
       |labels AS (
       |  SELECT node AS doc_id, CAST(min(reach) AS BIGINT) AS cid
       |  FROM walk GROUP BY node)""".stripMargin

  val oracles: Map[String, String] = Map(

    // ≥ 0.8 pairs + min-label closure for reps, then a depth-bounded
    // (16, mirroring the Spark hop budget) BFS recursive CTE; min
    // depth per node, max per cluster, histogram
    "q375_cluster_diameter" ->
      s"""WITH RECURSIVE
         |p AS (SELECT d1, d2 FROM (${TextDedup.duckJaccard("0.8")})),
         |e(u, v) AS (SELECT d1, d2 FROM p UNION ALL SELECT d2, d1 FROM p),
         |walk(node, reach) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM e)
         |  UNION
         |  SELECT w.node, e.v FROM walk w JOIN e ON e.u = w.reach),
         |labels AS (
         |  SELECT node AS doc_id, CAST(min(reach) AS BIGINT) AS cid
         |  FROM walk GROUP BY node),
         |bfs(node, depth) AS (
         |  SELECT DISTINCT cid, CAST(0 AS BIGINT) FROM labels
         |  UNION
         |  SELECT e.v, b.depth + 1 FROM bfs b JOIN e ON e.u = b.node
         |  WHERE b.depth < 16),
         |d AS (SELECT node, min(depth) AS dist FROM bfs GROUP BY node),
         |pc AS (
         |  SELECT l.cid, max(d.dist) AS ecc, count(*) AS sz
         |  FROM d JOIN labels l ON l.doc_id = d.node GROUP BY l.cid)
         |SELECT CAST(ecc AS BIGINT) AS ecc,
         |CAST(count(*) AS BIGINT) AS n_clusters,
         |CAST(sum(sz) AS BIGINT) AS n_docs
         |FROM pc GROUP BY ecc
         |ORDER BY ecc NULLS FIRST""".stripMargin,

    "q302_kcore" -> {
      val peels = (1 to CoreRounds)
        .map(r => duckPeel(s"e${r - 1}", s"n$r", s"e$r")).mkString(",\n")
      s"""WITH p AS MATERIALIZED (SELECT d1, d2 FROM (${TextDedup.duckJaccard("0.5")})),
         |e0(u, v) AS MATERIALIZED (SELECT d1, d2 FROM p UNION ALL SELECT d2, d1 FROM p),
         |$peels
         |SELECT u AS doc_id, CAST(count(*) AS BIGINT) AS core_deg
         |FROM e$CoreRounds GROUP BY u
         |ORDER BY doc_id NULLS FIRST""".stripMargin
    },

    "q303_assortativity" ->
      s"""WITH p AS (SELECT d1, d2 FROM (${TextDedup.duckJaccard("0.5")})),
         |sym AS (SELECT d1, d2 FROM p UNION ALL SELECT d2, d1 FROM p),
         |deg AS (SELECT d1 AS n, CAST(count(*) AS BIGINT) AS deg
         |  FROM sym GROUP BY 1),
         |ed AS (
         |  SELECT CAST(x.deg AS DOUBLE) AS dx, CAST(y.deg AS DOUBLE) AS dy
         |  FROM sym JOIN deg x ON x.n = sym.d1 JOIN deg y ON y.n = sym.d2),
         |f AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS m, sum(dx) AS sx, sum(dy) AS sy,
         |  sum(dx * dy) AS sxy, sum(dx * dx) AS sx2, sum(dy * dy) AS sy2
         |  FROM ed)
         |SELECT CAST(m / 2 AS BIGINT) AS n_edges,
         |round((m * sxy - sx * sy)
         |  / nullif(sqrt((m * sx2 - sx * sx) * (m * sy2 - sy * sy)), 0.0)
         |  + 1e-12, 6) AS assortativity
         |FROM f""".stripMargin,

    "q314_dedup_savings" ->
      s"""WITH RECURSIVE
         |tk AS MATERIALIZED (
         |  SELECT doc_id,
         |  CAST(len(list_filter(string_split(text, ' '), w -> len(w) > 0))
         |    AS BIGINT) AS nt
         |  FROM documents WHERE text IS NOT NULL),
         |tot AS (SELECT sum(nt) AS t FROM tk),
         |pa AS MATERIALIZED (SELECT d1, d2 FROM (${TextDedup.duckJaccard("0.5")})),
         |edgesa(u, v) AS (SELECT d1, d2 FROM pa UNION ALL SELECT d2, d1 FROM pa),
         |walka(node, reach) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM edgesa)
         |  UNION
         |  SELECT w.node, e.v FROM walka w JOIN edgesa e ON e.u = w.reach),
         |laba AS (
         |  SELECT node AS doc_id, CAST(min(reach) AS BIGINT) AS cid
         |  FROM walka GROUP BY node),
         |rema AS (
         |  SELECT l.cid, l.doc_id FROM laba l
         |  JOIN (SELECT cid, min(doc_id) AS keep FROM laba GROUP BY 1) k
         |    ON k.cid = l.cid
         |  WHERE l.doc_id <> k.keep),
         |rowa AS (
         |  SELECT CAST(0.5 AS DOUBLE) AS threshold,
         |  CAST(count(DISTINCT r.cid) AS BIGINT) AS n_clusters,
         |  CAST(count(*) AS BIGINT) AS n_docs_removed,
         |  CAST(coalesce(sum(tk.nt), 0) AS BIGINT) AS tokens_removed,
         |  round(coalesce(sum(tk.nt), 0) * 1.0 / (SELECT t FROM tot) + 1e-12, 6)
         |    AS token_share
         |  FROM rema r JOIN tk ON tk.doc_id = r.doc_id),
         |pb AS MATERIALIZED (SELECT d1, d2 FROM (${TextDedup.duckJaccard("0.7")})),
         |edgesb(u, v) AS (SELECT d1, d2 FROM pb UNION ALL SELECT d2, d1 FROM pb),
         |walkb(node, reach) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM edgesb)
         |  UNION
         |  SELECT w.node, e.v FROM walkb w JOIN edgesb e ON e.u = w.reach),
         |labb AS (
         |  SELECT node AS doc_id, CAST(min(reach) AS BIGINT) AS cid
         |  FROM walkb GROUP BY node),
         |remb AS (
         |  SELECT l.cid, l.doc_id FROM labb l
         |  JOIN (SELECT cid, min(doc_id) AS keep FROM labb GROUP BY 1) k
         |    ON k.cid = l.cid
         |  WHERE l.doc_id <> k.keep),
         |rowb AS (
         |  SELECT CAST(0.7 AS DOUBLE) AS threshold,
         |  CAST(count(DISTINCT r.cid) AS BIGINT) AS n_clusters,
         |  CAST(count(*) AS BIGINT) AS n_docs_removed,
         |  CAST(coalesce(sum(tk.nt), 0) AS BIGINT) AS tokens_removed,
         |  round(coalesce(sum(tk.nt), 0) * 1.0 / (SELECT t FROM tot) + 1e-12, 6)
         |    AS token_share
         |  FROM remb r JOIN tk ON tk.doc_id = r.doc_id),
         |pc AS MATERIALIZED (SELECT d1, d2 FROM (${TextDedup.duckJaccard("0.9")})),
         |edgesc(u, v) AS (SELECT d1, d2 FROM pc UNION ALL SELECT d2, d1 FROM pc),
         |walkc(node, reach) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM edgesc)
         |  UNION
         |  SELECT w.node, e.v FROM walkc w JOIN edgesc e ON e.u = w.reach),
         |labc AS (
         |  SELECT node AS doc_id, CAST(min(reach) AS BIGINT) AS cid
         |  FROM walkc GROUP BY node),
         |remc AS (
         |  SELECT l.cid, l.doc_id FROM labc l
         |  JOIN (SELECT cid, min(doc_id) AS keep FROM labc GROUP BY 1) k
         |    ON k.cid = l.cid
         |  WHERE l.doc_id <> k.keep),
         |rowc AS (
         |  SELECT CAST(0.9 AS DOUBLE) AS threshold,
         |  CAST(count(DISTINCT r.cid) AS BIGINT) AS n_clusters,
         |  CAST(count(*) AS BIGINT) AS n_docs_removed,
         |  CAST(coalesce(sum(tk.nt), 0) AS BIGINT) AS tokens_removed,
         |  round(coalesce(sum(tk.nt), 0) * 1.0 / (SELECT t FROM tot) + 1e-12, 6)
         |    AS token_share
         |  FROM remc r JOIN tk ON tk.doc_id = r.doc_id)
         |SELECT * FROM rowa UNION ALL SELECT * FROM rowb
         |UNION ALL SELECT * FROM rowc
         |ORDER BY threshold NULLS FIRST""".stripMargin,

    "q304_modularity" ->
      s"""WITH RECURSIVE
         |$duckClosure,
         |sym AS (SELECT d1, d2 FROM p UNION ALL SELECT d2, d1 FROM p),
         |deg AS (SELECT d1 AS doc_id, CAST(count(*) AS BIGINT) AS deg
         |  FROM sym GROUP BY 1),
         |intra AS (
         |  SELECT la.cid, CAST(count(*) AS BIGINT) AS ec
         |  FROM p
         |  JOIN labels la ON la.doc_id = p.d1
         |  JOIN labels lb ON lb.doc_id = p.d2
         |  WHERE la.cid = lb.cid
         |  GROUP BY 1),
         |perc AS (
         |  SELECT d.cid, sum(g.deg) AS dc, coalesce(max(i.ec), 0) AS ec
         |  FROM labels d
         |  JOIN deg g ON g.doc_id = d.doc_id
         |  LEFT JOIN intra i ON i.cid = d.cid
         |  GROUP BY 1)
         |SELECT CAST(count(*) AS BIGINT) AS n_communities,
         |CAST(sum(dc) // 2 AS BIGINT) AS n_edges,
         |round(sum(ec) * 1.0 / (sum(dc) / 2.0)
         |  - sum(CAST(dc AS DOUBLE) * CAST(dc AS DOUBLE))
         |    / (CAST(sum(dc) AS DOUBLE) * CAST(sum(dc) AS DOUBLE))
         |  + 1e-12, 6) AS modularity
         |FROM perc""".stripMargin
  )
}
