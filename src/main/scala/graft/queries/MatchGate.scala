package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{FuzzyMatch, Graph}

/** Matching / indexing gates: bounded edit-distance similarity join
  * (t83), inverted-index build (t84), per-vertex triangle counts
  * (t85), and top-term co-occurrence (t86) — the fuzzy-matching and
  * corpus-indexing layer of a training-data pipeline (typo-variant
  * collapse, posting lists, graph cohesion features, term-pair
  * statistics).
  *
  * t83's oracle brute-forces ALL word pairs in DuckDB while the Spark
  * side only scores symmetric-delete candidates
  * ([[graft.operators.FuzzyMatch]]) — the hash match certifies the
  * blocking is lossless, not just that the DP agrees.
  */
object MatchGate {
  type Q = (SparkSession, String) => DataFrame

  /** Distinct part-name tokens — the vocabulary for t83. */
  private def partWords(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(explode(split(col("p_name"), " ")).as("w"))
      .filter(col("w") =!= "").distinct()

  /** (doc_id, term) pairs, distinct within a document. */
  private def docTerms(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("term"))
      .filter(col("term") =!= "")

  /** t83: edit-distance ≤ 2 similarity join over part-name vocabulary;
    * deletion-neighborhood blocking + exact DP on candidates only. */
  def t83EditDistanceJoin(s: SparkSession, dir: String): DataFrame =
    FuzzyMatch.editDistancePairs(partWords(s, dir), "w", maxDist = 2)
      .orderBy("a", "b")

  /** t84: inverted index — term → document frequency + the first 50
    * postings (sorted doc ids, comma-joined). The posting cap keeps
    * the row bounded for stopword-grade terms; df stays exact. */
  def t84InvertedIndex(s: SparkSession, dir: String): DataFrame =
    docTerms(s, dir)
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        array_join(slice(sort_array(collect_list(col("doc_id"))), 1, 50), ",")
          .as("postings_head"))
      .orderBy("term")

  /** t85: per-vertex triangle counts on the t66 synthetic link graph
    * (every doc links to (2·id+1) mod N and (3·id+7) mod N),
    * degree-oriented wedge join ([[Graph.triangleCounts]]). */
  def t85TriangleCount(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val n = docs.count()
    val v = docs.select(col("doc_id").as("v"))
    val edges = v.select(col("v").as("src"), ((col("v") * 2 + 1) % n).as("dst"))
      .union(v.select(col("v").as("src"), ((col("v") * 3 + 7) % n).as("dst")))
    Graph.triangleCounts(edges)
      .select(col("v").as("doc_id"), col("n_triangles"))
      .orderBy("doc_id")
  }

  /** t86: co-occurrence counts over the top-10 terms by df
    * (deterministic df-desc/term-asc cut): within-document pairs via a
    * doc-keyed self-join of the top-term postings — fan-out bounded by
    * the broadcast vocabulary size, never corpus². */
  def t86TermCooccurrence(s: SparkSession, dir: String): DataFrame = {
    val dt = docTerms(s, dir)
    val top = dt.groupBy("term").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("term").asc).limit(10)
    val ft = dt.join(broadcast(top.select("term")), "term")
    ft.as("l").join(ft.as("r"),
        col("l.doc_id") === col("r.doc_id") && col("l.term") < col("r.term"))
      .groupBy(col("l.term").as("t1"), col("r.term").as("t2"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("t1", "t2")
  }

  /** t88: bounded-depth BFS reachability levels from doc 0 over the
    * t66 link graph ([[Graph.bfsLevels]], 4 relaxation rounds) — the
    * crawl-frontier / link-distance primitive. The oracle answers with
    * a RECURSIVE CTE, so the gate proves the engine's iterative
    * join+min relaxation equals the SQL fixpoint semantics. */
  def t88BfsLevels(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val n = docs.count()
    val v = docs.select(col("doc_id").as("v"))
    val edges = v.select(col("v").as("src"), ((col("v") * 2 + 1) % n).as("dst"))
      .union(v.select(col("v").as("src"), ((col("v") * 3 + 7) % n).as("dst")))
    Graph.bfsLevels(edges, source = 0L, rounds = 4)
      .select(col("v").as("doc_id"), col("lvl"))
      .orderBy("doc_id")
  }

  /** t90: hierarchical rollup WITHOUT iteration — docs arranged as a
    * heap-numbered ternary tree (parent(v) = (v−1) div 3), each node's
    * subtree character count and size computed by exploding every
    * node's ANCESTOR PATH scan-side (a fixed expression chain of
    * ⌈log₃ N⌉ parent steps — the materialized-path technique) and one
    * hash aggregate on the ancestor key. The account-hierarchy /
    * BOM-rollup shape: at 100 TB this is a scan plus one shuffle,
    * where the naive form is depth× iterated self-joins. The oracle
    * descends the same tree with a RECURSIVE CTE. */
  /** Ancestor chain of a heap-numbered ternary-tree node, self
    * included, root-terminated. A compiled UDF (the shingleUdf
    * precedent): nesting the recurrence as column expressions
    * duplicates each level into the next's condition AND value — a
    * 2^depth Catalyst tree; the loop is O(depth) per row. */
  private val ancestorsUdf = udf { (v: Long) =>
    val out = Seq.newBuilder[Long]
    var a = v
    out += a
    while (a > 0) { a = (a - 1) / 3; out += a }
    out.result()
  }

  def t90HierarchyRollup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
    val pairs = docs
      .withColumn("anc", explode(ancestorsUdf(col("doc_id"))))
      .select(col("anc"), col("n_chars"))
    pairs.groupBy(col("anc").as("doc_id"))
      .agg(count(lit(1)).as("subtree_size"),
        sum("n_chars").as("subtree_chars"))
      .orderBy("doc_id")
  }

  /** t93: spatial neighbor join — customers dispersed onto an integer
    * plane by multiplicative hashing, all pairs within L∞ ≤ 50 found
    * through [[graft.operators.GridJoin.neighborPairs]]' 3×3 grid-cell
    * blocking. The oracle brute-forces every point pair in DuckDB, so
    * the hash match certifies the grid blocking lost no pair — the
    * same lossless-blocking proof discipline as t83. */
  def t93GridNeighborPairs(s: SparkSession, dir: String): DataFrame = {
    val pts = Tables.customer(s, dir).select(col("c_custkey").as("id"),
      expr("(c_custkey * 2654435761) % 10007").as("x"),
      expr("(c_custkey * 40503) % 10007").as("y"))
    graft.operators.GridJoin.neighborPairs(pts, "id", "x", "y", r = 50L)
      .orderBy("id_a", "id_b")
  }

  /** q132: the SAME reachability computation as t88, but DECLARATIVE —
    * Spark 4's native `WITH RECURSIVE` fixpoint, the form a migrating
    * SQL user writes, sharing t88's oracle so the recursive-CTE
    * execution and [[Graph.bfsLevels]]' iterative join+min relaxation
    * are certified equal. The recursion is depth-bounded (lvl < 4) with
    * out-degree 2, so the working frontier is ≤ 2⁴ path rows per
    * source — at 100 TB the same form runs with Spark's recursion row
    * limits as the guard rail while the iterative twin (t88) remains
    * the unbounded-depth workhorse. */
  def q132RecursiveCte(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir).createOrReplaceTempView("g_q132_documents")
    s.sql(
      """WITH RECURSIVE nn AS (SELECT count(*) c FROM g_q132_documents),
        |e AS (SELECT doc_id s, (doc_id * 2 + 1) % (SELECT c FROM nn) d
        |      FROM g_q132_documents
        |      UNION ALL
        |      SELECT doc_id, (doc_id * 3 + 7) % (SELECT c FROM nn)
        |      FROM g_q132_documents),
        |r(v, lvl) AS (
        |  SELECT cast(0 as bigint), cast(0 as bigint)
        |  UNION ALL
        |  SELECT e.d, r.lvl + 1 FROM r JOIN e ON e.s = r.v WHERE r.lvl < 4)
        |SELECT v AS doc_id, cast(min(lvl) as bigint) AS lvl
        |FROM r GROUP BY v ORDER BY doc_id""".stripMargin)
  }

  /** t94: the linear-decision twin of t83 — per-word keep/drop under
    * the greedy keep-first rule instead of the pair set. Same deletion
    * blocking, same exact-distance contract; output linear in the
    * vocabulary. */
  def t94EditDistanceDedup(s: SparkSession, dir: String): DataFrame =
    graft.operators.FuzzyMatch
      .editDistanceDedup(partWords(s, dir), "w", maxDist = 2)
      .orderBy("word")

  /** t96: the linear-decision twin of t93 — per-point keep/drop under
    * the greedy keep-first rule instead of the neighbor pair set. Same
    * 3×3 grid blocking; output linear in the point set. */
  def t96GridDedup(s: SparkSession, dir: String): DataFrame = {
    val pts = Tables.customer(s, dir).select(col("c_custkey").as("id"),
      expr("(c_custkey * 2654435761) % 10007").as("x"),
      expr("(c_custkey * 40503) % 10007").as("y"))
    graft.operators.GridJoin.neighborDedup(pts, "id", "x", "y", r = 50L)
      .orderBy("id")
  }

  val queries: Map[String, Q] = Map(
    "q132_recursive_cte" -> (q132RecursiveCte _),
    "t94_edit_distance_dedup" -> (t94EditDistanceDedup _),
    "t96_grid_dedup" -> (t96GridDedup _),
    "t83_edit_distance_join" -> (t83EditDistanceJoin _),
    "t84_inverted_index" -> (t84InvertedIndex _),
    "t85_triangle_count" -> (t85TriangleCount _),
    "t86_term_cooccurrence" -> (t86TermCooccurrence _),
    "t88_bfs_levels" -> (t88BfsLevels _),
    "t90_hierarchy_rollup" -> (t90HierarchyRollup _),
    "t93_grid_neighbor_pairs" -> (t93GridNeighborPairs _))

  val oracles: Map[String, String] = Map(
    // q132 shares t88's fixpoint oracle — the declarative and iterative
    // engines must agree with the SAME reference answer
    "q132_recursive_cte" ->
      """WITH RECURSIVE nn AS (SELECT count(*) c FROM documents),
        |e AS (SELECT doc_id s, (doc_id * 2 + 1) % (SELECT c FROM nn) d
        |      FROM documents
        |      UNION ALL
        |      SELECT doc_id, (doc_id * 3 + 7) % (SELECT c FROM nn)
        |      FROM documents),
        |r(v, lvl) AS (
        |  SELECT cast(0 as bigint), cast(0 as bigint)
        |  UNION ALL
        |  SELECT e.d, r.lvl + 1 FROM r JOIN e ON e.s = r.v WHERE r.lvl < 4)
        |SELECT v doc_id, cast(min(lvl) as bigint) lvl
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "t83_edit_distance_join" ->
      // brute force on purpose: proves the Spark-side blocking lossless
      """WITH w AS (SELECT DISTINCT t w FROM (SELECT unnest(string_split(p_name, ' ')) t
        |    FROM part) WHERE t <> '')
        |SELECT a.w a, b.w b, levenshtein(a.w, b.w) dist
        |FROM w a JOIN w b ON a.w < b.w
        |WHERE levenshtein(a.w, b.w) <= 2
        |ORDER BY a, b""".stripMargin,
    "t94_edit_distance_dedup" ->
      // the brute-force DECISION the linear blocking must reproduce
      """WITH w AS (SELECT DISTINCT t w FROM (SELECT unnest(string_split(p_name, ' ')) t
        |    FROM part) WHERE t <> ''),
        |d AS (SELECT DISTINCT b.w w FROM w a JOIN w b ON a.w < b.w
        |      WHERE levenshtein(a.w, b.w) <= 2)
        |SELECT w.w word, (d.w IS NULL) kept
        |FROM w LEFT JOIN d ON w.w = d.w
        |ORDER BY word""".stripMargin,
    "t96_grid_dedup" ->
      // brute-force keep-first over the r-box neighborhood
      """WITH p AS (SELECT c_custkey id,
        |    (c_custkey * 2654435761) % 10007 x,
        |    (c_custkey * 40503) % 10007 y
        |  FROM customer),
        |d AS (SELECT DISTINCT b.id id FROM p a JOIN p b ON a.id < b.id
        |      WHERE abs(a.x - b.x) <= 50 AND abs(a.y - b.y) <= 50)
        |SELECT p.id AS id, (d.id IS NULL) kept
        |FROM p LEFT JOIN d ON p.id = d.id
        |ORDER BY p.id""".stripMargin,
    "t84_inverted_index" ->
      """WITH dt AS (SELECT DISTINCT doc_id, t term FROM (SELECT doc_id,
        |    unnest(string_split(text, ' ')) t FROM documents) WHERE t <> '')
        |SELECT term, cast(count(*) as bigint) df,
        |  array_to_string((list(doc_id ORDER BY doc_id))[1:50], ',') postings_head
        |FROM dt GROUP BY 1 ORDER BY 1""".stripMargin,
    "t85_triangle_count" ->
      """WITH v AS (SELECT doc_id vid FROM documents),
        |nn AS (SELECT count(*) c FROM documents),
        |raw AS (SELECT vid s, (vid * 2 + 1) % (SELECT c FROM nn) d FROM v
        |        UNION ALL
        |        SELECT vid, (vid * 3 + 7) % (SELECT c FROM nn) FROM v),
        |und AS (SELECT DISTINCT least(s, d) a, greatest(s, d) b FROM raw
        |        WHERE s <> d),
        |deg AS (SELECT x v, cast(count(*) as bigint) deg FROM
        |        (SELECT a x FROM und UNION ALL SELECT b FROM und) GROUP BY 1),
        |rk AS (SELECT v, deg * 1000000000000 + v rnk FROM deg),
        |ore AS (SELECT CASE WHEN ra.rnk < rb.rnk THEN a ELSE b END s,
        |               CASE WHEN ra.rnk < rb.rnk THEN b ELSE a END d,
        |               greatest(ra.rnk, rb.rnk) drnk
        |        FROM und JOIN rk ra ON und.a = ra.v JOIN rk rb ON und.b = rb.v),
        |tri AS (SELECT e1.s u, e1.d x, e2.d y
        |        FROM ore e1 JOIN ore e2 ON e1.s = e2.s AND e1.drnk < e2.drnk
        |        WHERE EXISTS (SELECT 1 FROM ore o WHERE o.s = e1.d AND o.d = e2.d))
        |SELECT vtx doc_id, cast(count(*) as bigint) n_triangles FROM
        |  (SELECT u vtx FROM tri UNION ALL SELECT x FROM tri
        |   UNION ALL SELECT y FROM tri)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "t86_term_cooccurrence" ->
      """WITH dt AS (SELECT DISTINCT doc_id, t term FROM (SELECT doc_id,
        |    unnest(string_split(text, ' ')) t FROM documents) WHERE t <> ''),
        |top AS (SELECT term FROM (SELECT term, count(*) df FROM dt GROUP BY 1)
        |        ORDER BY df DESC, term LIMIT 10),
        |ft AS (SELECT doc_id, term FROM dt WHERE term IN (SELECT term FROM top))
        |SELECT l.term t1, r.term t2, cast(count(*) as bigint) n_docs
        |FROM ft l JOIN ft r ON l.doc_id = r.doc_id AND l.term < r.term
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "t88_bfs_levels" ->
      // the SQL fixpoint form the engine's iterative relaxation must match
      """WITH RECURSIVE nn AS (SELECT count(*) c FROM documents),
        |e AS (SELECT doc_id s, (doc_id * 2 + 1) % (SELECT c FROM nn) d
        |      FROM documents
        |      UNION ALL
        |      SELECT doc_id, (doc_id * 3 + 7) % (SELECT c FROM nn)
        |      FROM documents),
        |r(v, lvl) AS (
        |  SELECT cast(0 as bigint), cast(0 as bigint)
        |  UNION ALL
        |  SELECT e.d, r.lvl + 1 FROM r JOIN e ON e.s = r.v WHERE r.lvl < 4)
        |SELECT v doc_id, cast(min(lvl) as bigint) lvl
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "t90_hierarchy_rollup" ->
      // descend the same ternary tree with a recursive CTE: (anc, node)
      // closure seeded with self-pairs, extended child-ward
      """WITH RECURSIVE nodes AS (SELECT doc_id v, n_chars FROM documents),
        |e AS (SELECT (v - 1) // 3 parent, v child FROM nodes WHERE v > 0),
        |pairs(anc, node) AS (
        |  SELECT v, v FROM nodes
        |  UNION ALL
        |  SELECT p.anc, e.child FROM pairs p JOIN e ON e.parent = p.node)
        |SELECT p.anc doc_id, cast(count(*) as bigint) subtree_size,
        |  cast(sum(n.n_chars) as bigint) subtree_chars
        |FROM pairs p JOIN nodes n ON n.v = p.node
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "t93_grid_neighbor_pairs" ->
      // brute force on purpose: certifies the grid blocking lossless
      """WITH p AS (SELECT c_custkey id,
        |    (c_custkey * 2654435761) % 10007 x,
        |    (c_custkey * 40503) % 10007 y
        |  FROM customer)
        |SELECT a.id id_a, b.id id_b, a.x - b.x dx, a.y - b.y dy,
        |  (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) d2
        |FROM p a JOIN p b ON a.id < b.id
        |WHERE abs(a.x - b.x) <= 50 AND abs(a.y - b.y) <= 50
        |ORDER BY id_a, id_b""".stripMargin)
}
