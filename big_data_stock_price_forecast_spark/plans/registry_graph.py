"""Graph-analytics query domain (edges from TPC-H/events).

Split mechanically from the monolithic plans/registry.py (r12);
statement order and text preserved verbatim.
"""
from __future__ import annotations

from .registry_common import *  # noqa: F401,F403 — the
# original monolith's prelude + shared helpers; underscore
# names are imported explicitly below
from .registry_common import (  # noqa: F401
    BFS_MAX_HOPS,
    DataFrame,
    F,
    JACCARD_TOPK,
    KCORE_K,
    KCORE_ROUNDS,
    LPA_ROUNDS,
    PR_DAMPING,
    PR_ITERS,
    SQL_COATTEND,
    SQL_PS_CAPPED,
    SparkSession,
    TRIANGLE_TOP_EDGES,
    TRI_TOPK,
    Window,
    _cap_part_degree,
    _coattendance,
    _rne,
    _sql_rne,
    load_table,
)



def q_graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source shortest hop distances over the supplier
    co-purchase graph (same top-K edge cut as the triangle query),
    seeded at the max-degree node (ties broken toward the smaller
    key) — the BFS/shortest-path member of the graph family. Engine side: frontier-expansion rounds (each
    one equi-join + min-aggregate, the CC machinery's shape) up to
    ``BFS_MAX_HOPS``; the toy-scale oracle is DuckDB's recursive CTE
    walk with the same cap. At 100 TB the frontier form is the only
    viable one — the CTE walk enumerates paths, not nodes. Hub parts
    above ``HUB_PART_MAX_DEGREE`` are dropped before the pair join
    (_cap_part_degree) so the projection fanout is bounded per key."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = _cap_part_degree(li.select("l_partkey", "l_suppkey").distinct())
    s1 = ps.select("l_partkey", F.col("l_suppkey").alias("sa"))
    s2 = ps.select("l_partkey", F.col("l_suppkey").alias("sb"))
    edges = (
        s1.join(s2, "l_partkey")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .orderBy(
            F.col("n_shared").desc(), F.col("sa").asc(), F.col("sb").asc()
        )
        .limit(TRIANGLE_TOP_EDGES)
        .select("sa", "sb")
    )
    und = edges.select(
        F.col("sa").alias("u"), F.col("sb").alias("v")
    ).unionByName(
        edges.select(F.col("sb").alias("u"), F.col("sa").alias("v"))
    )
    und = und.persist()
    # seed at the max-degree node (key tie-break): a min-key seed can
    # land in a tiny island of the top-K cut at larger SFs, making the
    # traversal degenerate
    seed = (
        und.groupBy("u")
        .agg(F.count(F.lit(1)).alias("deg"))
        .orderBy(F.col("deg").desc(), F.col("u").asc())
        .limit(1)
        .select("u", F.lit(0).alias("dist"))
    )
    dist = seed.localCheckpoint(eager=True)
    for hop in range(1, BFS_MAX_HOPS + 1):
        frontier = dist.filter(F.col("dist") == hop - 1)
        nxt = (
            frontier.join(und, "u")
            .select(F.col("v").alias("u"), F.lit(hop).alias("dist"))
            .distinct()
            .join(dist.select("u"), "u", "left_anti")
            .localCheckpoint(eager=True)
        )
        # early exit: an empty frontier means every reachable node has
        # its final distance — rounds past the eccentricity are pure
        # checkpoint overhead (the driver reads one scalar per round,
        # the CC operator's convergence contract)
        if not nxt.take(1):
            break
        dist = dist.unionByName(nxt).localCheckpoint(eager=True)
    und.unpersist()
    return dist.select(F.col("u").alias("s_suppkey"), "dist")


def _sql_graph_bfs() -> str:
    return f"""WITH RECURSIVE
ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
psc AS ({SQL_PS_CAPPED}),
edges AS (
  SELECT sa, sb FROM (
    SELECT a.l_suppkey AS sa, b.l_suppkey AS sb, count(*) AS n_shared
    FROM psc a JOIN psc b
      ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
    GROUP BY 1, 2
    ORDER BY n_shared DESC, sa ASC, sb ASC LIMIT {TRIANGLE_TOP_EDGES})),
und AS (
  SELECT sa AS u, sb AS v FROM edges
  UNION ALL SELECT sb, sa FROM edges),
walk(u, dist) AS (
  SELECT (SELECT u FROM (SELECT u, count(*) AS n FROM und GROUP BY 1
          ORDER BY n DESC, u ASC LIMIT 1)), 0
  UNION ALL
  SELECT e.v, w.dist + 1
  FROM walk w JOIN und e ON e.u = w.u
  WHERE w.dist < {BFS_MAX_HOPS})
SELECT u AS s_suppkey, CAST(min(dist) AS INT) AS dist
FROM walk GROUP BY 1"""


def q_graph_supplier_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the supplier co-purchase graph — the
    standard distributed-graph benchmark beside HITS and connected
    components. The graph: the ``TRIANGLE_TOP_EDGES`` strongest
    co-occurrence pairs of the bipartite part↔supplier projection
    (ranked by shared-part count with a key tie-break — an adaptive
    cut that stays non-degenerate at every SF where a fixed absolute
    threshold collapses to empty or complete). Triangles enumerate via
    the oriented two-path join (a<b<c ordering finds each triangle
    exactly once, the standard dedup-free formulation; the third edge
    closes as a LEFT SEMI probe); output is per-supplier triangle
    membership counts. At corpus scale the projection fanout is
    bounded by the ``HUB_PART_MAX_DEGREE`` df-cap (applied BEFORE the
    pair join — see _cap_part_degree), and the top-K cut keeps the
    triangle join edge-bounded."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = _cap_part_degree(li.select("l_partkey", "l_suppkey").distinct())
    s1 = ps.select("l_partkey", F.col("l_suppkey").alias("sa"))
    s2 = ps.select("l_partkey", F.col("l_suppkey").alias("sb"))
    edges = (
        s1.join(s2, "l_partkey")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .orderBy(
            F.col("n_shared").desc(), F.col("sa").asc(), F.col("sb").asc()
        )
        .limit(TRIANGLE_TOP_EDGES)
        .select("sa", "sb")
    )
    e1 = edges.select(F.col("sa").alias("a"), F.col("sb").alias("b"))
    e2 = edges.select(F.col("sa").alias("b2"), F.col("sb").alias("c"))
    e3 = edges.select(F.col("sa").alias("a3"), F.col("sb").alias("c3"))
    tri = (
        e1.join(e2, F.col("b") == F.col("b2"))
        .join(
            e3,
            (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")),
            "left_semi",
        )
        .select("a", "b", "c")
    )
    per_node = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("s_suppkey"))
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return per_node


SQL_GRAPH_TRIANGLES = f"""
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
psc AS ({SQL_PS_CAPPED}),
edges AS (
  SELECT sa, sb FROM (
    SELECT a.l_suppkey AS sa, b.l_suppkey AS sb, count(*) AS n_shared
    FROM psc a JOIN psc b
      ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
    GROUP BY 1, 2
    ORDER BY n_shared DESC, sa ASC, sb ASC LIMIT {TRIANGLE_TOP_EDGES})),
tri AS (
  SELECT e1.sa AS a, e1.sb AS b, e2.sb AS c
  FROM edges e1
  JOIN edges e2 ON e1.sb = e2.sa
  JOIN edges e3 ON e3.sa = e1.sa AND e3.sb = e2.sb),
members AS (
  SELECT a AS s_suppkey FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri)
SELECT s_suppkey, count(*) AS n_triangles FROM members GROUP BY 1"""


def q_graph_hits_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two HITS power iterations over the supplier↔part bipartite graph
    derived from lineitem — the iterative graph-algebra probe (beside
    the connected-components operator in operators/dedup.py). All
    scores stay INTEGER: hub₀ = 1, auth₁(p) = degree, hub₁(s) =
    Σ_p auth₁, auth₂(p) = Σ_s hub₁ — the unnormalized power-iteration
    algebra, so no float normalization order can perturb the result.
    The edge list dedups once on (part, supp); each half-iteration is
    one keyed aggregate + one equi-join, alternating between the
    partkey and suppkey exchanges (at cluster scale each re-use rides
    AQE's shuffle reuse). Top-50 by final authority, partkey
    tie-break."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select("l_partkey", "l_suppkey").distinct()
    auth1 = edges.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("a1")
    )
    hub1 = (
        edges.join(auth1, "l_partkey")
        .groupBy("l_suppkey")
        .agg(F.sum("a1").alias("h1"))
    )
    auth2 = (
        edges.join(hub1, "l_suppkey")
        .groupBy("l_partkey")
        .agg(F.sum("h1").alias("a2"))
    )
    return (
        auth2.join(auth1, "l_partkey")
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("a1").alias("degree"),
            F.col("a2").alias("authority"),
        )
        .orderBy(F.col("authority").desc(), F.col("p_partkey").asc())
        .limit(50)
    )


SQL_GRAPH_HITS = """
WITH edges AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
auth1 AS (SELECT l_partkey, count(*) AS a1 FROM edges GROUP BY 1),
hub1 AS (SELECT l_suppkey, sum(a1) AS h1
         FROM edges JOIN auth1 USING (l_partkey) GROUP BY 1),
auth2 AS (SELECT l_partkey, sum(h1) AS a2
          FROM edges JOIN hub1 USING (l_suppkey) GROUP BY 1)
SELECT l_partkey AS p_partkey, a1 AS degree,
       CAST(a2 AS BIGINT) AS authority
FROM auth2 JOIN auth1 USING (l_partkey)
ORDER BY authority DESC, p_partkey ASC LIMIT 50"""


def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, ``PR_ITERS`` unrolled power iterations)
    over the capped supplier co-purchase graph — the canonical
    distributed-graph benchmark beside HITS/triangles/BFS/CC. Each
    iteration is one equi-join + one keyed aggregate (the CC/BFS
    shape); the graph is the same ``HUB_PART_MAX_DEGREE``-capped
    top-K edge cut as the rest of the family. Float discipline: every
    per-edge contribution pr(u)/deg(u) snaps to the 1e-9 grid and
    sums in exact DECIMAL(28,9) (summation order cannot perturb it);
    the damped combine then re-snaps, so both engines walk identical
    score sequences with no tolerance anywhere. Iterations are
    unrolled into the one lazy plan — at this depth no checkpoint is
    needed, and at cluster scale each round reuses the node-key
    exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = _cap_part_degree(li.select("l_partkey", "l_suppkey").distinct())
    s1 = ps.select("l_partkey", F.col("l_suppkey").alias("sa"))
    s2 = ps.select("l_partkey", F.col("l_suppkey").alias("sb"))
    edges = (
        s1.join(s2, "l_partkey")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .orderBy(
            F.col("n_shared").desc(), F.col("sa").asc(), F.col("sb").asc()
        )
        .limit(TRIANGLE_TOP_EDGES)
        .select("sa", "sb")
    )
    # materialize the (top-K, tiny) edge list once: the unrolled
    # rounds reference it 2x each, and without the checkpoint every
    # reference replays the full bipartite projection + top-K cut
    edges = edges.coalesce(1).localCheckpoint(eager=True)
    und = edges.select(
        F.col("sa").alias("u"), F.col("sb").alias("v")
    ).unionByName(
        edges.select(F.col("sb").alias("u"), F.col("sa").alias("v"))
    )
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n"))
    snap9 = lambda c: F.floor(c * 1e9 + F.lit(0.5)) / 1e9  # noqa: E731
    d = PR_DAMPING
    # pr frame: (u, pr); seed 1/N
    pr = deg.crossJoin(F.broadcast(n_nodes)).select(
        "u", snap9(F.lit(1.0) / F.col("n")).alias("pr")
    )
    for _ in range(PR_ITERS):
        contrib = (
            und.join(pr, "u")
            .join(deg, "u")
            .select(
                F.col("v").alias("u"),
                snap9(F.col("pr") / F.col("deg"))
                .cast("decimal(28,9)")
                .alias("c"),
            )
        )
        sums = contrib.groupBy("u").agg(F.sum("c").alias("s"))
        # dangling-free by construction (every node in und has deg>=1),
        # but nodes receiving no contribution this round still need a
        # row: rebuild from deg with a left join
        pr = (
            deg.join(sums, "u", "left")
            .crossJoin(F.broadcast(n_nodes))
            .select(
                "u",
                snap9(
                    (1.0 - d) / F.col("n")
                    + d * F.coalesce(F.col("s").cast("double"), F.lit(0.0))
                ).alias("pr"),
            )
        )
    return pr.select(F.col("u").alias("s_suppkey"), _rne(F.col("pr"), "pagerank", 9))


def _sql_graph_pagerank() -> str:
    d = PR_DAMPING
    snap9 = lambda e: f"floor(({e}) * 1000000000.0 + 0.5) / 1000000000.0"  # noqa: E731
    steps = []
    prev = "pr0"
    for i in range(1, PR_ITERS + 1):
        steps.append(f"""c{i} AS (
  SELECT e.v AS u,
         CAST({snap9(f'p.pr / dg.deg')} AS DECIMAL(28,9)) AS c
  FROM und e JOIN {prev} p ON p.u = e.u JOIN deg dg ON dg.u = e.u),
s{i} AS (SELECT u, sum(c) AS s FROM c{i} GROUP BY 1),
pr{i} AS (
  SELECT dg.u,
         {snap9(
             f'(1.0 - {d}) / nn.n + {d} * '
             f'coalesce(CAST(s.s AS DOUBLE), 0.0)'
         )} AS pr
  FROM deg dg LEFT JOIN s{i} s ON s.u = dg.u CROSS JOIN nn)""")
        prev = f"pr{i}"
    body = ",\n".join(steps)
    return f"""
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
psc AS ({SQL_PS_CAPPED}),
edges AS (
  SELECT sa, sb FROM (
    SELECT a.l_suppkey AS sa, b.l_suppkey AS sb, count(*) AS n_shared
    FROM psc a JOIN psc b
      ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
    GROUP BY 1, 2
    ORDER BY n_shared DESC, sa ASC, sb ASC LIMIT {TRIANGLE_TOP_EDGES})),
und AS (
  SELECT sa AS u, sb AS v FROM edges
  UNION ALL SELECT sb, sa FROM edges),
deg AS (SELECT u, count(*) AS deg FROM und GROUP BY 1),
nn AS (SELECT count(*) AS n FROM deg),
pr0 AS (SELECT u, {snap9('1.0 / nn.n')} AS pr FROM deg CROSS JOIN nn),
{body}
SELECT u AS s_suppkey,
       {_sql_rne(f'{prev}.pr', 'pagerank', 9)}
FROM {prev}"""


def q_graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic–Adar link prediction over the user–item bipartite graph
    (item = (event_type, day, ⌊value⌋) co-attendance — fine enough
    that item degree stays bounded as the corpus grows, the property
    any blocking key needs at scale): for user pairs sharing items,
    AA = Σ_shared 1/ln(df_item) — the inverted-log-degree
    common-neighbor score. Hub items (df > 16) are cut BEFORE pair
    expansion — the same df-cap discipline as the MinHash inverted
    index (work ∝ Σ df² stays bounded; hubs contribute the least AA
    weight by construction, 1/ln(df)) — and singleton items (df < 2)
    produce no pairs. Determinism: each item weight snaps to the
    1e-12 grid and per-pair sums ride exact DECIMAL, so the top-25
    ranking (aa DESC, u1, u2) is order-free; ln(integer df) is one
    identical IEEE op in both engines. One distinct + one windowed
    df + one self-join on item (shuffle key = item, skew bounded by
    the cap). Item construction + df cap live in ``_coattendance``
    (shared with the LPA/Jaccard queries)."""
    d = _coattendance(spark, sf_dir).withColumn(
        "wq",
        F.floor(F.lit(1e12) / F.log(F.col("df").cast("double")) + F.lit(0.5))
        .cast("decimal(38,0)"),
    )
    a = d.select(
        F.col("user_id").alias("u1"), "item", "wq"
    )
    b = d.select(F.col("user_id").alias("u2"), "item")
    pairs = a.join(b, "item").filter(F.col("u1") < F.col("u2"))
    aa = pairs.groupBy("u1", "u2").agg(
        F.sum("wq").alias("aaq"),
        F.count(F.lit(1)).alias("n_shared"),
    )
    # global top-k via orderBy+limit → TakeOrderedAndProject (map-side
    # partial top-k per input partition, then one k-row merge); an
    # unpartitioned row_number window would sort EVERY pair in one
    # task — InferWindowGroupLimit doesn't fire on an empty partition
    # spec (plan-pinned in tests/test_plans2.py). The rank window then
    # runs over 25 rows.
    top = aa.orderBy(
        F.col("aaq").desc(), F.col("u1").asc(), F.col("u2").asc()
    ).limit(25)
    top = top.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(
                F.col("aaq").desc(), F.col("u1").asc(), F.col("u2").asc()
            )
        ),
    )
    return top.select(
        "rank",
        "u1",
        "u2",
        F.col("n_shared").cast("long").alias("n_shared"),
        _rne(F.col("aaq").cast("double") / F.lit(1e12), "aa", 8),
    )


def _sql_graph_adamic_adar() -> str:
    return f"""
WITH {SQL_COATTEND},
d AS (
  SELECT user_id, item,
         floor(1000000000000.0 / ln(df::DOUBLE) + 0.5)::DECIMAL(38,0) AS wq
  FROM dca),
aa AS (
  SELECT a.user_id AS u1, b.user_id AS u2,
         sum(a.wq) AS aaq, count(*) AS n_shared
  FROM d a JOIN d b ON a.item = b.item AND a.user_id < b.user_id
  GROUP BY 1, 2),
top AS (
  SELECT row_number() OVER (ORDER BY aaq DESC, u1 ASC, u2 ASC) AS rank,
         u1, u2, n_shared, aaq
  FROM aa)
SELECT rank, u1, u2, n_shared::BIGINT AS n_shared,
       {_sql_rne('aaq::DOUBLE / 1000000000000.0', 'aa', 8)}
FROM top WHERE rank <= 25"""


def q_graph_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation (3 unrolled rounds) over the same
    degree-bounded co-attendance graph as graph_adamic_adar — the
    cheap community detector a graph pipeline runs before anything
    spectral: labels start as user ids; each round every node adopts
    the most frequent label among its NEIGHBORS (tie-break: count
    desc, label asc — fully deterministic, no self-vote). Each round
    is one edge-label join + one (node, label) count + one windowed
    argmax — three rounds unrolled as shuffles on the node key; state
    per node is ONE label, never the history. The oracle unrolls the
    identical three rounds as chained CTEs. Item construction + df
    cap live in ``_coattendance`` (shared with adamic_adar/jaccard)."""
    und, lab = _lpa_labels(spark, sf_dir)
    return lab.select(
        F.col("node").alias("user_id"), F.col("label").alias("community")
    )


def _lpa_labels(spark: SparkSession, sf_dir: str):
    """(und, lab): the symmetric co-attendance edge list and the final
    3-round LPA label per node — shared by q_graph_lpa_communities and
    q_graph_modularity (one definition of the community structure)."""
    d = _coattendance(spark, sf_dir)
    a = d.select(F.col("user_id").alias("u"), "item")
    b = d.select(F.col("user_id").alias("v"), "item")
    und = (
        a.join(b, "item")
        .filter(F.col("u") != F.col("v"))
        .select("u", "v")
        .distinct()
    )
    und = und.localCheckpoint(eager=True)  # consumed once per round
    lab = (
        und.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    wpick = Window.partitionBy("dst").orderBy(
        F.col("cnt").desc(), F.col("label").asc()
    )
    for _ in range(LPA_ROUNDS):
        msgs = und.join(lab, F.col("u") == F.col("node")).select(
            F.col("v").alias("dst"), "label"
        )
        cnt = msgs.groupBy("dst", "label").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        lab = (
            cnt.withColumn("rk", F.row_number().over(wpick))
            .filter(F.col("rk") == 1)
            .select(F.col("dst").alias("node"), "label")
        )
    return und, lab


def _sql_graph_lpa_communities() -> str:
    rounds = []
    prev = "l0"
    for r in range(1, LPA_ROUNDS + 1):
        rounds.append(f"""
m{r} AS (
  SELECT e.v AS dst, l.label, count(*) AS cnt
  FROM e JOIN {prev} l ON e.u = l.node GROUP BY 1, 2),
l{r} AS (
  SELECT dst AS node, label FROM (
    SELECT dst, label,
           row_number() OVER (PARTITION BY dst
                              ORDER BY cnt DESC, label ASC) AS rk
    FROM m{r})
  WHERE rk = 1)""")
        prev = f"l{r}"
    body = ",".join(rounds)
    return f"""
WITH {SQL_COATTEND},
e AS (
  SELECT DISTINCT a.user_id AS u, b.user_id AS v
  FROM dca a JOIN dca b ON a.item = b.item AND a.user_id <> b.user_id),
l0 AS (SELECT DISTINCT u AS node, u AS label FROM e),{body}
SELECT node AS user_id, label AS community FROM l{LPA_ROUNDS}"""


def q_graph_jaccard_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor Jaccard link prediction over the shared
    df-capped co-attendance graph (``_coattendance`` — same blocking
    key and hub cut as adamic_adar/lpa, one definition per engine):
    J(u1,u2) = |items∩| / |items∪| for user pairs sharing ≥1 item,
    union = deg(u1) + deg(u2) − inter over the CAPPED item set (the
    only set the pair join can see — stated, not hidden). All-integer
    inputs; the ranking key is one IEEE division of exact longs,
    identical in both engines; global top-25 via orderBy+limit →
    TakeOrderedAndProject (the r10/r11 top-k discipline), rank window
    over the survivors only."""
    d = _coattendance(spark, sf_dir)
    deg = d.groupBy("user_id").agg(F.count(F.lit(1)).alias("deg"))
    a = d.select(F.col("user_id").alias("u1"), "item")
    b = d.select(F.col("user_id").alias("u2"), "item")
    inter = (
        a.join(b, "item")
        .filter(F.col("u1") < F.col("u2"))
        .groupBy("u1", "u2")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    j = (
        inter.join(deg.withColumnRenamed("user_id", "u1"), "u1")
        .withColumnRenamed("deg", "deg1")
        .join(deg.withColumnRenamed("user_id", "u2"), "u2")
        .withColumnRenamed("deg", "deg2")
        .withColumn(
            "un", F.col("deg1") + F.col("deg2") - F.col("inter")
        )
        .withColumn(
            "jac",
            F.col("inter").cast("double") / F.col("un").cast("double"),
        )
    )
    top = j.orderBy(
        F.col("jac").desc(), F.col("u1").asc(), F.col("u2").asc()
    ).limit(JACCARD_TOPK)
    w = Window.orderBy(
        F.col("jac").desc(), F.col("u1").asc(), F.col("u2").asc()
    )
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select(
            "rank",
            "u1",
            "u2",
            F.col("inter").cast("long").alias("inter"),
            F.col("un").cast("long").alias("un"),
            _rne(F.col("jac"), "jaccard", 8),
        )
    )


def _sql_graph_jaccard_links() -> str:
    return f"""
WITH {SQL_COATTEND},
deg AS (SELECT user_id, count(*) AS deg FROM dca GROUP BY 1),
inter AS (
  SELECT a.user_id AS u1, b.user_id AS u2, count(*) AS inter
  FROM dca a JOIN dca b ON a.item = b.item AND a.user_id < b.user_id
  GROUP BY 1, 2),
j AS (
  SELECT u1, u2, inter, d1.deg + d2.deg - inter AS un,
         inter::DOUBLE / (d1.deg + d2.deg - inter)::DOUBLE AS jac
  FROM inter
  JOIN deg d1 ON d1.user_id = u1
  JOIN deg d2 ON d2.user_id = u2),
top AS (
  SELECT row_number() OVER (ORDER BY jac DESC, u1 ASC, u2 ASC) AS rank,
         u1, u2, inter, un, jac
  FROM j)
SELECT rank, u1, u2, inter::BIGINT AS inter, un::BIGINT AS un,
       {_sql_rne('jac', 'jaccard', 8)}
FROM top WHERE rank <= {JACCARD_TOPK}"""


def q_graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle census + local clustering coefficient over
    the projected user–user graph induced by the shared df-capped
    co-attendance frame (``_coattendance`` — same blocking key and
    hub cut as adamic_adar/lpa/jaccard, one definition per engine).
    Triangles are enumerated once each with the id-oriented wedge
    join (a<b<c): wedge = E(a,b)⋈E(b,c) closed against E(a,c) — the
    standard distributed triangle algorithm; because the item df cap
    bounds the projected degree, the wedge expansion stays work-
    bounded as the corpus grows (∝ Σ deg², deg ≤ Σ df per user's
    capped items). cc(u) = 2·tri(u)/(deg(u)·(deg(u)−1)) — integer
    inputs, one identical IEEE expression per engine. Global top-25
    by (tri DESC, user_id) via orderBy+limit → TakeOrderedAndProject
    (the r10/r11 top-k discipline), rank window over survivors only."""
    d = _coattendance(spark, sf_dir)
    a = d.select(F.col("user_id").alias("u1"), "item")
    b = d.select(F.col("user_id").alias("u2"), "item")
    edges = (
        a.join(b, "item")
        .filter(F.col("u1") < F.col("u2"))
        .select("u1", "u2")
        .distinct()
        # five consumers (two wedge sides, the closing join, both deg
        # orientations): pin the df-capped edge list once instead of
        # replaying the co-attendance self-join per reference
        .localCheckpoint(eager=True)
    )
    wedge = edges.select(
        F.col("u1").alias("a"), F.col("u2").alias("b")
    ).join(
        edges.select(F.col("u1").alias("b"), F.col("u2").alias("c")),
        "b",
    )
    tri = wedge.join(
        edges.select(F.col("u1").alias("a"), F.col("u2").alias("c")),
        ["a", "c"],
    )
    per = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("user_id"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("tri"))
    )
    deg = (
        edges.select(F.col("u1").alias("user_id"))
        .unionAll(edges.select(F.col("u2").alias("user_id")))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    dd = F.col("deg").cast("double")
    j = per.join(deg, "user_id").withColumn(
        "cc",
        F.when(
            F.col("deg") >= 2,
            (F.lit(2.0) * F.col("tri").cast("double"))
            / (dd * (dd - F.lit(1.0))),
        ),
    )
    top = j.orderBy(F.col("tri").desc(), F.col("user_id").asc()).limit(
        TRI_TOPK
    )
    w = Window.orderBy(F.col("tri").desc(), F.col("user_id").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank",
        "user_id",
        F.col("tri").cast("long").alias("tri"),
        F.col("deg").cast("long").alias("deg"),
        _rne(F.col("cc"), "cc", 8),
    )


def _sql_graph_triangle_count() -> str:
    return f"""
WITH {SQL_COATTEND},
edges AS (
  SELECT DISTINCT a.user_id AS u1, b.user_id AS u2
  FROM dca a JOIN dca b ON a.item = b.item AND a.user_id < b.user_id),
tri AS (
  SELECT w.a, w.b, w.c
  FROM (SELECT e1.u1 AS a, e1.u2 AS b, e2.u2 AS c
        FROM edges e1 JOIN edges e2 ON e1.u2 = e2.u1) w
  JOIN edges e3 ON e3.u1 = w.a AND e3.u2 = w.c),
per AS (
  SELECT user_id, count(*) AS tri FROM (
    SELECT a AS user_id FROM tri
    UNION ALL SELECT b AS user_id FROM tri
    UNION ALL SELECT c AS user_id FROM tri)
  GROUP BY 1),
deg AS (
  SELECT user_id, count(*) AS deg FROM (
    SELECT u1 AS user_id FROM edges
    UNION ALL SELECT u2 AS user_id FROM edges)
  GROUP BY 1),
j AS (
  SELECT p.user_id, p.tri, d.deg,
         CASE WHEN d.deg >= 2 THEN (2.0 * p.tri::DOUBLE)
              / (d.deg::DOUBLE * (d.deg::DOUBLE - 1.0)) END AS cc
  FROM per p JOIN deg d ON p.user_id = d.user_id),
top AS (
  SELECT row_number() OVER (ORDER BY tri DESC, user_id ASC) AS rank,
         user_id, tri, deg, cc
  FROM j)
SELECT rank, user_id, tri::BIGINT AS tri, deg::BIGINT AS deg,
       {_sql_rne('cc', 'cc', 8)}
FROM top WHERE rank <= {TRI_TOPK}"""


def q_graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the user co-attendance graph — the
    one-number mixing summary (r > 0: hubs attach to hubs, the
    resilient-core topology; r < 0: hub-and-spoke, the topology where
    hub loss partitions the graph) next to the per-node triangle /
    Jaccard / AA cards on the SAME ``_coattendance`` projection.
    Edges come from the df-capped item self-join (work ∝ Σ df²,
    bounded); each undirected edge appears in both orientations so
    deg(u) is ONE count window per orientation (no node-table join),
    and Pearson's r over the (deg_u, deg_v) edge ends rides exact
    DECIMAL moments of integers — the only float ops are the final
    ratio and mean. Output is a single row."""
    d = _coattendance(spark, sf_dir)
    a = d.select(F.col("user_id").alias("u1"), "item")
    b = d.select(F.col("user_id").alias("u2"), "item")
    edges = (
        a.join(b, "item")
        .filter(F.col("u1") != F.col("u2"))
        .select("u1", "u2")
        .distinct()
    )
    dx = F.count(F.lit(1)).over(Window.partitionBy("u1"))
    dy = F.count(F.lit(1)).over(Window.partitionBy("u2"))
    e = edges.select(
        dx.cast("decimal(38,0)").alias("dx"),
        dy.cast("decimal(38,0)").alias("dy"),
        F.col("u1"),
    )
    agg = e.agg(
        F.count(F.lit(1)).alias("m2"),
        F.countDistinct("u1").alias("n_nodes"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
    )
    md = F.col("m2").cast("decimal(38,0)")
    covn = (md * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vxn = (md * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vyn = (md * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    r = F.when(
        (vxn > 0) & (vyn > 0), covn / F.sqrt(vxn) / F.sqrt(vyn)
    )
    return agg.select(
        F.col("n_nodes").cast("long").alias("n_nodes"),
        (F.col("m2") / F.lit(2)).cast("long").alias("n_edges"),
        _rne(
            F.col("sx").cast("double") / F.col("m2").cast("double"),
            "mean_deg",
            8,
        ),
        _rne(r, "assortativity", 8),
    )


def _sql_graph_assortativity() -> str:
    return f"""WITH {SQL_COATTEND},
edges AS (
  SELECT DISTINCT a.user_id AS u1, b.user_id AS u2
  FROM dca a JOIN dca b ON a.item = b.item AND a.user_id <> b.user_id),
e AS (
  SELECT u1,
         count(*) OVER (PARTITION BY u1)::DECIMAL(38,0) AS dx,
         count(*) OVER (PARTITION BY u2)::DECIMAL(38,0) AS dy
  FROM edges),
agg AS (
  SELECT count(*) AS m2, count(DISTINCT u1) AS n_nodes,
         sum(dx) AS sx, sum(dy) AS sy, sum(dx * dx) AS sxx,
         sum(dy * dy) AS syy, sum(dx * dy) AS sxy
  FROM e)
SELECT n_nodes::BIGINT AS n_nodes, (m2 // 2)::BIGINT AS n_edges,
       {_sql_rne('sx::DOUBLE / m2::DOUBLE', 'mean_deg', 8)},
       {_sql_rne(
           'CASE WHEN (m2::DECIMAL(38,0) * sxx - sx * sx)::DOUBLE > 0'
           ' AND (m2::DECIMAL(38,0) * syy - sy * sy)::DOUBLE > 0 THEN'
           ' (m2::DECIMAL(38,0) * sxy - sx * sy)::DOUBLE'
           ' / sqrt((m2::DECIMAL(38,0) * sxx - sx * sx)::DOUBLE)'
           ' / sqrt((m2::DECIMAL(38,0) * syy - sy * sy)::DOUBLE) END',
           'assortativity', 8)}
FROM agg"""


def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-round k-core peel (k=3, 3 rounds) of the co-attendance
    projection — the density filter that separates a cohesive core
    from hangers-on before any community/centrality pass (LPA on the
    full graph wastes its rounds on degree-1 fringe). Each round
    recomputes degrees with ONE count window per orientation (the
    edge list carries both, so no node-table join — the
    assortativity device) and drops edges with an under-k end;
    3 rounds is a FIXED bound (the full fixpoint is data-dependent —
    same bounded-unroll convention as LPA/PageRank), and nodes are
    labeled with their round-0 degree, post-peel degree, and core
    membership. Work per round is edge-list-sized and shrinks
    monotonically; df-capped items bound the starting size."""
    d = _coattendance(spark, sf_dir)
    a = d.select(F.col("user_id").alias("u1"), "item")
    b = d.select(F.col("user_id").alias("u2"), "item")
    edges = (
        a.join(b, "item")
        .filter(F.col("u1") != F.col("u2"))
        .select("u1", "u2")
        .distinct()
        # two consumers (deg0 and the peel chain): pin once
        .localCheckpoint(eager=True)
    )
    deg0 = edges.withColumn(
        "deg0", F.count(F.lit(1)).over(Window.partitionBy("u1"))
    ).select("u1", "deg0").distinct()
    e = edges
    for _ in range(KCORE_ROUNDS):
        e = (
            e.withColumn(
                "d1", F.count(F.lit(1)).over(Window.partitionBy("u1"))
            )
            .withColumn(
                "d2", F.count(F.lit(1)).over(Window.partitionBy("u2"))
            )
            .filter(
                (F.col("d1") >= KCORE_K) & (F.col("d2") >= KCORE_K)
            )
            .select("u1", "u2")
        )
    deg3 = e.groupBy("u1").agg(F.count(F.lit(1)).alias("deg_final"))
    out = deg0.join(deg3, "u1", "left")
    return out.select(
        F.col("u1").alias("user_id"),
        F.col("deg0").cast("long").alias("deg0"),
        F.coalesce(F.col("deg_final"), F.lit(0))
        .cast("long")
        .alias("deg_final"),
        (F.col("deg_final").isNotNull()).cast("int").alias("in_core"),
    )


def _sql_graph_kcore() -> str:
    k = KCORE_K
    rounds = []
    prev = "edges"
    for i in range(1, KCORE_ROUNDS + 1):
        rounds.append(f"""e{i} AS (
  SELECT u1, u2 FROM (
    SELECT u1, u2,
           count(*) OVER (PARTITION BY u1) AS d1,
           count(*) OVER (PARTITION BY u2) AS d2
    FROM {prev})
  WHERE d1 >= {k} AND d2 >= {k})""")
        prev = f"e{i}"
    chain = ",\n".join(rounds)
    return f"""WITH {SQL_COATTEND},
edges AS (
  SELECT DISTINCT a.user_id AS u1, b.user_id AS u2
  FROM dca a JOIN dca b ON a.item = b.item AND a.user_id <> b.user_id),
deg0 AS (
  SELECT DISTINCT u1, count(*) OVER (PARTITION BY u1) AS deg0
  FROM edges),
{chain},
degf AS (SELECT u1, count(*) AS deg_final FROM {prev} GROUP BY 1)
SELECT deg0.u1 AS user_id, deg0::BIGINT AS deg0,
       coalesce(deg_final, 0)::BIGINT AS deg_final,
       (deg_final IS NOT NULL)::INT AS in_core
FROM deg0 LEFT JOIN degf ON deg0.u1 = degf.u1"""


def q_graph_cc_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-component size distribution of the user co-attendance
    graph — the macro-structure card the per-node views (degree,
    triangles, k-core) can't give: one giant component = one social
    universe; many mid-size islands = segmented markets, and the
    histogram is what a partitioner needs to co-locate communities.
    Components come from the shared hash-min `connected_components`
    operator (pointer-doubling label propagation, O(log diameter)
    rounds, single-task union-find fast path below the edge
    threshold — the doc_dup_clusters device on a different graph);
    the oracle states the same fixpoint as a recursive reachability
    CTE. Output: (component_size → n_components) — bounded by the
    number of DISTINCT sizes, plus nodes-in-size for the share
    column."""
    from ..operators.dedup import connected_components

    d = _coattendance(spark, sf_dir)
    a = d.select(F.col("user_id").alias("u1"), "item")
    b = d.select(F.col("user_id").alias("u2"), "item")
    edges = (
        a.join(b, "item")
        .filter(F.col("u1") < F.col("u2"))
        .select("u1", "u2")
        .distinct()
    )
    comp = connected_components(edges, "u1", "u2")
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("size")
    )
    ntot = sizes.agg(F.sum("size").alias("nt"))
    hist = sizes.groupBy("size").agg(
        F.count(F.lit(1)).alias("n_components")
    ).crossJoin(F.broadcast(ntot))
    return hist.select(
        F.col("size").cast("long").alias("component_size"),
        F.col("n_components").cast("long").alias("n_components"),
        _rne(
            (F.col("size") * F.col("n_components")).cast("double")
            / F.col("nt").cast("double"),
            "node_share",
            8,
        ),
    )


def _sql_graph_cc_sizes() -> str:
    return f"""WITH RECURSIVE {SQL_COATTEND},
pairs AS (
  SELECT DISTINCT a.user_id AS u1, b.user_id AS u2
  FROM dca a JOIN dca b ON a.item = b.item
    AND a.user_id < b.user_id),
edges AS (
  SELECT u1 AS src, u2 AS dst FROM pairs
  UNION
  SELECT u2 AS src, u1 AS dst FROM pairs),
r AS (
  SELECT src AS node, src AS lbl FROM edges
  UNION
  SELECT e.dst AS node, r.lbl AS lbl FROM r JOIN edges e ON e.src = r.node),
comp AS (SELECT node, min(lbl) AS component FROM r GROUP BY node),
sizes AS (SELECT component, count(*) AS size FROM comp GROUP BY 1),
nt AS (SELECT sum(size) AS nt FROM sizes)
SELECT size::BIGINT AS component_size,
       count(*)::BIGINT AS n_components,
       {_sql_rne(
           '(size * count(*))::DOUBLE / any_value(nt.nt)::DOUBLE',
           'node_share', 8)}
FROM sizes CROSS JOIN nt
GROUP BY size"""


def q_graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the 3-round LPA partition — the quality
    score that tells you whether the communities the cheap detector
    found are real structure or noise: Q = Σ_c (e_c/m − (d_c/2m)²)
    over the SAME df-capped co-attendance graph and the SAME label
    chain as graph_lpa_communities (shared ``_lpa_labels`` — one
    definition per engine). All counts are exact longs; each
    community's term is a single IEEE expression snapped to the 1e-12
    grid and summed in DECIMAL, so community iteration order cannot
    perturb Q. Cost: two label joins over the edge list + one
    community aggregate — nothing quadratic."""
    und, lab = _lpa_labels(spark, sf_dir)
    # three consumers (both edge-end label joins + n_nodes): pin the
    # 3-round label chain once instead of replaying it per reference
    lab = lab.localCheckpoint(eager=True)
    lu = lab.select(F.col("node").alias("u"), F.col("label").alias("cu"))
    lv = lab.select(F.col("node").alias("v"), F.col("label").alias("cv"))
    e = und.join(lu, "u").join(lv, "v")
    m2 = e.agg(F.count(F.lit(1)).alias("m2"))  # 2m directed half-edges
    deg = e.groupBy("u", "cu").agg(F.count(F.lit(1)).alias("deg"))
    dsum = deg.groupBy("cu").agg(F.sum("deg").alias("dc"))
    intra = (
        e.filter(F.col("cu") == F.col("cv"))
        .groupBy("cu")
        .agg(F.count(F.lit(1)).alias("ec2"))  # intra counted both ways
    )
    terms = (
        dsum.join(intra, "cu", "left")
        .crossJoin(F.broadcast(m2))
        .select(
            "cu",
            (
                F.coalesce(F.col("ec2"), F.lit(0)).cast("double")
                / F.col("m2").cast("double")
                - (F.col("dc").cast("double") / F.col("m2").cast("double"))
                * (F.col("dc").cast("double") / F.col("m2").cast("double"))
            ).alias("t"),
        )
    )
    snap12 = (F.floor(F.col("t") * 1e12 + F.lit(0.5)) / 1e12).cast(
        "decimal(30,12)"
    )
    agg = terms.select(snap12.alias("ts")).agg(
        F.count(F.lit(1)).alias("n_communities"),
        F.sum("ts").alias("q"),
    )
    n_nodes = lab.agg(F.count(F.lit(1)).alias("n_nodes"))
    return (
        agg.crossJoin(F.broadcast(n_nodes))
        .crossJoin(F.broadcast(m2))
        .select(
            F.col("n_nodes").cast("long").alias("n_nodes"),
            (F.col("m2") / 2).cast("long").alias("n_edges"),
            F.col("n_communities").cast("long").alias("n_communities"),
            _rne(F.col("q").cast("double"), "modularity", 10),
        )
    )


def _sql_graph_modularity() -> str:
    rounds = []
    prev = "l0"
    for r in range(1, LPA_ROUNDS + 1):
        rounds.append(f"""
m{r} AS (
  SELECT e.v AS dst, l.label, count(*) AS cnt
  FROM e JOIN {prev} l ON e.u = l.node GROUP BY 1, 2),
l{r} AS (
  SELECT dst AS node, label FROM (
    SELECT dst, label,
           row_number() OVER (PARTITION BY dst
                              ORDER BY cnt DESC, label ASC) AS rk
    FROM m{r})
  WHERE rk = 1)""")
        prev = f"l{r}"
    body = ",".join(rounds)
    return f"""
WITH {SQL_COATTEND},
e AS (
  SELECT DISTINCT a.user_id AS u, b.user_id AS v
  FROM dca a JOIN dca b ON a.item = b.item AND a.user_id <> b.user_id),
l0 AS (SELECT DISTINCT u AS node, u AS label FROM e),{body},
el AS (
  SELECT e.u, e.v, lu.label AS cu, lv.label AS cv
  FROM e JOIN l{LPA_ROUNDS} lu ON e.u = lu.node
         JOIN l{LPA_ROUNDS} lv ON e.v = lv.node),
tw AS (SELECT count(*) AS m2 FROM el),
dsum AS (
  SELECT cu, count(*) AS dc FROM el GROUP BY 1),
intra AS (
  SELECT cu, count(*) AS ec2 FROM el WHERE cu = cv GROUP BY 1),
terms AS (
  SELECT d.cu,
         CAST(floor((coalesce(i.ec2, 0)::DOUBLE / tw.m2
                     - (d.dc::DOUBLE / tw.m2) * (d.dc::DOUBLE / tw.m2))
                    * 1e12 + 0.5) / 1e12 AS DECIMAL(30,12)) AS ts
  FROM dsum d LEFT JOIN intra i USING (cu) CROSS JOIN tw),
agg AS (
  SELECT count(*) AS n_communities, sum(ts) AS q FROM terms)
SELECT (SELECT count(*) FROM l{LPA_ROUNDS})::BIGINT AS n_nodes,
       (SELECT m2 // 2 FROM tw)::BIGINT AS n_edges,
       n_communities::BIGINT AS n_communities,
       {_sql_rne('q::DOUBLE', 'modularity', 10)}
FROM agg"""
