"""Link-graph analytics for corpus curation: fixed-point PageRank.

Why this exists in a training-data engine: link-based authority is a
classic corpus-quality signal (a page's crawl priority / quality prior in
web-scale dataset construction — cf. the public PageRank formulation,
Page et al. 1999, and its use as a quality feature in C4/CCNet-style
pipelines). The operator takes ANY edge DataFrame, so the same code
scores URL link graphs, citation graphs, or the behavioral browse graph
derived from the events table.

Determinism contract: every rank is a fixed-point BIGINT (``scale`` =
1e12 by default) and every per-iteration update uses only integer
addition and integer (floor) division. Integer sums are
order-independent, so Spark's nondeterministic shuffle/combine order and
DuckDB's sequential order produce BIT-IDENTICAL ranks — the operator is
exact-oracle-checkable despite being iterative float-free math:

    r0[u]    = scale div N
    dangling = sum of r[u] over nodes with no out-edge
    inflow[v] = sum over distinct edges (u,v) of (r[u] div deg[u])
    r'[v]    = (tele_num * scale) div (100 * N)
               + (damp_num * (inflow[v] + dangling div N)) div 100

with damp_num = round(damping * 100), tele_num = 100 - damp_num. The
floor divisions bleed a few units of mass per iteration (total mass
drifts < iterations * (N + 100) units out of 1e12) — an accepted,
deterministic quantization, not an error term that compounds: ranks stay
within ~1e-9 relative of the float fixpoint at default scale.

Scale posture (100 TB graph): each iteration is ONE shuffle — the
edges ⋈ ranks join is keyed on src (co-partitionable with a bucketed
edge layout so only ranks move), the inflow groupBy on dst. Rank state
is localCheckpoint'ed per iteration to cut the lineage chain (same
discipline as dedup.cluster_duplicates). The dangling term is a single
scalar aggregate per iteration (one row to the driver — the benign
collect class VERDICT r3 cleared). Degrees are computed once, outside
the loop.

No reference counterpart (net-new per SURVEY.md §2.7's mandate); the
composition entry lives in queries/analytics.py (link_graph_pagerank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SCALE = 10**12


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """Fixed-point PageRank over a (src, dst) edge list.

    Returns (node, rank) with rank a BIGINT in units of 1/scale.
    Edges are deduplicated first (simple-graph semantics: out-degree is
    the count of DISTINCT successors). Nodes appearing only as
    destinations still receive rank; nodes with no out-edges contribute
    their mass uniformly to everyone (standard dangling-node fix).

    Bit-identical to :func:`pagerank_weighted` on unit weights over the
    deduplicated edges (deg == wt, and ``rank * 1 div wt`` is the same
    integer algebra as ``rank div deg``), so the unweighted form IS that
    call — one iteration loop to maintain instead of two copies.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    return pagerank_weighted(
        e.withColumn("weight", F.lit(1)),
        iterations=iterations,
        damping=damping,
        scale=scale,
    )


def pagerank_weighted(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    iterations: int = 5,
    damping: float = 0.85,
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """Weighted PageRank: a node's outflow splits proportionally to
    integer edge weights (e.g. transition counts) instead of uniformly —
    contribution over edge (u,v,w) is ``(r[u] * w) div W[u]`` with W[u]
    the node's total out-weight. Same fixed-point determinism contract
    as :func:`pagerank` (products r·w stay exact below 2^63 for weights
    up to ~9·10^6 at the default scale; parallel edges are pre-summed).
    """
    if iterations < 0:
        raise ValueError(f"iterations must be >= 0, got {iterations}")
    damp_num = round(damping * 100)
    if not 0 <= damp_num <= 100:
        raise ValueError(f"damping must be in [0, 1], got {damping}")
    tele_num = 100 - damp_num

    e = (
        edges.select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
            F.col(weight).cast("long").alias("w"),
        )
        # NULL endpoints are malformed edges, not nodes: they would
        # inflate N (diluting every real node's teleport share), absorb
        # mass as permanent dangling "nodes", and emit a NULL-node rank
        # row — and the oracle twins' SQL semantics diverge on them
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .filter(F.col("w") > 0)
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0).cast("long"))
    wtot = e.groupBy("src").agg(F.sum("w").alias("wt")).localCheckpoint(eager=True)

    # dangling membership is STATIC (a node either has out-edges or not),
    # so it is computed once and carried on the rank relation; the
    # per-iteration dangling MASS then rides the plan as a one-row
    # broadcast (BNLJ) instead of a driver collect — one Spark job per
    # iteration (the checkpoint) instead of two (guide §2.4/§5: the
    # driver does no data work, and the blocking collect is gone).
    marked = (
        nodes.join(
            wtot.select(F.col("src").alias("node"), F.lit(True).alias("__o")),
            "node",
            "left",
        )
        .select("node", F.col("__o").isNull().alias("__dang"))
        .localCheckpoint(eager=True)
    )
    r = marked.withColumn("rank", F.lit(scale // n).cast("long"))
    base = (tele_num * scale) // (100 * n)
    for _ in range(iterations):
        # integer algebra identical to the collected form: the dangling
        # share is floor(sum(rank over dangling) / n), ranks nonnegative
        dang = r.filter(F.col("__dang")).agg(
            F.coalesce(F.sum("rank"), F.lit(0)).alias("__dsum")
        )
        inflow = (
            e.join(r, e["src"] == r["node"])
            .join(wtot, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("(rank * w) div wt").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        r = (
            marked.join(inflow, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                "__dang",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damp_num} * (coalesce(inflow, 0)"
                        f" + (__dsum div {n}))) div 100"
                    )
                ).cast("long").alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return r.select("node", "rank")


def pagerank_personalized(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    iterations: int = 5,
    damping: float = 0.85,
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """Personalized PageRank: teleport (and dangling) mass flows to the
    SEED set instead of uniformly — ranks measure proximity to the seeds
    (the graph-retrieval / related-items primitive). Seeds outside the
    edge set are ignored; at least one seed must touch the graph.

    Fixed-point update (same determinism contract as :func:`pagerank`):

        r'[v] = [v ∈ S] · (tele_num·scale) div (100·|S|)
                + (damp_num · (inflow[v] + [v ∈ S]·(dangling div |S|)))
                  div 100
    """
    if iterations < 0:
        raise ValueError(f"iterations must be >= 0, got {iterations}")
    damp_num = round(damping * 100)
    if not 0 <= damp_num <= 100:
        raise ValueError(f"damping must be in [0, 1], got {damping}")
    tele_num = 100 - damp_num

    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    e = e.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0).cast("long"))
    s = (
        seeds.select(F.col(seed_col).alias("node"))
        .distinct()
        .join(nodes, "node", "left_semi")
        .localCheckpoint(eager=True)
    )
    n_seeds = s.count()
    if n_seeds == 0:
        raise ValueError("no seed touches the graph")
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint(eager=True)

    # seed AND dangling membership are static — mark both once; the
    # per-iteration dangling mass rides the plan as a one-row broadcast
    # (same no-driver-collect rewrite as pagerank_weighted's loop).
    marked = (
        nodes.join(s.withColumn("is_seed", F.lit(True)), "node", "left")
        .join(
            deg.select(F.col("src").alias("node"), F.lit(True).alias("__o")),
            "node",
            "left",
        )
        .select(
            "node",
            F.coalesce("is_seed", F.lit(False)).alias("is_seed"),
            F.col("__o").isNull().alias("__dang"),
        )
        .localCheckpoint(eager=True)
    )
    # all mass starts at the seeds (the standard PPR initialization)
    r = marked.select(
        "node",
        "__dang",
        F.when(F.col("is_seed"), F.lit(scale // n_seeds))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("rank"),
    )
    base = (tele_num * scale) // (100 * n_seeds)
    for _ in range(iterations):
        dang = r.filter(F.col("__dang")).agg(
            F.coalesce(F.sum("rank"), F.lit(0)).alias("__dsum")
        )
        inflow = (
            e.join(r, e["src"] == r["node"])
            .join(deg, "src")
            .select(F.col("dst").alias("node"), F.expr("rank div deg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        r = (
            marked.join(inflow, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                "__dang",
                (
                    F.when(F.col("is_seed"), F.lit(base)).otherwise(F.lit(0))
                    + F.expr(
                        f"({damp_num} * (coalesce(inflow, 0) + "
                        f"if(is_seed, __dsum div {n_seeds}, 0))) div 100"
                    )
                ).cast("long").alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return r.select("node", "rank")


def pagerank_personalized_oracle_sql(
    edges_sql: str,
    seeds_sql: str,
    iterations: int = 5,
    damping: float = 0.85,
    scale: int = DEFAULT_SCALE,
) -> str:
    """DuckDB twin of :func:`pagerank_personalized`. ``seeds_sql`` must
    select one column named ``node``."""
    damp_num = round(damping * 100)
    tele_num = 100 - damp_num
    parts = [
        f"WITH edges AS (SELECT DISTINCT src, dst FROM ({edges_sql})),",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),",
        f"seeds AS (SELECT DISTINCT node FROM ({seeds_sql}) "
        "WHERE node IN (SELECT node FROM nodes)),",
        "deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),",
        "ns AS (SELECT COUNT(*) AS n FROM seeds),",
        "marked AS (SELECT n.node, n.node IN (SELECT node FROM seeds) AS is_seed "
        "FROM nodes n),",
        f"r0 AS (SELECT node, CAST(CASE WHEN is_seed THEN "
        f"{scale} // (SELECT n FROM ns) ELSE 0 END AS BIGINT) AS rank "
        "FROM marked),",
    ]
    for i in range(iterations):
        p, c = f"r{i}", f"r{i + 1}"
        parts.append(
            f"d{i} AS (SELECT COALESCE(SUM(rank), 0) AS dang FROM {p} "
            f"WHERE NOT EXISTS (SELECT 1 FROM deg WHERE deg.src = {p}.node)),"
        )
        parts.append(
            f"{c} AS (SELECT m.node, CAST("
            f"CASE WHEN m.is_seed THEN ({tele_num} * {scale}) // "
            f"(100 * (SELECT n FROM ns)) ELSE 0 END + "
            f"({damp_num} * (COALESCE(i.inflow, 0) + "
            f"CASE WHEN m.is_seed THEN (SELECT dang FROM d{i}) // "
            f"(SELECT n FROM ns) ELSE 0 END)) // 100 "
            f"AS BIGINT) AS rank "
            f"FROM marked m LEFT JOIN ("
            f"SELECT e.dst AS node, SUM(r.rank // dg.deg) AS inflow "
            f"FROM edges e JOIN {p} r ON e.src = r.node "
            f"JOIN deg dg ON e.src = dg.src GROUP BY e.dst"
            f") i ON m.node = i.node),"
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(f"SELECT node, rank FROM r{iterations}")
    return "\n".join(parts)


def pagerank_weighted_oracle_sql(
    edges_sql: str,
    iterations: int = 5,
    damping: float = 0.85,
    scale: int = DEFAULT_SCALE,
) -> str:
    """DuckDB twin of :func:`pagerank_weighted`. ``edges_sql`` must
    select (src, dst, weight); parallel edges are pre-summed here too."""
    damp_num = round(damping * 100)
    tele_num = 100 - damp_num
    parts = [
        f"WITH edges AS (SELECT src, dst, SUM(w) AS w FROM "
        f"(SELECT src, dst, CAST(TRUNC(weight) AS BIGINT) AS w "
        f"FROM ({edges_sql})) WHERE w > 0 GROUP BY src, dst),",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),",
        "wtot AS (SELECT src, SUM(w) AS wt FROM edges GROUP BY src),",
        "nn AS (SELECT COUNT(*) AS n FROM nodes),",
        f"r0 AS (SELECT node, CAST({scale} // (SELECT n FROM nn) AS BIGINT) AS rank FROM nodes),",
    ]
    for i in range(iterations):
        p, c = f"r{i}", f"r{i + 1}"
        parts.append(
            f"d{i} AS (SELECT COALESCE(SUM(rank), 0) AS dang FROM {p} "
            f"WHERE NOT EXISTS (SELECT 1 FROM wtot WHERE wtot.src = {p}.node)),"
        )
        parts.append(
            f"{c} AS (SELECT n.node, CAST("
            f"({tele_num} * {scale}) // (100 * (SELECT n FROM nn)) + "
            f"({damp_num} * (COALESCE(i.inflow, 0) + "
            f"(SELECT dang FROM d{i}) // (SELECT n FROM nn))) // 100 "
            f"AS BIGINT) AS rank "
            f"FROM nodes n LEFT JOIN ("
            f"SELECT e.dst AS node, SUM((r.rank * e.w) // t.wt) AS inflow "
            f"FROM edges e JOIN {p} r ON e.src = r.node "
            f"JOIN wtot t ON e.src = t.src GROUP BY e.dst"
            f") i ON n.node = i.node),"
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(f"SELECT node, rank FROM r{iterations}")
    return "\n".join(parts)


def pagerank_oracle_sql(
    edges_sql: str,
    iterations: int = 5,
    damping: float = 0.85,
    scale: int = DEFAULT_SCALE,
) -> str:
    """The DuckDB twin of :func:`pagerank`, generated for a fixed
    iteration count: one CTE pair (dangling scalar + rank relation) per
    iteration, all-integer arithmetic, bit-identical to the Spark result.

    ``edges_sql`` must select two columns aliased ``src`` and ``dst``
    (duplicates allowed — deduped here, mirroring the operator).
    """
    damp_num = round(damping * 100)
    tele_num = 100 - damp_num
    parts = [
        f"WITH edges AS (SELECT DISTINCT src, dst FROM ({edges_sql})),",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),",
        "deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),",
        "nn AS (SELECT COUNT(*) AS n FROM nodes),",
        f"r0 AS (SELECT node, CAST({scale} // (SELECT n FROM nn) AS BIGINT) AS rank FROM nodes),",
    ]
    for i in range(iterations):
        p, c = f"r{i}", f"r{i + 1}"
        parts.append(
            f"d{i} AS (SELECT COALESCE(SUM(rank), 0) AS dang FROM {p} "
            f"WHERE NOT EXISTS (SELECT 1 FROM deg WHERE deg.src = {p}.node)),"
        )
        parts.append(
            f"{c} AS (SELECT n.node, CAST("
            f"({tele_num} * {scale}) // (100 * (SELECT n FROM nn)) + "
            f"({damp_num} * (COALESCE(i.inflow, 0) + "
            f"(SELECT dang FROM d{i}) // (SELECT n FROM nn))) // 100 "
            f"AS BIGINT) AS rank "
            f"FROM nodes n LEFT JOIN ("
            f"SELECT e.dst AS node, SUM(r.rank // dg.deg) AS inflow "
            f"FROM edges e JOIN {p} r ON e.src = r.node "
            f"JOIN deg dg ON e.src = dg.src GROUP BY e.dst"
            f") i ON n.node = i.node),"
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(f"SELECT node, rank FROM r{iterations}")
    return "\n".join(parts)


def browse_graph(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    page_expr: str = "cast(get_json_object(props, '$.k') as bigint)",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Behavioral link graph from an event log: one edge per consecutive
    (page → next page) transition within a user's timeline. The page id
    defaults to the ``props.k`` JSON attribute of the synthetic events
    table; pass any SQL expression for real schemas (url, screen id...).

    Scale: one window shuffle keyed on user (the natural partitioning of
    an event log); self-loops kept — PageRank dedups and they carry real
    revisit signal for degree.
    """
    from pyspark.sql.window import Window as W

    w = W.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    pages = events.select(
        F.col(user_col), F.col(ts_col), F.col(tiebreak_col),
        F.expr(page_expr).alias("__page"),
    ).filter(F.col("__page").isNotNull())
    return (
        pages.withColumn("__prev", F.lag("__page").over(w))
        .filter(F.col("__prev").isNotNull())
        .select(F.col("__prev").alias("src"), F.col("__page").alias("dst"))
    )


BROWSE_EDGES_SQL = """
SELECT prev AS src, page AS dst FROM (
  SELECT LAG(page) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
         page
  FROM (SELECT user_id, ts, event_id,
               CAST(props->>'$.k' AS BIGINT) AS page
        FROM events WHERE CAST(props->>'$.k' AS BIGINT) IS NOT NULL)
) WHERE prev IS NOT NULL
"""
