"""Property-based checks for the exact-recall dedup machinery: on
arbitrary corpora (dup-heavy, empty docs, single tokens), the
prefix-filter near-dup join, duplicated-span detection, and the
deletion-variant fuzzy join must agree exactly with their naive
quadratic references — recall 1 is a theorem, so ANY counterexample is
a bug, and hypothesis hunts the boundary cases (threshold-exact
Jaccard, spans touching doc edges, ties)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_workflows_spark.operators import dedup
from etl_workflows_spark.operators.fuzzy import fuzzy_self_pairs
from etl_workflows_spark.operators.spans import duplicated_spans

# small vocab → heavy shingle collisions → dense near-dup structure
_doc = st.lists(
    st.sampled_from("aa bb cc dd ee ff".split()), min_size=0, max_size=12
).map(" ".join)
_corpus = st.lists(_doc, min_size=2, max_size=8)

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _jaccard(a: str, b: str, n: int = 3) -> float:
    def sh(t):
        toks = t.split(" ")
        return {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }

    sa, sb = sh(a), sh(b)
    if not sa or not sb:
        return 0.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


@_SETTINGS
@given(corpus=_corpus, threshold=st.sampled_from([0.3, 0.5, 0.8, 1.0]))
def test_prefix_pairs_equal_naive_jaccard(spark, corpus, threshold):
    rows = [(i, t) for i, t in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.near_dup_pairs_prefix(df, threshold).collect()
    }
    want = {
        (i, j)
        for i, a in rows
        for j, b in rows
        if i < j and _jaccard(a, b) >= threshold
    }
    assert got == want


@_SETTINGS
@given(corpus=_corpus, length=st.sampled_from([2, 3]))
def test_spans_equal_naive_windows(spark, corpus, length):
    rows = [(i, t) for i, t in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        tuple(r) for r in duplicated_spans(df, min_len=length).collect()
    )
    # naive: duplicated L-window starts, merged islands
    occ: dict[str, list] = {}
    toks = {i: t.split(" ") for i, t in rows}
    for i, ts in toks.items():
        for p in range(len(ts) - length + 1):
            occ.setdefault(" ".join(ts[p : p + length]), []).append((i, p + 1))
    want = []
    per_doc: dict[int, set] = {}
    for w, ps in occ.items():
        if len(ps) >= 2:
            for d, p in ps:
                per_doc.setdefault(d, set()).add(p)
    for d, starts in per_doc.items():
        ss = sorted(starts)
        lo = hi = ss[0]
        for p in ss[1:]:
            if p == hi + 1:
                hi = p
            else:
                want.append((d, lo, hi + length - 1, hi + length - lo))
                lo = hi = p
        want.append((d, lo, hi + length - 1, hi + length - lo))
    assert got == sorted(want)


_name = st.text(alphabet="abc", min_size=0, max_size=6)


@_SETTINGS
@given(names=st.lists(_name, min_size=2, max_size=8), d=st.sampled_from([1, 2]))
def test_fuzzy_pairs_equal_naive_levenshtein(spark, names, d):
    rows = [(i, s) for i, s in enumerate(names)]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy_self_pairs(df, "id", "s", d).collect()
    }

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    want = {
        (i, j, lev(a, b))
        for i, a in rows
        for j, b in rows
        if i < j and lev(a, b) <= d
    }
    assert got == want


def test_incremental_uf_matches_distributed_clustering(spark):
    """Round-6: near_dup_incremental's gated driver union-find must pick
    the SAME survivors as the distributed min-label clustering on a
    dup-heavy batch — min-id per component, both paths. Checked against
    an empty index so only the within-batch step differentiates them."""
    import random

    from etl_workflows_spark.operators import dedup

    rng = random.Random(606)
    vocab = [f"w{i}" for i in range(60)]
    rows = []
    vid = 0
    groups = []
    for _ in range(12):
        base = " ".join(rng.choice(vocab) for _ in range(30))
        group = []
        for _ in range(rng.randrange(1, 4)):
            rows.append((vid, base + " " + rng.choice(vocab)))
            group.append(vid)
            vid += 1
        groups.append(group)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for t in ("ufeq_idx_bands", "ufeq_idx_sh"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    empty = spark.createDataFrame([], "doc_id long, text string")
    dedup.build_near_dup_index(empty, "ufeq_idx", n_buckets=4)
    uf_ids = {
        r["doc_id"]
        for r in dedup.near_dup_incremental(docs, "ufeq_idx", 0.5).collect()
    }
    dist_ids = {
        r["doc_id"]
        for r in dedup.dedup_near_duplicates(docs, 0.5).collect()
    }
    assert uf_ids == dist_ids
    # and the survivors are exactly the min ids of the LSH components —
    # a dup-heavy batch must actually collapse
    assert len(uf_ids) < len(rows)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        max_size=120,
    )
)
def test_driver_union_find_matches_dfs_components(edges):
    """driver_union_find == reference DFS components with min-id keepers,
    on arbitrary edge lists (self-loops, duplicates, any order)."""
    from etl_workflows_spark.operators.dedup import driver_union_find

    got = driver_union_find(edges)
    # reference: DFS components over the undirected graph
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want: dict = {}
    seen: set = set()
    for start in adj:
        if start in seen:
            continue
        comp, stack = [], [start]
        while stack:
            x = stack.pop()
            if x in seen:
                continue
            seen.add(x)
            comp.append(x)
            stack.extend(adj[x] - seen)
        lo = min(comp)
        for x in comp:
            if x != lo:
                want[x] = lo
    assert got == want
