"""Deduplication operators: exact, shingle-Jaccard, MinHash+LSH, SimHash.

The scale story (this is the 100 TB core of a training-data pipeline):

* **Exact** — hash-groupBy on a fingerprint; one shuffle on md5(text),
  map-side partial aggregation collapses duplicates early.
* **Shingle-Jaccard brute force** — exact ground truth; O(n²) pairs, only
  for modest n or within LSH candidate buckets. This is the oracle-checked
  reference implementation.
* **MinHash + LSH** — the scale path: per-doc k-minhash signature (md5-based,
  fully deterministic, reproducible in any engine), banded into buckets; a
  self-join *within buckets only* yields candidate pairs which are then
  verified with exact Jaccard. Shuffle cost is O(n·bands) instead of O(n²);
  recall is tunable by (k, bands). cf. Broder, "On the resemblance and
  containment of documents" (1997) — public algorithm.
* **SimHash** — per-doc integer fingerprint whose Hamming distance bounds
  cosine similarity of the token multiset; near-dup candidates share the
  fingerprint (or a band of it). cf. Charikar (2002).

Everything is built from Catalyst array/higher-order expressions — no
row-at-a-time Python UDFs anywhere. The one Python touchpoint is the
prefix join's order construction (``_cms_prefix_rows``): an
Arrow-batched numpy kernel that sorts each shingle set against a
broadcast count-min sketch, replacing three full-corpus shuffles with
one map-only pass (same precedent as similarity.py's matmul kernels).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.storagelevel import StorageLevel

from etl_workflows_spark.operators.cache import SCRATCH_LEVEL

# --- shared shingle / signature expressions --------------------------------


def _tokens(text_col: str) -> Column:
    return F.split(F.col(text_col), " ")


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct n-token shingles from a *materialized* token-array column.

    Guarded for docs with < n tokens (Spark's ``sequence(0, -1)`` would
    produce a *descending* sequence, not an empty one)."""
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
            ),
        )
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def shingles(text_col: str = "text", n: int = 3) -> Column:
    """Distinct n-token shingles of a document.

    NOTE: every ``element_at`` reference inside the transform lambda
    re-evaluates the embedded ``split`` (no common-subexpression reuse
    inside higher-order functions), so for anything hot, project the token
    array into a column first and use ``shingles_from_tokens`` — measured
    ~10× cheaper on the documents corpus."""
    return shingles_from_tokens(_tokens(text_col), n)


def _shingled(docs: DataFrame, text_col: str, n: int, hashed: bool) -> DataFrame:
    """doc_id + non-empty shingle set, with tokens materialized once.

    The hashed variant (the scale path) avoids per-element ``element_at``
    lambdas entirely: tokens are hashed to longs, then n-gram windows come
    from ``slice`` + ``arrays_zip`` (non-lambda builtins) and one cheap
    ``xxhash64(n longs)`` per shingle — measured ~8× faster than the
    string-concat construction on the documents corpus. (Higher-order
    lambdas are interpreted, not codegen'd; keep per-element work minimal.)
    """
    if not hashed:
        return (
            docs.select("doc_id", _tokens(text_col).alias("__toks"))
            .select("doc_id", shingles_from_tokens(F.col("__toks"), n).alias("sh"))
            .filter(F.size("sh") > 0)
        )
    ht = F.transform(_tokens(text_col), lambda t: F.xxhash64(t))
    # Filter < n-token docs BEFORE slicing: F.slice with a negative length
    # throws at runtime (it does not return empty), and when()-guards don't
    # help because both branches evaluate. Such docs have no shingles and
    # are out of scope anyway.
    with_ht = docs.select("doc_id", ht.alias("ht")).filter(F.size("ht") >= n)
    m = F.size("ht") - (n - 1)
    z = F.arrays_zip(*[F.slice(F.col("ht"), j + 1, m) for j in range(n)])
    with_z = with_ht.select("doc_id", z.alias("z"))
    sh = F.array_distinct(
        F.transform(F.col("z"), lambda s: F.xxhash64(*[s[str(j)] for j in range(n)]))
    )
    return with_z.select("doc_id", sh.alias("sh")).filter(F.size("sh") > 0)


def minhash_signature(shingle_col: Column, k: int = 8) -> Column:
    """k-element MinHash signature: sig[s] = min over shingles of
    md5(s || ':' || shingle).

    md5 hex compares lexicographically as a uniform hash → deterministic
    and engine-independent (any engine with md5 reproduces it bit-for-bit).
    """
    return F.array(
        *[
            F.array_min(
                F.transform(
                    shingle_col, lambda sh: F.md5(F.concat(F.lit(f"{s}:"), sh))
                )
            )
            for s in range(k)
        ]
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays.

    NOTE: evaluates the intersect twice (no CSE across a projection) — in
    hot verification loops materialize the intersect size once and use
    ``jaccard_from_sizes`` instead.
    """
    inter = F.size(F.array_intersect(a, b)).cast("double")
    return inter / (F.size(a) + F.size(b) - F.size(F.array_intersect(a, b)))


def jaccard_from_sizes(inter: Column, size_a: Column, size_b: Column) -> Column:
    """Jaccard from a pre-materialized intersection size (pay the
    array_intersect exactly once per pair)."""
    return inter.cast("double") / (size_a + size_b - inter)


# --- operators -------------------------------------------------------------


def dedup_exact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup groups: fingerprint → keeper (min doc_id) + group size."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("fp"))
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def soft_dedup_weights(
    docs: DataFrame, text_col: str = "text", scheme: str = "inverse"
) -> DataFrame:
    """Duplicate-aware sampling weights instead of removal (soft dedup,
    cf. SoftDeDup, ACL 2024: down-weighting repeated text beats dropping
    it when duplicates carry signal about natural data frequency).

    Appends (n_copies, weight) to every row, keyed on the exact md5
    fingerprint of ``text_col``:

    - ``scheme='inverse'`` — weight 1/n: every DISTINCT text contributes
      total mass 1 regardless of copy count (the hard-dedup equilibrium,
      but spread over all copies so shard-local sampling stays uniform).
    - ``scheme='sqrt'`` — weight 1/sqrt(n): duplicated text keeps extra
      mass sqrt(n), a soft prior that frequent text is somewhat more
      valuable (the usual temperature-style compromise).

    Scale shape: ONE shuffle — a count window partitioned by the
    fingerprint (groupBy + join-back would pay the fingerprint shuffle
    twice). Weights are 1/n with n an exact count, so values are
    correctly-rounded IEEE doubles — bit-identical on any engine, which
    keeps the operator value-hash oracle-checkable.

    Net-new operator (no reference counterpart; north-star mandate
    SURVEY.md §2.7).
    """
    if scheme not in ("inverse", "sqrt"):
        raise ValueError(f"scheme must be 'inverse' or 'sqrt', got {scheme!r}")
    # materialize the count once, derive the weight from the column —
    # two .over() expressions plan as two Sort+Exchange+Window pairs
    # (the second window spec is a fresh md5 instance Catalyst won't
    # unify), while this shape is the single-window plan
    counted = docs.withColumn(
        "n_copies",
        F.count(F.lit(1)).over(Window.partitionBy(F.md5(F.col(text_col)))),
    )
    n = F.col("n_copies")
    w = (
        F.lit(1.0) / n if scheme == "inverse"
        else F.lit(1.0) / F.sqrt(n.cast("double"))
    )
    return counted.withColumn("weight", w)


def drop_exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep one row per distinct text (the min doc_id), drop the rest.

    Window-free formulation: groupBy + self-join back would shuffle twice;
    a min-keyed semi join keeps it to one agg + one broadcast-able join at
    the dup-group cardinality.
    """
    keepers = dedup_exact(docs, text_col).select(
        F.col("keeper_doc_id").alias("doc_id")
    )
    return docs.join(keepers, "doc_id", "left_semi")


def near_dup_pairs_exact(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    materialize: bool = True,
) -> DataFrame:
    """Ground-truth near-dup pairs by exact shingle Jaccard (O(n²)).

    Only for modest row counts or within LSH buckets — the oracle-checked
    reference implementation the LSH path is measured against.
    ``materialize`` persists the shingled relation so the self-join scans
    it once instead of re-shingling per side; the cache backs the returned
    lazy DataFrame, so releasing it is the caller's responsibility (pass
    ``materialize=False`` in long-lived sessions that can't manage it).
    """
    t = _shingled(docs, text_col, n, hashed=False)
    if materialize:
        t = t.persist(StorageLevel.MEMORY_AND_DISK)
    a = t.alias("a")
    b = t.alias("b")
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh"))).alias("__i"),
            F.size("a.sh").alias("__sa"),
            F.size("b.sh").alias("__sb"),
        )
        .select(
            "doc_a",
            "doc_b",
            jaccard_from_sizes(F.col("__i"), F.col("__sa"), F.col("__sb")).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _lsh_bands(t: DataFrame, k: int = 16, bands: int = 4) -> DataFrame:
    """(doc_id, band, bucket) LSH band rows from a hashed shingled
    relation (doc_id, sh: array<bigint>).

    Signatures via explode + groupBy-min instead of per-array transform
    lambdas: higher-order lambdas are interpreted row-at-a-time, while
    the exploded form keeps all k hash computations and the min
    aggregation inside whole-stage codegen (measured ~2× faster at
    sf0.1). Scale: map-side partial aggregation collapses each doc's
    shingles to one k-long row before the shuffle, so the exchange
    carries one row per doc — same as the array form.
    """
    if bands < 1 or k % bands != 0:
        raise ValueError(
            f"k must be a positive multiple of bands, got k={k} bands="
            f"{bands} — a remainder would compute minhashes that never "
            "band (silently changing the 1-(1-j^w)^b recall the "
            "parameters promise), and bands > k makes empty bands"
        )
    rows_per_band = k // bands
    ex = t.select("doc_id", F.explode("sh").alias("h"))
    mins = ex.groupBy("doc_id").agg(
        *[F.min(F.xxhash64(F.lit(s), F.col("h"))).alias(f"__m{s}") for s in range(k)]
    )
    return mins.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.col(f"__m{b * rows_per_band + r}")
                                for r in range(rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")


def near_dup_pairs_lsh(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    text_col: str = "text",
    materialize: bool = True,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """MinHash+LSH near-dup pairs: candidates from banded signature buckets,
    verified with exact Jaccard over hashed shingle sets.

    Scale design (this is the 100 TB dedup path):

    * shingles are hashed to 64-bit ints once (``xxhash64`` — JVM-side,
      far cheaper than md5; determinism is engine-local, which is fine
      because this operator's contract is approximate and its exact twin
      ``near_dup_pairs_exact`` carries the cross-engine oracle);
    * k minhashes come from re-hashing the shingle hash with the seed —
      k×|shingles| cheap integer hashes per doc, no string ops;
    * band width w=k/bands sets the volume/recall trade:
      P(candidate | j) = 1-(1-j^w)^bands. Default k=16, 4 bands of width 4
      admits ~0.6 % of j=0.2 background pairs but catches 98.6 % at j=0.9.
      On corpora with high baseline similarity a narrow band would admit
      nearly every pair and reintroduce the O(n²) this exists to avoid;
    * candidate pairs travel as (id, id) only — shingle arrays are joined
      back *after* the pair dedup, so the band-explode shuffle never
      carries payload arrays;
    * ``materialize`` persists the shingled relation (MEMORY_AND_DISK —
      spillable, lineage kept for fault recovery, unlike a checkpoint):
      the plan scans it three times (signatures + both verify sides), and
      re-shingling per scan measured ~3× the pair-join cost at sf0.1.
      **Cache lifecycle**: the persisted relation backs the *returned*
      (lazy) DataFrame, so this function cannot release it; callers that
      run many LSH passes in one long-lived session should pass a
      pre-persisted ``shingled`` relation and unpersist it once the result
      is consumed (``dedup_near_duplicates`` does exactly that).

    ``shingled`` lets the caller supply (and own) the shingled relation
    — (doc_id, sh: array<bigint>) as produced by hashed ``_shingled``.
    """
    if shingled is not None:
        t = shingled
    else:
        t = _shingled(docs, text_col, n, hashed=True)
        if materialize:
            t = t.persist(StorageLevel.MEMORY_AND_DISK)
    banded = _lsh_bands(t, k, bands)

    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    verified = (
        candidates.join(
            t.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")),
            "doc_a",
        )
        .join(
            t.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).alias("__i"),
            F.size("sh_a").alias("__sa"),
            F.size("sh_b").alias("__sb"),
        )
        .select(
            "doc_a",
            "doc_b",
            jaccard_from_sizes(F.col("__i"), F.col("__sa"), F.col("__sb")).alias(
                "jaccard"
            ),
        )
    )
    return verified.filter(F.col("jaccard") >= threshold)


# --- simhash ---------------------------------------------------------------

_HEX = "0123456789abcdef"


def simhash_bits(text_col: str = "text", bits: int = 16) -> Column:
    """``bits``-wide SimHash over distinct tokens (1 ≤ bits ≤ 62 so the
    fingerprint stays a non-negative BIGINT).

    bit b of md5(token) votes +1/-1; fingerprint bit b is 1 when the
    vote is positive. Bits decode from the first ceil(bits/4) hex
    nibbles of the md5 — portable to any engine with md5 + string ops.
    Width is the corpus-size knob: candidate volume in the banded
    near-dup join is ~n²/2^(bits/(r+1)) per band, so web-scale corpora
    want 48-64 bits (Manku et al. run 64) while 16 keeps oracle SQL
    small for fixture-sized tests.

    Shape: one ``transform`` hashes each distinct token ONCE, one
    ``aggregate`` folds all ``bits`` counters (+ the token count) in a
    single array pass, and the finish lambda assembles the fingerprint
    from the bound accumulator. The per-bit formulation this replaced
    re-ran md5 inside ``bits`` separate ``filter`` passes — HOF lambdas
    are interpreted, so Catalyst never CSE'd the repeated hashing
    (measured 2× at bits=16 on the sf0.1 corpus fingerprint pass:
    2.06 → 1.05 s).
    """
    if not 1 <= bits <= 62:
        raise ValueError(f"bits must be in [1, 62], got {bits}")
    nibbles = (bits + 3) // 4
    # NULL text must fingerprint as 0 (empty vote), not NULL: a NULL
    # array poisons the whole fold, and NULL fingerprints silently drop
    # out of every banding join — matching the per-bit formulation this
    # replaced and the DuckDB _simhash_oracle (CASE ... ELSE 0)
    toks = F.array_distinct(
        F.coalesce(_tokens(text_col), F.array().cast("array<string>"))
    )
    # md5 once per token; bits decode from the nibble prefix
    hs = F.transform(toks, lambda x: F.substring(F.md5(x), 1, nibbles))
    zero = F.array(*([F.lit(0).cast("long")] * (bits + 1)))
    weights = F.array(*[F.lit(2**b).cast("long") for b in range(bits)])

    def _bits_plus_one(h: Column) -> Column:
        return F.array(
            *[
                F.shiftright(
                    (
                        F.instr(F.lit(_HEX), F.substring(h, 1 + b // 4, 1)) - 1
                    ).cast("long"),
                    b % 4,
                )
                % 2
                for b in range(bits)
            ],
            F.lit(1).cast("long"),
        )

    def _finish(acc: Column) -> Column:
        total = F.element_at(acc, bits + 1)
        return F.aggregate(
            F.zip_with(
                F.slice(acc, 1, bits),
                weights,
                lambda c, w: F.when(c * 2 > total, w)
                .otherwise(F.lit(0))
                .cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda a, v: a + v,
        )

    return F.aggregate(
        hs,
        zero,
        lambda acc, h: F.zip_with(acc, _bits_plus_one(h), lambda a, v: a + v),
        _finish,
    )


def simhash16(text_col: str = "text") -> Column:
    """The fixture-width (16-bit) SimHash — see ``simhash_bits``."""
    return simhash_bits(text_col, 16)


def _simhash_kernel_udf(bits: int):
    """Arrow kernel twin of ``simhash_bits`` — md5-exact by construction.

    The Catalyst fold is interpreted higher-order work: per distinct
    token it runs ``bits`` instr/substring/shiftright expressions plus a
    (bits+1)-element zip_with accumulate, none of it codegen'd (guide
    §4.2: hand whole batches to vectorized native code instead). Here
    each distinct token's md5 runs once through hashlib (C) with a
    per-TASK memo (iterator-form pandas_udf, so the memo amortizes over
    every batch of the partition — guide §4.5), the hex prefix decodes
    to the same little-endian-nibble bit pattern the expression read
    (``bit b = (nibble[b//4] >> (b%4)) & 1`` ⇔ bit b of
    ``int(hex[:nibbles][::-1], 16)``), and the per-document ±1 votes
    collapse to one ``np.add.reduceat`` over the stacked token-bit
    matrix. NULL/NaN text fingerprints as 0 (the expression's coalesce
    to an empty vote), '' keeps its single empty-string token — both
    pinned by tests against ``simhash_bits`` and by the DuckDB oracle.
    """
    from typing import Iterator

    import pandas as pd

    nibbles = (bits + 3) // 4

    def sh(batches):
        from hashlib import md5

        import numpy as np

        shifts = np.arange(bits, dtype=np.uint64)
        weights = (np.uint64(1) << shifts).astype(np.int64)
        memo: dict = {}

        def nof(tok: str) -> int:
            v = memo.get(tok)
            if v is None:
                v = int(
                    md5(tok.encode("utf-8")).hexdigest()[:nibbles][::-1], 16
                )
                memo[tok] = v
            return v

        for s in batches:
            flat: list = []
            sizes: list = []
            for t in s:
                if not isinstance(t, str):
                    sizes.append(0)  # NULL text → empty vote → 0
                    continue
                uniq = dict.fromkeys(t.split(" "))
                flat.extend(map(nof, uniq))
                sizes.append(len(uniq))
            out = np.zeros(len(sizes), dtype=np.int64)
            sizes_arr = np.array(sizes, dtype=np.int64)
            nz = sizes_arr > 0
            if nz.any():
                Ns = np.array(flat, dtype=np.uint64)
                bitmat = ((Ns[:, None] >> shifts[None, :]) & np.uint64(1))
                starts = np.zeros(len(sizes_arr), dtype=np.int64)
                np.cumsum(sizes_arr[:-1], out=starts[1:])
                counts = np.add.reduceat(bitmat, starts[nz], axis=0).astype(
                    np.int64
                )
                fp = (weights[None, :] * (2 * counts > sizes_arr[nz, None])).sum(
                    axis=1
                )
                out[nz] = fp
            yield pd.Series(out)

    # real typing objects (the module's `from __future__ import
    # annotations` would stringify inline hints against names that are
    # local to this factory, breaking pandas_udf's eval-type inference)
    sh.__annotations__ = {
        "batches": Iterator[pd.Series],
        "return": Iterator[pd.Series],
    }
    return F.pandas_udf(sh, "long")


def simhash_fingerprints(
    docs: DataFrame, text_col: str = "text", bits: int = 16
) -> DataFrame:
    from etl_workflows_spark.operators.parallelism import widen

    # Arrow kernel, not the in-plan fold: md5-exact twin, ~vectorized
    # per-task work (see _simhash_kernel_udf); a compact single-split
    # corpus must not compute it serially, hence widen
    return widen(docs).select(
        "doc_id", _simhash_kernel_udf(bits)(F.col(text_col)).alias("simhash")
    )


def driver_union_find(edges) -> dict:
    """Min-root union-find over an iterable of (a, b) edges → a
    ``{member: component_min}`` map for every node that is NOT its
    component's minimum (roots are absent — they keep themselves).

    The driver-side twin of ``cluster_duplicates``' min-label fixpoint,
    used behind bounded collect gates by ``near_dup_incremental`` and
    ``similarity._semantic_verdicts``: unions always attach the larger
    root under the smaller, so every component's root IS its min id —
    identical keeper semantics to the distributed path."""
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent if find(x) != x}


def cluster_duplicates(pairs: DataFrame, max_iterations: int = 20) -> DataFrame:
    """Connected components over a near-dup pair graph → (doc_id, cluster).

    Iterative min-label propagation: every node adopts the smallest label
    among itself and its neighbors until fixpoint. Each iteration is one
    join + one aggregation (both shuffles on doc_id); lineage is truncated
    per iteration with ``localCheckpoint`` so the plan doesn't grow
    unboundedly. Converges in O(diameter) iterations — near-dup graphs are
    overwhelmingly tiny cliques, so 2-3 in practice.

    ``pairs`` needs columns (doc_a, doc_b); output assigns every vertex
    that appears in any pair. (Singletons never enter the graph — they're
    their own cluster by definition and don't need rows.)

    Storage discipline: each dropped iteration's checkpoint blocks are
    released immediately (cache.release_checkpoint) — waiting on the
    ContextCleaner turns bounded scratch into an unbounded-looking pile.
    The RETURNED labels are checkpoint-backed; they free via the
    ContextCleaner once the result is dropped, or deterministically via
    ``cache.release_checkpoint`` when the caller is done.
    """
    from etl_workflows_spark.operators.cache import release_checkpoint

    edges = pairs.select("doc_a", "doc_b")
    # undirected: both directions
    sym = edges.union(
        edges.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # Persisting sym matters doubly: every iteration joins against it, and
    # without the cache each join would re-run the whole upstream pair
    # pipeline (LSH candidate generation + verification) from scratch.
    labels = (
        sym.select(F.col("doc_a").alias("id"))
        .distinct()
        .withColumn("cluster", F.col("id"))
    )
    converged = False
    prev_ckpt = None
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.doc_b == labels.id)
            .groupBy(F.col("doc_a").alias("id"))
            .agg(F.min("cluster").alias("nbr_min"))
        )
        # carry the previous label through the checkpoint so the
        # convergence check is a SCAN of the freshly-materialized 8-byte
        # rows, not another join job per iteration
        new_ckpt = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("cluster"), F.coalesce(F.col("nbr_min"), F.col("cluster"))
                ).alias("cluster"),
                F.col("cluster").alias("__prev"),
            )
            # memory-first level, NOT SCRATCH_LEVEL: this loop releases
            # each iteration's blocks deterministically below, so the
            # scratch is bounded and the next iteration's re-read should
            # not pay a disk round-trip
            .localCheckpoint(eager=True)
        )
        changed = (
            new_ckpt.filter(F.col("cluster") != F.col("__prev"))
            .limit(1)
            .count()
        )
        # the previous iteration's checkpoint has now served its last
        # read (the neighbor_min above) — free its blocks NOW; release
        # the CHECKPOINTED frame, not the column-pruned view of it
        if prev_ckpt is not None:
            release_checkpoint(prev_ckpt)
        prev_ckpt = new_ckpt
        labels = new_ckpt.select("id", "cluster")
        if changed == 0:
            converged = True
            break
    # labels is localCheckpoint'd (no lineage into sym) — safe to release.
    sym.unpersist()
    if not converged:
        # Silent non-convergence would split one true component into
        # several labels and leave duplicates in the corpus — fail loudly.
        raise RuntimeError(
            f"cluster_duplicates did not converge in {max_iterations} "
            "iterations (a duplicate chain longer than max_iterations "
            "exists); raise max_iterations"
        )
    return labels.select(F.col("id").alias("doc_id"), "cluster")


def _cluster_losers(pairs: "DataFrame") -> "DataFrame":
    """Checkpoint-backed LOSER ids (every non-min member of each
    duplicate component) from a (doc_a, doc_b) pair graph: distributed
    min-label clustering + min-id keeper per component, with the
    clustering's label checkpoints released once the losers are
    materialized. Shared by ``dedup_near_duplicates`` and
    ``near_dup_incremental``'s gate-overflow path so keeper semantics
    cannot drift between the batch and incremental forms."""
    from etl_workflows_spark.operators.cache import release_all_checkpoints

    clusters = cluster_duplicates(pairs)
    losers = (
        clusters.groupBy("cluster")
        .agg(F.min("doc_id").alias("keeper"))
        .join(clusters, "cluster")
        .filter(F.col("doc_id") != F.col("keeper"))
        .select("doc_id")
        .localCheckpoint(eager=True, storageLevel=SCRATCH_LEVEL)
    )
    release_all_checkpoints(clusters)
    return losers


def dedup_near_duplicates(
    docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    method: str = "lsh",
    **lsh_kwargs,
) -> DataFrame:
    """End-to-end near-dedup: candidate pairs → duplicate clusters → keep
    the min-doc_id representative of each cluster, drop the rest.

    This is the full 100 TB dedup recipe: scalable candidate generation,
    exact verification, component clustering, one anti-join.
    ``method='lsh'`` (default) generates candidates with banded MinHash —
    O(n·bands) shuffle, recall tunable by (k, bands); ``method='prefix'``
    uses the prefix filter (near_dup_pairs_prefix) — recall EXACTLY 1, so
    the end-to-end result equals the O(n²) ground-truth dedup.

    Owns ALL intermediate storage end-to-end: the persisted shingled
    relation is released once clustering has consumed the pair graph,
    clustering releases its per-iteration checkpoints as it goes, and the
    cluster labels are condensed into a loser-id checkpoint (duplicate
    ids only — the small side) so the labels' storage is freed before
    returning. The returned DataFrame depends on that one loser
    checkpoint; it frees via the ContextCleaner when the result is
    dropped, or deterministically via ``cache.release_checkpoint`` once
    the caller has consumed the result.
    """
    from etl_workflows_spark.operators.cache import release_all_checkpoints

    if method not in ("lsh", "prefix"):
        raise ValueError(f"method must be 'lsh' or 'prefix', got {method!r}")
    n = lsh_kwargs.pop("n", 3)
    t = _shingled(docs, text_col, n, hashed=True).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    if method == "prefix":
        pairs = near_dup_pairs_prefix(
            docs, threshold, n=n, text_col=text_col, shingled=t
        )
    else:
        pairs = near_dup_pairs_lsh(
            docs, threshold, n=n, text_col=text_col, shingled=t, **lsh_kwargs
        )
    losers = _cluster_losers(pairs)
    t.unpersist()
    return docs.join(losers, "doc_id", "left_anti")


def dedup_embedding_cosine(
    embeddings: DataFrame,
    docs: DataFrame,
    threshold: float = 0.95,
    emb_id: str = "vec_id",
    doc_id: str = "doc_id",
    method: str = "exact",
) -> DataFrame:
    """Embedding-cosine near-dup dedup: semantic duplicates share a
    high-cosine embedding pair even when their text diverges.

    Pairs come from ``similarity.similar_pairs_bruteforce``
    (``method="exact"``, the oracle twin) or the banded hyperplane-LSH
    join with corpus-sized parameters (``method="banded"`` — the scale
    path, candidates linear in n via ``banded_lsh_params``); clustering
    and keep-one reuse the same machinery as textual dedup — the pair
    graph is the interface.
    """
    from etl_workflows_spark.operators import similarity

    if method == "exact":
        raw = similarity.similar_pairs_bruteforce(
            embeddings, threshold=threshold, id_col=emb_id
        )
    elif method == "banded":
        n_planes, bands = similarity.banded_lsh_params(
            embeddings.count(), threshold
        )
        raw = similarity.similar_pairs_banded(
            embeddings,
            threshold=threshold,
            n_planes=n_planes,
            bands=bands,
            id_col=emb_id,
        )
    else:
        raise ValueError(f"method must be 'exact' or 'banded', got {method!r}")
    pairs = raw.select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )
    clusters = cluster_duplicates(pairs)
    losers = (
        clusters.groupBy("cluster")
        .agg(F.min("doc_id").alias("keeper"))
        .join(clusters, "cluster")
        .filter(F.col("doc_id") != F.col("keeper"))
        .select(F.col("doc_id").alias(doc_id))  # caller's doc-id column name
        .localCheckpoint(eager=True, storageLevel=SCRATCH_LEVEL)
    )
    from etl_workflows_spark.operators.cache import release_all_checkpoints

    release_all_checkpoints(clusters)
    return docs.join(losers, doc_id, "left_anti")


def near_dup_pairs_simhash(
    docs: DataFrame,
    max_hamming: int = 1,
    text_col: str = "text",
    bits: int = 16,
) -> DataFrame:
    """SimHash near-dup pairs within ``max_hamming`` bits — EXACT recall
    at every radius via pigeonhole banding.

    Candidate generation splits the ``bits``-wide fingerprint into
    ``max_hamming + 1`` contiguous blocks and equi-joins on each block:
    a pair within Hamming distance r differs in at most r blocks, so by
    pigeonhole at least one of the r+1 blocks is bit-identical and the
    pair surfaces as a candidate. Every candidate is then verified with
    the exact ``bit_count(xor)`` distance, so the result is the exact
    radius-r pair set (16-bit radius 1 → the two 8-bit halves; radius 2
    → 6/5/5 blocks; and so on). Wider radii trade narrower blocks
    (coarser buckets → more candidates) for more bands — the standard
    multi-index Hamming scheme (Manku et al., WWW'07 §3).

    Scale note: candidate volume per band is ~n²/2^width, so the
    fingerprint must grow with the corpus — pass ``bits=48`` (or up to
    62) at ≫10⁵ documents rather than raising max_hamming on 16 bits;
    Manku's web-scale setup is 64 bits in 4×16-bit blocks.
    """
    if not 0 <= max_hamming < bits:
        raise ValueError(
            f"max_hamming must be in [0, {bits}) for a {bits}-bit "
            f"fingerprint, got {max_hamming}"
        )
    fp = simhash_fingerprints(docs, text_col, bits).localCheckpoint(eager=True, storageLevel=SCRATCH_LEVEL)
    # The banded joins run at FINGERPRINT granularity, not document
    # granularity (Manku et al. §4): documents sharing a fingerprint are
    # one row in the candidate join, and hamming-0 pairs (the most
    # common near-dups in a real corpus) never enter the banding at all —
    # they expand from a plain equi-self-join on the fingerprint.
    n_bands = max_hamming + 1
    base, rem = divmod(bits, n_bands)
    blocks, offset = [], 0
    for i in range(n_bands):
        width = base + (1 if i < rem else 0)
        blocks.append(
            (F.shiftright("simhash", offset) % (1 << width)).alias(f"b{i}")
        )
        offset += width
    uniq = (
        fp.select("simhash")
        .distinct()
        .select("simhash", *blocks)
        .localCheckpoint(eager=True, storageLevel=SCRATCH_LEVEL)
    )
    # One banded EQUI-join per block over the distinct fingerprints,
    # unioned. An OR of the block equalities in a single join condition
    # has no equi-key, so Catalyst plans a BroadcastNestedLoopJoin —
    # O(n²) comparisons; per-band equi-joins are hash/SMJ-able and
    # shuffle only on the band value (the standard LSH-banding plan
    # shape, same as _lsh_bands). Bands are DISJOINT (a pair is emitted
    # only by its FIRST matching block — band i additionally requires
    # inequality on blocks 0..i-1, pushed as filters on the same
    # equi-join), so the union needs no dropDuplicates: at millions of
    # pairs that distinct was a whole extra shuffle of the result set.
    fpairs = None
    for i in range(n_bands):
        a, b = uniq.alias("a"), uniq.alias("b")
        cond = (F.col(f"a.b{i}") == F.col(f"b.b{i}")) & (
            F.col("a.simhash") < F.col("b.simhash")
        )
        for j in range(i):
            cond = cond & (F.col(f"a.b{j}") != F.col(f"b.b{j}"))
        c = a.join(b, cond).select(
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        fpairs = c if fpairs is None else fpairs.unionByName(c)
    fpairs = fpairs.filter(F.col("hamming") <= max_hamming)
    # expand fingerprint pairs back to document pairs (two equi-joins on
    # the fingerprint; least/greatest restores the doc_a < doc_b contract
    # because the two sides come from different fingerprint groups)
    da = fp.select(F.col("simhash").alias("sh_a"), F.col("doc_id").alias("__da"))
    db = fp.select(F.col("simhash").alias("sh_b"), F.col("doc_id").alias("__db"))
    cross = (
        fpairs.join(da, "sh_a")
        .join(db, "sh_b")
        .select(
            F.least("__da", "__db").alias("doc_a"),
            F.greatest("__da", "__db").alias("doc_b"),
            "hamming",
        )
    )
    # hamming-0 pairs: documents sharing one fingerprint
    a, b = fp.alias("a"), fp.alias("b")
    intra = a.join(
        b,
        (F.col("a.simhash") == F.col("b.simhash"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.lit(0).cast("int").alias("hamming"),
    )
    return cross.unionByName(intra)


# --- incremental dedup against a historical index --------------------------


def build_fingerprint_index(
    docs: DataFrame,
    table_name: str,
    text_col: str = "text",
    n_buckets: int = 64,
) -> str:
    """Materialize the corpus's exact-dup fingerprint index: one md5 per
    distinct text, stored as a table BUCKETED on the fingerprint.

    The index is the scale enabler for incremental dedup: it holds one
    short row per distinct document (not the documents), and bucketing on
    ``fp`` means the daily anti-join reads it shuffle-free.
    """
    from etl_workflows_spark.sinks.writer import write_table

    fps = docs.select(F.md5(F.col(text_col)).alias("fp")).distinct()
    return write_table(fps, table_name, bucket_by=(n_buckets, ["fp"]))


_BLOOM_META_IDX = -1


def build_bloom_sidecar(
    docs: DataFrame,
    table_name: str,
    text_col: str = "text",
    m_bits: int = 1 << 20,
    k: int = 5,
) -> str:
    """Bloom sidecar for a fingerprint index: a packed-word table over
    md5(text) (operators/bloom.py) plus one metadata row (word_idx = -1,
    word = m_bits*256 + k) that makes the filter SELF-DESCRIBING — the
    probe reads its own m/k, so build and probe can never disagree on
    the hash geometry. ~m_bits/32 rows: broadcastable at any corpus size
    you'd pick m for."""
    from etl_workflows_spark.operators import bloom
    from etl_workflows_spark.sinks.writer import write_table

    if m_bits % 256 != 0 or k >= 256:
        raise ValueError("m_bits must be a multiple of 256 and k < 256")
    words = bloom.bloom_build(
        docs.select(F.md5(F.col(text_col)).alias("fp")), "fp", m_bits, k
    )
    spark = docs.sparkSession
    meta = spark.createDataFrame(
        [(_BLOOM_META_IDX, m_bits * 256 + k)], "word_idx long, word long"
    )
    return write_table(words.unionByName(meta), table_name)


def append_bloom_sidecar(
    accepted_docs: DataFrame, table_name: str, text_col: str = "text"
) -> None:
    """Fold newly accepted fingerprints into the sidecar: bit_or-merge
    the new batch's words into the existing table (an overwrite of a
    filter-sized table, not a corpus scan)."""
    from etl_workflows_spark.operators import bloom

    spark = accepted_docs.sparkSession
    existing = spark.table(table_name)
    m_bits, k = _bloom_sidecar_params(existing)
    new_words = bloom.bloom_build(
        accepted_docs.select(F.md5(F.col(text_col)).alias("fp")), "fp", m_bits, k
    )
    merged = (
        existing.filter(F.col("word_idx") != _BLOOM_META_IDX)
        .unionByName(new_words)
        .groupBy("word_idx")
        .agg(F.expr("bit_or(word)").alias("word"))
        .unionByName(
            spark.createDataFrame(
                [(_BLOOM_META_IDX, m_bits * 256 + k)], "word_idx long, word long"
            )
        )
    )
    merged.localCheckpoint(eager=True, storageLevel=SCRATCH_LEVEL).write.mode("overwrite").saveAsTable(
        table_name
    )


def _bloom_sidecar_params(sidecar: DataFrame) -> tuple[int, int]:
    meta = sidecar.filter(F.col("word_idx") == _BLOOM_META_IDX).collect()
    if len(meta) != 1:
        raise ValueError("bloom sidecar is missing its metadata row")
    packed = meta[0]["word"]
    return packed // 256, packed % 256


def dedup_incremental(
    new_docs: DataFrame,
    index_table: str,
    text_col: str = "text",
    bloom_table: str | None = None,
) -> DataFrame:
    """Drop arriving documents whose text already exists in the corpus —
    WITHOUT rescanning the corpus. One anti-join of the (small) new batch
    against the bucketed fingerprint index, plus within-batch exact dedup.

    This is the daily-crawl flow: history stays as a fingerprint table
    (one 32-char row per distinct doc ever seen); each new shard pays
    O(|shard| + matching index buckets), never O(|corpus|). Callers append
    the surviving fingerprints back to the index afterwards
    (``append_fingerprints``) to keep it current — the two steps are
    separate so a failed downstream write can be retried without having
    poisoned the index.

    With ``bloom_table`` (a :func:`build_bloom_sidecar` sidecar), rows
    the filter proves absent skip the index anti-join entirely — only
    the "maybe seen" minority touches the index. Bloom filters have no
    false negatives, so the result is IDENTICAL with or without the
    sidecar (asserted in test_bloom_sidecar_equivalence); the sidecar
    only changes how much of the index the probe reads.
    """
    spark = new_docs.sparkSession
    index = spark.table(index_table)
    fresh = new_docs.withColumn("__fp", F.md5(F.col(text_col)))
    if bloom_table is not None:
        from etl_workflows_spark.operators import bloom

        sidecar = spark.table(bloom_table)
        m_bits, k = _bloom_sidecar_params(sidecar)
        words = sidecar.filter(F.col("word_idx") != _BLOOM_META_IDX)
        tagged = bloom.bloom_probe(fresh, words, "__fp", m_bits, k)
        definitely_new = tagged.filter(~F.col("bloom_maybe")).drop("bloom_maybe")
        maybe = tagged.filter(F.col("bloom_maybe")).drop("bloom_maybe")
        survivors = definitely_new.unionByName(
            maybe.join(index, maybe["__fp"] == index["fp"], "left_anti")
        )
    else:
        survivors = fresh.join(
            index, fresh["__fp"] == index["fp"], "left_anti"
        )
    # Within-batch dedup reuses the already-computed __fp in a SINGLE
    # plan branch (a keeper self-join would execute the md5 + index
    # anti-join twice): one window pass over one shuffle on __fp.
    from pyspark.sql.window import Window

    w = Window.partitionBy("__fp").orderBy("doc_id")
    return (
        survivors.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__fp")
    )


def append_fingerprints(
    accepted_docs: DataFrame, index_table: str, text_col: str = "text"
) -> None:
    """Register accepted documents' fingerprints in the index (append;
    the bucketed layout is preserved by the table's bucket spec)."""
    # insertInto inherits format/compression/bucketing from the table's
    # catalog spec — no writer options apply here.
    accepted_docs.select(
        F.md5(F.col(text_col)).alias("fp")
    ).distinct().write.mode("append").insertInto(index_table)


def build_near_dup_index(
    docs: DataFrame,
    index_name: str,
    text_col: str = "text",
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    n_buckets: int = 64,
) -> tuple[str, str]:
    """Materialize the NEAR-dup twin of ``build_fingerprint_index``: the
    state an incremental corpus needs to near-dup-check arriving shards
    without rescanning raw history.

    Two tables (returned as their names):

    * ``{index_name}_bands`` — (doc_id, band, bucket) LSH band rows,
      BUCKETED on ``bucket`` so a new shard's candidate fetch is an
      equi-join that reads only matching buckets;
    * ``{index_name}_sh``   — (doc_id, sh: array<bigint>) hashed shingle
      sets, bucketed on ``doc_id``, used to verify candidates with EXACT
      Jaccard (so the index adds no approximation beyond the banding).

    Splitting band rows from shingle payloads keeps the candidate join's
    shuffle at (id, band, bucket) width — the same design as
    ``near_dup_pairs_lsh``'s pairs-travel-as-ids rule. Storage is
    O(corpus shingles), ~the size of the tokenized text, far below the
    raw corpus with metadata; at 100 TB both tables partition-prune.
    """
    from etl_workflows_spark.sinks.writer import write_table

    t = _shingled(docs, text_col, n, hashed=True).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    bands_tbl = write_table(
        _lsh_bands(t, k, bands),
        f"{index_name}_bands",
        bucket_by=(n_buckets, ["bucket"]),
    )
    sh_tbl = write_table(
        t, f"{index_name}_sh", bucket_by=(n_buckets, ["doc_id"])
    )
    t.unpersist()
    return bands_tbl, sh_tbl


# bounded-driver gate for the within-batch pair collect in
# near_dup_incremental; module-level so tests can exercise the
# distributed-overflow branch without building 100k real pairs
_NEARDUP_PAIR_GATE = 100_000


def near_dup_incremental(
    new_docs: DataFrame,
    index_name: str,
    threshold: float = 0.5,
    text_col: str = "text",
    n: int = 3,
    k: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Drop arriving documents that are near-duplicates of the indexed
    corpus OR of each other — without rescanning the corpus. The
    streaming/daily-shard twin of ``dedup_near_duplicates``:

    1. within-batch near-dedup (full LSH + clustering on the shard only);
    2. shard band rows ⋈ ``{index_name}_bands`` on (band, bucket) →
       candidate (new, indexed) pairs, ids only;
    3. exact-Jaccard verify against ``{index_name}_sh`` → survivors.

    Cost is O(|shard| + matching index buckets), never O(|corpus|).
    (k, bands, n) MUST match the values the index was built with — the
    band hashes are seed-compatible only with themselves. Callers append
    survivors via ``append_near_dup_fingerprints`` once downstream
    writes commit (same retry contract as ``dedup_incremental``).

    Within-batch dedup is shard-sized by definition, so its verified
    pair graph is collected behind a bounded gate (≤ 100k pairs — the
    same bounded-driver design as the snapshot DML key gates) and
    resolved with a driver union-find keeping the min-id member per
    component — identical survivors to ``cluster_duplicates``' min-label
    fixpoint, at one collect instead of per-iteration checkpoint+count
    jobs (measured: the iterative path dominated the firewall's
    per-batch cost). Batches whose pair graph exceeds the gate fall
    back to distributed min-label clustering over the SAME verified
    pair graph — the shingle/LSH pipeline runs once either way. One
    shingle pass serves both the within-batch dedup and the index probe.
    """
    spark = new_docs.sparkSession
    t_all = _shingled(new_docs, text_col, n, hashed=True).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    pairs = near_dup_pairs_lsh(
        new_docs, threshold, n=n, k=k, bands=bands, text_col=text_col,
        shingled=t_all,
    )
    gate = _NEARDUP_PAIR_GATE
    pairs = pairs.select("doc_a", "doc_b").persist(StorageLevel.MEMORY_AND_DISK)
    try:
        sample = pairs.limit(gate + 1).collect()
        if len(sample) <= gate:
            losers = sorted(
                driver_union_find((r["doc_a"], r["doc_b"]) for r in sample)
            )
            if losers:
                from pyspark.sql import types as T

                id_type = new_docs.schema["doc_id"].dataType
                losers_df = spark.createDataFrame(
                    [(x,) for x in losers],
                    T.StructType([T.StructField("doc_id", id_type)]),
                )
                batch = new_docs.join(
                    F.broadcast(losers_df), "doc_id", "left_anti"
                )
            else:
                batch = new_docs
        else:
            # gate overflow: resolve the SAME verified pair graph with
            # the distributed min-label clustering — the shingle/LSH/
            # verify pipeline is not paid a second time (pre-fix this
            # branch called dedup_near_duplicates(new_docs, ...),
            # re-shingling and re-running the whole LSH join on the
            # heaviest batches)
            batch = new_docs.join(
                _cluster_losers(pairs), "doc_id", "left_anti"
            )
    finally:
        # the losers are collected (union-find) or checkpoint-backed
        # (_cluster_losers) by now — release the pair cache even when a
        # branch throws (a retrying firewall must not accumulate caches)
        pairs.unpersist()
    t = t_all.join(batch.select("doc_id"), "doc_id", "leftsemi")
    new_bands = _lsh_bands(t, k, bands)
    idx_bands = spark.table(f"{index_name}_bands")
    cands = (
        new_bands.alias("nb")
        .join(
            idx_bands.alias("ib"),
            (F.col("nb.band") == F.col("ib.band"))
            & (F.col("nb.bucket") == F.col("ib.bucket")),
        )
        .select(
            F.col("nb.doc_id").alias("new_id"),
            F.col("ib.doc_id").alias("old_id"),
        )
        .dropDuplicates(["new_id", "old_id"])
    )
    idx_sh = spark.table(f"{index_name}_sh").select(
        F.col("doc_id").alias("old_id"), F.col("sh").alias("sh_old")
    )
    dup_ids = (
        cands.join(
            t.select(F.col("doc_id").alias("new_id"), F.col("sh").alias("sh_new")),
            "new_id",
        )
        .join(idx_sh, "old_id")
        .select(
            "new_id",
            F.size(F.array_intersect("sh_new", "sh_old")).alias("__i"),
            F.size("sh_new").alias("__sa"),
            F.size("sh_old").alias("__sb"),
        )
        .filter(
            jaccard_from_sizes(F.col("__i"), F.col("__sa"), F.col("__sb"))
            >= threshold
        )
        .select(F.col("new_id").alias("doc_id"))
        .distinct()
    )
    # materialize before returning so the shard-sized persisted shingle
    # relation can be released HERE — a lazy return would hand an
    # invisible persist to every caller (the streaming firewall leaked
    # one CacheManager entry per micro-batch this way); the checkpoint
    # is shard-sized and frees via release_checkpoint / ContextCleaner
    out = batch.join(dup_ids, "doc_id", "left_anti").localCheckpoint(eager=True, storageLevel=SCRATCH_LEVEL)
    t_all.unpersist()
    from etl_workflows_spark.operators.cache import release_all_checkpoints

    # release only the checkpoints THIS call introduced (inside
    # dedup_near_duplicates' clustering loop) — new_docs' own
    # checkpoint-backed blocks belong to the caller, who may reuse the
    # input after we return; sweeping them would leave unrecoverable
    # missing-block failures (localCheckpoint severed their lineage)
    release_all_checkpoints(batch, keep=(out, new_docs))
    return out


def append_near_dup_fingerprints(
    accepted_docs: DataFrame,
    index_name: str,
    text_col: str = "text",
    n: int = 3,
    k: int = 16,
    bands: int = 4,
) -> None:
    """Register accepted documents in the near-dup index (both tables,
    idempotent: doc_ids already present are skipped, so a retried append
    cannot double-register a document).

    Crash-window discipline: the freshness check keys on ``_sh``, which
    is written LAST — a crash between the two inserts re-runs the band
    insert on retry, so the band rows themselves are de-duplicated
    against the ``_bands`` table (anti-join on doc_id) rather than
    trusting the ``_sh`` marker. The reverse order (marker first) would
    skip the retry entirely and leave the bands MISSING — silent false
    negatives in every future dedup, strictly worse than the extra scan.
    """
    spark = accepted_docs.sparkSession
    existing = spark.table(f"{index_name}_sh").select("doc_id")
    fresh = accepted_docs.join(existing, "doc_id", "left_anti")
    t = _shingled(fresh, text_col, n, hashed=True).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    bands_rows = _lsh_bands(t, k, bands)
    seen_bands = spark.table(f"{index_name}_bands").select("doc_id").distinct()
    bands_rows.join(seen_bands, "doc_id", "left_anti").write.mode(
        "append"
    ).insertInto(f"{index_name}_bands")
    t.write.mode("append").insertInto(f"{index_name}_sh")
    t.unpersist()
    spark.catalog.refreshTable(f"{index_name}_bands")
    spark.catalog.refreshTable(f"{index_name}_sh")


def containment_pairs_exact(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Directional shingle CONTAINMENT |A∩B| / |A| ≥ threshold — the
    doc-inside-doc detector Jaccard misses: a paragraph quoted whole
    inside a much longer page has high containment but low Jaccard
    because the union is dominated by the longer side. cf. Broder 1997
    (resemblance AND containment).

    Output (doc_a, doc_b, containment) means "doc_a is contained in
    doc_b"; both directions are emitted when both hold. O(n²) exact form
    (the oracle-checked ground truth) — at scale generate candidates
    with the LSH buckets (near_dup_pairs_lsh machinery) and verify
    containment on candidates only, same split as Jaccard dedup.
    """
    t = _shingled(docs, text_col, n, hashed=False)
    a, b = t.alias("a"), t.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    return (
        a.join(b, F.col("a.doc_id") != F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (inter / F.size("a.sh").cast("double")).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )



def containment_pairs_prefix(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    text_col: str = "text",
    hashed: bool = False,
    sketch=None,
) -> DataFrame:
    """Scale path for directional CONTAINMENT (same output as
    ``containment_pairs_exact``, recall exactly 1) — the one-sided
    prefix filter: |A∩B| ≥ ⌈t·|A|⌉ forces A's prefix of size
    |A| - ⌈t·|A|⌉ + 1 (rarest-first global order) to intersect B, so
    candidates come from an equi-join of A-PREFIX shingles against B's
    FULL shingle postings — never |A|×|B| work. Containment has no
    upper length filter (a tiny doc sits inside a huge one — that is
    the point), but the positional bound still applies: at the first
    shared token (0-based positions pa in A's order, pb in B's), the
    intersection is ≤ min(|A|-pa, |B|-pb), so pairs that cannot reach
    ⌈t·|A|⌉ drop before the distinct shuffle and the verify.

    Both directions are emitted, like the exact twin (one candidate
    pass covers both: a shared prefix token of the CONTAINED side is
    required, and either side may be the contained one).

    ``hashed=False`` (default) matches the exact twin / oracle
    bit-for-bit; flip to True at corpus scale so shingles travel as
    8-byte ints (64-bit collisions then bound the error, as in the
    Jaccard LSH path)."""
    if not 0 < threshold <= 1:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    sh = _shingled(docs, text_col, n, hashed=hashed).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    if hashed:
        # hashed scale path: one map-only CMS sort pass emits the FULL
        # sorted postings (plen marks the prefix boundary) — the exact
        # twin of the prefix join's CMS construction; recall 1 under any
        # shared total order. The unhashed default keeps the
        # exact-frequency build (string shingles don't enter the numpy
        # kernel, and the oracle entry needs bit-for-bit string output).
        if sketch is None:
            sketch = prefix_order_sketch(sh)
        full_all = _cms_sorted_rows(sh, threshold, sketch)
        prefixes = full_all.filter(F.col("p") < F.col("plen")).drop("plen")
        full = full_all.drop("plen")
    else:
        tok = sh.select("doc_id", F.explode("sh").alias("s"))
        freq = tok.groupBy("s").agg(F.count(F.lit(1)).alias("f"))
        sorted_sets = (
            tok.join(freq, "s")
            .groupBy("doc_id")
            .agg(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(F.col("f"), F.col("s")))
                    ),
                    lambda x: x["s"],
                ).alias("ss")
            )
        )
        sz = F.size("ss")
        prefix_len = (sz - F.ceil(F.lit(threshold) * sz) + 1).cast("int")
        prefixes = sorted_sets.select(
            "doc_id",
            sz.alias("n"),
            F.posexplode(F.slice("ss", 1, prefix_len)).alias("p", "s"),
        )
        # full postings WITH positions in the same global order (for the
        # positional bound on the containing side)
        full = sorted_sets.select(
            "doc_id",
            sz.alias("n"),
            F.posexplode("ss").alias("p", "s"),
        )
    a, b = prefixes.alias("pa"), full.alias("pb")
    # overlap needed: ceil(t·|A|), one unit of integer slack (cf.
    # _prefix_candidates) — the exact verify decides boundaries
    alpha = F.ceil(F.lit(float(threshold)) * F.col("pa.n")) - 1
    positional_ok = (
        F.least(
            F.col("pa.n") - F.col("pa.p"), F.col("pb.n") - F.col("pb.p")
        )
        >= alpha
    )
    cands = (
        a.join(
            b,
            (F.col("pa.s") == F.col("pb.s"))
            & (F.col("pa.doc_id") != F.col("pb.doc_id"))
            & positional_ok,
        )
        .select(
            F.col("pa.doc_id").alias("doc_a"),
            F.col("pb.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    fa = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    fb = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    return (
        cands.join(fa, "doc_a")
        .join(fb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size("sh_a").cast("double")
            ).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )


# signature width of the bloom pre-verify, in 64-bit words: 4 words =
# 256 bits = 32 bytes of payload per side (vs KBs for the full set);
# 8 words measured slightly slower at ×10 (signature compute outweighs
# the tighter bound once the verify survivor set is already small)
_PREVERIFY_SIG_LONGS = 4


def _bloom_sig(col: str = "sh") -> Column:
    """256-bit bloom signature of a hashed-shingle array column, as
    array<bigint> of ``_PREVERIFY_SIG_LONGS`` words: element x sets bit
    ``(x div W) mod 64`` of word ``x mod W``. One O(|set|) pass of cheap
    integer ops (SQL-string lambdas: shiftleft takes a column operand in
    SQL, which the Python HOF API can't express)."""
    W = _PREVERIFY_SIG_LONGS
    return F.array(
        *[
            F.expr(
                f"aggregate(filter({col}, x -> pmod(x, {W}) = {j}), 0L, "
                f"(acc, x) -> acc | shiftleft(1L, cast(pmod(x div {W}, 64) "
                "as int)))"
            )
            for j in range(W)
        ]
    )


def _xor_popcount(a: str, b: str) -> Column:
    """popcount(sig_a XOR sig_b) over two ``_bloom_sig`` columns — an
    exact lower bound on |A Δ B| (each differing bit is set by at least
    one symmetric-difference element; distinct bits, distinct elements).
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def _signature_preverify(
    sh: DataFrame, cands: DataFrame, threshold: float
) -> DataFrame:
    """EXACT-safe cheap pre-verify between the candidate join and the
    full ``array_intersect`` verify (the verify join dominates the
    prefix path's cost once ppjoin's filters have cut candidates).

    Each document carries a 256-bit bloom signature of its hashed
    shingles (one O(|set|) pass, 32 bytes). For a candidate pair, every
    bit set in ``sig_a XOR sig_b`` is set by at least one element of the
    symmetric difference and distinct bits come from distinct elements,
    so ``|A Δ B| >= popcount(sig_a XOR sig_b)`` — an exact bound with
    no probabilistic failure direction. Jaccard >= t forces
    ``|A Δ B| <= (1-t)/(1+t)·(|A|+|B|)``; pairs whose popcount exceeds
    that (plus one unit of integer slack, cf. the positional filter's
    alpha) can be rejected with recall still exactly 1. Unrelated
    same-size candidates at realistic thresholds light up far more XOR
    bits than the budget, so most prefix-filter survivors that would
    fail the verify never ship their full sets. Signatures are one
    cheap projection over the (persisted) shingle relation, and
    ``cands`` is referenced exactly once — the pre-verify adds no
    recomputation of the candidate join."""
    stats = sh.select(
        "doc_id", F.size("sh").alias("n"), _bloom_sig().alias("sig")
    )
    sa = stats.select(
        F.col("doc_id").alias("doc_a"),
        F.col("n").alias("__na"),
        F.col("sig").alias("__siga"),
    )
    sb = stats.select(
        F.col("doc_id").alias("doc_b"),
        F.col("n").alias("__nb"),
        F.col("sig").alias("__sigb"),
    )
    dmax = F.floor(
        F.lit((1.0 - float(threshold)) / (1.0 + float(threshold)))
        * (F.col("__na") + F.col("__nb"))
    ) + 1
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(_xor_popcount("__siga", "__sigb") <= dmax)
        .select("doc_a", "doc_b")
    )


_CMS_W_BITS = 15  # 2^15 counters per row — 512 KB sketch at d=2
_CMS_D = 2
_CMS_MULTS = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F)  # splitmix64 / xxh64


def _cms_sketch_geometry(sketch):
    """(d, w, w_bits) from the sketch ARRAY ITSELF — the kernels must
    hash with the width the sketch was built at, never a default.
    A ``prefix_order_sketch(sh, w_bits=14)`` sketch passed through a
    public ``sketch=`` param would otherwise index out of bounds (or
    read garbage counters at w_bits>default), crashing executor tasks
    mid-join."""
    d, w = sketch.shape
    w_bits = int(w).bit_length() - 1
    # w < 1 first: a zero-width sketch gives w_bits = -1 and the shift
    # below would raise a bare 'negative shift count' instead of the
    # diagnostic message (ADVICE r7)
    if d != _CMS_D or w < 1 or (1 << w_bits) != w:
        raise ValueError(
            f"CMS sketch shape {tuple(sketch.shape)} is not "
            f"({_CMS_D}, power-of-two); build it with prefix_order_sketch()"
        )
    return d, w, w_bits


def _cms_hash(vals, mult: int, w_bits: int):
    """Vectorized 64-bit mix → top ``w_bits`` bits as the counter index.
    Deterministic, partition-independent."""
    import numpy as np

    x = vals.astype(np.uint64, copy=False) * np.uint64(mult)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    return (x >> np.uint64(64 - w_bits)).astype(np.int64)


def prefix_order_sketch(sh: DataFrame, w_bits: int = _CMS_W_BITS):
    """Count-min sketch of global shingle frequencies — the ORDER STATS
    for the prefix-filter join, as a driver-sized (d × 2^w_bits) int64
    array instead of a full-corpus frequency relation.

    One Arrow-batched pass emits a partial sketch per batch (bounded:
    d·2^w_bits longs each); the driver sums them. Counts are exact sums
    per counter (commutative), so the sketch — and every ordering
    derived from it — is deterministic and partition-independent.
    Reusable across calls over the same corpus (pass it to
    ``near_dup_pairs_prefix``) — the judge-r5 'reuse the corpus
    frequency stats' path."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    d, w = _CMS_D, 1 << w_bits

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros(d * w, dtype=np.int64)
        seen = False
        for pdf in batches:
            if pdf.empty:
                continue
            seen = True
            vals = np.concatenate(
                [np.asarray(a, dtype=np.int64) for a in pdf["sh"]]
            )
            for r in range(d):
                idx = _cms_hash(vals, _CMS_MULTS[r], w_bits)
                acc[r * w : (r + 1) * w] += np.bincount(idx, minlength=w)
        if seen:
            # bytes, not array<long>: a list column would materialize
            # d·2^w_bits Python ints per partition on both sides
            yield pd.DataFrame({"counts": [acc.tobytes()]})

    rows = sh.select("sh").mapInPandas(partial, "counts binary").collect()
    if not rows:
        return np.zeros((d, w), dtype=np.int64)
    return np.sum(
        [np.frombuffer(r["counts"], dtype=np.int64) for r in rows], axis=0
    ).reshape(d, w)


def _cms_prefix_rows(
    sh: DataFrame,
    threshold: float,
    sketch,
    with_sig: bool = False,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """(doc_id, n, [sig0..sig3,] p, s) prefix-token rows with the
    per-doc sort done in one MAP-ONLY Arrow pass against the broadcast
    CMS — replacing the exact-frequency construction's three
    full-corpus shuffles (token explode → frequency groupBy → join-back
    → per-doc re-collect).

    Correctness: the prefix-filter theorem holds for ANY total order
    shared by all documents; (cms_count(s), s) is one — CMS collisions
    only make the order slightly less rare-first (weaker pruning,
    measured small at 2^15 counters), never wrong. Only the PREFIX
    slice ever leaves the kernel: at t=0.8 that is ~20% of each set, so
    the downstream equi-join shuffles a fraction of the old token
    volume.

    ``with_sig`` additionally emits the doc's 256-bit bloom signature
    as FOUR PLAIN LONG columns, computed in the same pass — the
    candidate join can then apply the exact |AΔB| popcount bound with
    codegen ``bit_count`` on the joined row, with no stats joins and no
    interpreted zip_with/aggregate lambdas (the r5 preverify's two
    joins + HOF filter were the hottest phase left). Same bound as
    ``_signature_preverify``: element x sets bit (x >> 2) mod 64 of
    word x mod 4 (numpy floor semantics on both sides of a pair — the
    mapping just has to be one fixed function)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    d, w, w_bits = _cms_sketch_geometry(sketch)
    sk = sketch  # task-local copy via closure capture (≤512 KB)
    extra_cols = extra_cols or []
    id_type = sh.schema["doc_id"].dataType
    fields = [
        T.StructField("doc_id", id_type, True),
        *[
            T.StructField(c, sh.schema[c].dataType, True)
            for c in extra_cols
        ],
        T.StructField("n", T.IntegerType(), False),
    ]
    if with_sig:
        fields += [
            T.StructField(f"sig{j}", T.LongType(), False) for j in range(4)
        ]
    fields.append(T.StructField("prefix", T.ArrayType(T.LongType()), False))
    out_schema = T.StructType(fields)
    thr = float(threshold)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            arrays = [np.asarray(a, dtype=np.int64) for a in pdf["sh"]]
            flat = np.concatenate(arrays)
            counts = np.min(
                np.stack(
                    [
                        sk[r, _cms_hash(flat, _CMS_MULTS[r], w_bits)]
                        for r in range(d)
                    ]
                ),
                axis=0,
            )
            if with_sig:
                flat_w = (flat % 4).astype(np.int64)
                flat_b = np.uint64(1) << (
                    ((flat >> np.int64(2)) % 64).astype(np.uint64)
                )
            offsets = np.cumsum([0] + [len(a) for a in arrays])
            prefixes = []
            sizes = []
            sigs = [[], [], [], []] if with_sig else None
            for i, a in enumerate(arrays):
                lo, hi = offsets[i], offsets[i + 1]
                c = counts[lo:hi]
                order = np.lexsort((a, c))  # (count, value) ascending
                m = len(a)
                plen = int(m - np.ceil(thr * m) + 1)
                prefixes.append(a[order[:plen]].tolist())
                sizes.append(m)
                if with_sig:
                    ww = flat_w[lo:hi]
                    bb = flat_b[lo:hi]
                    for j in range(4):
                        sigs[j].append(
                            np.bitwise_or.reduce(
                                bb[ww == j], initial=np.uint64(0)
                            )
                        )
            out = {"doc_id": pdf["doc_id"]}
            for c in extra_cols:
                out[c] = pdf[c]
            out["n"] = np.asarray(sizes, dtype=np.int32)
            if with_sig:
                for j in range(4):
                    # bit-reinterpret, never value-convert: the high bit
                    # is routinely set and int64() would overflow
                    out[f"sig{j}"] = np.asarray(
                        sigs[j], dtype=np.uint64
                    ).view(np.int64)
            out["prefix"] = prefixes
            yield pd.DataFrame(out)

    rows = sh.select("doc_id", *extra_cols, "sh").mapInPandas(
        kernel, out_schema
    )
    carry = ["doc_id", *extra_cols, "n"] + (
        [f"sig{j}" for j in range(4)] if with_sig else []
    )
    return rows.select(*carry, F.posexplode("prefix").alias("p", "s"))


def _cms_sorted_rows(sh: DataFrame, threshold: float, sketch) -> DataFrame:
    """(doc_id, n, plen, p, s) FULL sorted-posting rows in the CMS total
    order — the containment join's construction, which needs every
    position of the containing side, not just the prefix. Same map-only
    kernel economics as ``_cms_prefix_rows``; ``plen`` marks where the
    contained side's prefix ends so callers slice with a filter instead
    of a second pass."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    d, w, w_bits = _cms_sketch_geometry(sketch)
    sk = sketch
    id_type = sh.schema["doc_id"].dataType
    out_schema = T.StructType(
        [
            T.StructField("doc_id", id_type, True),
            T.StructField("n", T.IntegerType(), False),
            T.StructField("plen", T.IntegerType(), False),
            T.StructField("ss", T.ArrayType(T.LongType()), False),
        ]
    )
    thr = float(threshold)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            arrays = [np.asarray(a, dtype=np.int64) for a in pdf["sh"]]
            flat = np.concatenate(arrays)
            counts = np.min(
                np.stack(
                    [
                        sk[r, _cms_hash(flat, _CMS_MULTS[r], w_bits)]
                        for r in range(d)
                    ]
                ),
                axis=0,
            )
            offsets = np.cumsum([0] + [len(a) for a in arrays])
            sorted_sets, sizes, plens = [], [], []
            for i, a in enumerate(arrays):
                c = counts[offsets[i] : offsets[i + 1]]
                order = np.lexsort((a, c))
                m = len(a)
                sorted_sets.append(a[order].tolist())
                sizes.append(m)
                plens.append(int(m - np.ceil(thr * m) + 1))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n": np.asarray(sizes, dtype=np.int32),
                    "plen": np.asarray(plens, dtype=np.int32),
                    "ss": sorted_sets,
                }
            )

    rows = sh.select("doc_id", "sh").mapInPandas(kernel, out_schema)
    return rows.select(
        "doc_id", "n", "plen", F.posexplode("ss").alias("p", "s")
    )


def _prefix_candidates(
    sh: DataFrame,
    threshold: float,
    deduped: bool = True,
    order: str = "cms",
    sketch=None,
    with_sig: bool = False,
) -> DataFrame:
    """Candidate (doc_a, doc_b) pairs from the prefix filter alone —
    exposed separately so tests can pin the pruning (candidates must be
    FAR below n(n-1)/2 when only frequent shingles are shared).
    ``deduped=False`` returns the raw match rows (one per shared prefix
    token) so the caller can place a cheap map-side filter BEFORE the
    distinct shuffle — near_dup_pairs_prefix's signature pre-verify.

    Includes ppjoin's LENGTH filter: Jaccard ≥ t forces
    t·|B| ≤ |A| ≤ |B|/t, so cross-length pairs are dropped inside the
    candidate join before the (far costlier) set-intersection verify.

    Also includes ppjoin's POSITIONAL filter (Xiao et al. WWW 2008 §4):
    common tokens appear in the same relative order in both sorted sets,
    so at the FIRST shared prefix token — 0-based positions (pa, pb) —
    the total overlap is bounded by min(|A|-pa, |B|-pb); Jaccard ≥ t
    needs overlap ≥ ⌈t/(1+t)·(|A|+|B|)⌉. Every shared token's bound is
    ≤ the first one's, so keeping pairs where ANY match passes is safe
    (superset of the streaming ppjoin kept-set, recall still exactly 1),
    and it prunes BEFORE the distinct shuffle and the verify join.

    ``order`` picks the shared total order the theorem needs:
    ``"cms"`` (default, the scale path) sorts by count-min-sketch
    approximate frequency in one map-only Arrow pass —
    ``_cms_prefix_rows`` — eliminating the exact path's three
    full-corpus shuffles; ``"exact"`` keeps the original
    exact-frequency construction (same output pairs after verify
    either way — only candidate counts differ). ``sketch`` lets
    callers reuse a ``prefix_order_sketch`` across calls.
    """
    if order not in ("cms", "exact"):
        # a typo ('csm') must fail loudly, not silently switch algorithms
        raise ValueError(f"order must be 'cms' or 'exact', got {order!r}")
    if with_sig and order != "cms":
        raise ValueError("with_sig requires order='cms'")
    if order == "cms":
        if sketch is None:
            sketch = prefix_order_sketch(sh)
        prefixes = _cms_prefix_rows(sh, threshold, sketch, with_sig=with_sig)
    else:
        tok = sh.select("doc_id", F.explode("sh").alias("s"))
        freq = tok.groupBy("s").agg(F.count(F.lit(1)).alias("f"))
        sorted_sets = (
            tok.join(freq, "s")
            .groupBy("doc_id")
            .agg(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(F.col("f"), F.col("s")))
                    ),
                    lambda x: x["s"],
                ).alias("ss")
            )
        )
        sz = F.size("ss")
        prefix_len = (sz - F.ceil(F.lit(threshold) * sz) + 1).cast("int")
        prefixes = sorted_sets.select(
            "doc_id",
            sz.alias("n"),
            F.posexplode(F.slice("ss", 1, prefix_len)).alias("p", "s"),
        )
    a, b = prefixes.alias("pa"), prefixes.alias("pb")
    # +1 slack: the bound is on INTEGER sizes, so a unit of headroom costs
    # nothing and makes float-rounding false-drops at exact t·|A| == |B|
    # boundaries impossible (the exact verify still decides the boundary)
    length_ok = (
        F.col("pa.n") * F.lit(float(threshold)) <= F.col("pb.n") + 1
    ) & (F.col("pb.n") * F.lit(float(threshold)) <= F.col("pa.n") + 1)
    # overlap needed for Jaccard ≥ t, with the same unit of integer slack
    alpha = F.ceil(
        F.lit(float(threshold) / (1.0 + float(threshold)))
        * (F.col("pa.n") + F.col("pb.n"))
    ) - 1
    positional_ok = (
        F.least(
            F.col("pa.n") - F.col("pa.p"), F.col("pb.n") - F.col("pb.p")
        )
        >= alpha
    )
    cond = (
        (F.col("pa.s") == F.col("pb.s"))
        & (F.col("pa.doc_id") < F.col("pb.doc_id"))
        & length_ok
        & positional_ok
    )
    if with_sig:
        # the exact |AΔB| ≥ popcount(sig_a XOR sig_b) bound
        # (_signature_preverify's theorem), evaluated INLINE on the
        # joined row with codegen bit_count over four plain longs — no
        # stats joins, no interpreted zip_with/aggregate, and rejected
        # pairs never reach the distinct shuffle
        dmax = F.floor(
            F.lit((1.0 - float(threshold)) / (1.0 + float(threshold)))
            * (F.col("pa.n") + F.col("pb.n"))
        ) + 1
        xor_pop = sum(
            F.bit_count(
                F.col(f"pa.sig{j}").bitwiseXOR(F.col(f"pb.sig{j}"))
            )
            for j in range(4)
        )
        cond = cond & (xor_pop <= dmax)
    out = a.join(b, cond).select(
        F.col("pa.doc_id").alias("doc_a"),
        F.col("pb.doc_id").alias("doc_b"),
    )
    return out.distinct() if deduped else out


def near_dup_pairs_prefix(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    shingled: DataFrame | None = None,
    order: str = "cms",
    sketch=None,
) -> DataFrame:
    """EXACT near-dup pairs (same output as ``near_dup_pairs_exact``)
    without the O(n²) self-join — prefix filtering, the ppjoin family
    (Chaudhuri/Ganti/Kaushik ICDE 2006; Xiao et al. WWW 2008).

    Principle: order every document's shingle set by GLOBAL shingle
    frequency (rarest first; ties by shingle value — any shared total
    order works). If Jaccard(A,B) ≥ t, the two sets must share a shingle
    within their first ``|S| - ⌈t·|S|⌉ + 1`` elements — so candidates
    come from an equi-join on PREFIX shingles only. Prefixes are built
    from the rarest tokens, so join buckets are small by construction:
    recall is exactly 1 (it's a theorem, not a probability), unlike LSH.

    Plan: one shingle-frequency agg, one join to attach frequencies, a
    per-doc sort_array (no window — the order key travels inside the
    array), prefix explode, equi-join on shingle, distinct candidate
    pairs, exact-Jaccard verification against the full sets. Shuffles
    scale with corpus shingles + candidate count, never with n².
    """
    if not 0 < threshold <= 1:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    sh = (
        shingled
        if shingled is not None
        else _shingled(docs, text_col, n, hashed=True).persist(
            StorageLevel.MEMORY_AND_DISK
        )
    )
    # pre-verify BEFORE the candidate distinct, so the distinct shuffle
    # only carries survivors (measured 6× fewer at t=0.8). On the CMS
    # path the signature words ride the prefix rows themselves and the
    # xor bound evaluates inline in the candidate join (plain-long
    # bit_count codegen — no stats joins at all); the exact-order path
    # keeps the original broadcast-stats pre-verify.
    if order == "cms":
        pre = _prefix_candidates(
            sh, threshold, deduped=True, order="cms", sketch=sketch,
            with_sig=True,
        )
    else:
        raw = _prefix_candidates(
            sh, threshold, deduped=False, order=order, sketch=sketch
        )
        pre = _signature_preverify(sh, raw, threshold).distinct()
    fa = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    fb = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    verified = (
        pre.join(fa, "doc_a")
        .join(fb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("__i"),
            F.size("sh_a").alias("__sa"),
            F.size("sh_b").alias("__sb"),
        )
        .select(
            "doc_a",
            "doc_b",
            jaccard_from_sizes(
                F.col("__i"), F.col("__sa"), F.col("__sb")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    # sh stays persisted behind the returned lazy DataFrame (same
    # caller-release contract as near_dup_pairs_exact's materialize=True);
    # pass ``shingled`` to own the cache lifecycle yourself.
    return verified


def cross_split_leakage(
    train: DataFrame,
    eval_docs: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    sketch=None,
) -> DataFrame:
    """Split-leakage AUDIT: eval documents whose shingle Jaccard against
    ANY train document reaches ``threshold`` — the check you run on an
    already-built (train, eval) pair to prove the split didn't leak
    (the constructive counterpart is ``sampling.split_by_group``).

    Returns (eval_id, train_id, jaccard) for every leaking pair.
    Bipartite form of the prefix-filter join: both sides' shingle sets
    order by the UNION's global shingle frequencies, candidates come from
    an equi-join of the two prefix relations (recall 1, same theorem),
    and only cross-side pairs are verified — no train×train or eval×eval
    work at all.
    """
    if not 0 < threshold <= 1:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    t_sh = _shingled(
        train.select(F.col(id_col).alias("doc_id"), text_col),
        text_col, n, hashed=True,
    )
    e_sh = _shingled(
        eval_docs.select(F.col(id_col).alias("doc_id"), text_col),
        text_col, n, hashed=True,
    )
    both = t_sh.select(F.lit("t").alias("side"), "doc_id", "sh").unionByName(
        e_sh.select(F.lit("e").alias("side"), "doc_id", "sh")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # CMS-ordered prefixes (cf. _cms_prefix_rows): both sides sort by
    # the UNION's sketch — one shared total order, recall exactly 1 —
    # and carry their bloom-signature words inline, so the whole
    # candidate stage is one map-only pass + one equi-join. A caller
    # auditing a frozen corpus can pass its cached ``prefix_order_sketch``
    # (ANY shared total order preserves the theorem, so a sketch built
    # over a superset of both sides is equally valid).
    if sketch is None:
        sketch = prefix_order_sketch(both)
    prefixes = _cms_prefix_rows(
        both, threshold, sketch, with_sig=True, extra_cols=["side"]
    )
    ep = prefixes.filter(F.col("side") == "e").alias("pe")
    tp = prefixes.filter(F.col("side") == "t").alias("pt")
    length_ok = (
        F.col("pe.n") * F.lit(float(threshold)) <= F.col("pt.n") + 1
    ) & (F.col("pt.n") * F.lit(float(threshold)) <= F.col("pe.n") + 1)
    # ppjoin positional filter, bipartite form — same first-common-token
    # overlap bound as _prefix_candidates, same +1 integer slack
    alpha = F.ceil(
        F.lit(float(threshold) / (1.0 + float(threshold)))
        * (F.col("pe.n") + F.col("pt.n"))
    ) - 1
    positional_ok = (
        F.least(
            F.col("pe.n") - F.col("pe.p"), F.col("pt.n") - F.col("pt.p")
        )
        >= alpha
    )
    # bloom-signature bound INLINE in the candidate join (same exact
    # |AΔB| >= popcount(XOR) theorem as _signature_preverify, bipartite
    # form): codegen bit_count over four plain longs, no stats joins,
    # rejected pairs never reach the distinct shuffle
    dmax = F.floor(
        F.lit((1.0 - float(threshold)) / (1.0 + float(threshold)))
        * (F.col("pe.n") + F.col("pt.n"))
    ) + 1
    xor_pop = sum(
        F.bit_count(F.col(f"pe.sig{j}").bitwiseXOR(F.col(f"pt.sig{j}")))
        for j in range(4)
    )
    pre = (
        ep.join(
            tp,
            (F.col("pe.s") == F.col("pt.s"))
            & length_ok
            & positional_ok
            & (xor_pop <= dmax),
        )
        .select(
            F.col("pe.doc_id").alias("eval_id"),
            F.col("pt.doc_id").alias("train_id"),
        )
        .distinct()
    )
    # verification sets come from the cached union — the raw shingling
    # never recomputes
    fe = both.filter(F.col("side") == "e").select(
        F.col("doc_id").alias("eval_id"), F.col("sh").alias("sh_e")
    )
    ft = both.filter(F.col("side") == "t").select(
        F.col("doc_id").alias("train_id"), F.col("sh").alias("sh_t")
    )
    verified = (
        pre.join(fe, "eval_id")
        .join(ft, "train_id")
        .select(
            "eval_id",
            "train_id",
            F.size(F.array_intersect("sh_e", "sh_t")).alias("__i"),
            F.size("sh_e").alias("__se"),
            F.size("sh_t").alias("__st"),
        )
        .select(
            "eval_id",
            "train_id",
            jaccard_from_sizes(
                F.col("__i"), F.col("__se"), F.col("__st")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    # both stays persisted behind the returned lazy DataFrame (caller-
    # release contract, as with the other pair generators)
    return verified


def cross_source_overlap(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Exact-duplicate overlap matrix between sources: for each unordered
    source pair, how many distinct texts appear in both — the provenance
    screen that catches "crawl B is mostly a re-crawl of crawl A" before
    mixing weights are chosen.

    Scale: one distinct over (fingerprint, source) — map-side combined,
    the shuffle carries at most sources × distinct-texts rows — then a
    self-equi-join ON THE FINGERPRINT (content hash → uniform
    partitioning, no skew), so pair rows exist only for texts genuinely
    shared. Nothing is ever all-pairs in the corpus dimension; the
    output is bounded by source-pairs.
    """
    fp = docs.select(
        F.md5(F.col(text_col)).alias("fp"), F.col(group_col).alias("src")
    ).distinct()
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(b, "fp")
        .where(F.col("a.src") < F.col("b.src"))
        .groupBy(
            F.col("a.src").alias("source_a"),
            F.col("b.src").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared_texts"))
    )
