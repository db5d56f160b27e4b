"""Substring-level exact duplicate-span detection and excision.

Document-level dedup (``dedup_exact`` / ``near_dup_pairs_*``) misses the
dominant failure mode of web corpora: long VERBATIM passages repeated
inside otherwise-distinct pages (licence blocks, syndicated articles,
templated boilerplate).  Lee et al. 2021 ("Deduplicating Training Data
Makes Language Models Better", arXiv:2107.06499) remove duplicated
substrings of >= 50 tokens with a suffix array — a single-machine
construction.  The Spark-first equivalent used here: a token span of
length >= L is duplicated iff every one of its L-token rolling windows
occurs more than once corpus-wide, so

1. build each document's L-token rolling windows IN-PLAN (one
   ``transform`` over the token array — no Python, and when hashing no
   L-token strings ever leave the projection),
2. one ``groupBy`` over window keys finds windows occurring >= 2 times
   corpus-wide (map-side partial aggregation soaks up dup-heavy data),
3. a per-document gaps-and-islands window merges runs of duplicated
   window STARTS into maximal spans.

Window keys travel as ``xxhash64`` by default (8 bytes instead of an
L-token string on the shuffle); ``hashed=False`` shuffles the literal
window text — the spans produced are identical either way (64-bit
collisions aside), which is what lets DuckDB oracle-check the hashed
plan with its own string windows.

Scale posture: work is O(total tokens) windows; the only corpus-wide
shuffle is the window-key aggregation (AQE handles hot boilerplate
keys); island-merging shuffles by doc_id only.  Nothing is ever
collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_workflows_spark.operators.cache import SCRATCH_LEVEL


def _window_starts(toks: Column, length: int) -> Column:
    """1-based start positions of every L-token rolling window,
    empty (not descending — Spark's sequence(1, 0) pitfall) when the
    document is shorter than one window."""
    return F.when(
        F.size(toks) >= length,
        F.sequence(F.lit(1), F.size(toks) - length + 1),
    ).otherwise(F.array().cast("array<int>"))


def token_windows(
    docs: DataFrame,
    length: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    hashed: bool = True,
) -> DataFrame:
    """(doc_id, pos, win): every L-token rolling window of every
    document, pos 1-based.  ``hashed=True`` emits xxhash64(window) so
    only 8 bytes per window reach the shuffle."""
    if length < 2:
        raise ValueError(f"window length must be >= 2, got {length}")
    from etl_workflows_spark.operators.parallelism import widen

    docs = widen(docs)
    if not hashed:
        toks = F.split(F.col(text_col), " ")
        wins = F.transform(
            _window_starts(toks, length),
            lambda i: F.concat_ws(" ", F.slice(toks, i, length)),
        )
        return docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(wins).alias("p0", "win"),
        ).select("doc_id", (F.col("p0") + 1).alias("pos"), "win")
    # hashed path — the dedup._shingled recipe: hash each token ONCE
    # (one transform), build windows as arrays_zip of L shifted slices
    # (bulk builtins, no per-element lambda), posexplode, then one
    # codegen'd xxhash64 over the L token-hash longs per row — the
    # per-window array slice + L-token string build + string hash of
    # the old concat_ws form never happens, and the only remaining
    # higher-order lambda is the O(n) token hash. Key equivalence class
    # unchanged: injective up to 64-bit collisions (same class as
    # hashing the window text). Docs shorter than one window are
    # filtered BEFORE slicing (F.slice throws on negative length; such
    # docs carry no windows by contract).
    ht = F.transform(F.split(F.col(text_col), " "), lambda t: F.xxhash64(t))
    base = docs.select(
        F.col(id_col).alias("doc_id"), ht.alias("__ht")
    ).filter(F.size("__ht") >= length)
    m = F.size("__ht") - (length - 1)
    z = F.arrays_zip(*[F.slice("__ht", j + 1, m) for j in range(length)])
    wins = F.transform(
        z, lambda s: F.xxhash64(*[s[str(j)] for j in range(length)])
    )
    return base.select(
        "doc_id", F.posexplode(wins).alias("p0", "win")
    ).select("doc_id", (F.col("p0") + 1).alias("pos"), "win")


def _duplicated_hits(w: DataFrame) -> DataFrame:
    """Occurrences of corpus-wide duplicated windows.  groupBy + leftsemi
    (not COUNT OVER PARTITION BY win): partial aggregation halves the
    shuffle and AQE can split the hot boilerplate keys.

    ``w`` is referenced twice (the dup-key aggregate and the semi join's
    probe side) — it is materialized once here, because without that the
    whole tokenize+explode upstream re-runs for each reference (no CSE
    across self-referencing plans; measured ~25% of the x10 wall). The
    checkpoint blocks free via the ContextCleaner once the result is
    dropped (same contract as the prefix join's persisted shingles)."""
    w = w.localCheckpoint(eager=True, storageLevel=SCRATCH_LEVEL)
    dup_keys = (
        w.groupBy("win")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= 2)
        .select("win")
    )
    return w.join(dup_keys, "win", "leftsemi")


def duplicated_spans(
    docs: DataFrame,
    min_len: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    hashed: bool = True,
) -> DataFrame:
    """Maximal duplicated token spans: per document, maximal runs of
    L-token windows (L = ``min_len``) that each occur >= 2 times
    corpus-wide.  Returns (doc_id, start_pos, end_pos, n_tokens) with
    1-based inclusive token positions.

    Maximality via gaps-and-islands: duplicated window starts
    p, p+1, ..., p+k merge into one span [p, p+k+L-1]; a gap in the
    start sequence ends the island (the classic pos - ROW_NUMBER()
    group key — consecutive starts share it, any gap shifts it).
    """
    hits = _duplicated_hits(
        token_windows(docs, min_len, text_col, id_col, hashed)
    )
    isl = hits.withColumn(
        "__grp",
        F.col("pos")
        - F.row_number().over(
            Window.partitionBy("doc_id").orderBy("pos")
        ),
    )
    return (
        isl.groupBy("doc_id", "__grp")
        .agg(
            F.min("pos").alias("start_pos"),
            (F.max("pos") + min_len - 1).alias("end_pos"),
        )
        .select(
            "doc_id",
            "start_pos",
            "end_pos",
            (F.col("end_pos") - F.col("start_pos") + 1).alias("n_tokens"),
        )
    )


def excise_duplicate_spans(
    docs: DataFrame,
    min_len: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    hashed: bool = True,
) -> DataFrame:
    """Remove all-but-one occurrence of every duplicated >= L-token
    span, Lee et al. 2021 semantics re-expressed relationally:

    - the CANONICAL occurrence of a duplicated window is its globally
      first (min (doc_id, pos)) — kept;
    - a token is dropped iff some non-canonical duplicated window
      covers it AND no canonical occurrence covers it (canonical
      coverage wins, so the retained copy always survives whole).

    Coverage expands windows to token positions relationally (explode
    of pos..pos+L-1 — O(duplicated windows × L) rows, never O(n²));
    the surviving tokens rebuild in order with the sort-free
    collect/sort_array/transform idiom (no per-doc window sort).

    Returns the input with ``text_col`` replaced by the excised text
    (documents losing every token keep an empty string).  Deterministic
    for a fixed corpus.
    """
    hits = _duplicated_hits(
        token_windows(docs, min_len, text_col, id_col, hashed)
    )
    firsts = hits.groupBy("win").agg(
        F.min(F.struct("doc_id", "pos")).alias("__first")
    )
    tagged = hits.join(firsts, "win").select(
        "doc_id",
        "pos",
        (
            (F.col("doc_id") == F.col("__first.doc_id"))
            & (F.col("pos") == F.col("__first.pos"))
        ).alias("canonical"),
    )
    cover = tagged.select(
        "doc_id",
        "canonical",
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + min_len - 1)
        ).alias("tpos"),
    )
    # drop is consumed twice below (the anti-join and the affected-doc
    # set) and is tiny (non-canonical duplicated positions only) —
    # materialize it so the window/cover subtree runs once
    drop = (
        cover.groupBy("doc_id", "tpos")
        .agg(F.max(F.col("canonical").cast("int")).alias("__c"))
        .filter(F.col("__c") == 0)
        .select("doc_id", "tpos")
        .localCheckpoint(eager=True, storageLevel=SCRATCH_LEVEL)
    )
    from etl_workflows_spark.operators.parallelism import widen

    # rebuild ONLY documents that lose at least one token: an untouched
    # document's rebuild (split → anti-join nothing → ordered concat)
    # reproduces its text byte-for-byte (split/concat_ws round-trips
    # empty tokens), so the corpus-wide token explode + anti-join +
    # per-doc collect_list sort — the dominant cost when duplication is
    # sparse — runs over the affected slice instead of every document
    # (guide §1.2: don't compute what you throw away). Worst case
    # (everything duplicated) degenerates to the old full rebuild.
    affected = drop.select("doc_id").distinct()
    toks = (
        widen(docs)
        .select(F.col(id_col).alias("doc_id"), F.col(text_col))
        .join(affected, "doc_id", "leftsemi")
        .select(
            "doc_id",
            F.posexplode(F.split(F.col(text_col), " ")).alias("p0", "tok"),
        )
        .select("doc_id", (F.col("p0") + 1).alias("tpos"), "tok")
    )
    kept = toks.join(drop, ["doc_id", "tpos"], "leftanti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("tpos", "tok"))),
                lambda x: x["tok"],
            ),
        ).alias("__new_text")
    )
    # join through a reserved temp key: renaming id_col to "doc_id" would
    # collide (ambiguous reference) when the input carries an unrelated
    # doc_id column alongside a custom id_col
    out = (
        docs.withColumn("__excise_id", F.col(id_col))
        .join(
            affected.select(
                F.col("doc_id").alias("__excise_id"),
                F.lit(True).alias("__aff"),
            ),
            "__excise_id",
            "left",
        )
        .join(
            rebuilt.withColumnRenamed("doc_id", "__excise_id"),
            "__excise_id",
            "left",
        )
        .withColumn(
            text_col,
            F.when(
                F.col("__aff").isNull(),
                # untouched: original text (NULL text normalizes to "",
                # exactly what its empty rebuild produced before)
                F.coalesce(F.col(text_col), F.lit("")),
            ).otherwise(
                # affected: rebuilt text; every token excised → no
                # rebuilt row → "" (row count always preserved)
                F.coalesce(F.col("__new_text"), F.lit(""))
            ),
        )
        .drop("__new_text", "__excise_id", "__aff")
    )
    return out


def ngram_novelty(
    docs: DataFrame,
    length: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    hashed: bool = True,
) -> DataFrame:
    """Per-document n-gram novelty (memorization audit): the share of a
    document's L-token rolling windows that occur exactly once
    corpus-wide. Returns (doc_id, n_windows, dup_windows,
    novelty_ratio); docs shorter than one window carry no windows and
    are absent by contract (novelty of nothing is undefined).

    ``hashed=True`` (default) counts xxhash64 window keys — 8 bytes on
    the shuffle instead of an L-token string, at the price that a
    64-bit collision counts two distinct windows as duplicates of each
    other (expected collisions ≈ n²/2⁶⁵: ~0.03 windows at 10⁹, so the
    ratio's error is negligible but NOT zero at extreme scale). Pass
    ``hashed=False`` for exact literal-window counting — the form the
    DuckDB oracle replays.

    Shape: the window extraction is materialized ONCE (the bare
    freq-agg + join-back references it twice and would re-run the whole
    tokenize+explode — no CSE across self-referencing plans), then one
    window-frequency agg (map-side combined) + one equi-join back. A
    COUNT() OVER (PARTITION BY win) is one pass and measured faster at
    ×10, but funnels each hot boilerplate window into a single reducer
    with NO AQE protection (AQE splits skewed joins, never skewed
    windows) — the checkpoint + groupBy + AQE-skew-splittable join is
    what survives a 1e9-copy boilerplate window at 100 TB.
    """
    w = (
        token_windows(docs, length, text_col, id_col, hashed)
        .select(F.col("doc_id"), "win")  # pos unused: halve the checkpoint
        .localCheckpoint(eager=True, storageLevel=SCRATCH_LEVEL)
    )
    freq = w.groupBy("win").agg(F.count(F.lit(1)).alias("c"))
    return (
        w.join(freq, "win")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_windows"),
            F.sum(F.when(F.col("c") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("dup_windows"),
        )
        .select(
            "doc_id",
            "n_windows",
            "dup_windows",
            F.round(
                F.lit(1.0)
                - F.col("dup_windows").cast("double")
                / F.col("n_windows").cast("double"),
                6,
            ).alias("novelty_ratio"),
        )
    )
