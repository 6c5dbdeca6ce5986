"""Lexical retrieval over the `documents` table: BM25 scoring and
top-k keyword search — the sparse-retrieval complement to the
embedding ANN tier (`functions/similarity.py`). A training-data
pipeline uses this for targeted corpus slicing ("pull every document
about X for inspection/curation") and as the lexical half of hybrid
retrieval.

Scale shape: the query's terms are LITERALS, so per-document term
frequencies are array-filter expressions over the tokenized text —
whole-stage-codegen projections, zero shuffle, no inverted index
required for the score pass. Corpus statistics (N, avgdl, per-term
document frequency) reduce through ONE map-side-combinable aggregate
to a single row that broadcast-nested-loop joins back (1-row build
side). Top-k is TakeOrderedAndProject: per-partition heaps of k, an
O(k) driver merge — never a full sort. At 100 TB the stats pass is
the only extra scan; production systems precompute (N, avgdl) and
per-term df once per corpus snapshot and feed them as literals, which
drops this to a single scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ilogtail_spark.functions.textstats import tokens


def bm25_corpus_stats(
    docs: DataFrame,
    query_terms: list[str],
    *,
    text_col: str = "text",
) -> dict:
    """The corpus-level BM25 inputs as one driver-side dict:
    ``{"n_docs": int, "avgdl": float, "df": {term: int}}``. ONE
    map-side-combinable aggregate, O(1) rows collected. At 100 TB this
    is the write-time pass: compute once per corpus snapshot, feed the
    dict to every `bm25_topk(stats=...)` query — each query is then a
    single scan with literal statistics (no stats subquery, no join)."""
    toks = tokens(F.col(text_col))
    row = docs.select(
        F.size(toks).alias("dl"),
        *[
            F.array_contains(toks, t).cast("long").alias(f"hit{i}")
            for i, t in enumerate(query_terms)
        ],
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum(f"hit{i}").alias(f"df{i}")
            for i in range(len(query_terms))
        ],
    ).first()
    # empty corpus: avg() is NULL → avgdl 0.0 (and df NULLs → 0) so the
    # stats dict stays well-typed; bm25_topk then returns an empty
    # result just like the inline-stats path does on the same corpus.
    # sum_dl rides along for merge_bm25_stats: the exact integer sum is
    # what makes incremental merging bit-identical to a full recompute
    # (merging AVERAGES re-rounds; merging exact sums cannot).
    return {
        "n_docs": row["n_docs"],
        "avgdl": float(row["avgdl"]) if row["avgdl"] is not None else 0.0,
        "sum_dl": int(row["sum_dl"] or 0),
        "df": {
            t: int(row[f"df{i}"] or 0) for i, t in enumerate(query_terms)
        },
    }


def merge_bm25_stats(*stats: dict) -> dict:
    """Merge per-batch `bm25_corpus_stats` dicts into the UNION corpus's
    stats without rescanning anything — the incremental-ingestion path:
    compute stats once per arriving batch, fold into the snapshot's
    running stats (`plans/snapshot.py` persists the dict), and every
    count stays exact.

    Bit-identical to a single-pass recompute over the union, not just
    close: n_docs/df are integer sums, and avgdl is re-derived as
    (Σ sum_dl)/(Σ n_docs) — the same two exact integers Spark's `avg`
    divides (doc lengths are ints, so their double-accumulated sum is
    exact below 2^53; addition order cannot change it). Merging the
    AVERAGES instead ((n₁·avg₁+n₂·avg₂)/n) would re-round twice and
    drift in the last ulp — pinned by the shared `bm25` oracle on the
    `bm25_incremental` registry query."""
    n_docs = sum(s["n_docs"] for s in stats)
    sum_dl = sum(s["sum_dl"] for s in stats)
    terms: list[str] = []
    for s in stats:
        terms.extend(t for t in s["df"] if t not in terms)
    return {
        "n_docs": n_docs,
        "avgdl": (sum_dl / n_docs) if n_docs else 0.0,
        "sum_dl": sum_dl,
        "df": {t: sum(s["df"].get(t, 0) for s in stats) for t in terms},
    }


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 10,
    stats: dict | None = None,
) -> DataFrame:
    """BM25 (Robertson/Spärck Jones, the Lucene `+1`-smoothed idf form
    — always non-negative) top-k over whitespace tokens:

        idf(t)   = ln((N − df_t + 0.5)/(df_t + 0.5) + 1)
        score(d) = Σ_t idf(t) · tf · (k1+1)/(tf + k1·(1−b+b·dl/avgdl))

    Returns (doc_id, bm25) for the `topk` best-scoring documents that
    contain at least one query term; bm25 rounded to 6 decimals, ties
    broken by doc_id so the cut is deterministic. Term contributions
    add in query-term order (a fixed left-associated chain, not a SQL
    SUM whose partition order floats), so the float is reproducible
    across engines.

    With ``stats`` (from `bm25_corpus_stats`, computed once per corpus
    snapshot) the statistics become plan LITERALS: no stats subquery,
    no join — the whole query is one scan → fused projection → top-k
    heaps. Identical scores either way (the literals are the exact
    doubles the inline aggregate produces)."""
    if not query_terms:
        raise ValueError("bm25_topk requires at least one query term")

    def tf(toks: Column, term: str) -> Column:
        # single-arg lambda: a two-arg one would make F.filter pass the
        # (element, index) pair and silently bind `term` to the index
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    from ilogtail_spark.partitioning import spread_for_expansion

    toks = tokens(F.col(text_col))
    # spread: tokenize + per-term filters are CPU work over what is a
    # single input split at fixture scale (gated no-op otherwise)
    base = spread_for_expansion(docs, id_col).select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("dl"),
        *[tf(toks, t).alias(f"tf{i}") for i, t in enumerate(query_terms)],
    )
    if stats is None:
        # the narrow (id, dl, tf…) projection feeds BOTH the stats
        # aggregate and the scoring join — checkpoint it so the
        # tokenize+filter pass runs once, not once per consumer
        # (O(docs × ints) blocks, reclaimed with the plan)
        base = base.localCheckpoint(eager=False)
    if stats is not None:
        scored = base.select(
            "*",
            F.lit(int(stats["n_docs"])).alias("n_docs"),
            F.lit(float(stats["avgdl"])).alias("avgdl"),
            *[
                F.lit(int(stats["df"][t])).alias(f"df{i}")
                for i, t in enumerate(query_terms)
            ],
        )
    else:
        stats_row = base.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg("dl").alias("avgdl"),
            *[
                F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
                for i in range(len(query_terms))
            ],
        )
        scored = base.join(F.broadcast(stats_row))

    def contrib(i: int) -> Column:
        tf = F.col(f"tf{i}").cast("double")
        idf = F.log(
            (F.col("n_docs") - F.col(f"df{i}") + 0.5) / (F.col(f"df{i}") + 0.5)
            + 1.0
        )
        norm = tf + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        return idf * tf * (k1 + 1.0) / norm

    score = contrib(0)
    for i in range(1, len(query_terms)):
        score = score + contrib(i)

    any_hit = F.col("tf0") > 0
    for i in range(1, len(query_terms)):
        any_hit = any_hit | (F.col(f"tf{i}") > 0)

    return (
        scored.filter(any_hit)
        .select("doc_id", F.round(score, 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col("doc_id"))
        .limit(topk)
    )


def hybrid_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vec_id: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    topk: int = 10,
    n_candidates: int = 50,
    k0: int = 60,
    dense_rank: DataFrame | None = None,
) -> DataFrame:
    """Hybrid retrieval: fuse the lexical (BM25) and dense (embedding
    cosine) candidate lists with Reciprocal Rank Fusion
    (Cormack/Clarke/Büttcher, SIGIR'09):

        rrf(d) = Σ_lists 1/(k0 + rank_list(d))

    RRF fuses RANKS, not scores — no cross-list score normalization,
    and since ranks are exact integers the fused float is identical
    across engines by construction. Each retriever contributes its
    top-`n_candidates`; documents in only one list get that list's
    term only. The query document itself is excluded from the dense
    list (brute_force_topk semantics) but may rank lexically.

    Scale shape: both candidate pulls are the full-corpus operators
    (zero-shuffle BM25 scoring, broadcast-query dense scoring); the
    fusion join and rank windows run over ≤ 2·n_candidates rows —
    bounded by the PARAMETER, like the Bloom bitmap, so the
    single-partition rank windows are O(n_candidates), never
    corpus-sized.

    ``dense_rank`` swaps the dense retriever: pass any
    (doc_id, r_dense) ranking — e.g. `ivf_topk`/`lsh_bucket_topk`
    output — and RRF fuses it instead of the brute-force tier. At
    corpus scale the dense candidates come from the ANN tiers; brute
    force is the default because it is the exact/oracle tier."""
    from pyspark.sql.window import Window

    from ilogtail_spark.functions.similarity import brute_force_topk

    lex = bm25_topk(
        docs,
        query_terms,
        id_col=id_col,
        text_col=text_col,
        topk=n_candidates,
    )
    wl = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    lex = lex.select("doc_id", F.row_number().over(wl).alias("r_lex"))

    if dense_rank is not None:
        dense = dense_rank.select("doc_id", "r_dense")
    else:
        q = embeddings.filter(F.col(vec_id_col) == query_vec_id)
        dense = brute_force_topk(
            embeddings, q, id_col=vec_id_col, vec_col=vec_col,
            k=n_candidates,
        ).select(F.col("n_id").alias("doc_id"), F.col("rank").alias("r_dense"))

    one = F.lit(1.0)
    k0d = F.lit(float(k0))
    fused = (
        lex.join(dense, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(
                F.coalesce(one / (k0d + F.col("r_lex")), F.lit(0.0))
                + F.coalesce(one / (k0d + F.col("r_dense")), F.lit(0.0)),
                6,
            ).alias("rrf"),
        )
    )
    return fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(topk)


def bm25_multi_topk(
    docs: DataFrame,
    queries: dict[str, list[str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 10,
    stats: dict | None = None,
) -> DataFrame:
    """BM25 top-k for a BATCH of queries in ONE corpus scan — the
    corpus-slicing pass a curation run actually executes (hundreds of
    topic queries over one snapshot), where per-query jobs would each
    re-scan the corpus and the scans, not the scoring, dominate at
    100 TB.

    Shape: term frequencies are computed once per DISTINCT term across
    all queries (shared zero-shuffle array-filter projections, exactly
    `bm25_topk`'s scoring kernel); each query's score is its own
    fixed-order chain over the shared tf/df columns, so scores are
    bit-identical to the single-query operator. Per-document hits fold
    into an array of (query_id, bm25) structs, null-scored entries are
    filtered BEFORE the explode, and `inline` emits only real hits —
    the exploded relation is Σ_q |hits_q| rows, never docs × queries.

    Per-query top-k is a rank-limit window (`row_number() <= k`
    partitioned by query_id): Spark rewrites that filter into a
    WindowGroupLimit, which prunes each map task's output to its local
    top-k per query BEFORE the exchange — the shuffle carries
    O(tasks · queries · k) rows, so this is the same per-partition-heap
    discipline as TakeOrderedAndProject, generalized per group
    (plan-audited).

    Returns (query_id, doc_id, bm25, rank), rank 1-based, ties broken
    by doc_id. `stats` (from `bm25_corpus_stats` over the distinct-term
    union) turns the statistics into plan literals — one scan total.
    """
    if not queries or any(not t for t in queries.values()):
        raise ValueError("bm25_multi_topk requires non-empty term lists")
    # distinct union, first-occurrence order (deterministic tf columns)
    union_terms: list[str] = []
    for terms in queries.values():
        for t in terms:
            if t not in union_terms:
                union_terms.append(t)
    tidx = {t: i for i, t in enumerate(union_terms)}

    def tf(toks: Column, term: str) -> Column:
        # single-arg lambda (two-arg binds (element, index) — see bm25_topk)
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    from ilogtail_spark.partitioning import spread_for_expansion

    toks = tokens(F.col(text_col))
    # spread + (below) checkpoint: same two-consumer shape as bm25_topk
    base = spread_for_expansion(docs, id_col).select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("dl"),
        *[tf(toks, t).alias(f"tf{i}") for i, t in enumerate(union_terms)],
    )
    if stats is None:
        base = base.localCheckpoint(eager=False)
    if stats is not None:
        scored = base.select(
            "*",
            F.lit(int(stats["n_docs"])).alias("n_docs"),
            F.lit(float(stats["avgdl"])).alias("avgdl"),
            *[
                F.lit(int(stats["df"][t])).alias(f"df{i}")
                for i, t in enumerate(union_terms)
            ],
        )
    else:
        stats_row = base.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg("dl").alias("avgdl"),
            *[
                F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
                for i in range(len(union_terms))
            ],
        )
        scored = base.join(F.broadcast(stats_row))

    def contrib(i: int) -> Column:
        tfc = F.col(f"tf{i}").cast("double")
        idf = F.log(
            (F.col("n_docs") - F.col(f"df{i}") + 0.5) / (F.col(f"df{i}") + 0.5)
            + 1.0
        )
        norm = tfc + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        return idf * tfc * (k1 + 1.0) / norm

    entries = []
    for qid, terms in queries.items():
        idxs = [tidx[t] for t in terms]
        score = contrib(idxs[0])
        for i in idxs[1:]:
            score = score + contrib(i)
        any_hit = F.col(f"tf{idxs[0]}") > 0
        for i in idxs[1:]:
            any_hit = any_hit | (F.col(f"tf{i}") > 0)
        entries.append(
            F.struct(
                F.lit(qid).alias("query_id"),
                F.when(any_hit, F.round(score, 6)).alias("bm25"),
            )
        )
    hits = scored.select(
        "doc_id",
        F.inline(
            F.filter(F.array(*entries), lambda s: s["bm25"].isNotNull())
        ),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("bm25"), F.asc("doc_id")
    )
    return (
        hits.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "doc_id", "bm25", "rank")
    )


def hybrid_multi_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    queries: dict[str, dict],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    topk: int = 10,
    n_candidates: int = 50,
    k0: int = 60,
    stats: dict | None = None,
) -> DataFrame:
    """`hybrid_topk` for a BATCH of queries: ONE scan of the document
    corpus (batched BM25) + ONE scan of the embedding corpus (all query
    vectors in one broadcast against `brute_force_topk`, whose window
    is already partitioned per query), RRF-fused per query_id.

    ``queries`` maps query_id -> {"terms": [...], "vec_id": int}. The
    fusion join runs over ≤ 2 · n_queries · n_candidates rows — bounded
    by parameters, like the single-query operator. Returns
    (query_id, doc_id, rrf), top-`topk` per query.
    """
    from pyspark.sql.window import Window

    from ilogtail_spark.functions.similarity import brute_force_topk

    lex = bm25_multi_topk(
        docs,
        {qid: spec["terms"] for qid, spec in queries.items()},
        id_col=id_col,
        text_col=text_col,
        topk=n_candidates,
        stats=stats,
    ).select("query_id", "doc_id", F.col("rank").alias("r_lex"))

    vec_to_qids: dict[int, list[str]] = {}
    for qid, spec in queries.items():
        vec_to_qids.setdefault(int(spec["vec_id"]), []).append(qid)
    qvecs = embeddings.filter(
        F.col(vec_id_col).isin(list(vec_to_qids))
    )
    dense_raw = brute_force_topk(
        embeddings, qvecs, id_col=vec_id_col, vec_col=vec_col,
        k=n_candidates,
    )
    # fan each neighbor row back out to the query ids sharing its
    # vector — an array/when explode (parameter-sized literals) rather
    # than a map lookup, since a map could return only ONE qid per vec
    dense = dense_raw.select(
        F.explode(
            F.array(
                *[
                    F.when(
                        F.col("q_id") == F.lit(vid), F.lit(qid)
                    )
                    for vid, qids in vec_to_qids.items()
                    for qid in qids
                ]
            )
        ).alias("query_id"),
        F.col("n_id").alias("doc_id"),
        F.col("rank").alias("r_dense"),
    ).filter(F.col("query_id").isNotNull())

    one = F.lit(1.0)
    k0d = F.lit(float(k0))
    fused = (
        lex.join(dense, ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id",
            "doc_id",
            F.round(
                F.coalesce(one / (k0d + F.col("r_lex")), F.lit(0.0))
                + F.coalesce(one / (k0d + F.col("r_dense")), F.lit(0.0)),
                6,
            ).alias("rrf"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf"), F.asc("doc_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "doc_id", "rrf", "rank")
    )
