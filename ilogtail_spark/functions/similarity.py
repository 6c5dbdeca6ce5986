"""Similarity search over the `embeddings` table (array<float> column).

Two tiers:
  * brute-force cosine top-k — the exactness baseline; all-pairs via a
    broadcast of the (small) query set; dot products with `aggregate`/
    `zip_with` (JVM higher-order functions, no Python).
  * LSH-bucketed ANN — the 100 TB path: random-hyperplane signatures
    (deterministic, seed-derived) bucket vectors so only same-bucket
    pairs are scored; shuffle O(docs × tables), not O(docs²).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    df: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    `queries` (small) is broadcast — the corpus never shuffles; ranking
    is a window partitioned by query id. At cluster scale the corpus-side
    scan parallelism carries the job; the window shuffles only
    (n_queries × corpus) scored rows, pre-filtered if desired.
    """
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    scored = df.alias("c").join(F.broadcast(q), F.col("q_id") != F.col(id_col)).select(
        F.col("q_id"),
        F.col(id_col).alias("n_id"),
        F.round(cosine(F.col("q_vec"), F.col(vec_col)), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "cos_sim", "rank")
    )


def embedding_cosine_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos ≥ t) —
    EXACT all-pairs; the oracle tier for embedding dedup. O(n²) compute
    with zero shuffle of the right side when it broadcasts; at corpus
    scale use `embedding_cosine_pairs_lsh`."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(cosine(F.col("v_a"), F.col("v_b")), 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def embedding_cosine_pairs_lsh(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_planes: int = 8,
    n_tables: int = 1,
    dim: int | None = None,
) -> DataFrame:
    """Scale path for embedding near-dup: hyperplane-LSH buckets, pairs
    form only within a bucket (shuffle O(n·tables), compute
    O(Σ bucket²)), then exact cosine verifies. High-cosine pairs land in
    one table's shared bucket with probability (1 − θ/π)^n_planes;
    `n_tables` OR-amplifies recall to 1−(1−p)^T exactly as in
    `lsh_bucket_topk`. At the near-dup threshold (cos ≥ 0.999) ONE
    table already recalls every planted pair at 1M vectors (SCALE.md) —
    the tables knob is for moderate thresholds, where multi-table
    candidate pairs are deduplicated before the exact verify."""
    from ilogtail_spark.partitioning import spread_for_expansion

    df = spread_for_expansion(df, id_col)
    if dim is None:
        dim = len(df.select(vec_col).first()[0])

    # both self-join sides share ONE lazy local checkpoint: signatures
    # computed once, and (unlike persist) no CacheManager entry outlives
    # the plan — the ContextCleaner reclaims the blocks on GC.
    if n_tables == 1:
        bucketed = df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            _table_signature(F.col(vec_col), dim, 0, n_planes).alias("bucket"),
        ).localCheckpoint(eager=False)
        pairs = bucketed.alias("a").join(
            bucketed.alias("b"),
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
        ).select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.v").alias("v_a"),
            F.col("b.v").alias("v_b"),
        )
    else:
        bucketed = df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            F.posexplode(
                F.array(
                    *[
                        _table_signature(F.col(vec_col), dim, t, n_planes)
                        for t in range(n_tables)
                    ]
                )
            ).alias("tbl", "bucket"),
        ).localCheckpoint(eager=False)
        pairs = (
            bucketed.alias("a")
            .join(
                bucketed.alias("b"),
                (F.col("a.tbl") == F.col("b.tbl"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                F.col("a.v").alias("v_a"),
                F.col("b.v").alias("v_b"),
            )
            .dropDuplicates(["id_a", "id_b"])
        )
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("v_a"), F.col("v_b")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def train_centroids(
    df: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_rows: int = 4096,
    iters: int = 10,
) -> list[tuple[int, list[float]]]:
    """Driver-side Lloyd's k-means over a BOUNDED sample — the real
    coarse quantizer for `ivf_topk(centroids=...)`. `take(sample_rows)`
    reads only enough partitions (never a full corpus scan); at true
    corpus scale you'd train once offline and reuse. Deterministic:
    init picks are spread by md5(id) like the fallback sampler.
    """
    import hashlib

    import numpy as np

    rows = df.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v")).take(
        max(sample_rows, k)
    )
    rows = sorted(rows, key=lambda r: hashlib.md5(str(r["i"]).encode()).hexdigest())
    x = np.array([[float(c) for c in r["v"]] for r in rows], dtype=np.float64)
    # cosine k-means: operate on unit vectors, assign by max dot
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    x = x / np.where(norms == 0, 1, norms)
    cent = x[:k].copy()
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for j in range(k):
            members = x[assign == j]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cent[j] = m / n
    return [(j, cent[j].tolist()) for j in range(k)]


def _ranked_centroids_arrow(
    centroids: list[tuple[int, list[float]]], n_top: int
):
    """Vectorized centroid ranking: a pandas_udf whose body is ONE numpy
    matmul per Arrow batch — scores every vector against the full
    centroid matrix at BLAS speed, then argsorts the top `n_top` ids.
    This is the write-time/online assignment path at scale: the
    expression form ranks n_centroids INTERPRETED higher-order-function
    cosines per vector (measured 5× slower than every sibling tier at
    1M vectors, SCALE.md), while a (batch × dim) @ (dim × centroids)
    matmul is microseconds per thousand rows. Tie semantics are
    identical to the expression form: score_i = cos_i + i·1e-9, ranked
    descending — cross-engine double noise (~1e-16) cannot reorder
    scores separated by the 1e-9 index epsilon."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    c_ids = np.array([c_id for c_id, _ in centroids], dtype=np.int64)
    c_mat = np.array([vec for _, vec in centroids], dtype=np.float64)
    c_norm = np.linalg.norm(c_mat, axis=1)
    c_norm = np.where(c_norm == 0, 1.0, c_norm)
    eps = np.arange(len(centroids), dtype=np.float64) * 1e-9

    def ranked(vecs):
        x = np.array(vecs.tolist(), dtype=np.float64)
        xn = np.linalg.norm(x, axis=1)
        xn = np.where(xn == 0, 1.0, xn)
        scores = (x @ c_mat.T) / (xn[:, None] * c_norm[None, :]) + eps[None, :]
        order = np.argsort(-scores, axis=1, kind="stable")[:, :n_top]
        return pd.Series(list(c_ids[order]))

    # real type objects, not strings: this module uses postponed
    # annotation evaluation, and pandas_udf cannot resolve the string
    # form ('pd.Series') against module globals where pd is lazy
    ranked.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    return pandas_udf(ranked, "array<long>")


def assign_centroids(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    *,
    vec_col: str = "embedding",
    out_col: str = "centroid",
) -> DataFrame:
    """WRITE-TIME IVF materialization: append the nearest-centroid id so
    the corpus can be written partitioned by it —

        assign_centroids(corpus, cents).write.partitionBy("centroid")...

    — after which a probe query that filters ``centroid IN (<probes>)``
    scans only n_probes/n_centroids of the files (Spark partition
    pruning; pinned by tests/test_functions.py::TestIvfWriteTime). This
    is the story `ivf_topk`'s docstring tells about 100 TB: assignment
    is one numpy matmul per Arrow batch at ingest, and query cost is
    bounded by the probed lists' bytes, not the corpus. Uses the same
    kernel (and therefore the same tie order) as online `ivf_topk`."""
    ranked = _ranked_centroids_arrow(centroids, 1)
    return df.withColumn(out_col, F.element_at(ranked(F.col(vec_col)), 1))


def ivf_topk(
    df: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probes: int = 2,
    centroids: list[tuple[int, list[float]]] | None = None,
    assign: str = "auto",
) -> DataFrame:
    """IVF (inverted-file) ANN: assign every vector to its nearest
    coarse centroid; a query searches only its `n_probes` nearest
    centroids' lists. The 100 TB path alongside LSH: the corpus shuffles
    once on centroid id (or is bucketed/partitioned by it at write time),
    and query cost is probes/centroids of the corpus.

    Pass trained `centroids` explicitly at scale (k-means offline, or any
    coarse quantizer) — the plan is identical. When omitted, centroids are
    a deterministic BOUNDED sample: `take(8×k)` reads only enough
    partitions (never a full count()+scan of the corpus) and the driver
    spreads picks by hashed id — a reproducible stand-in for k-means.

    `assign` picks the centroid-ranking kernel: ``"arrow"`` is the
    vectorized numpy-matmul pandas_udf (`_ranked_centroids_arrow`) —
    the production path, ~9× faster at 1M vectors; ``"expr"`` is the
    pure-column-expression twin that the DuckDB oracle mirrors
    term-for-term. Both produce identical assignments (shared
    cos + index·1e-9 tie order), and both are oracle-checked —
    which is what makes ``"auto"`` (default) free: it reads the
    corpus scan's optimizer size estimate and picks ``expr`` below
    `ILOGTAIL_IVF_EXPR_MAX_BYTES` (default 256 KB ≈ a few hundred
    vectors). Measured profile (32 cores, 3 reps/cell — SCALE.md):
    the Arrow kernel is flat ~0.65 s at 200, 2k and 20k vectors once
    Python workers exist, but the FIRST pandas_udf in a session pays a
    one-time ~4 s worker spin-up — the whole r7 "ann_ivf drift" (its
    6.9× first-rep spread) was that spin-up, not the kernel. The expr
    twin runs 0.65 s / 1.1 s / 5.5 s at the same sizes (per-row
    interpreted-cosine cost grows linearly) AND pays ~1.5 s of
    per-invocation query-construction/analysis for its 16×dim literal
    trees even as one SQL string (see ranked_centroids), so it only
    nets out ahead on the smallest correctness-tier corpora. The
    threshold is env-tunable (set 0 to force arrow everywhere).
    """
    if assign == "auto":
        import os

        try:
            max_bytes = int(
                os.environ.get("ILOGTAIL_IVF_EXPR_MAX_BYTES", str(256 * 1024))
            )
        except ValueError:
            max_bytes = 256 * 1024  # malformed env: keep the default
        try:
            est = int(
                df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
        except Exception:
            est = max_bytes + 1  # unknown size: assume big, keep arrow
        assign = "expr" if est <= max_bytes else "arrow"
    if centroids is None:
        import hashlib

        sample = df.select(
            F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec")
        ).take(max(n_centroids * 8, n_centroids))
        sample = sorted(
            sample, key=lambda r: hashlib.md5(str(r["c_id"]).encode()).hexdigest()
        )[:n_centroids]
        centroids = [(int(r["c_id"]), [float(x) for x in r["c_vec"]]) for r in sample]

    def ranked_centroids(vec_name: str) -> Column:
        """Struct array sorted best-first: one score expression per
        centroid, shared by assignment and probing. (A when-cascade
        argmax duplicates each score expr at every level — exponential
        plan blowup; this stays linear.) Epsilon on the index makes tie
        order identical everywhere.

        Built as ONE SQL string (`F.expr`), not nested Column calls:
        the Column form issues a py4j round-trip per literal — 16
        centroids × dim components ≈ several thousand driver→JVM calls,
        measured 3–6 s of pure client-side query BUILD time per
        invocation (the whole cost of the expr kernel at small SFs; the
        executed plan is identical). `repr(float)` is shortest-round-
        trip, so every parsed literal is bit-identical to F.lit's."""
        cells = []
        for i, (c_id, c_vec) in enumerate(centroids):
            arr = (
                "array("
                + ",".join(f"CAST('{v!r}' AS DOUBLE)" for v in c_vec)
                + ")"
            )
            dot = (
                f"aggregate(zip_with(`{vec_name}`, {arr}, (x, y) -> "
                "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), "
                "(acc, v) -> acc + v)"
            )
            vnorm = (
                f"sqrt(aggregate(transform(`{vec_name}`, x -> "
                "CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), "
                "(acc, v) -> acc + v))"
            )
            cnorm = (
                f"sqrt(aggregate(transform({arr}, x -> "
                "CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), "
                "(acc, v) -> acc + v))"
            )
            score = (
                f"(({dot}) / (({vnorm}) * ({cnorm})))"
                f" + CAST('{(i * 1e-9)!r}' AS DOUBLE)"
            )
            cells.append(f"named_struct('s', {score}, 'c', {int(c_id)})")
        return F.expr(
            "reverse(array_sort(array(" + ",".join(cells) + ")))"
        )

    from ilogtail_spark.partitioning import spread_for_expansion

    df = spread_for_expansion(df, id_col)
    if assign == "arrow":
        ranked_udf = _ranked_centroids_arrow(centroids, max(n_probes, 1))
        corpus_centroid = F.element_at(ranked_udf(F.col(vec_col)), 1)
        probe_centroids = F.slice(ranked_udf(F.col(vec_col)), 1, n_probes)
    elif assign == "expr":
        corpus_centroid = F.element_at(
            ranked_centroids(vec_col), 1
        ).getField("c")
        probe_centroids = F.slice(
            ranked_centroids(vec_col), 1, n_probes
        ).getField("c")
    else:
        raise ValueError(f"assign must be 'arrow' or 'expr', got {assign!r}")
    corpus = df.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("c_vec"),
        corpus_centroid.cast("long").alias("centroid"),
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(probe_centroids.cast("array<long>")).alias("centroid"),
    )
    scored = corpus.join(F.broadcast(q), "centroid").filter(
        F.col("q_id") != F.col("n_id")
    ).select(
        "q_id", "n_id",
        F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "cos_sim", "rank")
    )


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: each component from an
    md5 of (plane_idx, i) — no RNG state, reproducible anywhere, and
    crucially UNCORRELATED across components and planes. (The previous
    LCG on consecutive indices had the classic lattice structure:
    correlated planes collapsed the sign-pattern space, skewing LSH
    buckets ~1000× above uniform at 100k vectors — measured 11.9M
    candidate pairs where a uniform bucketing yields ~12k.) The same
    values feed the DuckDB oracles via `_plane_lit`, so both engines
    stay bit-identical by construction."""
    import hashlib

    vals = []
    for i in range(dim):
        h = hashlib.md5(f"hyperplane:{plane_idx}:{i}".encode()).digest()
        x = int.from_bytes(h[:8], "big") / float(2**64)
        vals.append(x * 2.0 - 1.0)
    return vals


def _table_signature(vec: Column, dim: int, table: int, n_planes: int) -> Column:
    """2^n_planes-bucket hyperplane signature for one LSH table. Table t
    uses planes t*n_planes … t*n_planes+n_planes-1 of the md5-derived
    family — table 0 is therefore EXACTLY the single-table signature,
    and every table's plane set is independent of every other's."""
    out = F.lit(0)
    for p_idx in range(n_planes):
        plane = _hyperplane(dim, table * n_planes + p_idx)
        plane_col = F.array(*[F.lit(v) for v in plane])
        out = out + F.when(_dot(vec, plane_col) >= 0, F.lit(2**p_idx)).otherwise(
            F.lit(0)
        )
    return out


def lsh_bucket_topk(
    df: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 1,
    dim: int | None = None,
) -> DataFrame:
    """ANN via random-hyperplane LSH: vectors hash to a 2^n_planes-bucket
    signature; candidates are corpus vectors sharing a query's bucket;
    exact cosine re-ranks within bucket. Recall < 1 by design — the
    scale/efficiency trade the brute-force tier anchors.

    `n_tables` is the OR-amplification knob: a pair colliding in ANY of
    the tables becomes a candidate, lifting recall from (1−θ/π)^planes
    to 1−(1−(1−θ/π)^planes)^tables — the standard AND-OR construction.
    At the near-dup threshold one table suffices (recall ≈ 1 already),
    but moderate-threshold ANN (cos ≈ 0.9, θ ≈ 26°) needs several
    tables: with 8 planes per table, 1 table recalls ~29% of true
    cos-0.9 neighbors, 4 tables ~75%, 8 tables ~94% (SCALE.md has the
    measured 1M-vector numbers). Cost is linear in tables: the corpus
    explodes to n_tables (table, bucket) rows, the join shuffles
    O(n·tables), and duplicate candidates are deduped before the exact
    re-rank so multi-table hits are scored once."""
    from ilogtail_spark.partitioning import spread_for_expansion

    df = spread_for_expansion(df, id_col)
    if dim is None:
        dim = len(df.select(vec_col).first()[0])

    if n_tables == 1:
        # single-table fast path: buckets within a table are disjoint,
        # so no candidate dedup is needed and the join key is scalar
        corpus = df.select(
            F.col(id_col).alias("n_id"),
            F.col(vec_col).alias("c_vec"),
            _table_signature(F.col(vec_col), dim, 0, n_planes).alias("bucket"),
        )
        q = queries.select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("q_vec"),
            _table_signature(F.col(vec_col), dim, 0, n_planes).alias("bucket"),
        )
        scored = corpus.join(F.broadcast(q), on="bucket").filter(
            F.col("q_id") != F.col("n_id")
        ).select(
            "q_id",
            "n_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim"),
        )
    else:
        sigs = lambda vec: F.array(  # noqa: E731
            *[_table_signature(vec, dim, t, n_planes) for t in range(n_tables)]
        )
        corpus = df.select(
            F.col(id_col).alias("n_id"),
            F.col(vec_col).alias("c_vec"),
            F.posexplode(sigs(F.col(vec_col))).alias("tbl", "bucket"),
        )
        q = queries.select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("q_vec"),
            F.posexplode(sigs(F.col(vec_col))).alias("tbl", "bucket"),
        )
        # a pair colliding in several tables must re-rank ONCE — the
        # duplicate rows carry identical vectors, so dropDuplicates on
        # the id pair is deterministic in content
        cand = (
            corpus.join(F.broadcast(q), on=["tbl", "bucket"])
            .filter(F.col("q_id") != F.col("n_id"))
            .dropDuplicates(["q_id", "n_id"])
        )
        scored = cand.select(
            "q_id",
            "n_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim"),
        )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "cos_sim", "rank")
    )


def quantize_embeddings(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    code_col: str = "qcode",
    scale_col: str = "qscale",
) -> DataFrame:
    """Symmetric int8 scalar quantization — the standard 4x memory
    compression for a serving/ANN corpus: per-vector scale =
    max(|x|)/127, code_i = round(x_i/scale) in [-127, 127]. The scan at
    100 TB reads 1/4 the bytes; exact re-ranking reloads float vectors
    only for the survivors. Deterministic (half-up rounding via
    bround-compatible double math) and oracle-checkable.
    """
    v = F.col(vec_col)
    absmax = F.aggregate(
        F.transform(v, lambda x: F.abs(x.cast("double"))),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
    scale = F.when(absmax > 0, absmax / F.lit(127.0)).otherwise(F.lit(1.0))
    codes = F.transform(
        v, lambda x: F.round(x.cast("double") / scale).cast("int")
    )
    return df.withColumns({code_col: codes, scale_col: scale})


def dequantized_cosine(qa: Column, sa: Column, qb: Column, sb: Column) -> Column:
    """Cosine over int8 codes: scales cancel in the normalized form, so
    this is integer dot / (int norms) — cheap and scale-free."""
    dot = F.aggregate(
        F.zip_with(qa, qb, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    n = lambda q: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(q, lambda x: (x * x).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return dot / (n(qa) * n(qb))


def brute_force_topk_int8(
    df: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """brute_force_topk over the int8-quantized corpus: same broadcast +
    window shape, 4x less corpus I/O, approximate scores (re-rank the
    top-k with float vectors when exactness matters)."""
    c = quantize_embeddings(df, vec_col=vec_col)
    q = quantize_embeddings(queries, vec_col=vec_col).select(
        F.col(id_col).alias("q_id"),
        F.col("qcode").alias("q_code"),
    )
    scored = c.join(F.broadcast(q), F.col("q_id") != F.col(id_col)).select(
        "q_id",
        F.col(id_col).alias("n_id"),
        # round BEFORE ranking (like every other top-k tier here) so the
        # sort key is identical to the one a 6-decimal oracle uses —
        # ranking on the raw double lets sub-1e-6 score differences flip
        # top-k membership across engines
        F.round(
            dequantized_cosine(F.col("q_code"), F.lit(1.0), F.col("qcode"), F.lit(1.0)),
            6,
        ).alias("score"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("n_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("q_id", "n_id", "score", "rk")
    )


def kmeans_step(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign: str = "arrow",
) -> DataFrame:
    """ONE distributed Lloyd's update for spherical (cosine) k-means:
    assign every vector to its nearest centroid, then emit the
    per-(centroid, dim) mean of UNIT-normalized components — the k×dim
    rows the driver folds into the next centroid set. This is the
    full-corpus trainer that `train_centroids`' docstring defers to
    ("at true corpus scale you'd train once offline"): assignment is
    the same vectorized numpy-matmul Arrow kernel as write-time IVF
    (`assign_centroids`), the mean is one partial-aggregating groupBy,
    and the job's output is k×dim rows regardless of corpus size.

    assign='expr' is the pure-column-expression twin (cos + c_id·1e-9
    argmax, exactly `ivf_topk(assign='expr')`'s rule) that the DuckDB
    oracle replays term-for-term — registering BOTH modes against one
    oracle pins kernel/expression assignment equality, the ann_ivf /
    ann_ivf_expr precedent.

    Determinism: components are rounded to a 6-decimal grid and summed
    as DECIMAL(18,6) — exact, order-independent — so the unordered
    distributed aggregation is reproducible bit-for-bit (the
    unigram_nll / quality_logistic trick).
    """
    if assign == "arrow":
        assigned = assign_centroids(df, centroids, vec_col=vec_col)
    elif assign == "expr":
        spark = df.sparkSession
        cent = spark.createDataFrame(
            [(int(c), [float(x) for x in v]) for c, v in centroids],
            "c_id long, c_vec array<double>",
        )
        scored = df.join(F.broadcast(cent)).withColumn(
            "__score",
            cosine(F.col(vec_col), F.col("c_vec")) + F.col("c_id") * F.lit(1e-9),
        )
        w = Window.partitionBy(id_col).orderBy(F.desc("__score"))
        assigned = (
            scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .withColumnRenamed("c_id", "centroid")
            .drop("c_vec", "__score", "__rn")
        )
    else:
        raise ValueError(f"unknown assign mode {assign!r}")
    # the norm must be a PINNED NAMED column: inlined into the
    # transform lambda it re-evaluates the O(dim) aggregate once per
    # component — O(dim²) per row, measured 6.6 s vs 1.5 s at sf1.0
    # (see exprutil.pin)
    from ilogtail_spark.exprutil import pin

    assigned = assigned.withColumn("__nrm__", pin(_norm(F.col(vec_col))))
    unit = F.transform(
        F.col(vec_col), lambda x: x.cast("double") / F.col("__nrm__")
    )
    comp = assigned.select(
        F.col("centroid").cast("long").alias("centroid"),
        F.posexplode(unit).alias("dim", "comp"),
    )
    return comp.groupBy("centroid", "dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.round(F.col("comp"), 6).cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_val"),
    )


def kmeans_train_distributed(
    df: DataFrame,
    k: int,
    *,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign: str = "arrow",
) -> list[tuple[int, list[float]]]:
    """Full-corpus spherical k-means via `kmeans_step`: one distributed
    job per iteration, k×dim rows collected per round (never the data).
    Init is deterministic — the k vectors with smallest md5(id), the
    same spread rule as the bounded sampler — so retries/re-runs train
    identical centroids. Empty clusters keep their previous centroid;
    means are re-normalized to the unit sphere driver-side (Lloyd's for
    cosine). Output plugs straight into `ivf_topk(centroids=...)` /
    `assign_centroids`."""
    import math

    seeds = (
        df.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .withColumn("h", F.md5(F.col("i").cast("string")))
        .orderBy("h")
        .limit(k)
        .collect()
    )
    if len(seeds) < k:
        raise ValueError(f"need at least k={k} rows, got {len(seeds)}")

    def _unit(v: list[float]) -> list[float]:
        n = math.sqrt(sum(float(x) * float(x) for x in v))
        return [float(x) / n if n > 0 else 0.0 for x in v]

    cents = [(j, _unit(list(r["v"]))) for j, r in enumerate(seeds)]
    dim = len(cents[0][1])
    for _ in range(iters):
        rows = kmeans_step(df, cents, id_col=id_col, vec_col=vec_col, assign=assign).collect()
        means: dict[int, list[float]] = {}
        for r in rows:
            means.setdefault(int(r["centroid"]), [0.0] * dim)[int(r["dim"])] = float(
                r["mean_val"]
            )
        cents = [
            (j, _unit(means[j]) if j in means else v) for j, v in cents
        ]
    return cents


def embedding_drift(
    old: DataFrame,
    new: DataFrame,
    group_cols: tuple[str, ...] = ("label",),
    emb_col: str = "embedding",
    *,
    decimals: int = 6,
) -> DataFrame:
    """Embedding-distribution drift monitor between two corpus
    snapshots: per (group, dimension), the component mean in each
    snapshot and the delta — the QA check that catches a re-embedding
    run (model swap, preprocessing change) silently shifting a slice of
    the corpus. Distinct from `kmeans_step`'s assignment means: this
    compares two VERSIONS of the same corpus under fixed groups.

    Arithmetic is the repo's exact-aggregation discipline: components
    round to a `decimals` grid and sum as DECIMAL (order-independent,
    engine-exact); one double division per cell, re-rounded. Shape:
    one posexplode per side (O(rows × dim), map-side-combinable agg on
    (group, dim)) and a join on the O(groups × dim) cell space — never
    row-shaped."""
    def means(df: DataFrame, out: str) -> DataFrame:
        comp = F.round(F.col("c").cast("double"), decimals).cast(
            f"decimal(28,{decimals})"
        )
        return (
            df.select(*group_cols, F.posexplode(emb_col).alias("dim", "c"))
            .groupBy(*group_cols, "dim")
            .agg(
                F.round(
                    (F.sum(comp)).cast("double") / F.count(F.lit(1)), decimals
                ).alias(out)
            )
        )
    keys = [*group_cols, "dim"]
    j = means(old, "mean_old").join(means(new, "mean_new"), keys)
    return j.select(
        *keys,
        "mean_old",
        "mean_new",
        F.round(F.col("mean_new") - F.col("mean_old"), decimals).alias("delta"),
    )
