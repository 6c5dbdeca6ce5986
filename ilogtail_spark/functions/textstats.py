"""Text analysis for training-data pipelines over the `documents` table.

Beyond the reference's operator set (task brief): language-ID, quality
scoring, token counting, document fingerprinting. All pure Column
expressions — at 100 TB these run inside whole-stage codegen with the
scan, no shuffle except the explicit fingerprint aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small stopword lists for the n-gram/stopword-ratio language heuristic.
EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "was", "at", "by", "be", "this",
]
DE_STOPWORDS = [
    "der", "die", "das", "und", "oder", "von", "zu", "im", "ist", "es",
    "dass", "für", "auf", "mit", "als", "war", "bei", "sein", "ein", "eine",
]


def tokens(col: Column) -> Column:
    """Whitespace tokenization, empty-safe (shared by all text ops)."""
    return F.split(F.trim(col), r"\s+")


def token_count(df: DataFrame, text_col: str = "text", out: str = "n_tokens") -> DataFrame:
    return df.withColumn(out, F.size(tokens(F.col(text_col))))


def bpe_ish_token_count(
    df: DataFrame, text_col: str = "text", out: str = "n_bpe_tokens"
) -> DataFrame:
    """BPE-ish token estimate: count word pieces + digits + punctuation
    runs via a tokenizer regex (`\\w+ | digit runs | single punct`).
    regexp_count keeps it JVM-side."""
    return df.withColumn(
        out, F.regexp_count(F.col(text_col), F.lit(r"[A-Za-z]{1,8}|[0-9]|[^A-Za-z0-9\s]"))
    )


def tokenizer_backend() -> str | None:
    """Which real-tokenizer library is importable, if any — the
    availability gate for `token_count_exact` (same pattern as the
    PIL/pyvips gates in `functions/multimodal.py`). Neither ships in
    this sandbox; on a production image either makes token budgets
    exact."""
    for mod in ("tiktoken", "tokenizers"):
        try:
            __import__(mod)
            return mod
        except ImportError:
            continue
    return None


def token_count_exact(
    df: DataFrame,
    text_col: str = "text",
    out: str = "n_tokens_exact",
    *,
    tokenizer="auto",
    encoding: str = "cl100k_base",
) -> DataFrame:
    """EXACT token counts through a real tokenizer, as an Arrow-batched
    pandas_udf — the production form of `bpe_ish_token_count` wherever
    a tokenizer library is installed. `pack_greedy` budgets fed from
    this column are exact in model tokens, not estimates.

    ``tokenizer`` is the pluggable surface:
      * a callable ``list[str] -> list[int]`` (counts per text) — any
        picklable batch tokenizer; the encoder itself should be built
        lazily inside the callable so executors construct it once
        (see `_tiktoken_counter` for the shape);
      * ``"auto"`` — use tiktoken (``encoding``) or HuggingFace
        `tokenizers` when importable, else FALL BACK to the
        `bpe_ish_token_count` regex estimate (same output column, so
        downstream budget logic is oblivious to which tier ran);
      * ``None`` — force the bpe_ish fallback.

    Scale shape: one Arrow stage (ArrowEvalPython), batch-at-a-time
    encode — tokenizers are the rare case where Python is unavoidable,
    and the Arrow batch transfer keeps it off the row-at-a-time path.
    No shuffle; composes with the scan like every per-doc projection."""
    fn = tokenizer if callable(tokenizer) else None
    if fn is None and tokenizer == "auto":
        backend = tokenizer_backend()
        if backend == "tiktoken":
            fn = _tiktoken_counter(encoding)
        elif backend == "tokenizers":
            fn = _hf_counter()
    if fn is None:
        return bpe_ish_token_count(df, text_col, out)

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def count(texts):
        return pd.Series(
            fn(texts.fillna("").tolist()), index=texts.index, dtype="int64"
        )

    # real type objects, not strings: postponed annotation evaluation
    # (module-level `from __future__ import annotations`) breaks
    # pandas_udf's string-hint resolution — same fix as the IVF kernel
    count.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return df.withColumn(out, pandas_udf(count, "long")(F.col(text_col)))


def _tiktoken_counter(encoding: str):
    def counts(texts: list) -> list:
        import tiktoken

        enc = tiktoken.get_encoding(encoding)
        return [len(t) for t in enc.encode_ordinary_batch(texts)]

    return counts


def _hf_counter():
    def counts(texts: list) -> list:
        from tokenizers import Tokenizer

        if not hasattr(Tokenizer, "_ils_cached"):
            Tokenizer._ils_cached = Tokenizer.from_pretrained("gpt2")
        enc = Tokenizer._ils_cached
        return [len(e.ids) for e in enc.encode_batch(texts)]

    return counts


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + composite score:
    length, mean token length, punctuation ratio, stopword ratio,
    uppercase ratio. Deterministic arithmetic only (oracle-checkable)."""

    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks)
    n_char = F.length(t)
    stop_arr = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, F.lower(x))))
    n_punct = F.regexp_count(t, F.lit(r"[^\w\s]"))
    n_upper = F.regexp_count(t, F.lit(r"[A-Z]"))
    df = df.withColumns(
        {
            "n_chars_q": n_char,
            "n_tokens": n_tok,
            "mean_token_len": F.round((n_char - n_tok + 1) / n_tok, 4),
            "punct_ratio": F.round(n_punct / F.greatest(n_char, F.lit(1)), 6),
            "stopword_ratio": F.round(n_stop / F.greatest(n_tok, F.lit(1)), 6),
            "upper_ratio": F.round(n_upper / F.greatest(n_char, F.lit(1)), 6),
        }
    )
    score = (
        F.when((F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when(F.col("stopword_ratio") >= 0.05, F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(F.col("punct_ratio") <= 0.2, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(F.col("upper_ratio") <= 0.3, F.lit(0.1)).otherwise(F.lit(0.0))
    )
    return df.withColumn("quality_score", F.round(score, 2))


# stand-in coefficients for the pluggable linear quality model below —
# hand-set to rank obviously-good text above obviously-bad, documented
# as the slot where a TRAINED model's weights go
DEFAULT_QUALITY_WEIGHTS = {
    "log_n_tokens": 0.8,
    "mean_token_len": 0.1,
    "punct_ratio": -4.0,
    "stopword_ratio": 3.0,
    "upper_ratio": -2.0,
}


def quality_logistic(
    df: DataFrame,
    text_col: str = "text",
    *,
    weights: dict[str, float] | None = None,
    bias: float = -2.0,
    out: str = "quality_prob",
) -> DataFrame:
    """Linear quality model over the heuristic features — the shape of
    the trained quality filters real curation pipelines run (CCNet's
    fastText LM filter, the LLaMA/Gopher quality classifiers): a
    logistic score σ(bias + w·features) with PLUGGABLE weights, so a
    model trained offline drops in as a dict and the plan stays one
    fused whole-stage-codegen projection — zero shuffle, zero Python.

    Features are `quality_score`'s rounded ratios plus a rounded
    log1p(token count); rounding each feature BEFORE the dot product is
    what keeps the score reproducible across engines (libm log/exp may
    differ in the last ulp; a 6-decimal feature grid absorbs it, and
    the final σ is rounded to 6 as well). The accumulation is a fixed
    left-associated chain in `weights` order — same discipline as the
    BM25 score chain."""

    d = quality_score(df, text_col).withColumn(
        "log_n_tokens", F.round(F.log1p(F.col("n_tokens")), 6)
    )
    z = F.lit(float(bias))
    for feat, w in (weights or DEFAULT_QUALITY_WEIGHTS).items():
        z = z + F.lit(float(w)) * F.col(feat)
    return d.withColumn(
        out, F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    )


# Gopher rule-filter stopword set (Rae et al. 2021 §A1.1: keep docs
# containing at least 2 of these)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_ellipsis_line_frac: float = 0.3,
    ellipsis_suffixes: tuple[str, ...] = ("...", "…"),
    max_bullet_line_frac: float = 0.9,
    bullet_prefixes: tuple[str, ...] = ("-", "*", "•"),
    max_symbol_word_ratio: float = 0.1,
    symbols: tuple[str, ...] = ("#", "…"),
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
) -> DataFrame:
    """Gopher-style document rule filter (Rae et al. 2021 §A1.1) as ONE
    fused projection: word-count bounds, mean-word-length bounds,
    ellipsis-line and bullet-line fractions, symbol-to-word ratio,
    alphabetic-word fraction, and a distinct-stopword floor. Emits the
    measured features (ratios on a rounded 6-dec grid — deterministic,
    oracle-checkable), one boolean per rule, and `keep` = AND of all.

    Every threshold and token set is a parameter because real curation
    runs tune them per corpus; the defaults are the published Gopher
    values. Pure column expressions — zero shuffle, zero Python; at
    100 TB this runs inside whole-stage codegen with the scan, so the
    filter costs one pass regardless of how many rules are active.
    Symbol counts use the replace-length-delta (regexp_count measured
    ~50× slower for fixed strings)."""
    from ilogtail_spark.exprutil import pin

    t = F.col(text_col)
    # pin the two expensive splits as named columns: five output
    # columns reference `words` and two reference `lines`, and the
    # higher-order lambdas consuming them are CodegenFallback, so
    # runtime subexpression elimination never dedupes the inlined
    # regex split of the (page-sized) text per referencing column
    df = df.withColumns(
        {"__gw__": pin(tokens(t)), "__gl__": pin(F.split(t, "\n"))}
    )
    words = F.col("__gw__")
    n_words = F.size(words)
    sum_word_len = F.aggregate(
        F.transform(words, lambda w: F.length(w)), F.lit(0), lambda a, x: a + x
    )
    lines = F.col("__gl__")
    n_lines = F.greatest(F.size(lines), F.lit(1))

    def _endswith_any(line: Column) -> Column:
        c = F.lit(False)
        for s in ellipsis_suffixes:
            c = c | F.rtrim(line).endswith(F.lit(s))
        return c

    def _startswith_any(line: Column) -> Column:
        c = F.lit(False)
        for p in bullet_prefixes:
            c = c | F.ltrim(line).startswith(F.lit(p))
        return c

    n_symbols = F.lit(0)
    for s in symbols:
        # the length delta is an exact multiple of len(s); Column has no
        # floordiv, so divide and cast back to an exact integer
        n_symbols = n_symbols + (
            (F.length(t) - F.length(F.replace(t, F.lit(s), F.lit("")))) / len(s)
        ).cast("long")
    low_words = F.transform(words, lambda w: F.lower(w))
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in stopwords]),
            lambda s: F.array_contains(low_words, s),
        )
    )
    d = df.withColumns(
        {
            "n_words": n_words,
            "mean_word_len": F.round(sum_word_len / F.greatest(n_words, F.lit(1)), 4),
            "ellipsis_line_frac": F.round(
                F.size(F.filter(lines, _endswith_any)) / n_lines, 6
            ),
            "bullet_line_frac": F.round(
                F.size(F.filter(lines, _startswith_any)) / n_lines, 6
            ),
            "symbol_word_ratio": F.round(
                n_symbols / F.greatest(n_words, F.lit(1)), 6
            ),
            "alpha_word_frac": F.round(
                F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
                / F.greatest(n_words, F.lit(1)),
                6,
            ),
            "stopword_hits": stop_hits,
        }
    )
    rules = {
        "r_word_count": (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words),
        "r_mean_word_len": (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len),
        "r_ellipsis": F.col("ellipsis_line_frac") <= max_ellipsis_line_frac,
        "r_bullet": F.col("bullet_line_frac") <= max_bullet_line_frac,
        "r_symbol": F.col("symbol_word_ratio") <= max_symbol_word_ratio,
        "r_alpha": F.col("alpha_word_frac") >= min_alpha_word_frac,
        "r_stopwords": F.col("stopword_hits") >= min_stopword_hits,
    }
    d = d.withColumns(rules)
    keep = F.lit(True)
    for r in rules:
        keep = keep & F.col(r)
    return d.withColumn("keep", keep).drop("__gw__", "__gl__")


# tiny character-trigram profiles (most frequent trigrams incl. spaces,
# standard n-gram language-ID features)
EN_TRIGRAMS = [" th", "the", "he ", "ing", "nd ", " an", "and", " of", "of ", "ed "]
DE_TRIGRAMS = ["en ", "er ", " de", "der", "ie ", "ch ", "sch", "ein", " un", "und"]


def lang_id(
    df: DataFrame, text_col: str = "text", out: str = "lang_pred",
    *, mode: str = "stopword",
) -> DataFrame:
    """Language-ID heuristic, two deterministic shuffle-free modes:

    mode='stopword': the language whose stopword list hits the most
    tokens wins; ties/no-hits → 'und'.
    mode='trigram' : classic char-n-gram scoring — count occurrences of
    each language's top character trigrams; counted regex-free via the
    length-delta of a replace (regexp_count measured 50× slower here),
    highest total wins.
    """

    if mode == "trigram":
        low = F.lower(F.col(text_col))

        def hits(grams: list[str]) -> Column:
            total = F.lit(0)
            for g in grams:
                total = total + (
                    F.length(low) - F.length(F.replace(low, F.lit(g), F.lit(g[:-1])))
                )
            return total

        en_hits, de_hits = hits(EN_TRIGRAMS), hits(DE_TRIGRAMS)
    else:
        toks = tokens(F.lower(F.col(text_col)))
        en_arr = F.array(*[F.lit(w) for w in EN_STOPWORDS])
        de_arr = F.array(*[F.lit(w) for w in DE_STOPWORDS])
        en_hits = F.size(F.filter(toks, lambda x: F.array_contains(en_arr, x)))
        de_hits = F.size(F.filter(toks, lambda x: F.array_contains(de_arr, x)))
    return df.withColumn(
        out,
        F.when((en_hits > de_hits) & (en_hits > 0), F.lit("en"))
        .when((de_hits > en_hits) & (de_hits > 0), F.lit("de"))
        .otherwise(F.lit("und")),
    )


def kgram_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 5,
    mod_p: int = 4,
) -> DataFrame:
    """Rolling-hash document fingerprinting (MOD-p / 0-mod-p sampling,
    the scheme winnowing improves on): hash every token k-gram with a
    stable hash, keep the ~1/mod_p of hashes ≡ 0 (mod mod_p) as the
    document's fingerprint set, plus an order-insensitive digest.
    Copied/overlapping passages share fingerprints regardless of
    position — the plagiarism/near-dup detection primitive. Pure array
    expressions, no shuffle."""
    from ilogtail_spark.functions.dedup import _hash32, _shingles

    hashes = F.transform(_shingles(F.col(text_col), k), _hash32)
    sampled = F.array_sort(
        F.array_distinct(F.filter(hashes, lambda h: h % mod_p == 0))
    )
    return df.select(
        F.col(id_col),
        sampled.alias("fingerprints"),
        F.md5(F.array_join(F.transform(sampled, lambda h: h.cast("string")), ",")).alias(
            "fp_digest"
        ),
        F.size(sampled).alias("n_fingerprints"),
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Document fingerprint: position-weighted token hash folded mod a
    prime — a rolling-hash analog that is exactly reproducible in ANSI
    SQL (posexplode + sum), so the oracle can verify it. Distributed as a
    partial aggregation (map-side combine) over exploded tokens."""
    tok = tokens(F.col(text_col))
    exploded = df.select(
        F.col(id_col), F.posexplode(tok).alias("pos", "tok")
    ).withColumn(
        "piece",
        ((F.col("pos") + 1) * (F.length("tok") * 131 + F.ascii("tok"))) % 1000000007,
    )
    return exploded.groupBy(id_col).agg(
        (F.sum("piece") % 1000000007).alias("fingerprint"),
        F.count(F.lit(1)).alias("n_tokens"),
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition quality signals per document (the
    repetition filters of Rae et al. 2021 §A1.1, standard in
    training-data pipelines): fraction of words in the most common word,
    fraction in the most common word-bigram, and the duplicate-word
    fraction.

    Scale shape: explode → two hash aggregations keyed by doc (and
    doc+gram) — both shuffles partition on the document key, fully
    map-side-combinable, linear in corpus size. Deliberately NOT a
    higher-order-function fold: per-doc mode via array exists() is
    O(words²) per row, while the explode plan is O(words).
    """
    from ilogtail_spark.partitioning import spread_for_expansion

    df = spread_for_expansion(df, id_col)
    words = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda w: w != "")
    # the tokenized relation feeds BOTH the unigram and the bigram
    # explode; checkpointed so lower+split+filter runs once per doc
    # (the bm25/banded convention — blocks are GC'd with the plan)
    base = df.select(F.col(id_col), words.alias("__w")).localCheckpoint(
        eager=False
    )

    uni = base.select(id_col, F.explode("__w").alias("g"))
    uni_stats = (
        uni.groupBy(id_col, "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_words"),
            F.max("c").alias("top_word_n"),
            F.count(F.lit(1)).alias("n_distinct"),
        )
    )

    # bigrams via one zip_with concat over the shifted view (the
    # _kgrams trick): one string concat per element instead of two
    # element_at lookups through a materialized index sequence.
    # concat (not concat_ws) + explicit slice: the zip_with pads the
    # shorter side with NULL and concat_ws would silently keep those
    # rows as unigrams.
    sz = F.size("__w")
    bigrams = F.when(
        sz >= 2,
        F.slice(
            F.zip_with(
                F.col("__w"),
                F.slice(F.col("__w"), 2, F.greatest(sz - 1, F.lit(0))),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
            1,
            F.greatest(sz - 1, F.lit(0)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bi = base.select(id_col, F.explode(bigrams).alias("g"))
    bi_stats = (
        bi.groupBy(id_col, "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(F.max("c").alias("top_bigram_n"), F.sum("c").alias("n_bigrams"))
    )

    out = uni_stats.join(bi_stats, id_col, "left")
    return out.select(
        id_col,
        F.col("n_words").cast("int").alias("n_words"),
        (F.col("top_word_n") / F.col("n_words")).cast("double").alias("top_word_frac"),
        F.coalesce(
            (F.col("top_bigram_n") / F.col("n_bigrams")).cast("double"), F.lit(0.0)
        ).alias("top_bigram_frac"),
        ((F.col("n_words") - F.col("n_distinct")) / F.col("n_words"))
        .cast("double")
        .alias("dup_word_frac"),
    )


# PII patterns: the practical scrub set of a training-data pipeline.
# Same regex text must run in Spark (Java) and DuckDB (RE2) oracles, so
# only the shared-syntax subset is used (no lookbehind).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?\d{3}[- .]\d{3,4}[- .]\d{4}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
}


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    *,
    kinds: tuple[str, ...] = ("email", "phone", "ipv4"),
    out_col: str | None = None,
) -> DataFrame:
    """Redact PII spans with '<KIND>' placeholders and count matches per
    kind — the doc-level analog of processor_desensitize
    (plugins/processor/desensitize/processor_desensitize.go), applied in
    the order given (earlier kinds consume their spans first, so an
    email's digits can't double-count as a phone).

    Pure codegen'd regexp_replace chain + match counts; one map stage.
    """
    out = F.col(text_col)
    counts: dict[str, Column] = {}
    for kind in kinds:
        pat = PII_PATTERNS[kind]
        counts[f"n_{kind}"] = F.size(
            F.regexp_extract_all(out, F.lit(f"({pat})"), 1)
        ).cast("int")
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return df.withColumns({**counts, (out_col or text_col): out})


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    *,
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "strat",
) -> DataFrame:
    """Deterministic per-stratum sampling — the corpus-mixing step of a
    training-data pipeline (e.g. downsample one language/source to a
    target ratio). Unlike ``DataFrame.sampleBy`` the decision is a pure
    hash of (salt, id): reproducible across runs/partitions/retries, no
    RNG state, and the SAME rows are kept when the job re-runs — which
    is what makes downstream dedup/packing stages resumable.

    Keep rule: first 15 hex digits of md5(salt || ':' || id) as a
    uniform draw in [0, 1); keep when draw < fraction[stratum]. One map
    stage, no shuffle.
    """
    draw = (
        F.conv(F.substring(F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col))), 1, 15), 16, 10)
        .cast("double") / F.lit(float(16**15))
    )
    frac = F.lit(default_fraction)
    for k, v in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(frac)
    return df.where(draw < frac)


def training_shards(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    n_shards: int = 64,
    salt: str = "shuf",
) -> DataFrame:
    """Deterministic global shuffle + sharding for training-order
    writes — the last step of a curation pipeline before the trainer
    reads: every example gets

      * ``shuffle_key`` — md5(salt || ':' || id): the within-shard
        training ORDER (lexicographic = a pseudo-random permutation,
        reproducible across runs/retries, re-rollable by changing
        `salt` per epoch);
      * ``shard``       — the key's first 60 bits mod n_shards: a
        uniform shard assignment derived from the SAME hash (one md5
        per row, and the md5-prefix-to-bigint form keeps the whole op
        DuckDB-reproducible — the r2 trick that made the LSH family
        oracle-checkable, vs the engine-internal xxhash64 that forced
        `shard_hash` to rows-only).

    Deliberately emits a sort KEY, not an integer rank: a global
    row_number would funnel the corpus through one window task, while
    key + shard lets `write_training_shards` produce fully-shuffled,
    in-order shard files with a range-free partitionBy write and a
    per-partition sort — every step map-side or per-shard. Pure
    projection here: no shuffle, no Python (plan shape shared with
    `stratified_sample`)."""
    key = F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col)))
    return df.select(
        "*",
        F.pmod(
            F.conv(F.substring(key, 1, 15), 16, 10).cast("long"),
            F.lit(n_shards),
        )
        .cast("int")
        .alias("shard"),
        key.alias("shuffle_key"),
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    n_shards: int = 64,
    salt: str = "shuf",
) -> None:
    """Materialize `training_shards` as one directory per shard with
    rows in shuffle_key order inside each file: repartition on the
    shard id (ONE hash shuffle, no range sampling, no skew — xxhash64
    is uniform), sort within partitions, write partitionBy(shard). A
    trainer streams shard=K in file order and sees the deterministic
    permutation."""
    sharded = training_shards(
        df, id_col=id_col, n_shards=n_shards, salt=salt
    )
    (
        sharded.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "shuffle_key")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def mixture_rates(
    counts: dict[str, int], temperature: float = 0.7, *, target_frac: float | None = None
) -> dict[str, float]:
    """Temperature-scaled mixing rates over per-source/-language
    document counts — the standard multilingual/multi-source rebalance
    (sample source i proportional to p_i^T, T<1 upweights tails; the
    mBERT/XLM-R exponent-smoothing scheme). Driver-side arithmetic on
    a bounded dict (sources/languages: dozens).

    Returns per-stratum KEEP fractions for `stratified_sample`, scaled
    so the largest is 1.0 (pure downsampling — no replication), or so
    the expected kept total is ``target_frac`` of the corpus when
    given. rate_i ∝ p_i^T / p_i = count_i^(T-1)·total^(1-T): applying
    it to stratum i's count yields kept_i ∝ p_i^T, the temperature
    distribution."""
    if not counts:
        return {}
    total = sum(counts.values())
    raw = {
        k: (c / total) ** (temperature - 1.0) if c else 0.0
        for k, c in counts.items()
    }
    if target_frac is None:
        top = max(raw.values())
        return {k: v / top for k, v in raw.items()}
    kept = sum(counts[k] * raw[k] for k in counts)
    scale = target_frac * total / kept if kept else 0.0
    return {k: min(1.0, v * scale) for k, v in raw.items()}


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    *,
    out_col: str | None = None,
    strip_punct: bool = True,
) -> DataFrame:
    """Dedup-preprocessing normalization (the C4/CCNet-style canonical
    form hashed by exact dedup): lowercase, optionally strip
    punctuation, collapse whitespace runs, trim. Pure codegen'd
    expressions; unicode NFC is out of scope (needs ICU, not present
    JVM-side as a builtin)."""
    out = F.lower(F.col(text_col))
    if strip_punct:
        out = F.regexp_replace(out, r"[^a-z0-9\s]", " ")
    out = F.trim(F.regexp_replace(out, r"\s+", " "))
    return df.withColumn(out_col or text_col, out)


_URL_RE = r"https?://[A-Za-z0-9.-]+(?::\d+)?(?:/[^\s\"']*)?"


def url_stats(
    df: DataFrame, text_col: str = "text", *, id_col: str = "doc_id"
) -> DataFrame:
    """URL extraction + registered-domain rollup — the provenance /
    domain-mix accounting of a web-corpus pipeline. Explode the per-doc
    URL list, take the hostname, and aggregate (domain → docs, urls):
    one explode + one domain-keyed hash aggregation, map-side
    combinable."""
    urls = F.regexp_extract_all(F.col(text_col), F.lit(f"({_URL_RE})"), 1)
    host = F.regexp_extract(F.col("url"), r"^https?://([^/:]+)", 1)
    return (
        df.select(F.col(id_col), F.explode(urls).alias("url"))
        .select(id_col, F.lower(host).alias("domain"))
        .groupBy("domain")
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.count(F.lit(1)).alias("n_urls"),
        )
    )


def vocab_topk(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 50,
) -> DataFrame:
    """Corpus vocabulary heavy hitters: the `top_k` most frequent
    tokens with corpus share and document frequency — what a curation
    pipeline inspects to discover stopwords, boilerplate, and
    contamination markers before tuning filters (`quality_score`
    stopword lists, `ngram_jaccard` max_df).

    One explode → token-keyed hash aggregate. Zipf-distributed tokens
    are exactly the map-side-combine-friendly case: each task collapses
    its millions of 'the' rows to one partial before the shuffle, so
    the exchange carries O(distinct tokens per task), not O(tokens) —
    no salting needed even though the key distribution is maximally
    skewed. Document frequency rides the same aggregate as a
    count_distinct of a (token, doc) pre-distinct, and the corpus
    total is a 1-row broadcast. Top-k is per-partition heaps
    (TakeOrderedAndProject), never a full sort."""
    from ilogtail_spark.partitioning import spread_for_expansion

    df = spread_for_expansion(df)

    tok = df.select(
        F.col(id_col).alias("__doc__"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    )
    per_doc = tok.groupBy("token", "__doc__").agg(
        F.count(F.lit(1)).alias("c")
    )
    counts = per_doc.groupBy("token").agg(
        F.sum("c").alias("n_occurrences"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    total = counts.agg(F.sum("n_occurrences").alias("__total__"))
    return (
        counts.join(F.broadcast(total))
        .select(
            "token",
            "n_occurrences",
            "n_docs",
            F.round(F.col("n_occurrences") / F.col("__total__"), 6).alias(
                "share"
            ),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(top_k)
    )


def cms_bucket(tok: Column, row: int, width: int) -> Column:
    """Deterministic count-min hash: md5-derived row-salted bucket.
    Same literal arithmetic renders in DuckDB ('0x'||substr(md5(...)))
    — the property that makes the sketch oracle-checkable."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"cms{row}:"), tok)), 1, 8), 16, 10
        ).cast("long")
        % width
    )


def count_min_sketch(
    df: DataFrame,
    text_col: str = "text",
    *,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Count-min sketch of token occurrences (Cormode & Muthukrishnan
    2005): a fixed depth×width counter grid where every token
    increments one bucket per row; point estimates are the MIN over
    rows, an overestimate bounded by ε=e/width of the total count.
    Returns the sketch as a (row, bucket, cnt) relation of at most
    depth×width rows — PARAMETER-bounded state, so at 100 TB the
    sketch (a) aggregates with map-side combine (hot tokens collapse
    per task before the shuffle), (b) broadcasts for free at estimate
    time, and (c) merges across shards/days by simple (row,bucket) sum
    — the frequency-stats analog of the Bloom bitmap in
    `bloom_contamination`."""
    from ilogtail_spark.partitioning import spread_for_expansion

    df = spread_for_expansion(df)

    toks = df.select(
        F.explode(tokens(F.col(text_col))).alias("token")
    )
    entries = toks.select(
        F.posexplode(
            F.array(*[cms_bucket(F.col("token"), j, width) for j in range(depth)])
        ).alias("row", "bucket")
    )
    return entries.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    tokens_df: DataFrame,
    *,
    depth: int = 4,
    width: int = 1024,
    token_col: str = "token",
    out: str = "cms_count",
) -> DataFrame:
    """Point-estimate token counts from a count-min sketch: min over
    the depth rows of the token's bucket counters (0 when a bucket was
    never touched). The sketch relation is ≤ depth×width rows, so the
    join is a forced broadcast — safe by parameter bound, the
    bloom-bitmap precedent."""
    probes = tokens_df.select(
        "*",
        F.posexplode(
            F.array(
                *[cms_bucket(F.col(token_col), j, width) for j in range(depth)]
            )
        ).alias("row", "bucket"),
    )
    others = [c for c in tokens_df.columns if c != token_col]
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(token_col, *others)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out))
    )


def _hll_alpha(m: int) -> float:
    """Standard HyperLogLog bias-correction constants (Flajolet et al.
    2007)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_sketch(
    df: DataFrame,
    col: str,
    *,
    p: int = 8,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """HyperLogLog register relation for approximate distinct counting
    (Flajolet et al. 2007): md5-derived 60-bit hash → top p bits pick a
    register, rho = leading-zero count of the rest + 1, register keeps
    the max. Returns (group..., j, reg) with at most 2^p rows per group
    — PARAMETER-bounded, mergeable state (max per register), the
    distinct-count analog of `count_min_sketch`.

    Why this beats exact countDistinct at 100 TB: exact distinct
    expands to a (group, value) pre-aggregation whose state is
    O(distinct values); the HLL register agg is map-side-combinable
    into ≤ 2^p longs per group regardless of cardinality, and
    registers from different shards/days merge by element-wise max.
    Everything is integer arithmetic (bit length via base-2 string
    conv, not floating log2), so the sketch is bit-identical in DuckDB
    and fully oracle-checkable — unlike engine-native
    approx_count_distinct."""
    q = 60 - p
    h = F.conv(F.substring(F.md5(F.col(col)), 1, 15), 16, 10).cast("long")
    d = df.select(*group_cols, h.alias("__h"))
    rem = F.col("__h").bitwiseAND(F.lit((1 << q) - 1))
    bit_len = F.when(rem == 0, F.lit(0)).otherwise(
        F.length(F.conv(rem, 10, 2))
    )
    return (
        d.select(
            *group_cols,
            F.shiftrightunsigned(F.col("__h"), q).alias("j"),
            (F.lit(q + 1) - bit_len).alias("rho"),
        )
        .groupBy(*group_cols, "j")
        .agg(F.max("rho").alias("reg"))
    )


def hll_estimate(
    sketch: DataFrame,
    *,
    p: int = 8,
    group_cols: tuple[str, ...] = (),
    out: str = "approx_distinct",
) -> DataFrame:
    """Distinct-count estimate from `hll_sketch` registers, with the
    standard small-range linear-counting correction. The harmonic sum
    Σ2^-reg is computed as EXACT integers scaled by 2^(q+1) (each term
    2^(q+1-reg) ≥ 1 is integral; the total < 2^61 fits a long), so the
    only floating-point steps are one division and — on the
    linear-counting branch — one ln(), both rounded to a 4-decimal
    grid: the estimate is deterministic and engine-portable. Large-range
    correction (n approaching 2^60) is out of scope for a 60-bit hash."""
    q = 60 - p
    m = 1 << p
    numer = _hll_alpha(m) * m * m * (1 << (q + 1))  # exact: alpha × 2^(2p+q+1)
    gb = list(group_cols)
    agg = sketch.groupBy(*gb).agg(
        F.sum(
            F.pow(F.lit(2.0), F.lit(q + 1) - F.col("reg")).cast("long")
        ).alias("__seen_sum"),
        F.count(F.lit(1)).alias("__n_seen"),
    )
    total = (
        F.col("__seen_sum")
        + (F.lit(m) - F.col("__n_seen")) * F.lit(1 << (q + 1))
    )
    v_zero = F.lit(m) - F.col("__n_seen")
    raw = F.lit(numer) / total.cast("double")
    est = F.when(
        (raw <= 2.5 * m) & (v_zero > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero.cast("double")),
    ).otherwise(raw)
    return agg.select(*gb, F.round(est, 4).alias(out))


def length_quantiles(
    df: DataFrame,
    *,
    text_col: str = "text",
    group_col: str = "lang",
    quantiles: tuple = (0.5, 0.9, 0.99),
    approx: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group token-length quantiles plus the doc count: the
    length-distribution diagnostic a curation pipeline reads before
    setting `quality_score` min/max-length cutoffs per language/source.

    The DEFAULT tier is ``approx=True``: Spark `approx_percentile`
    (Greenwald–Khanna summary, relative rank error ≤ 1/accuracy). Its
    partial state is O(accuracy·log n) and MAP-SIDE COMBINABLE, so
    memory is bounded no matter how large a single group is. That
    matters because the hazard here is group SIZE, not group count:
    exact `percentile` is an ObjectHashAggregate that buffers each
    group's ENTIRE value vector on one reducer — with a dozen
    languages at 10^12 turns the largest language alone is ~10^11
    int64s (~800 GB) on a single task. Exact stays available as
    ``approx=False`` — the oracle/verification tier for bounded
    inputs, never the corpus-scale default.

    Semantics and oracles: exact = linear interpolation (Spark
    `percentile` == DuckDB `quantile_cont` to the last ulp). Approx
    returns an ELEMENT of the group — and whenever accuracy ≥ group
    size the GK summary keeps every sample, making the result the
    exact discrete quantile (== DuckDB `quantile_disc`; verified over
    adversarial group sizes 1..997 at q ∈ {0, .01, .25, .5, .75, .9,
    .99, 1}). So the approx tier is itself oracle-checkable at test
    scale, and its sub-accuracy regime is pinned by a rank-tolerance
    pytest against the exact tier."""
    toks = tokens(F.col(text_col))
    qarr = "array(" + ", ".join(str(q) for q in quantiles) + ")"
    pct = (
        f"approx_percentile(__n__, {qarr}, {accuracy})"
        if approx
        else f"percentile(__n__, {qarr})"
    )
    agged = (
        df.select(F.col(group_col), F.size(toks).alias("__n__"))
        .groupBy(group_col)
        .agg(
            F.expr(pct).alias("__qs__"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )
    # cast: approx returns the input integer type, exact returns double
    # — one output schema for both tiers (and for the shared oracles)
    return agged.select(
        group_col,
        *[
            F.round(F.get("__qs__", i).cast("double"), 6).alias(
                f"p{round(q * 100)}"
            )
            for i, q in enumerate(quantiles)
        ],
        "n_docs",
    )


def unigram_vocab(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Train a unigram language model over a corpus: returns
    ``(vocab, total)`` where `vocab` is (tok, cnt) for tokens seen at
    least `min_count` times and `total` is the 1-row (total_tokens)
    relation (counted over ALL occurrences, including sub-threshold
    ones, so probabilities stay a true distribution as the cutoff
    moves). One explode + one token-keyed aggregation; the token
    relation is localCheckpointed because both outputs read it (same
    executor-loss trade-off as documented in dedup.py:125). The scan is
    spread to the session's cores first — tokenize+explode is
    row-expanding CPU work that would otherwise run on a small
    fixture's single input split (spread_for_expansion is a no-op when
    the scan already has enough splits)."""
    from ilogtail_spark.partitioning import spread_for_expansion

    tok = spread_for_expansion(df).select(
        F.explode(tokens(F.col(text_col))).alias("tok")
    )
    vocab_all = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    vocab_all = vocab_all.localCheckpoint(eager=False)
    total = vocab_all.agg(F.sum("cnt").alias("total_tokens"))
    return vocab_all.filter(F.col("cnt") >= min_count), total


def unigram_nll(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_count: int = 2,
    vocab: DataFrame | None = None,
    total: DataFrame | None = None,
) -> DataFrame:
    """Per-document mean negative log-likelihood under a unigram LM —
    the CCNet-style perplexity quality tier (Wenzek et al. 2020): docs
    whose token distribution diverges from the corpus (boilerplate,
    gibberish, wrong language) score high and can be filtered or
    bucketed. Output: (id, n_tokens, nll), nll = -Σ log p(tok) / n.

    Pass a pretrained ``(vocab, total)`` pair (from :func:`unigram_vocab`
    over a REFERENCE corpus — the real training-data workflow: train on
    trusted text, score candidates); with neither given the corpus
    scores itself. Out-of-vocab tokens take the floor probability
    1/total.

    Numeric determinism: Spark aggregates in arbitrary order and double
    addition is non-associative, so the per-token log-probs are rounded
    to a 6-decimal grid and summed as DECIMAL(18,6) — exact,
    order-independent arithmetic; only then does one double division
    produce the mean. That is what makes the DuckDB oracle hash-match
    bit-for-bit (same trick as quality_logistic's feature grid).

    Plan shape: explode → token-keyed agg (train) + broadcast vocab join
    + 1-row BNLJ total (the bm25 stats precedent) → doc-keyed agg. The
    vocab join is broadcast when the LM is small; at 100 TB train
    write-time via `unigram_vocab` and let AQE pick the join strategy.
    """
    if (vocab is None) != (total is None):
        raise ValueError("pass both vocab and total, or neither")
    if vocab is None:
        vocab, total = unigram_vocab(df, text_col, min_count)
    from ilogtail_spark.partitioning import spread_for_expansion

    tok = spread_for_expansion(df, id_col).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    scored = (
        tok.join(F.broadcast(vocab), "tok", "left")
        .join(F.broadcast(total))
        .withColumn(
            "logp",
            F.round(F.log(F.coalesce(F.col("cnt"), F.lit(1)) / F.col("total_tokens")), 6),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(
            -F.sum(F.col("logp").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("nll"),
    )


def _bigrams(ts: Column) -> Column:
    """token array → array<struct<prev,tok>> of adjacent pairs."""
    n1 = F.greatest(F.size(ts) - 1, F.lit(0))
    return F.zip_with(
        F.slice(ts, 1, n1),
        F.slice(ts, 2, n1),
        lambda a, b: F.struct(a.alias("prev"), b.alias("tok")),
    )


def bigram_vocab(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train a bigram language model: returns ``(vocab, ctx, total)`` —
    `vocab` is (prev, tok, cnt) for bigrams seen ≥ `min_count` times,
    `ctx` is the per-context denominator (prev, ctx_cnt) counted over
    ALL bigrams (so p(tok|prev) stays a true conditional distribution
    as the cutoff moves — same discipline as :func:`unigram_vocab`),
    `total` the 1-row bigram count for the unseen-context floor.
    One explode + one (prev, tok)-keyed aggregation; ctx and total are
    rollups of the same relation (localCheckpointed, shared). The scan
    is spread to the session's cores first (see unigram_vocab)."""
    from ilogtail_spark.partitioning import spread_for_expansion

    bg = spread_for_expansion(df).select(
        F.explode(_bigrams(tokens(F.col(text_col)))).alias("bg")
    ).select("bg.prev", "bg.tok")
    all_bg = bg.groupBy("prev", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    all_bg = all_bg.localCheckpoint(eager=False)
    ctx = all_bg.groupBy("prev").agg(F.sum("cnt").alias("ctx_cnt"))
    total = all_bg.agg(F.sum("cnt").alias("total_bigrams"))
    return all_bg.filter(F.col("cnt") >= min_count), ctx, total


def bigram_nll(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_count: int = 2,
    model: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Per-document mean negative log-likelihood under a bigram LM —
    the sharper KenLM-style tier above :func:`unigram_nll` (CCNet uses
    a 5-gram; the plan shape is identical from bigram up): fluent text
    scores low, shuffled/boilerplate/gibberish text scores high even
    when its unigram mix looks normal. Output: (id, n_bigrams, nll),
    nll = -Σ log p(tok|prev) / n; docs with <2 tokens have no bigrams
    and drop out. p = cnt/ctx_cnt; sub-threshold or unseen bigrams take
    the floor 1/ctx_cnt (1/total_bigrams when the context itself is
    unseen — only possible with a pretrained `model`).

    Same bit-exact arithmetic as unigram_nll: per-bigram log-probs on a
    6-decimal grid, DECIMAL(18,6) order-independent sum, one double
    division. Plan: explode → (prev,tok) train agg → broadcast model
    joins → doc-keyed agg; at 100 TB pretrain with :func:`bigram_vocab`
    write-time and let AQE pick the join strategy."""
    if model is None:
        model = bigram_vocab(df, text_col, min_count)
    vocab, ctx, total = model
    from ilogtail_spark.partitioning import spread_for_expansion

    bg = spread_for_expansion(df, id_col).select(
        F.col(id_col), F.explode(_bigrams(tokens(F.col(text_col)))).alias("bg")
    ).select(id_col, "bg.prev", "bg.tok")
    scored = (
        bg.join(F.broadcast(vocab), ["prev", "tok"], "left")
        .join(F.broadcast(ctx), ["prev"], "left")
        .join(F.broadcast(total))
        .withColumn(
            "logp",
            F.round(
                F.log(
                    F.coalesce(F.col("cnt"), F.lit(1))
                    / F.coalesce(F.col("ctx_cnt"), F.col("total_bigrams"))
                ),
                6,
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(
            -F.sum(F.col("logp").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("nll"),
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    *,
    strata_col: str | None = None,
    id_col: str = "doc_id",
    salt: str = "ws1",
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirtakis 2006): keep the k rows with the largest
    ln(u)/w priority, u a pure hash draw of (salt, id) — rows with
    double the weight are twice as likely to survive, and the selection
    is reproducible across runs/partitions/retries like
    :func:`stratified_sample`. With `strata_col`, k rows per stratum
    (quota sampling: weight by quality, cap per source).

    The draw is (hash+1)/16^15 ∈ (0,1] so ln is finite; ln(u) is rounded
    to a 9-decimal grid before the division so libm ulp differences
    cannot reorder priorities (the priority itself is internal — only
    surviving rows are emitted). Plan: one map stage + one TOP-K per
    stratum (rank window ⇒ a single Exchange on the stratum key; global
    k uses one TakeOrderedAndProject-style window over an empty key —
    fine because only k rows survive it).

    Weights must be strictly positive; rows with NULL or non-positive
    weight are dropped (they carry no sampling mass).
    """
    u = (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col))), 1, 15),
            16, 10,
        ).cast("double") + F.lit(1.0)
    ) / F.lit(float(16**15))
    w = F.col(weight_col).cast("double")
    priority = F.round(F.round(F.log(u), 9) / w, 9)
    from pyspark.sql import Window

    part = Window.partitionBy(strata_col) if strata_col else Window.partitionBy()
    rnk = F.row_number().over(part.orderBy(F.desc("__pri"), F.asc(id_col)))
    return (
        df.where(w > 0)
        .withColumn("__pri", priority)
        .withColumn("__rnk", rnk)
        .where(F.col("__rnk") <= k)
        .drop("__pri", "__rnk")
    )


def c4_clean(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_words: int = 5,
    min_lines: int = 3,
) -> DataFrame:
    """C4-style line-level page cleaning (Raffel et al. 2020 §2.2): keep
    only lines that end in terminal punctuation (. ! ? or a closing
    quote) and carry at least `min_words` words; drop lines mentioning
    javascript / lorem ipsum or containing '{'; drop pages with fewer
    than `min_lines` surviving lines. Output: (id, n_lines_kept,
    clean_text).

    Pure array/higher-order-function expressions over the page — zero
    shuffle, zero Python; the per-line rlike inside the HOF lambda is
    interpreted (not codegen), which is the right trade here because
    the predicate is inherently per-line (the r2 lesson about HOF vs
    whole-line regex applies to whole-line work only)."""
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(
        lines,
        lambda l: (
            F.trim(l).rlike('[.!?"]$')
            & (F.size(F.split(F.trim(l), r"\s+")) >= min_words)
            & ~F.lower(l).contains("javascript")
            & ~F.lower(l).contains("lorem ipsum")
            & ~l.contains("{")
        ),
    )
    return (
        df.select(
            F.col(id_col),
            F.size(kept).alias("n_lines_kept"),
            F.array_join(kept, "\n").alias("clean_text"),
        )
        .filter(F.col("n_lines_kept") >= min_lines)
    )
