"""Distributed BPE tokenizer training over a document corpus.

Byte-pair-encoding training (Sennrich et al. 2016, the algorithm behind
GPT-2/RoBERTa-style tokenizers) splits cleanly into a corpus-scale half
and a tiny iterative half, and the split IS the scale story:

1. **Word-frequency extraction** — the only stage that touches all the
   text. One map-side-combinable `groupBy(word).sum()` shuffle; at
   100 TB this is the same shape as `exact_dedup` and costs one pass.
   Everything downstream operates on the (word, freq) table, which is
   smaller than the corpus by the average word frequency (orders of
   magnitude under Zipf).
2. **Merge learning** — iterates num_merges times over the word table.
   Capped to the `top_words` most frequent words (standard practice:
   HuggingFace/SentencePiece train on a frequency-truncated vocabulary),
   the table is O(100k) rows — collected once and trained exactly on
   the driver in O(vocab × merges). No per-iteration Spark job, no
   driver loop over corpus data.
3. **Encoding** — applying a FIXED merge list is a fold of literal
   `replace` calls over the space-joined symbol string, entirely
   JVM-side inside whole-stage codegen: zero Python on workers, zero
   shuffle. This works because `replace` scans left-to-right and
   resumes AFTER each replacement — exactly the greedy non-overlapping
   semantics of a BPE merge application (pinned by the differential
   test against an independent pure-Python implementation).

Symbol strings are padded/joined with spaces (`' h e l l o '`) so a
merge `(a, b)` compiles to `replace(s, ' a b ', ' ab ')` — symbols never
contain spaces, so matches can only occur at symbol boundaries.

Beyond-reference operator (training-data pipeline family); the
reference agent has no tokenizer, but a 100 TB corpus pipeline needs
one trained on exactly this machinery.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["word_freqs", "pair_counts", "encode_bpe", "train_bpe"]

_DEFAULT_TOKEN_RE = "[a-z]+"


def word_freqs(
    df: DataFrame,
    text_col: str = "text",
    *,
    lowercase: bool = True,
    token_re: str = _DEFAULT_TOKEN_RE,
    min_count: int = 1,
) -> DataFrame:
    """Corpus → (word, freq). The one corpus-scale stage of BPE
    training: explode the token array and count — partial aggregation
    collapses each partition to its local vocabulary before the single
    word-keyed shuffle."""
    src = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    toks = F.expr(f"regexp_extract_all(__bpe_src, '{token_re}', 0)")
    out = (
        df.withColumn("__bpe_src", src)
        .select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    if min_count > 1:
        out = out.filter(F.col("freq") >= min_count)
    return out


def _symbolize(word: Column) -> Column:
    """word → DOUBLE-space-joined padded symbol string:
    'hello' → '  h  e  l  l  o  '. Two spaces per boundary because
    literal replace() resumes scanning AFTER the matched region: with
    single spaces, consecutive occurrences of the same pair share their
    boundary space and the second occurrence can never match (e.g.
    'a a a a' merges to 'aa a a', not 'aa aa'). With two spaces the
    pattern ' a  b ' consumes ONE space of each boundary, leaving the
    other as the neighbor's — greedy left-to-right non-overlapping
    application, exactly the BPE merge convention."""
    return F.concat(F.lit("  "), F.regexp_replace(word, "(.)", "$1  "))


def _fold_merges(sym: Column, merges: list[tuple[str, str]]) -> Column:
    """Apply a fixed merge list in order via literal replace() — the
    JVM-side greedy merge application (see module docstring)."""
    out = sym
    for a, b in merges:
        out = F.replace(out, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} "))
    return out


def _tokens_of(word: Column, merges: list[tuple[str, str]]) -> Column:
    return F.split(F.trim(_fold_merges(_symbolize(word), merges)), "  ")


def pair_counts(
    wf: DataFrame,
    merges: list[tuple[str, str]] | None = None,
    *,
    word_col: str = "word",
    freq_col: str = "freq",
) -> DataFrame:
    """(word, freq) table → adjacent-symbol-pair counts (left, right,
    cnt) under an already-applied merge list — one BPE training step's
    statistics as a declarative plan: symbol split and pairing are
    array built-ins, the count is one map-side-combinable aggregation
    over the (small) word table."""
    cs = _tokens_of(F.col(word_col), merges or [])
    pairs = F.zip_with(
        F.slice(cs, 1, F.greatest(F.size(cs) - 1, F.lit(0))),
        F.slice(cs, 2, F.greatest(F.size(cs) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("left"), b.alias("right")),
    )
    return (
        wf.select(F.col(freq_col).alias("__f"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("__f").alias("cnt"))
    )


def encode_bpe(
    df: DataFrame,
    text_col: str = "text",
    merges: list[tuple[str, str]] | None = None,
    *,
    lowercase: bool = True,
    token_re: str = _DEFAULT_TOKEN_RE,
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize a text column with a trained merge list: per word, the
    replace-fold merge application, flattened back to one token array
    per document. Pure Column expressions — the 100 TB encode is a
    zero-shuffle map stage."""
    src = "lower(" + text_col + ")" if lowercase else text_col
    words = F.expr(f"regexp_extract_all({src}, '{token_re}', 0)")
    toks = F.flatten(
        F.transform(words, lambda w: _tokens_of(w, merges or []))
    )
    # pin: the per-word replace-fold is the dominant per-row cost, and
    # any consumer referencing the token array more than once (counts +
    # head slice, say) would otherwise inline the whole fold per
    # reference (see exprutil.pin)
    from ilogtail_spark.exprutil import pin

    return df.withColumn(out_col, pin(toks))


def train_bpe(
    spark: SparkSession,
    df: DataFrame,
    text_col: str = "text",
    *,
    num_merges: int = 100,
    top_words: int = 65536,
    min_count: int = 1,
    lowercase: bool = True,
    token_re: str = _DEFAULT_TOKEN_RE,
) -> list[tuple[str, str]]:
    """Learn `num_merges` BPE merges. The corpus-scale work is ONE
    distributed word-frequency pass; the merge loop runs exactly on the
    `top_words`-truncated vocabulary driver-side (O(vocab × merges)
    memory/time, no further cluster work). Ties on pair count break by
    lexicographic pair order — deterministic across runs and engines.

    Returns the ordered merge list for :func:`encode_bpe` /
    :func:`pair_counts`."""
    wf = word_freqs(df, text_col, lowercase=lowercase, token_re=token_re,
                    min_count=min_count)
    rows = (
        wf.orderBy(F.col("freq").desc(), F.col("word"))
        .limit(top_words)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        k = tuple(r["word"])
        vocab[k] = vocab.get(k, 0) + int(r["freq"])

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: Counter = Counter()
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        best = max(counts.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, f in vocab.items():
            out: list[str] = []
            i = 0
            n = len(syms)
            while i < n:
                if i + 1 < n and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            k = tuple(out)
            new_vocab[k] = new_vocab.get(k, 0) + f
        vocab = new_vocab
    return merges
