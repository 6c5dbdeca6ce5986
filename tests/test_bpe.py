"""BPE tokenizer training (functions/bpe.py): differential tests
against an independent pure-Python implementation of Sennrich-style
BPE, plus plan/shape guarantees."""

import re
from collections import Counter

from pyspark.sql import functions as F

from ilogtail_spark.functions.bpe import (
    encode_bpe,
    pair_counts,
    train_bpe,
    word_freqs,
)
from tests.conftest import spark  # noqa: F401

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps while the quick fox runs",
    "lower lowest newer newest wider widest",
    "hugging faces and byte pairs and byte pair encoding",
    "aaa aaaa aa a banana bandana",
]


# ---- independent reference implementation (kept deliberately naive) ----

def _ref_word_freqs(texts):
    c = Counter()
    for t in texts:
        c.update(re.findall("[a-z]+", t.lower()))
    return c


def _ref_train(texts, n):
    vocab = {tuple(w): f for w, f in _ref_word_freqs(texts).items()}
    merges = []
    for _ in range(n):
        pairs = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        nv = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + f
        vocab = nv
    return merges


def _ref_encode_word(w, merges):
    syms = list(w)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _ref_encode(text, merges):
    toks = []
    for w in re.findall("[a-z]+", text.lower()):
        toks += _ref_encode_word(w, merges)
    return toks


class TestWordFreqs:
    def test_matches_counter(self, spark):  # noqa: F811
        df = spark.createDataFrame([(t,) for t in TEXTS], ["text"])
        got = {r["word"]: r["freq"] for r in word_freqs(df).collect()}
        assert got == dict(_ref_word_freqs(TEXTS))

    def test_min_count(self, spark):  # noqa: F811
        df = spark.createDataFrame([(t,) for t in TEXTS], ["text"])
        got = {r["word"] for r in word_freqs(df, min_count=3).collect()}
        want = {w for w, f in _ref_word_freqs(TEXTS).items() if f >= 3}
        assert got == want


class TestPairCounts:
    def test_char_pairs_match_reference(self, spark):  # noqa: F811
        df = spark.createDataFrame([(t,) for t in TEXTS], ["text"])
        got = {
            (r["left"], r["right"]): r["cnt"]
            for r in pair_counts(word_freqs(df)).collect()
        }
        want = Counter()
        for w, f in _ref_word_freqs(TEXTS).items():
            for i in range(len(w) - 1):
                want[(w[i], w[i + 1])] += f
        assert got == dict(want)

    def test_pairs_after_merges(self, spark):  # noqa: F811
        merges = _ref_train(TEXTS, 5)
        df = spark.createDataFrame([(t,) for t in TEXTS], ["text"])
        got = {
            (r["left"], r["right"]): r["cnt"]
            for r in pair_counts(word_freqs(df), merges).collect()
        }
        want = Counter()
        for w, f in _ref_word_freqs(TEXTS).items():
            syms = _ref_encode_word(w, merges)
            for i in range(len(syms) - 1):
                want[(syms[i], syms[i + 1])] += f
        assert got == dict(want)


class TestTrainAndEncode:
    def test_train_matches_reference(self, spark):  # noqa: F811
        df = spark.createDataFrame([(t,) for t in TEXTS], ["text"])
        assert train_bpe(spark, df, num_merges=20) == _ref_train(TEXTS, 20)

    def test_encode_differential(self, spark):  # noqa: F811
        merges = _ref_train(TEXTS, 15)
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(TEXTS)], ["i", "text"]
        )
        got = {
            r["i"]: list(r["bpe_tokens"])
            for r in encode_bpe(df, merges=merges).collect()
        }
        for i, t in enumerate(TEXTS):
            assert got[i] == _ref_encode(t, merges), t

    def test_encode_roundtrip_text(self, spark):  # noqa: F811
        # concatenating tokens reconstructs the letter stream exactly
        merges = _ref_train(TEXTS, 10)
        df = spark.createDataFrame([(t,) for t in TEXTS], ["text"])
        out = encode_bpe(df, merges=merges).withColumn(
            "glued", F.array_join("bpe_tokens", "")
        )
        for r in out.collect():
            assert r["glued"] == "".join(re.findall("[a-z]+", r["text"]))

    def test_encode_zero_shuffle(self, spark):  # noqa: F811
        merges = _ref_train(TEXTS, 10)
        df = spark.createDataFrame([(t,) for t in TEXTS], ["text"])
        plan = (
            encode_bpe(df, merges=merges)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan

    def test_top_words_cap(self, spark):  # noqa: F811
        # capping to the 3 most frequent words trains on exactly those
        df = spark.createDataFrame([(t,) for t in TEXTS], ["text"])
        wf = _ref_word_freqs(TEXTS)
        top3 = sorted(wf.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        capped_texts = [" ".join(w for w, f in top3 for _ in range(f))]
        assert train_bpe(spark, df, num_merges=8, top_words=3) == \
            _ref_train(capped_texts, 8)
