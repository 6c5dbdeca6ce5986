"""Differential harnesses for the round-6 session-4 operator family:
each test builds a deterministic pseudo-random dataset (md5-seeded — no
RNG state), runs the Spark operator ONCE, and compares against an
independent pure-Python replay of the semantics. This is the repo's
standing verification depth beyond the DuckDB oracles: the replay
shares no code with the operator, so an agreement is two independent
implementations, three counting the oracle.
"""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

from pyspark.sql import functions as F


def _h(*parts) -> int:
    return int.from_bytes(
        hashlib.md5(":".join(map(str, parts)).encode()).digest()[:8], "big"
    )


def _random_corpus(n_docs: int, vocab: int, doc_len: int):
    """Deterministic word-soup docs with planted duplicate lines."""
    docs = []
    for d in range(n_docs):
        words = [f"w{_h('tok', d, i) % vocab}" for i in range(doc_len)]
        lines = [
            " ".join(words[i : i + 4]) for i in range(0, doc_len, 4)
        ]
        if d % 3 == 0:
            lines[1] = "shared boilerplate line alpha"
        if d % 4 == 0:
            lines[-1] = "shared boilerplate line beta"
        docs.append((d, "\n".join(lines)))
    return docs


class TestLineDedupDifferential:
    def test_replay(self, spark):
        from ilogtail_spark.functions.dedup import line_dedup

        docs = _random_corpus(40, vocab=30, doc_len=16)
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["doc_id"]: r["text"]
            for r in line_dedup(df, min_count=2, keep_first=True).collect()
        }
        # pure-Python replay: global first occurrence by (doc_id, pos)
        count: Counter = Counter()
        for d, text in docs:
            for line in text.split("\n"):
                count[line] += 1
        first: dict[str, tuple[int, int]] = {}
        for d, text in docs:
            for pos, line in enumerate(text.split("\n")):
                if (d, pos) < first.get(line, (1 << 60, 0)):
                    first[line] = (d, pos)
        want: dict[int, str] = {}
        for d, text in docs:
            kept = [
                line
                for pos, line in enumerate(text.split("\n"))
                if count[line] < 2 or first[line] == (d, pos)
            ]
            if kept:
                want[d] = "\n".join(kept)
        assert got == want


class TestFunnelDifferential:
    def test_replay(self, spark):
        from ilogtail_spark.functions.conversations import funnel

        rows = []
        for c in range(30):
            for t in range(12):
                role = ["user", "assistant", "tool"][_h("r", c, t) % 3]
                text = "ERR" if _h("e", c, t) % 5 == 0 else "ok"
                rows.append((f"c{c:02d}", t, role, text, None, None))
        schema = (
            "conv_id string, turn_idx int, role string, text string,"
            " tool string, ts timestamp"
        )
        df = spark.createDataFrame(rows, schema)
        steps = [
            F.col("role") == "user",
            F.col("text") == "ERR",
            F.col("role") == "tool",
        ]
        got = {
            r["conv_id"]: (
                r["step1_pos"], r["step2_pos"], r["step3_pos"],
                r["funnel_depth"], r["converted"],
            )
            for r in funnel(df, steps).collect()
        }
        # replay: greedy earliest-match pointer walk per conv
        convs = defaultdict(list)
        for conv, t, role, text, _tool, _ts in rows:
            convs[conv].append((t, role, text))
        want = {}
        for conv, turns in convs.items():
            preds = [
                lambda role, text: role == "user",
                lambda role, text: text == "ERR",
                lambda role, text: role == "tool",
            ]
            pos = [None, None, None]
            k = 0
            for t, role, text in sorted(turns):
                if k < 3 and preds[k](role, text):
                    pos[k] = t
                    k += 1
            want[conv] = (pos[0], pos[1], pos[2], k, pos[2] is not None)
        assert got == want


class TestCmsHllDifferential:
    def test_cms_never_under_random_corpus(self, spark):
        from ilogtail_spark.functions.textstats import (
            cms_estimate,
            count_min_sketch,
            tokens,
        )

        docs = [
            (d, " ".join(f"t{_h('c', d, i) % 37}" for i in range(20)))
            for d in range(60)
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        truth: Counter = Counter()
        for _d, text in docs:
            truth.update(text.split(" "))
        tok = df.select(F.explode(tokens(F.col("text"))).alias("token"))
        tf = tok.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
        sketch = count_min_sketch(df, depth=3, width=8)
        est = cms_estimate(sketch, tf, depth=3, width=8).collect()
        assert len(est) == len(truth)
        for r in est:
            assert r["tf"] == truth[r["token"]]  # exact side vs replay
            assert r["cms_count"] >= r["tf"]  # CMS one-sided guarantee

    def test_hll_register_replay(self, spark):
        """The Spark register relation equals a pure-Python HLL build."""
        from ilogtail_spark.functions.textstats import hll_sketch

        vals = [f"item-{i}" for i in range(500)]
        df = spark.createDataFrame([(v,) for v in vals], "v string")
        got = {
            (r["j"], r["reg"])
            for r in hll_sketch(df, "v", p=6).collect()
        }
        p, q = 6, 54
        regs: dict[int, int] = {}
        for v in vals:
            h = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
            j, rem = h >> q, h & ((1 << q) - 1)
            rho = q + 1 if rem == 0 else q + 1 - rem.bit_length()
            regs[j] = max(regs.get(j, 0), rho)
        assert got == set(regs.items())
