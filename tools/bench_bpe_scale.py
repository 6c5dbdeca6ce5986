"""BPE tokenizer training + bigram LM at 2000x the test fixture: the
1M-doc corpus of tools/bench_dedup_scale.py (same generator + parquet
cache). Evidence for the scale split documented in functions/bpe.py:

- word_freqs: the ONE corpus-scale shuffle — must stay map-side
  combinable (partial rows per task = local vocab, not corpus tokens);
- train_bpe: driver loop on the capped vocabulary — wall-clock must be
  O(vocab x merges), independent of corpus size;
- encode_bpe: zero-shuffle map stage — throughput is the headline
  (tokens/s), plan must carry no Exchange;
- bigram_nll: broadcast model joins — the bigram explosion must not
  shuffle.

Prints one JSON line per op; paste the summary into SCALE.md.
Usage: python tools/bench_bpe_scale.py [n_docs] [n_merges]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_dedup_scale import gen_docs  # noqa: E402  (same corpus cache)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    from pyspark.sql import functions as F

    from ilogtail_spark.functions.bpe import encode_bpe, train_bpe, word_freqs
    from ilogtail_spark.functions.textstats import bigram_nll
    from ilogtail_spark.session import get_spark

    spark = get_spark(
        app_name="bpe_scale",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(gen_docs(spark, n_docs))

    t0 = time.time()
    TOKEN_RE = "[a-z0-9]+"  # the scale corpus uses alphanumeric tokens
    vocab_size = word_freqs(docs, "text", token_re=TOKEN_RE).count()
    t_wf = time.time() - t0
    print(json.dumps({"op": "word_freqs", "n_docs": n_docs,
                      "distinct_words": vocab_size, "sec": round(t_wf, 2)}))

    t0 = time.time()
    merges = train_bpe(spark, docs, "text", num_merges=n_merges,
                       top_words=50_000, token_re=TOKEN_RE)
    t_tr = time.time() - t0
    print(json.dumps({"op": "train_bpe", "n_merges": len(merges),
                      "top_words": 50_000, "sec": round(t_tr, 2),
                      "first_merges": ["".join(m) for m in merges[:8]]}))

    enc = encode_bpe(docs, "text", merges, token_re=TOKEN_RE)
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "encode must stay a pure map stage"
    t0 = time.time()
    n_tokens = enc.agg(F.sum(F.size("bpe_tokens"))).collect()[0][0]
    t_enc = time.time() - t0
    print(json.dumps({"op": "encode_bpe", "n_docs": n_docs,
                      "n_tokens": int(n_tokens), "sec": round(t_enc, 2),
                      "tokens_per_sec": int(n_tokens / t_enc),
                      "zero_exchange": True}))

    t0 = time.time()
    stats = bigram_nll(docs).agg(
        F.count(F.lit(1)), F.avg("nll"), F.sum("n_bigrams")
    ).collect()[0]
    t_bg = time.time() - t0
    print(json.dumps({"op": "bigram_nll", "docs_scored": int(stats[0]),
                      "mean_nll": round(float(stats[1]), 4),
                      "n_bigrams": int(stats[2]), "sec": round(t_bg, 2)}))


if __name__ == "__main__":
    main()
