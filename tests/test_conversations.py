"""Golden tests for conversation-level operators (functions/conversations.py):
literal multi-turn fixtures in, exact stats / pairs / sessions out."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ilogtail_spark.functions.conversations import (
    conversation_stats,
    sessionize,
    sft_pairs,
)

SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s)


def _conv(spark):
    rows = [
        ("c1", 0, "user", "hi there", None, _ts(0)),
        ("c1", 1, "assistant", "hello", None, _ts(5)),
        ("c1", 2, "tool", "result=42", "python", _ts(10)),
        ("c1", 3, "assistant", "the answer is 42", None, _ts(2000)),
        ("c2", 0, "user", "ping", None, _ts(0)),
        ("c2", 1, "assistant", "pong", None, _ts(1)),
    ]
    return spark.createDataFrame(rows, SCHEMA)


class TestConversationStats:
    def test_counts_and_span(self, spark):
        out = {r["conv_id"]: r for r in conversation_stats(_conv(spark)).collect()}
        c1 = out["c1"]
        assert c1["n_turns"] == 4
        assert c1["n_user"] == 1 and c1["n_assistant"] == 2
        assert c1["n_tool_calls"] == 1 and c1["n_distinct_tools"] == 1
        assert c1["total_chars"] == len("hi there") + len("hello") + len("result=42") + len("the answer is 42")
        assert c1["duration_s"] == 2000
        assert out["c2"]["duration_s"] == 1

    def test_null_tools_not_counted_distinct(self, spark):
        out = conversation_stats(_conv(spark)).filter(F.col("conv_id") == "c2").first()
        assert out["n_tool_calls"] == 0 and out["n_distinct_tools"] == 0


class TestSftPairs:
    def test_context_is_prior_k_turns(self, spark):
        out = {
            (r["conv_id"], r["turn_idx"]): r
            for r in sft_pairs(_conv(spark), context_turns=3).collect()
        }
        # assistant turn 1: one prior turn
        assert out[("c1", 1)]["context"] == "user: hi there"
        assert out[("c1", 1)]["response"] == "hello"
        # assistant turn 3: exactly the prior 3 turns, in turn order
        assert out[("c1", 3)]["context"] == (
            "user: hi there\nassistant: hello\ntool: result=42"
        )
        # only assistant turns emit pairs
        assert ("c1", 0) not in out and ("c1", 2) not in out

    def test_bounded_window(self, spark):
        out = sft_pairs(_conv(spark), context_turns=1).collect()
        by_key = {(r["conv_id"], r["turn_idx"]): r["context"] for r in out}
        assert by_key[("c1", 3)] == "tool: result=42"  # only 1 prior turn

    def test_first_turn_assistant_empty_context(self, spark):
        df = spark.createDataFrame(
            [("c3", 0, "assistant", "opening", None, _ts(0))], SCHEMA
        )
        assert sft_pairs(df).first()["context"] == ""


class TestSessionize:
    def test_gap_splits_sessions(self, spark):
        out = sessionize(_conv(spark), gap_s=300).orderBy("conv_id", "session_seq").collect()
        c1 = [r for r in out if r["conv_id"] == "c1"]
        # turns 0-2 within 10s, then a 1990s gap -> two sessions
        assert [(r["session_seq"], r["n_turns"]) for r in c1] == [(1, 3), (2, 1)]
        assert c1[0]["end_s"] - c1[0]["start_s"] == 10
        c2 = [r for r in out if r["conv_id"] == "c2"]
        assert [(r["session_seq"], r["n_turns"]) for r in c2] == [(1, 2)]

    def test_single_exchange_plan(self, spark):
        plan = sessionize(_conv(spark), gap_s=300)._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        # lag + running sum + rollup share one hash Exchange on conv_id
        assert final.count("Exchange") <= 2  # window exchange + (possibly AQE-read agg)


class TestResponseLatency:
    def test_latency_to_latest_user_turn(self, spark):
        from ilogtail_spark.functions.conversations import response_latency

        out = {
            (r["conv_id"], r["turn_idx"]): r["latency_s"]
            for r in response_latency(_conv(spark)).collect()
        }
        # turn 1 replies 5s after the user turn at t=0;
        # turn 3 replies 2000s after the SAME user turn (no user between)
        assert out == {("c1", 1): 5, ("c1", 3): 2000, ("c2", 1): 1}

    def test_assistant_before_any_user_dropped(self, spark):
        from ilogtail_spark.functions.conversations import response_latency

        df = spark.createDataFrame(
            [("c3", 0, "assistant", "opening", None, _ts(0)),
             ("c3", 1, "user", "q", None, _ts(5)),
             ("c3", 2, "assistant", "a", None, _ts(9))],
            SCHEMA,
        )
        out = {(r["conv_id"], r["turn_idx"]): r["latency_s"]
               for r in response_latency(df).collect()}
        assert out == {("c3", 2): 4}


class TestFunnel:
    def _run(self, spark, rows, steps=None):
        from pyspark.sql import functions as F

        from ilogtail_spark.functions.conversations import funnel

        df = spark.createDataFrame(
            [(c, i, r, t, None, _ts(i)) for (c, i, r, t) in rows], SCHEMA
        )
        steps = steps or [
            F.col("role") == "user",
            F.col("text").contains("ERR"),
            F.col("text").contains("fix"),
        ]
        return {r["conv_id"]: r.asDict() for r in funnel(df, steps).collect()}

    def test_full_conversion_in_order(self, spark):
        out = self._run(spark, [
            ("c1", 0, "user", "hello"),
            ("c1", 1, "assistant", "ERR happened"),
            ("c1", 2, "tool", "fix applied"),
        ])
        r = out["c1"]
        assert (r["step1_pos"], r["step2_pos"], r["step3_pos"]) == (0, 1, 2)
        assert r["funnel_depth"] == 3 and r["converted"] is True

    def test_out_of_order_does_not_count(self, spark):
        # ERR comes BEFORE the first user turn → funnel stalls at 1
        out = self._run(spark, [
            ("c1", 0, "assistant", "ERR early"),
            ("c1", 1, "user", "hello"),
            ("c1", 2, "tool", "fix applied"),
        ])
        r = out["c1"]
        assert r["step1_pos"] == 1 and r["step2_pos"] is None
        assert r["step3_pos"] is None  # stall cascades
        assert r["funnel_depth"] == 1 and r["converted"] is False

    def test_strictly_after_not_same_turn(self, spark):
        # one turn satisfying steps 1 and 2 at once only advances step 1
        out = self._run(spark, [("c1", 0, "user", "ERR in first turn")])
        r = out["c1"]
        assert r["step1_pos"] == 0 and r["step2_pos"] is None
        assert r["funnel_depth"] == 1

    def test_earliest_match_is_greedy_optimal(self, spark):
        # first ERR at 1 is used; the later ERR at 3 is not needed
        out = self._run(spark, [
            ("c1", 0, "user", "q"),
            ("c1", 1, "assistant", "ERR a"),
            ("c1", 2, "assistant", "ERR b"),
            ("c1", 3, "tool", "fix"),
        ])
        r = out["c1"]
        assert (r["step2_pos"], r["step3_pos"]) == (1, 3)
        assert r["converted"] is True

    def test_zero_depth(self, spark):
        out = self._run(spark, [("c1", 0, "assistant", "nothing")])
        assert out["c1"]["funnel_depth"] == 0
        assert out["c1"]["converted"] is False

    def test_convs_independent(self, spark):
        out = self._run(spark, [
            ("c1", 0, "user", "q"),
            ("c2", 0, "assistant", "ERR only, no user"),
        ])
        assert out["c1"]["funnel_depth"] == 1
        assert out["c2"]["funnel_depth"] == 0


class TestLatencyPercentiles:
    def test_known_quantiles_and_buckets(self, spark):
        from ilogtail_spark.functions.conversations import latency_percentiles

        # one conv: user at t=0, replies at +1..+8 within hour 0;
        # a second burst in hour 1 with constant latency 10
        rows = [("c1", 0, "user", "q", None, _ts(0))]
        rows += [("c1", i, "assistant", "a", None, _ts(i)) for i in range(1, 9)]
        rows += [("c2", 0, "user", "q", None, _ts(3600))]
        rows += [
            ("c2", i, "assistant", "a", None, _ts(3600 + 10 * i))
            for i in range(1, 4)
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        out = {
            r["window_start"]: r.asDict()
            for r in latency_percentiles(df, qs=(0.5, 1.0)).collect()
        }
        base = out[min(out)]
        # hour-0 latencies are 1..8 (each reply measures from t=0):
        # discrete p50 of 1..8 = 4, max = 8
        assert base["p50"] == 4.0 and base["p100"] == 8.0
        assert base["n_replies"] == 8
        nxt = out[max(out)]
        assert max(out) - min(out) == 3600
        # hour-1 latencies are 10, 20, 30
        assert nxt["p50"] == 20.0 and nxt["n_replies"] == 3

    def test_replies_without_prior_user_excluded(self, spark):
        from ilogtail_spark.functions.conversations import latency_percentiles

        df = spark.createDataFrame(
            [("c1", 0, "assistant", "orphan", None, _ts(0))], SCHEMA
        )
        assert latency_percentiles(df).count() == 0


class TestRetention:
    def _run(self, spark, rows):
        from ilogtail_spark.functions.conversations import retention

        df = spark.createDataFrame(
            [(u, i, "user", "t", None, _ts(s)) for i, (u, s) in enumerate(rows)],
            SCHEMA,
        )
        base = 1704067200  # _ts(0) epoch — a whole-hour boundary
        return {
            r["bucket"] - base: (r["n_active"], r["n_retained"])
            for r in retention(df, window_s=3600).collect()
        }

    def test_adjacent_window_retained(self, spark):
        out = self._run(spark, [
            ("u1", 0), ("u1", 3600),      # active hours 0 and 1 → retained
            ("u2", 0),                     # active hour 0 only
            ("u3", 0), ("u3", 7200),       # gap — hour 0 NOT retained into 1
        ])
        assert out[0] == (3, 1)
        assert out[3600] == (1, 0)
        assert out[7200] == (1, 0)

    def test_multiple_turns_one_window_count_once(self, spark):
        out = self._run(spark, [("u1", 0), ("u1", 10), ("u1", 20)])
        assert out == {0: (1, 0)}


class TestSchemaDrift:
    def test_first_seen_and_counts(self, spark):
        from ilogtail_spark.operators.aggregate import schema_drift

        rows = [
            ("c1", 0, "user", '{"a": 1}', None, _ts(0)),
            ("c1", 1, "user", '{"a": 2, "b": 3}', None, _ts(3600)),
            ("c1", 2, "user", 'not json', None, _ts(3600)),
            ("c1", 3, "user", '{"b": 4}', None, _ts(7200)),
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        base = 1704067200
        out = {
            r["key"]: (r["first_seen"] - base, r["last_seen"] - base,
                       r["n_windows"], r["n_rows"])
            for r in schema_drift(df, window_s=3600).collect()
        }
        assert out["a"] == (0, 3600, 2, 2)
        assert out["b"] == (3600, 7200, 2, 2)
        assert set(out) == {"a", "b"}  # the non-JSON row contributes nothing


class TestToolStats:
    def test_profile(self, spark):
        from ilogtail_spark.functions.conversations import tool_stats

        rows = [
            ("c1", 0, "user", "q", None, _ts(0)),
            ("c1", 1, "tool", "ok result", "python", _ts(10)),
            ("c1", 2, "assistant", "a", None, _ts(13)),
            ("c2", 0, "tool", "ERROR: boom", "python", _ts(0)),
            ("c2", 1, "user", "retry", None, _ts(7)),
            ("c2", 2, "tool", "fine", "shell", _ts(8)),  # last turn → no gap
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        out = {r["tool"]: r.asDict() for r in tool_stats(df).collect()}
        py = out["python"]
        assert py["n_calls"] == 2 and py["n_convs"] == 2
        assert py["n_error_outputs"] == 1
        # gaps: 3s (c1 turn1→2) and 7s (c2 turn0→1) → mean 5
        assert py["mean_wait_s"] == 5.0
        sh = out["shell"]
        assert sh["n_calls"] == 1 and sh["mean_wait_s"] is None


class TestRoleTransitions:
    def test_matrix(self, spark):
        from ilogtail_spark.functions.conversations import role_transitions

        rows = [
            ("c1", 0, "user", "q", None, _ts(0)),
            ("c1", 1, "assistant", "a", None, _ts(1)),
            ("c1", 2, "user", "q2", None, _ts(2)),
            ("c2", 0, "user", "x", None, _ts(0)),
            ("c2", 1, "assistant", "y", None, _ts(1)),
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        out = {
            (r["prev_role"], r["role"]): r["n"]
            for r in role_transitions(df).collect()
        }
        # conv boundaries never produce a transition (c2's opener has
        # no prev), so exactly these pairs exist
        assert out == {("user", "assistant"): 2, ("assistant", "user"): 1}


class TestTopErrors:
    def test_topk_and_normalization(self, spark):
        from ilogtail_spark.operators.aggregate import top_errors

        rows = []
        # hour 0: signature A (code collapses) x3, B x2, C x1, D x1
        for i, txt in enumerate(
            ["ERROR code=500", "ERROR code=502", "ERROR code=503",
             "ERROR timeout 30s", "ERROR timeout 60s",
             "ERROR disk full", "ERROR oom killed", "all fine here"]
        ):
            rows.append(("c1", i, "user", txt, None, _ts(i)))
        # hour 1: one error only
        rows.append(("c2", 0, "user", "ERROR lonely 1", None, _ts(3600)))
        df = spark.createDataFrame(rows, SCHEMA)
        out = [
            (r["bucket"], r["signature"], r["n"], r["rank"])
            for r in top_errors(df, k=2).orderBy("bucket", "rank").collect()
        ]
        base = 1704067200
        assert out == [
            (base, "ERROR code=#", 3, 1),
            (base, "ERROR timeout #s", 2, 2),
            (base + 3600, "ERROR lonely #", 1, 1),
        ]

    def test_windowgrouplimit_in_plan(self, spark):
        from ilogtail_spark.operators.aggregate import top_errors

        df = spark.createDataFrame(
            [("c1", 0, "user", "ERROR x", None, _ts(0))], SCHEMA
        )
        plan = top_errors(df)._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "WindowGroupLimit" in final  # k-heaps, not a full sort
