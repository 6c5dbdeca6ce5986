"""Randomized round-trip tests (seeded, single Spark job each): a pure
Python reference model mirrors the C++ semantics, 200+ random cases run
through the Spark operator in one DataFrame, outputs compared row-by-row."""

from __future__ import annotations

import random
import string

from ilogtail_spark.operators.container import container_log_parse
from ilogtail_spark.operators.transform import string_replace

_PRINTABLE = string.ascii_letters + string.digits + " .,:/-_[]{}"


def _model_containerd(line: str):
    """Reference model of ParseContainerdTextLogLine
    (ProcessorParseContainerLogNative.cpp:180-263)."""
    p1 = line.find(" ")
    if p1 < 0:
        return None
    p2 = line.find(" ", p1 + 1)
    if p2 < 0:
        return None
    time, stream = line[:p1], line[p1 + 1 : p2]
    if stream not in ("stdout", "stderr"):
        return None
    rest = line[p2 + 1 :]
    if rest[:1] in ("P", "F") and rest[1:2] == " ":
        return (time, stream, rest[2:], rest[0] == "P")
    return (time, stream, rest, False)


class TestContainerdRandom:
    def test_matches_reference_model(self, spark):
        rng = random.Random(42)
        lines = []
        for _ in range(250):
            time = "".join(rng.choices("0123456789TZ:.-", k=rng.randint(1, 24)))
            stream = rng.choice(["stdout", "stderr", "stdout", "stderr", "bogus", "std out"])
            tag = rng.choice(["P ", "F ", "", "PP ", "P", "F", "X "])
            content = "".join(rng.choices(_PRINTABLE + "PF", k=rng.randint(0, 30)))
            lines.append(f"{time} {stream} {tag}{content}")
        df = spark.createDataFrame(
            [(i, ln) for i, ln in enumerate(lines)], "i int, text string"
        )
        got = {
            r["i"]: (r["_time_"], r["_source_"], r["content"], r["is_partial"])
            for r in container_log_parse(df, fmt="containerd_text").collect()
        }
        for i, ln in enumerate(lines):
            exp = _model_containerd(ln)
            g = got[i]
            if exp is None:
                assert g[2] is None, ln  # parse fail ⇒ null content
            else:
                assert g == exp, (ln, g, exp)


class TestUnquoteRandom:
    def test_escape_roundtrip(self, spark):
        rng = random.Random(7)
        originals = []
        for _ in range(250):
            s = "".join(
                rng.choices(string.ascii_letters + '\\"\n\t' + " nt", k=rng.randint(0, 24))
            )
            originals.append(s)
        escaped = [
            '"'
            + s.replace("\\", "\\\\").replace('"', '\\"')
            .replace("\n", "\\n").replace("\t", "\\t")
            + '"'
            for s in originals
        ]
        df = spark.createDataFrame(
            [(i, e) for i, e in enumerate(escaped)], "i int, v string"
        )
        out = {r["i"]: r["v"] for r in
               string_replace(df, "v", method="unquote").collect()}
        for i, s in enumerate(originals):
            assert out[i] == s, (escaped[i], out[i], s)
