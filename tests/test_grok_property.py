"""Property-based test: grok compiler group-index math holds for random
compositions of aliased patterns, literal text, and user parens."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from ilogtail_spark.grok import compile_grok

# (pattern name, generator of matching sample values)
SAMPLES = {
    "INT": st.integers(-(10**6), 10**6).map(str),
    "WORD": st.from_regex(r"[A-Za-z]{1,10}", fullmatch=True),
    "IPV4": st.tuples(*[st.integers(0, 255)] * 4).map(
        lambda t: ".".join(map(str, t))
    ),
    "UUID": st.from_regex(
        r"[a-f0-9]{8}-[a-f0-9]{4}-[a-f0-9]{4}-[a-f0-9]{4}-[a-f0-9]{12}",
        fullmatch=True,
    ),
}

piece = st.tuples(
    st.sampled_from(sorted(SAMPLES)),
    st.from_regex(r"[a-z]{1,6}", fullmatch=True),  # alias
    st.booleans(),  # wrap this piece in a user literal group?
)


@settings(max_examples=60, deadline=None)
@given(st.lists(piece, min_size=1, max_size=5, unique_by=lambda p: p[1]),
       st.data())
def test_group_indices_extract_expected_values(pieces, data):
    # build "<sep>%{NAME:alias}<sep>..." with hard separators so matches
    # can't bleed into each other
    expr_parts, text_parts, expected = [], [], {}
    for i, (name, alias, wrap) in enumerate(pieces):
        ref = f"%{{{name}:{alias}}}"
        if wrap:
            ref = "(" + ref + ")"  # user paren shifts group numbering
        expr_parts.append(ref)
        value = data.draw(SAMPLES[name], label=alias)
        text_parts.append(value)
        expected[alias] = value
    expr = ";;".join(expr_parts)
    text = ";;".join(text_parts)

    cg = compile_grok(expr)
    m = re.search(cg.regex, text)
    assert m is not None, (expr, text, cg.regex)
    for alias, _typ, gi in cg.fields:
        assert m.group(gi) == expected[alias], (expr, text, alias)
