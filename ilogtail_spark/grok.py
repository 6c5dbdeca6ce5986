"""Grok → single-regex compiler (driver-side, compile-once).

Reimplements the semantics of processor_grok
(plugins/processor/grok/processor_grok.go):
  * `%{NAME}`            — inline the named pattern, non-capturing;
  * `%{NAME:alias}`      — inline it as a capturing group bound to alias;
  * `%{NAME:alias:type}` — same, plus a cast (`int`/`long`/`float`/
    `double`/`bool`) applied after extraction (processor_grok.go:49).

The reference denormalizes the pattern graph with a topological sort
(processor_grok.go:218-258, sort at :380-427) so each pattern is expanded
exactly once; we achieve the same closure by memoized recursive expansion
with cycle detection. The compiled artifact is ONE plain-group regex plus
an ordered (alias, type, group_index) list — group indices are counted the
same way Java and Python do (opening parens of capturing groups), so the
result runs unchanged in JVM ``regexp_extract`` or pandas ``str.extract``.

Multiple `Match` expressions are tried in order, first match wins
(processor_grok.go:135-173) — see :func:`grok_parse`.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# A compact default pattern library covering the reference's commonly-used
# subset (processor_grok_default_patterns.go ships 97; these are the ones
# its tests and docs exercise). All standard grok definitions — public
# knowledge, written fresh.
DEFAULT_PATTERNS: dict[str, str] = {
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"%{USERNAME}",
    "INT": r"(?:[+-]?(?:[0-9]+))",
    "BASE10NUM": r"(?:[+-]?(?:[0-9]+(?:\.[0-9]+)?)|\.[0-9]+)",
    "NUMBER": r"(?:%{BASE10NUM})",
    "POSINT": r"\b(?:[1-9][0-9]*)\b",
    "NONNEGINT": r"\b(?:[0-9]+)\b",
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "QUOTEDSTRING": r'(?:"(?:[^"\\]|\\.)*"|\'(?:[^\'\\]|\\.)*\')',
    "QS": r"%{QUOTEDSTRING}",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "IPV4": r"(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)",
    "IPV6": r"(?:[0-9A-Fa-f]{0,4}:){2,7}(?:[0-9A-Fa-f]{0,4}|%{IPV4})",
    "IP": r"(?:%{IPV6}|%{IPV4})",
    "HOSTNAME": r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b",
    "HOST": r"%{HOSTNAME}",
    "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
    "EMAILLOCALPART": r"[a-zA-Z][a-zA-Z0-9_.+-=:]+",
    "EMAILADDRESS": r"%{EMAILLOCALPART}@%{HOSTNAME}",
    "MAC": r"(?:[A-Fa-f0-9]{2}[:-]){5}[A-Fa-f0-9]{2}",
    "MONTH": r"\b(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|Jun(?:e)?|Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|Nov(?:ember)?|Dec(?:ember)?)\b",
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "MONTHDAY": r"(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])",
    "DAY": r"(?:Mon(?:day)?|Tue(?:sday)?|Wed(?:nesday)?|Thu(?:rsday)?|Fri(?:day)?|Sat(?:urday)?|Sun(?:day)?)",
    "YEAR": r"(?:\d\d){1,2}",
    "HOUR": r"(?:2[0123]|[01]?[0-9])",
    "MINUTE": r"(?:[0-5][0-9])",
    "SECOND": r"(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?)",
    "TIME": r"(?!<[0-9])%{HOUR}:%{MINUTE}(?::%{SECOND})(?![0-9])",
    "DATE_US": r"%{MONTHNUM}[/-]%{MONTHDAY}[/-]%{YEAR}",
    "DATE_EU": r"%{MONTHDAY}[./-]%{MONTHNUM}[./-]%{YEAR}",
    "ISO8601_TIMEZONE": r"(?:Z|[+-]%{HOUR}(?::?%{MINUTE}))",
    "ISO8601_SECOND": r"(?:%{SECOND}|60)",
    "TIMESTAMP_ISO8601": r"%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]%{HOUR}:?%{MINUTE}(?::?%{SECOND})?%{ISO8601_TIMEZONE}?",
    "DATE": r"%{DATE_US}|%{DATE_EU}",
    "DATESTAMP": r"%{DATE}[- ]%{TIME}",
    "HTTPDATE": r"%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{INT}",
    "LOGLEVEL": r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|[Ii]nfo?(?:rmation)?|INFO?(?:RMATION)?|[Ww]arn?(?:ing)?|WARN?(?:ING)?|[Ee]rr?(?:or)?|ERR?(?:OR)?|[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?)",
    "UNIXPATH": r"(?:/[\w_%!$@:.,+~-]+)+",
    "WINPATH": r"(?:[A-Za-z]+:|\\)(?:\\[^\\?*]*)+",
    "PATH": r"(?:%{UNIXPATH}|%{WINPATH})",
    "URIPROTO": r"[A-Za-z](?:[A-Za-z0-9+\-.]+)+",
    "URIHOST": r"%{IPORHOST}(?::%{POSINT})?",
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\-]*)+",
    "URIQUERY": r"[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*",
    "URIPARAM": r"\?%{URIQUERY}",
    "URIPATHPARAM": r"%{URIPATH}(?:\?%{URIQUERY})?",
    "URI": r"%{URIPROTO}://(?:%{USER}(?::[^@]*)?@)?(?:%{URIHOST})?(?:%{URIPATHPARAM})?",
    "SYSLOGTIMESTAMP": r"%{MONTH} +%{MONTHDAY} %{TIME}",
    "COMBINEDAPACHELOG": r'%{IPORHOST:clientip} %{USER:ident} %{USER:auth} \[%{HTTPDATE:timestamp}\] "(?:%{WORD:verb} %{NOTSPACE:request}(?: HTTP/%{NUMBER:httpversion})?|%{DATA:rawrequest})" %{NUMBER:response} (?:%{NUMBER:bytes}|-) %{QS:referrer} %{QS:agent}',
}

_GROK_REF = re.compile(r"%\{(\w+)(?::([\w.\[\]]+))?(?::(\w+))?\}")
# an unescaped '(' that starts a *capturing* group
_CAPTURING_PAREN = re.compile(r"(?<!\\)\((?!\?)")


@dataclass
class CompiledGrok:
    regex: str                     # plain-group Java/Python-compatible regex
    fields: list[tuple[str, str, int]]  # (alias, type, group_index)

    @property
    def keys(self) -> list[str]:
        return [a for a, _, _ in self.fields]

    @property
    def types(self) -> dict[str, str]:
        m = {"int": "int", "long": "long", "float": "float", "double": "double",
             "bool": "boolean", "boolean": "boolean"}
        return {a: m[t] for a, t, _ in self.fields if t in m}


def compile_grok(
    expr: str, custom_patterns: dict[str, str] | None = None
) -> CompiledGrok:
    """Denormalize a grok expression into one plain-group regex.

    Equivalent closure to the reference's topo-sorted denormalization
    (processor_grok.go:261-295): every %{REF} is fully inlined; alias
    captures become plain `(...)` groups; group indices are assigned by
    opening-paren order, counting any literal capturing parens the user
    wrote in `expr` itself (they get index slots but no alias).
    """
    patterns = dict(DEFAULT_PATTERNS)
    if custom_patterns:
        patterns.update(custom_patterns)

    memo: dict[str, str] = {}

    def expand_plain(name: str, stack: tuple[str, ...]) -> str:
        """Expand a referenced pattern with all inner aliases discarded
        (an un-aliased %{REF} captures nothing, grok semantics)."""
        if name in memo:
            return memo[name]
        if name in stack:
            raise ValueError(f"grok pattern cycle: {' -> '.join(stack)} -> {name}")
        if name not in patterns:
            raise KeyError(f"unknown grok pattern %{{{name}}}")
        body = patterns[name]

        def sub(m: re.Match[str]) -> str:
            return "(?:" + expand_plain(m.group(1), stack + (name,)) + ")"

        out = _GROK_REF.sub(sub, body)
        # neutralize capturing parens inside library patterns so they don't
        # shift user group indices
        out = _CAPTURING_PAREN.sub("(?:", out)
        memo[name] = out
        return out

    fields: list[tuple[str, str, int]] = []
    counter = {"g": 0}

    def build(s: str) -> str:
        out: list[str] = []
        pos = 0
        for m in _GROK_REF.finditer(s):
            lit = s[pos : m.start()]
            counter["g"] += len(_CAPTURING_PAREN.findall(lit))
            out.append(lit)
            name, alias, typ = m.group(1), m.group(2), m.group(3)
            inner = expand_plain(name, ())
            if alias:
                counter["g"] += 1
                fields.append((alias.replace(".", "_"), typ or "string", counter["g"]))
                out.append("(" + inner + ")")
            else:
                out.append("(?:" + inner + ")")
            pos = m.end()
        tail = s[pos:]
        counter["g"] += len(_CAPTURING_PAREN.findall(tail))
        out.append(tail)
        return "".join(out)

    regex = build(expr)
    re.compile(regex)  # validate eagerly, driver-side
    return CompiledGrok(regex=regex, fields=fields)


def grok_parse(
    df: DataFrame,
    matches: list[str] | str,
    source_key: str = "text",
    *,
    custom_patterns: dict[str, str] | None = None,
    keep_source: bool = True,
    keep_source_if_parse_error: bool = True,
    mode: str = "jvm",
) -> DataFrame:
    """processor_grok (plugins/processor/grok/processor_grok.go:35-173).

    Multiple match expressions are tried in priority order; the first
    whose regex matches supplies the fields (processor_grok.go:135-173).
    Columnar form: later patterns only fill keys still NULL on rows not
    matched by an earlier pattern.
    """
    from ilogtail_spark.operators.parse import regex_parse

    if isinstance(matches, str):
        matches = [matches]
    compiled = [compile_grok(mx, custom_patterns) for mx in matches]

    if len(compiled) == 1:
        cg = compiled[0]
        return regex_parse(
            df, cg.regex, cg.keys, source_key, types=cg.types,
            keep_source=keep_source,
            keep_source_if_parse_error=keep_source_if_parse_error, mode=mode,
        )

    # multi-match: priority-ordered fill
    all_keys: list[str] = []
    for cg in compiled:
        for k in cg.keys:
            if k not in all_keys:
                all_keys.append(k)
    df = df.withColumn("__grok_done__", F.lit(False))
    for ci, cg in enumerate(compiled):
        pat = "(?s)" + cg.regex
        m = (~F.col("__grok_done__")) & F.col(source_key).rlike(pat)
        cols = {}
        for k, typ, gi in cg.fields:
            val = F.regexp_extract(F.col(source_key), pat, gi)
            if k in cg.types:
                val = val.cast(cg.types[k])
            prev = F.col(k) if ci > 0 and k in df.columns else F.lit(None)
            cols[k] = F.when(m, val).otherwise(prev.cast(cg.types.get(k, "string")))
        cols["__grok_done__"] = F.col("__grok_done__") | m
        df = df.withColumns(cols)
    matched = F.col("__grok_done__")
    from ilogtail_spark.operators.parse import _apply_keep_source

    df = _apply_keep_source(df, source_key, matched, keep_source, keep_source_if_parse_error)
    return df.drop("__grok_done__")
