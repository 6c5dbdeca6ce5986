"""Differential harness for custom_single_flatten / custom_single: a
pure-Python model implements the reference semantics directly
(convertLogToMap + addTagIfRequired + the flatten/nested merge,
pkg/protocol/converter) and is compared against the Spark operator on
RANDOMIZED contents maps — many rows, ONE Spark job per configuration,
like the prom_relabel interpreter harness.
"""

from __future__ import annotations

import json
import random

from ilogtail_spark.operators.convert import (
    K8S_TAG_CONVERSION,
    TAG_CONVERSION,
    TAG_PREFIX,
    custom_single,
    custom_single_flatten,
)

# ------------------------- pure-Python model -------------------------


def _convert(name: str, k8s: bool) -> str:
    if k8s and name in K8S_TAG_CONVERSION:
        return K8S_TAG_CONVERSION[name]
    return TAG_CONVERSION.get(name, name)


def _add_tag(tags: dict, rename: dict, key: str, value: str) -> None:
    # addTagIfRequired (converter.go:309-315)
    if key in rename:
        if rename[key]:
            tags[rename[key]] = value
    else:
        tags[key] = value


def model_convert_log_to_map(
    contents: dict, group_tags: dict, source: str | None, topic: str | None,
    rename: dict, k8s: bool,
) -> tuple[dict, dict]:
    out_contents: dict = {}
    tags: dict = {}
    for k, v in contents.items():
        if k == "__log_topic__":
            _add_tag(tags, rename, "log.topic", v)
        elif k == TAG_PREFIX + "__user_defined_id__":
            continue
        elif k.startswith(TAG_PREFIX):
            _add_tag(tags, rename, _convert(k[len(TAG_PREFIX):], k8s), v)
        elif k in TAG_CONVERSION:
            _add_tag(tags, rename, _convert(k, k8s), v)
        else:
            out_contents[k] = v
    for k, v in group_tags.items():
        if k in ("__user_defined_id__", "__pack_id__"):
            continue
        _add_tag(tags, rename, _convert(k, k8s), v)
    if source is not None:
        _add_tag(tags, rename, "host.ip", source)
    if topic is not None:
        _add_tag(tags, rename, "log.topic", topic)
    return out_contents, tags


def model_flatten(contents, tags, t, pk_rename) -> dict:
    out = dict(contents)
    out.update(tags)  # tags win
    out[pk_rename.get("time", "time")] = t
    return out


def model_nested(contents, tags, t, pk_rename) -> dict:
    return {
        pk_rename.get("contents", "contents"): contents,
        pk_rename.get("tags", "tags"): tags,
        pk_rename.get("time", "time"): t,
    }


# ------------------------- random generator --------------------------

CONTENT_KEYS = ["method", "status", "msg", "a.b", 'we"ird', "path"]
# NOTE: no bare-conv-key + prefixed-twin pairs (e.g. __path__ AND
# __tag__:__path__): those collide on the same final tag name and their
# winner is entry-order-defined, but a python-dict-sourced map column
# crosses into the JVM as a HashMap and loses insertion order (see the
# operator's ordering note) — create_map-built maps keep it, tested in
# TestFlattenSemantics.
TAGGY_KEYS = (
    ["__log_topic__", TAG_PREFIX + "__user_defined_id__"]
    + [TAG_PREFIX + k for k in TAG_CONVERSION]
    + [TAG_PREFIX + "custom_tag"]
)
RENAMABLE = ["host.name", "log.topic", "k8s.node.ip", "custom_tag", "env",
             "log.file.path"]


def random_case(rng: random.Random) -> dict:
    contents = {}
    for k in rng.sample(CONTENT_KEYS, rng.randrange(1, 4)):
        contents[k] = f"v{rng.randrange(100)}|x"
    for k in rng.sample(TAGGY_KEYS, rng.randrange(0, 5)):
        contents[k] = f"t{rng.randrange(100)}"
    return contents


class TestFlattenDifferential:
    def _run(self, spark, k8s: bool, rename: dict, pk: dict):
        rng = random.Random(0xC0FFEE + k8s)
        cases = [random_case(rng) for _ in range(60)]
        group_tags = {"env": "prod", "__pack_id__": "p", "__hostname__": "gh"}
        rows = [(i, 1700000000 + i, c, f"10.0.{i % 4}.1", f"top{i % 3}")
                for i, c in enumerate(cases)]
        df = spark.createDataFrame(
            rows,
            "row_id long, log_time long, fields map<string,string>, "
            "src string, topic string",
        )
        flat = {
            r["row_id"]: json.loads(r["flat_json"])
            for r in custom_single_flatten(
                df, "fields", "log_time", group_tags=group_tags,
                source_col="src", topic_col="topic",
                tag_key_rename=rename, protocol_key_rename=pk, k8s=k8s,
            ).collect()
        }
        nested = {
            r["row_id"]: json.loads(r["single_json"])
            for r in custom_single(
                df, "fields", "log_time", group_tags=group_tags,
                source_col="src", topic_col="topic",
                tag_key_rename=rename, protocol_key_rename=pk, k8s=k8s,
            ).collect()
        }
        for i, (_, t, c, src, top) in enumerate(rows):
            mc, mt = model_convert_log_to_map(
                c, group_tags, src, top, rename, k8s
            )
            assert flat[i] == model_flatten(mc, mt, t, pk), (i, c)
            assert nested[i] == model_nested(mc, mt, t, pk), (i, c)

    def test_plain(self, spark):
        self._run(spark, k8s=False, rename={}, pk={})

    def test_k8s_with_renames_and_deletes(self, spark):
        self._run(
            spark, k8s=True,
            rename={"host.name": "hn", "k8s.node.ip": "", "custom_tag": "",
                    "env": "environment", "log.file.path": "file.path"},
            pk={"time": "@ts", "contents": "c", "tags": "t"},
        )
