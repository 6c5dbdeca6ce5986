"""iLogtail YAML config adapter: a reference user's pipeline file runs
unchanged — inputs read as `content` rows, plugin Types + reference
parameter names translate to operators, flushers write files."""

from __future__ import annotations

import json
import os

import pytest

from ilogtail_spark.plans.config import (
    compile_ilogtail_config,
    read_inputs,
    run_ilogtail_config,
)

NGINX_YAML = """
enable: true
inputs:
  - Type: input_file
    FilePaths:
      - {log_path}
processors:
  - Type: processor_regex
    SourceKey: content
    Regex: '(\\S+) \\S+ \\S+ \\[([^\\]]+)\\] "(\\w+) (\\S+) HTTP/([\\d.]+)" (\\d+) (\\d+) "([^"]*)" "([^"]*)"'
    Keys:
      - remote_addr
      - time_local
      - method
      - url
      - protocol
      - status
      - body_bytes_sent
      - http_referer
      - http_user_agent
  - Type: processor_dict_map
    SourceKey: method
    DestKey: method_class
    MapDict:
      GET: read
      POST: write
    HandleMissing: true
    Missing: other
flushers:
  - Type: flusher_stdout
    OnlyStdout: true
"""

LINES = [
    '10.0.0.1 - - [01/Jan/2024:00:00:01 +0000] "GET /a HTTP/1.1" 200 123 "-" "curl/8"',
    '10.0.0.2 - - [01/Jan/2024:00:00:02 +0000] "POST /b HTTP/1.1" 500 7 "-" "wget/1"',
]


class TestYamlConfig:
    def _write_log(self, tmp_path):
        p = tmp_path / "access.log"
        p.write_text("\n".join(LINES) + "\n")
        return str(p)

    def test_end_to_end(self, spark, tmp_path):
        yaml_text = NGINX_YAML.format(log_path=self._write_log(tmp_path))
        out_dir = str(tmp_path / "sinks")
        df = run_ilogtail_config(spark, yaml_text, out_dir=out_dir)
        rows = {r["remote_addr"]: r for r in df.collect()}
        assert rows["10.0.0.1"]["method"] == "GET"
        assert rows["10.0.0.1"]["method_class"] == "read"
        assert rows["10.0.0.2"]["status"] == "500"
        assert rows["10.0.0.2"]["method_class"] == "write"
        # flusher wrote jsonlines
        sink = [d for d in os.listdir(out_dir) if d.startswith("flusher_0")][0]
        files = [
            f for f in os.listdir(os.path.join(out_dir, sink)) if f.endswith(".json")
        ]
        recs = []
        for f in files:
            with open(os.path.join(out_dir, sink, f)) as fh:
                recs += [json.loads(line) for line in fh if line.strip()]
        assert {r["remote_addr"] for r in recs} == {"10.0.0.1", "10.0.0.2"}

    def test_source_kept_on_parse_error_default(self, spark, tmp_path):
        p = tmp_path / "bad.log"
        p.write_text("not an access line\n")
        yaml_text = NGINX_YAML.format(log_path=str(p))
        row = run_ilogtail_config(spark, yaml_text).first()
        # regex.go keep-source-on-error default: raw content survives
        assert row["content"] == "not an access line"
        assert row["remote_addr"] is None

    def test_unknown_processor_raises(self, spark):
        with pytest.raises(KeyError, match="processor_spl"):
            compile_ilogtail_config(
                {"processors": [{"Type": "processor_spl"}], "flushers": []}
            )

    def test_unknown_input_raises(self, spark):
        with pytest.raises(KeyError, match="service_http_server"):
            read_inputs(spark, {"inputs": [{"Type": "service_http_server"}]})

    def test_disabled_config_raises(self, spark):
        with pytest.raises(ValueError, match="enable"):
            compile_ilogtail_config({"enable": False})
