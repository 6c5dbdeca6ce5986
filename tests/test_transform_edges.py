"""Correctness anchors for transform edge semantics: AES known-answer
vectors (processor_encrypt), unquote escape ordering
(processor_string_replace), and simhash band validation."""

from __future__ import annotations

import pytest

from ilogtail_spark.functions.dedup import simhash_pairs
from ilogtail_spark.operators.transform import encrypt_fields, string_replace


class TestEncryptKnownAnswer:
    # Expected ciphertexts independently generated with
    # `openssl enc -aes-128-cbc -K <hex(key)> -iv <iv>` (PKCS#7 padding,
    # same parameters as plugins/processor/encrypt/processor_encrypt.go) —
    # this anchors the op to a real AES implementation, not just to its
    # own determinism.
    # HEX key material (16 bytes = AES-128): parseKey:174 hex-decodes
    # the Key on BOTH supply paths (inline and KeyFilePath), so the
    # operator takes hex everywhere. These are the bytes of the ASCII
    # string "0123456789abcdef" — same key the openssl vectors used.
    KEY = "0123456789abcdef".encode().hex()

    def test_zero_iv_vector(self, spark):
        # Spark's aes_encrypt emits IV || ciphertext; the ciphertext body
        # must equal the openssl result for the same key/iv/plaintext
        df = spark.createDataFrame([("hello",)], "text string")
        out = encrypt_fields(df, ["text"], self.KEY).first()
        assert out["text"].lower() == "00" * 16 + "674c7ef38e78cabd9cec9c125823a639"

    def test_oracle_kat_literals_match_openssl(self, spark):
        """The O_ENCRYPT oracle literals (queries._ENCRYPT_KAT) must stay
        pinned to a real AES implementation: re-derive each via the
        openssl CLI and via Spark, and require all three to agree."""
        import shutil
        import subprocess

        from ilogtail_spark.queries import _ENCRYPT_IV_PREFIX, _ENCRYPT_KAT

        df = spark.createDataFrame(
            [(k,) for k in _ENCRYPT_KAT], "role string"
        )
        spark_out = {
            r["orig"]: r["role"]
            for r in encrypt_fields(
                df.selectExpr("role", "role AS orig"), ["role"], self.KEY
            ).collect()
        }
        for plain, ct in _ENCRYPT_KAT.items():
            assert spark_out[plain] == _ENCRYPT_IV_PREFIX + ct
            if shutil.which("openssl"):
                got = subprocess.run(
                    ["openssl", "enc", "-aes-128-cbc", "-K", self.KEY,
                     "-iv", "00" * 16],
                    input=plain.encode(), capture_output=True, check=True,
                ).stdout.hex().upper()
                assert got == ct

    def test_nonzero_iv_vector(self, spark):
        df = spark.createDataFrame([("sensitive-data",)], "text string")
        out = encrypt_fields(
            df, ["text"], self.KEY, iv_hex="000102030405060708090a0b0c0d0e0f"
        ).first()
        assert out["text"].lower() == (
            "000102030405060708090a0b0c0d0e0f"
            "d2481b96528f14a61453cdd799d67e4f"
        )

    def test_key_from_file(self, spark, tmp_path):
        # EncryptionInfo.KeyFilePath (processor_encrypt.go:41-53,
        # parseKey:153-182): JSON file with hex Key (+ optional IV);
        # must produce the same ciphertext as the literal-key path
        import json

        kf = tmp_path / "aes_key.json"
        kf.write_text(
            json.dumps(
                {
                    "Key": self.KEY,
                    "IV": "000102030405060708090a0b0c0d0e0f",
                }
            )
        )
        df = spark.createDataFrame([("sensitive-data",)], "text string")
        out = encrypt_fields(df, ["text"], key_file_path=str(kf)).first()
        assert out["text"].lower() == (
            "000102030405060708090a0b0c0d0e0f"
            "d2481b96528f14a61453cdd799d67e4f"
        )
        # explicit iv_hex overrides the file's IV
        out2 = encrypt_fields(
            df, ["text"], key_file_path=str(kf), iv_hex="00" * 16
        ).first()
        out3 = encrypt_fields(df, ["text"], self.KEY).first()
        assert out2["text"] == out3["text"]

    def test_key_file_errors(self, spark, tmp_path):
        import json

        df = spark.createDataFrame([("x",)], "text string")
        with pytest.raises(ValueError, match="key or key_file_path"):
            encrypt_fields(df, ["text"])
        kf = tmp_path / "nokey.json"
        kf.write_text(json.dumps({"IV": "00" * 16}))
        with pytest.raises(ValueError, match="no 'Key'"):
            encrypt_fields(df, ["text"], key_file_path=str(kf))


class TestUnquoteEscapeOrder:
    def test_escaped_backslash_not_reinterpreted(self, spark):
        # a\\nb (chars a,\,\,n,b) → a\nb (a, backslash, n, b) — NOT a newline
        df = spark.createDataFrame([('"a\\\\nb"',)], "v string")
        out = string_replace(df, "v", method="unquote").first()
        assert out["v"] == "a\\nb"

    def test_plain_escapes(self, spark):
        df = spark.createDataFrame([('"x\\n\\ty\\"z"',)], "v string")
        out = string_replace(df, "v", method="unquote").first()
        assert out["v"] == 'x\n\ty"z'

    def test_double_backslash_to_single(self, spark):
        df = spark.createDataFrame([('"c:\\\\path"',)], "v string")
        out = string_replace(df, "v", method="unquote").first()
        assert out["v"] == "c:\\path"


class TestSimhashBandValidation:
    def test_incomplete_banding_raises(self, spark):
        df = spark.createDataFrame([("d1", "a b c")], "doc_id string, text string")
        # 4 bands (band_bits=8) cannot guarantee hamming ≤ 6 — pigeonhole
        with pytest.raises(ValueError, match="pigeonhole"):
            simhash_pairs(df, max_hamming=6, band_bits=8)

    def test_defaults_are_complete(self, spark):
        df = spark.createDataFrame(
            [("d1", "alpha beta gamma"), ("d2", "alpha beta gamma")],
            "doc_id string, text string",
        )
        pairs = simhash_pairs(df).collect()  # defaults: 8 bands ≥ hamming 6+1
        assert {(r["id_a"], r["id_b"]) for r in pairs} == {("d1", "d2")}


class TestSimhashWideForm:
    def test_60_bit_form_finds_planted_dups(self, spark):
        """The scale form (60-bit hash, 15-bit bands): exact duplicates
        (hamming 0) must always pair, near-identical texts must pair
        within the hamming budget, and unrelated texts must not."""
        rows = [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog today"),  # exact
            (3, "the quick brown fox jumps over the lazy dog tonight"),  # near
            (4, "completely unrelated words about something else entirely"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        # 60/15 → 4 bands → pigeonhole supports max_hamming ≤ 3 (a wide
        # hash is STRICTER per hamming unit — by design)
        pairs = {(r["id_a"], r["id_b"]): r["hamming"]
                 for r in simhash_pairs(df, max_hamming=3, bits=60,
                                        band_bits=15).collect()}
        assert pairs[(1, 2)] == 0
        assert not any(4 in p for p in pairs)

    def test_wide_bits_validation(self, spark):
        import pytest

        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        from ilogtail_spark.functions.dedup import simhash

        with pytest.raises(ValueError, match=r"\[1, 60\]"):
            simhash(df, bits=61)
        # 60-bit signatures use the full width (not stuck at 32 bits)
        sigs = [r["simhash"] for r in simhash(
            spark.createDataFrame(
                [(i, f"tok{i} alpha beta gamma delta") for i in range(50)],
                "doc_id long, text string"), bits=60).collect()]
        assert any(s >= 2**32 for s in sigs)
