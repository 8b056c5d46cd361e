"""Winnowing fingerprint properties (Schleimer/Wilkerson/Aiken 2003).

The operator's value rests on the local-selection guarantee: with
k-gram size k and window w, any two documents sharing a token run of
length >= w + k - 1 MUST share at least one selected fingerprint hash.
These tests drive :func:`operators.text.winnow_fingerprints` (the same
core the registered ``doc_winnowing_fingerprints`` query uses) on
synthetic corpora where the ground truth is constructed, plus a
quadratic pure-Python reference for exact selection equality.
"""

from __future__ import annotations

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from ml_feature_store_enterprise_grade_spark.operators.text import (
    _WINNOW_W,
    winnow_fingerprints,
)

K = 3  # word-k-gram size fixed by the operator


def _hash64(s: str, seed: int = 0) -> int:
    """Python twin of functions.scalar.portable_hash64."""
    return int(hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:15], 16)


def _py_winnow(tokens: list[str], w: int = _WINNOW_W) -> set[tuple[int, int]]:
    """Quadratic reference: leftmost-min (hash, pos) per full window."""
    grams = [
        " ".join(tokens[i : i + K]) for i in range(len(tokens) - K + 1)
    ]
    hashes = [(_hash64(g), i + 1) for i, g in enumerate(grams)]
    if not hashes:
        return set()
    n = len(hashes)
    out: set[tuple[int, int]] = set()
    for s in range(1, max(n - w + 1, 1) + 1):
        frame = hashes[s - 1 : s - 1 + w]
        h, p = min(frame)
        out.add((p, h))
    return out


def _toks_frame(spark, docs: dict[int, list[str]]):
    rows = [(i, toks) for i, toks in docs.items()]
    return spark.createDataFrame(rows, "doc_id long, toks array<string>")


def test_selection_matches_python_reference(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    docs = {
        i: [rng.choice(vocab) for _ in range(rng.randint(1, 60))]
        for i in range(20)
    }
    got = {
        (r.doc_id, r.fpos, r.fph)
        for r in winnow_fingerprints(_toks_frame(spark, docs)).collect()
    }
    want = {
        (doc_id, p, h)
        for doc_id, toks in docs.items()
        for (p, h) in _py_winnow(toks)
    }
    assert got == want


def test_shared_run_guarantee(spark):
    """Any shared run of >= w + k - 1 tokens => >= 1 shared hash."""
    rng = random.Random(11)
    vocab = [f"t{i}" for i in range(200)]
    shared = [rng.choice(vocab) for _ in range(_WINNOW_W + K - 1)]
    docs = {}
    for i in range(12):
        left = [rng.choice(vocab) for _ in range(rng.randint(0, 25))]
        right = [rng.choice(vocab) for _ in range(rng.randint(0, 25))]
        docs[i] = left + shared + right
    fp = winnow_fingerprints(_toks_frame(spark, docs))
    per_doc = {
        r.doc_id: set(r.hs)
        for r in fp.groupBy("doc_id").agg(F.collect_set("fph").alias("hs")).collect()
    }
    assert set(per_doc) == set(docs)
    ids = sorted(per_doc)
    for a in ids:
        for b in ids:
            if a < b:
                assert per_doc[a] & per_doc[b], (
                    f"docs {a},{b} share a {_WINNOW_W + K - 1}-token run "
                    "but no fingerprint"
                )


def test_density_close_to_expected(spark):
    """On random text the expected selection density is ~2/(w+1)."""
    rng = random.Random(23)
    vocab = [f"v{i}" for i in range(5000)]
    docs = {i: [rng.choice(vocab) for _ in range(400)] for i in range(10)}
    fp = winnow_fingerprints(_toks_frame(spark, docs))
    n_sel = fp.count()
    n_kgrams = sum(len(t) - K + 1 for t in docs.values())
    density = n_sel / n_kgrams
    expected = 2.0 / (_WINNOW_W + 1)
    assert expected * 0.7 < density < expected * 1.3


def test_short_doc_single_window(spark):
    """Docs shorter than w k-grams still emit exactly one fingerprint
    (the min over the whole doc)."""
    docs = {0: ["a", "b", "c", "d"]}  # 2 k-grams < w
    fp = winnow_fingerprints(_toks_frame(spark, docs)).collect()
    assert len(fp) == 1
    grams = ["a b c", "b c d"]
    assert fp[0].fph == min(_hash64(g) for g in grams)


def test_empty_and_subkgram_docs_absent(spark):
    docs = {0: [], 1: ["only", "two"], 2: ["a", "b", "c"]}
    fp = winnow_fingerprints(_toks_frame(spark, docs))
    assert {r.doc_id for r in fp.collect()} == {2}
