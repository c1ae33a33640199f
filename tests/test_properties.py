"""Property-based and randomized-oracle tests.

Two layers:
  * hypothesis over pure-Python invariants (no Spark per example):
    the NER alternation pattern is leftmost-longest non-overlapping,
    checked against a brute-force scanner on random token sequences.
  * one-shot randomized Spark-vs-Python oracles for the hand-optimized
    textops kernels (zip_with shingles, one-md5 MinHash signatures,
    explode SimHash): 300 random texts in a single Spark job, compared
    against an independent pure-Python reimplementation — guards the
    optimized column-expression forms against semantic drift.
"""

from __future__ import annotations

import hashlib
import random
import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cspirit_ontology_information_extraction_opus4plan_spark.ontology_data import (
    alternation,
    surfaces,
)
from cspirit_ontology_information_extraction_opus4plan_spark.operators import (
    textops as TX,
)

# --- hypothesis: NER leftmost-longest ---------------------------------------

_SURF = surfaces()[:40]
_NOISE = ["xqz", "lorem", "ipsum", "foo1"]


def _brute_leftmost_longest(text: str, words: list[str]) -> list[tuple]:
    """Independent scanner: at each position, the longest word-boundary
    match wins; scanning resumes after it (non-overlapping)."""
    out, i = [], 0
    by_len = sorted(words, key=len, reverse=True)
    while i < len(text):
        hit = None
        for w in by_len:
            if text.startswith(w, i):
                before_ok = i == 0 or not (text[i - 1].isalnum()
                                           or text[i - 1] == "_")
                j = i + len(w)
                after_ok = j == len(text) or not (text[j].isalnum()
                                                  or text[j] == "_")
                if before_ok and after_ok:
                    hit = w
                    break
        if hit:
            out.append((i, hit))
            i += len(hit)
        else:
            i += 1
    return out


@settings(max_examples=200, deadline=None)
@given(st.lists(st.sampled_from(_SURF + _NOISE), min_size=0, max_size=12))
def test_ner_pattern_is_leftmost_longest(tokens):
    text = " ".join(tokens)
    pat = re.compile(r"\b(" + alternation(_SURF) + r")\b")
    got = [(m.start(), m.group(1)) for m in pat.finditer(text)]
    assert got == _brute_leftmost_longest(text, _SURF)


# --- randomized Spark-vs-Python oracle for textops kernels ------------------


def _py_tokens(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.lower().strip()) if t]


def _py_shingles(tokens: list[str], w: int) -> list[str]:
    if len(tokens) >= w:
        return [" ".join(tokens[i:i + w])
                for i in range(len(tokens) - w + 1)]
    return [" ".join(tokens)]


def _py_minhash(tokens: list[str]) -> list[str]:
    hs = [hashlib.md5(s.encode()).hexdigest()
          for s in set(_py_shingles(tokens, TX.SHINGLE_W))]
    out = []
    for perm in TX.MINHASH_PERMS:
        table = str.maketrans(TX.HEX_DIGITS, perm)
        out.append(min(h.translate(table) for h in hs))
    return out


def _py_simhash(tokens: list[str]) -> int:
    toks = list(dict.fromkeys(tokens))
    total = 0
    for k in range(16):
        c = sum(1 if hashlib.md5(t.encode()).hexdigest()[k] >= "8" else -1
                for t in toks)
        if c > 0:
            total += 1 << k
    return total


@pytest.fixture(scope="module")
def random_docs():
    rng = random.Random(20260817)
    vocab = [f"w{i}" for i in range(30)] + ["a", "bb", "ccc"]
    docs = []
    for i in range(300):
        n = rng.randint(1, 40)
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    return docs


def test_textops_kernels_match_python_oracle(spark, random_docs):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(random_docs, "doc_id long, text string")

    sh = df.select(
        "doc_id", TX._shingles(TX.tokens_col(), TX.SHINGLE_W).alias("sh"))
    got_sh = {r["doc_id"]: list(r["sh"]) for r in sh.collect()}
    for doc_id, text in random_docs:
        assert got_sh[doc_id] == _py_shingles(_py_tokens(text),
                                              TX.SHINGLE_W), doc_id

    sig = TX.minhash_signatures(df)
    got_sig = {r["doc_id"]: [r[f"mh{i}"] for i in range(TX.MINHASH_K)]
               for r in sig.collect()}
    for doc_id, text in random_docs:
        assert got_sig[doc_id] == _py_minhash(_py_tokens(text)), doc_id

    clusters = TX.simhash_clusters(df).collect()
    from collections import Counter
    want = Counter(_py_simhash(_py_tokens(t)) for _, t in random_docs)
    want_clusters = {h: n for h, n in want.items() if n > 1}
    got_clusters = {r["simhash"]: r["n_docs"] for r in clusters}
    assert got_clusters == want_clusters
