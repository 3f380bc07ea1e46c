"""Known-answer tests for the round-11 batch-O operators
(q_round11o): Kneser-Ney bigrams, tokenizer fertility, bigram
cross-entropy, Chao1 — replayed with independent python/pandas
reimplementations (KN from the textbook formula over dict counts; the
cross-entropy from a literal per-doc loop)."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

from data_ingestor_and_features_creator_spark import plans

QUERIES = plans.queries()


def _docs(duck):
    return duck.execute(
        "SELECT doc_id, text, lang, n_chars FROM documents"
        " ORDER BY doc_id").df()


def _tok(s):
    return [t for t in re.split(r"[ \t\r\n]+", s) if t]


def _bigram_counts(df):
    c12 = Counter()
    per_doc = {}
    for _, row in df.iterrows():
        toks = _tok(row["text"])
        bgs = list(zip(toks, toks[1:]))
        per_doc[row["doc_id"]] = bgs
        c12.update(bgs)
    return c12, per_doc


def test_kneser_ney_vs_python(spark, sf_dir, duck):
    c12, _ = _bigram_counts(_docs(duck))
    c1 = defaultdict(int)
    n1w = defaultdict(int)
    n1c = defaultdict(int)
    for (w1, w2), c in c12.items():
        c1[w1] += c
        n1w[w1] += 1
        n1c[w2] += 1
    nbig = len(c12)
    d = 0.75
    rows = QUERIES["vocab_kneser_ney_bigram"](spark, sf_dir).collect()
    assert len(rows) == 20
    expect_order = sorted(c12.items(),
                          key=lambda kv: (-kv[1], kv[0]))[:20]
    for r, ((w1, w2), c) in zip(rows, expect_order):
        assert (r["w1"], r["w2"], r["count"]) == (w1, w2, c)
        p = (max(c - d, 0.0) / c1[w1]
             + d * n1w[w1] / c1[w1] * (n1c[w2] / nbig))
        assert abs(r["p_kn"] - p) < 1e-5


def test_fertility_vs_python(spark, sf_dir, duck):
    df = _docs(duck)
    pat = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9\s]+")
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for _, row in df.iterrows():
        a = agg[row["lang"]]
        a[0] += 1
        a[1] += len(_tok(row["text"]))
        a[2] += len(pat.findall(row["text"]))
        a[3] += row["n_chars"]
    rows = {r["lang"]: r for r in
            QUERIES["data_tokenizer_fertility"](spark, sf_dir)
            .collect()}
    assert set(rows) == set(agg)
    for lang, (nd, w, p, ch) in agg.items():
        r = rows[lang]
        assert (r["n_docs"], r["words"], r["pieces"]) == (nd, w, p)
        assert abs(r["fertility"] - p / w) < 1e-5
        assert abs(r["chars_per_piece"] - ch / p) < 1e-5


def test_cross_entropy_vs_python(spark, sf_dir, duck):
    df = _docs(duck)
    c12, per_doc = _bigram_counts(df)
    c1 = defaultdict(int)
    vocab = set()
    for (w1, w2), c in c12.items():
        c1[w1] += c
        vocab.update((w1, w2))
    v = len(vocab)
    rows = {r["doc_id"]: r for r in
            QUERIES["text_bigram_cross_entropy"](spark, sf_dir)
            .collect()}
    for doc_id, bgs in per_doc.items():
        if not bgs:
            assert doc_id not in rows
            continue
        lps = [round(math.log((c12[bg] + 0.5) / (c1[bg[0]] + 0.5 * v)),
                     9) for bg in bgs]
        r = rows[doc_id]
        assert r["n_bigrams"] == len(bgs)
        assert abs(r["cross_entropy"] + sum(lps) / len(lps)) < 1e-5


def test_chao1_vs_python(spark, sf_dir, duck):
    df = _docs(duck)
    tf = Counter()
    for _, row in df.iterrows():
        tf.update(_tok(row["text"]))
    n = sum(tf.values())
    types = len(tf)
    f1 = sum(1 for c in tf.values() if c == 1)
    f2 = sum(1 for c in tf.values() if c == 2)
    r = QUERIES["vocab_chao1_unseen"](spark, sf_dir).collect()[0]
    assert (r["n_tokens"], r["n_types"], r["f1"], r["f2"]) == (
        n, types, f1, f2)
    if f2 > 0:
        assert abs(r["chao1"] - (types + f1 * f1 / (2 * f2))) < 1e-4
    else:
        assert r["chao1"] is None
    assert abs(r["chao1_bc"]
               - (types + f1 * (f1 - 1) / (2 * (f2 + 1)))) < 1e-4
    assert abs(r["gt_unseen_mass"] - f1 / n) < 1e-6
