#!/usr/bin/env python
"""Media-pipeline blow-up evidence (round 6): the real-decode multimodal
path at 1000x the committed fixture count.

Generates (once, gitignored) 20,000 real 32x32 BMP files — 19,000
unique iid-noise images plus 1,000 planted near-duplicate pairs (pair
partner = the same image with +/-1 perturbation on ~5% of pixels, so
block means move < 0.1 gray level and the pair's aHash hamming stays
<= 3 while iid cross-pair hashes sit at binomial(64, 1/2) — expected
32, P(<=3) ~ 1e-14, i.e. zero false positives by construction).

Then runs the production pipeline over the real files:
  1. binaryFile scan + probe_media (magic sniff + BMP header decode)
  2. decode -> 8x8 aHash -> 4x16-bit band join -> bit_count verify
and prints ONE JSON line with wall times, throughput, planted-pair
recall, and the false-positive count.

Usage: python tools/media_blowup.py [n_assets]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_ingestor_and_features_creator_spark.operators import codecs, media  # noqa: E402
from data_ingestor_and_features_creator_spark.operators.textops import simhash_pairs  # noqa: E402
from data_ingestor_and_features_creator_spark.session import get_spark  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BIG = os.path.join(ROOT, "testdata_derived", "media_big")


def generate(n_assets: int) -> float:
    """n_assets total; the first 2*n_pairs ids form planted pairs
    (even = original, odd = perturbed twin)."""
    if os.path.isdir(BIG) and len(os.listdir(BIG)) == n_assets:
        return 0.0
    os.makedirs(BIG, exist_ok=True)
    t0 = time.time()
    n_pairs = n_assets // 20
    rng = np.random.RandomState(77)
    for k in range(n_pairs):
        img = rng.randint(0, 256, (32, 32)).astype(np.uint8)
        mask = rng.random_sample((32, 32)) < 0.05
        bump = rng.choice(np.array([-1, 1], dtype=np.int16), (32, 32))
        near = np.clip(img.astype(np.int16) + mask * bump,
                       0, 255).astype(np.uint8)
        with open(os.path.join(BIG, f"a{2 * k:06d}.bmp"), "wb") as f:
            f.write(codecs.encode_bmp(img))
        with open(os.path.join(BIG, f"a{2 * k + 1:06d}.bmp"), "wb") as f:
            f.write(codecs.encode_bmp(near))
    for i in range(2 * n_pairs, n_assets):
        img = rng.randint(0, 256, (32, 32)).astype(np.uint8)
        with open(os.path.join(BIG, f"a{i:06d}.bmp"), "wb") as f:
            f.write(codecs.encode_bmp(img))
    return time.time() - t0


def main() -> int:
    n_assets = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    gen_s = generate(n_assets)
    n_pairs = n_assets // 20

    from pyspark.sql import functions as F
    spark = get_spark("media_blowup")

    def assets():
        return (spark.read.format("binaryFile").load(BIG)
                .select(F.element_at(F.split("path", "/"), -1)
                        .alias("file"), "content"))

    t0 = time.time()
    probe = (assets()
             .mapInPandas(media.probe_media, schema=media.PROBE_SCHEMA)
             .groupBy("modality")
             .agg(F.count("*").alias("n"), F.sum("n_bytes").alias("bytes"),
                  F.min("width").alias("min_w"), F.max("width").alias("max_w"))
             .collect())
    probe_s = time.time() - t0
    n_probed = sum(r["n"] for r in probe)

    t0 = time.time()
    sig = (assets()
           .mapInPandas(media.bmp_ahash, schema=media.AHASH_SCHEMA)
           .select(F.col("file").alias("doc_id"),
                   F.col("phash").alias("simhash")))
    pairs = [(r["a"], r["b"]) for r in
             simhash_pairs(sig, max_hamming=3)
             .select("a", "b").collect()]
    dedup_s = time.time() - t0

    planted = {(f"a{2 * k:06d}.bmp", f"a{2 * k + 1:06d}.bmp")
               for k in range(n_pairs)}
    found = set(pairs)
    recall = len(planted & found) / len(planted)
    print(json.dumps({
        "metric": "media_blowup",
        "n_assets": n_assets,
        "gen_s": round(gen_s, 1),
        "probe_s": round(probe_s, 2),
        "probe_assets_per_s": round(n_probed / probe_s, 0),
        "dedup_s": round(dedup_s, 2),
        "dedup_assets_per_s": round(n_assets / dedup_s, 0),
        "planted_pairs": len(planted),
        "recall": recall,
        "false_positives": len(found - planted),
    }))
    spark.stop()
    return 0 if recall == 1.0 and not (found - planted) else 1


if __name__ == "__main__":
    raise SystemExit(main())
