"""Known-answer tests for the real-media operators (plans/q_media.py,
operators/media.py): the properties the DuckDB oracles can't reach —
thumbnail CONTENT (seeded-RNG scenes aren't SQL-derivable), decoder
dispatch, fan-out shapes — verified against independent references
(the generator's own formulas, plain-numpy re-implementations that
share no code with the integral-image kernel).
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest

from data_ingestor_and_features_creator_spark.operators import codecs, media
from data_ingestor_and_features_creator_spark.plans import q_media

MEDIA = q_media._MEDIA

pytestmark = pytest.mark.skipif(
    not os.path.isdir(MEDIA),
    reason="media fixtures not generated (tools/gen_derived.py --media)")


# ---------------------------------------------------------------- local
# (kernel-level, no Spark — the codecs themselves are covered in
# test_codecs.py; these pin the FEATURE kernels over real files)


def _naive_block_means(img: np.ndarray, oh: int = 8,
                       ow: int = 8) -> np.ndarray:
    """Independent reference for the thumbnail: plain slicing + float
    mean + floor — no integral image, shares nothing with the kernel."""
    h, w = img.shape
    ys = np.linspace(0, h, oh + 1).astype(int)
    xs = np.linspace(0, w, ow + 1).astype(int)
    out = np.empty((oh, ow), dtype=np.int64)
    for a in range(oh):
        for b in range(ow):
            blk = img[ys[a]:max(ys[a + 1], ys[a] + 1),
                      xs[b]:max(xs[b + 1], xs[b] + 1)]
            out[a, b] = int(blk.astype(np.float64).mean())
    return out


def test_block_means_match_naive_reference_on_all_fixtures():
    for f in sorted(glob.glob(os.path.join(MEDIA, "img_*.bmp"))):
        img = codecs.decode_bmp(open(f, "rb").read())
        got = media._block_means(img)
        want = _naive_block_means(img)
        assert np.array_equal(got, want), os.path.basename(f)


def test_block_means_exactness_against_known_grid():
    # 16x16 image of value 4*row: block (a, b) covers rows 2a..2a+1 →
    # mean = (4*2a + 4*(2a+1))/2 = 8a + 2 exactly
    img = (4 * np.arange(16, dtype=np.uint8))[:, None].repeat(16, 1)
    t = media._block_means(img)
    want = (8 * np.arange(8) + 2)[:, None].repeat(8, 1)
    assert np.array_equal(t, want)


def test_edf_fixture_plants_the_documented_beat_grid():
    for i, f in enumerate(sorted(glob.glob(os.path.join(MEDIA,
                                                        "ecg_*.edf")))):
        d = codecs.decode_edf(open(f, "rb").read())
        ecg = next(s for s in d["signals"] if s["label"].startswith("ECG"))
        assert len(ecg["digital"]) == 1024 and int(ecg["fs_hz"]) == 128
        period = 70 + i % 30
        spikes = np.flatnonzero(ecg["digital"] == 26000)
        assert np.array_equal(spikes, np.arange(0, 1024, period))


# ---------------------------------------------------------------- spark


def test_probe_media_catalogs_every_fixture(spark):
    rows = {r["file"]: r for r in
            q_media.multimodal_table(spark, "").collect()}
    assert len(rows) == 48
    assert rows["img_000.bmp"]["modality"] == "image/bmp"
    assert (rows["img_004.bmp"]["width"], rows["img_004.bmp"]["height"]) \
        == (25, 25)       # 8-bit palettized variant decodes too
    assert rows["tone_000.wav"]["sample_rate"] == 8000
    assert rows["tone_000.wav"]["n_samples"] == 4000
    assert rows["clip_000.y4m"]["n_frames"] == 16
    assert rows["ecg_000.edf"]["n_channels"] == 2
    assert all(r["n_bytes"] > 0 for r in rows.values())


def test_resize_thumbnail_content_matches_reference(spark):
    out = {r["file"]: r for r in
           (q_media._assets(spark, "img_*.bmp")
            .mapInPandas(media.bmp_thumbnail, schema=media.THUMB_SCHEMA)
            .collect())}
    assert len(out) == 24
    for name in ("img_000.bmp", "img_005.bmp", "img_004.bmp"):
        img = codecs.decode_bmp(
            open(os.path.join(MEDIA, name), "rb").read())
        want = _naive_block_means(img).astype(np.uint8).tobytes()
        assert bytes(out[name]["thumb"]) == want, name
        assert out[name]["in_h"] == img.shape[0]
        assert out[name]["thumb_sum"] == sum(want)


def test_frame_sample_tracks_the_moving_square(spark):
    rows = (q_media._assets(spark, "clip_000.y4m")
            .mapInPandas(media.y4m_frames(every_nth=4),
                         schema=media.FRAMES_SCHEMA)
            .orderBy("frame_idx").collect())
    assert [r["frame_idx"] for r in rows] == [0, 4, 8, 12]
    assert [r["frame_ts_ms"] for r in rows] == [0, 160, 320, 480]
    # generator formula, clip 0: gradient sum + square lift
    grad = (3 * np.arange(24)[:, None] + 5 * np.arange(32)[None, :]) % 200
    for r in rows:
        f = r["frame_idx"]
        y0, x0 = (2 * f) % 16, (3 * f) % 24
        want = int(grad.sum() - grad[y0:y0 + 8, x0:x0 + 8].sum() + 64 * 255)
        assert r["luma_sum"] == want and r["n_px"] == 768


def test_wav_features_match_square_wave_closed_form(spark):
    rows = (q_media._assets(spark, "tone_003.wav")
            .mapInPandas(media.wav_frame_features(frame_samples=64),
                         schema=media.AUDIO_SCHEMA)
            .orderBy("frame_idx").collect())
    assert len(rows) == 62                      # 3968 // 64, tail drops
    j = np.arange(4000, dtype=np.int64)
    amp = 29000 - 7 * j + 125 * 3
    sg = np.where((j % 200) < 100, 1, -1)
    pcm = amp * sg
    for r in rows[:5] + rows[-2:]:
        lo = r["frame_idx"] * 64
        fr = pcm[lo:lo + 64]
        assert r["sumsq"] == int((fr * fr).sum())
        neg = fr < 0
        assert r["zc"] == int((neg[1:] != neg[:-1]).sum())


def test_phash_dedup_finds_exactly_the_planted_pairs(spark):
    got = [(r["file_a"], r["file_b"]) for r in
           q_media.multimodal_phash_dedup(spark, "").collect()]
    want = [(f"img_{2 * k:03d}.bmp", f"img_{2 * k + 1:03d}.bmp")
            for k in range(8)]
    assert got == want


def test_hrv_from_edf_matches_planted_grid_features(spark):
    """Full chain (EDF bytes → beats → RR → features) against the
    jittered grid's closed form, computed independently in numpy."""
    out = {r["record_id"]: r for r in
           q_media.hrv_from_edf(spark, "").collect()}
    assert set(out) == set(range(6))
    for rid in range(6):
        period = 70 + 9 * rid
        pos = [0] + [k * period + ((k * 7) % 5 - 2) * 4
                     for k in range(1, 64)
                     if 0 <= k * period + ((k * 7) % 5 - 2) * 4 <= 2047]
        rr = np.diff(np.array(pos)) * 7.8125
        d = np.diff(rr)
        r = out[rid]
        assert r["n_beats"] == len(rr)
        assert r["mean_nni"] == pytest.approx(rr.mean(), abs=1e-6)
        assert r["sdnn"] == pytest.approx(rr.std(ddof=1), abs=1e-6)
        assert r["rmssd"] == pytest.approx(np.sqrt((d * d).mean()),
                                           abs=1e-6)
        assert r["nni_50"] == int((np.abs(d) > 50).sum())
    # the jitter makes the features non-degenerate
    assert any(out[r]["sdnn"] > 10 for r in out)
    assert any(out[r]["nni_50"] > 0 for r in out)


def test_edf_rpeaks_recover_planted_grid_end_to_end(spark):
    rows = q_media.scan_edf_rpeaks(spark, "").collect()
    by_rec: dict[int, list] = {}
    for r in rows:
        by_rec.setdefault(r["record_id"], []).append(r)
    assert set(by_rec) == set(range(6))
    for rid, beats in by_rec.items():
        period = 70 + rid % 30
        assert [b["peak_idx"] for b in beats] == \
            list(range(0, 1024, period))
        assert beats[0]["rr_ms"] is None
        assert beats[1]["rr_ms"] == pytest.approx(period * 1000.0 / 128)
        assert beats[0]["file"] == f"ecg_{rid:03d}.edf"
