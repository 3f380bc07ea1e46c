"""Real-media Arrow kernels (round 6): the decode stage over ACTUAL
container files, built on the pure-numpy codecs (operators/codecs.py —
BMP / WAV / EDF / Y4M, all public self-describing formats).

This module replaces the round-2 stub kernels: every function here
consumes ``binaryFile``-scanned rows (path, content) in Arrow batches
and runs a REAL parser on the bytes — magic-sniff dispatch, header
decode, pixel/sample extraction — not a byte-reinterpretation fake.
Entropy-coded formats (JPEG/PNG/MP3/H.264) are out of scope for this
container (no Pillow/ffmpeg); they slot in at deploy time behind the
same sniff-dispatch without touching any Spark-side shape.

Scale notes (unchanged from the stub era — the plumbing was always the
production design): payloads ride the scan as BINARY, Arrow moves whole
batches to Python, decode parallelism == partition count, fan-out
(frames, samples) happens executor-side inside the batch so output
cardinality never touches the driver. Repartition by size before the
decode stage when payload sizes are skewed (video vs thumbnail mix).

Exactness: every numeric this module emits is an INTEGER derived from
decoded samples (block sums with floor division, energy sums, sign
crossings) so the DuckDB oracles can re-derive expected values with
pure integer arithmetic — no libm, no float-replication risk.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from . import codecs

# --------------------------------------------------------------- probe

PROBE_SCHEMA = ("file string, modality string, n_bytes long, width int, "
                "height int, n_frames int, n_channels int, "
                "sample_rate int, n_samples long")


def probe_media(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Sniff + header-decode every asset → one typed metadata row each
    (the catalog pass a mixed-modality lake table runs at ingest).
    Dimensions come from the DECODED container, not the filename."""
    for pdf in batches:
        rows = []
        for file, content in zip(pdf["file"], pdf["content"]):
            b = bytes(content)
            m = codecs.sniff_modality(b)
            row = {"file": file, "modality": m, "n_bytes": len(b),
                   "width": None, "height": None, "n_frames": None,
                   "n_channels": None, "sample_rate": None,
                   "n_samples": None}
            if m == "image/bmp":
                img = codecs.decode_bmp(b)
                row.update(height=img.shape[0], width=img.shape[1],
                           n_frames=1, n_channels=1)
            elif m == "audio/wav":
                rate, ch, pcm = codecs.decode_wav(b)
                row.update(sample_rate=rate, n_channels=ch,
                           n_samples=len(pcm) // max(ch, 1))
            elif m == "video/y4m":
                d = codecs.decode_y4m(b)
                row.update(width=d["width"], height=d["height"],
                           n_frames=len(d["frames"]), n_channels=1,
                           sample_rate=d["fps_num"] // d["fps_den"])
            elif m == "signal/edf":
                d = codecs.decode_edf(b)
                s0 = d["signals"][0]
                row.update(n_channels=len(d["signals"]),
                           sample_rate=int(s0["fs_hz"]),
                           n_samples=len(s0["digital"]),
                           n_frames=d["n_records"])
            rows.append(row)
        out = pd.DataFrame(rows, columns=["file", "modality", "n_bytes",
                                          "width", "height", "n_frames",
                                          "n_channels", "sample_rate",
                                          "n_samples"])
        for c in ("width", "height", "n_frames", "n_channels",
                  "sample_rate"):
            out[c] = out[c].astype("Int32")
        out["n_samples"] = out["n_samples"].astype("Int64")
        out["n_bytes"] = out["n_bytes"].astype("int64")
        yield out


# ----------------------------------------------------------- thumbnail

THUMB_W, THUMB_H = 8, 8

THUMB_SCHEMA = ("file string, in_w int, in_h int, out_w int, out_h int, "
                "thumb binary, thumb_sum long")


def _block_means(img: np.ndarray, oh: int = THUMB_H,
                 ow: int = THUMB_W) -> np.ndarray:
    """Exact integer block-average pooling via an integral image:
    block value = floor(block_sum / block_pixels). O(H*W) regardless of
    output size, bit-identical across platforms (pure int arithmetic)."""
    h, w = img.shape
    ii = np.zeros((h + 1, w + 1), dtype=np.int64)
    ii[1:, 1:] = img.astype(np.int64).cumsum(0).cumsum(1)
    ys = np.linspace(0, h, oh + 1).astype(int)
    xs = np.linspace(0, w, ow + 1).astype(int)
    out = np.empty((oh, ow), dtype=np.int64)
    for a in range(oh):
        y0, y1 = ys[a], max(ys[a + 1], ys[a] + 1)
        for b in range(ow):
            x0, x1 = xs[b], max(xs[b + 1], xs[b] + 1)
            s = ii[y1, x1] - ii[y0, x1] - ii[y1, x0] + ii[y0, x0]
            out[a, b] = s // ((y1 - y0) * (x1 - x0))
    return out


def bmp_thumbnail(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Decode BMP → grayscale plane → 8×8 block-average thumbnail.
    Real image resize over real pixels; the thumbnail re-emits as
    binary (the downstream contract for signature/preview stages)."""
    for pdf in batches:
        rows = []
        for file, content in zip(pdf["file"], pdf["content"]):
            img = codecs.decode_bmp(bytes(content))
            t = _block_means(img)
            rows.append({"file": file, "in_w": img.shape[1],
                         "in_h": img.shape[0], "out_w": THUMB_W,
                         "out_h": THUMB_H,
                         "thumb": t.astype(np.uint8).tobytes(),
                         "thumb_sum": int(t.sum())})
        yield pd.DataFrame(rows, columns=["file", "in_w", "in_h", "out_w",
                                          "out_h", "thumb", "thumb_sum"])


AHASH_SCHEMA = "file string, phash long"


def bmp_ahash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Decode BMP → 8×8 block means → 64-bit average-hash (bit i set
    iff block i brighter than the thumbnail mean). One int64 signature
    per asset — feeds the banded near-dup join exactly like SimHash."""
    for pdf in batches:
        rows = []
        for file, content in zip(pdf["file"], pdf["content"]):
            img = codecs.decode_bmp(bytes(content))
            blocks = _block_means(img).astype(np.float64)
            bits = (blocks > blocks.mean()).reshape(-1)
            h = 0
            for k in range(64):
                if bits[k]:
                    h |= 1 << k
            if h >= 1 << 63:
                h -= 1 << 64
            rows.append({"file": file, "phash": h})
        out = pd.DataFrame(rows, columns=["file", "phash"])
        out["phash"] = out["phash"].astype("int64")
        yield out


# --------------------------------------------------------------- video

FRAMES_SCHEMA = ("file string, frame_idx int, frame_ts_ms long, "
                 "luma_sum long, n_px int")


def y4m_frames(every_nth: int = 4):
    """Decode YUV4MPEG2 → keep every ``every_nth`` luma frame → one
    stats row per kept frame. One input row fans out to many output
    rows executor-side (the real cardinality shape of frame
    extraction). Timestamps come from the stream's own F tag."""
    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for file, content in zip(pdf["file"], pdf["content"]):
                d = codecs.decode_y4m(bytes(content))
                ms_num, ms_den = 1000 * d["fps_den"], d["fps_num"]
                for idx in range(0, len(d["frames"]), every_nth):
                    fr = d["frames"][idx]
                    rows.append({"file": file, "frame_idx": idx,
                                 "frame_ts_ms": idx * ms_num // ms_den,
                                 "luma_sum": int(fr.astype(np.int64).sum()),
                                 "n_px": fr.size})
            out = pd.DataFrame(rows, columns=["file", "frame_idx",
                                              "frame_ts_ms", "luma_sum",
                                              "n_px"])
            out["frame_idx"] = out["frame_idx"].astype("int32")
            out["n_px"] = out["n_px"].astype("int32")
            yield out
    return sample


# --------------------------------------------------------------- audio

AUDIO_SCHEMA = ("file string, frame_idx int, frame_ts_ms long, "
                "sumsq long, zc int")


def wav_frame_features(frame_samples: int = 64):
    """Decode RIFF/WAVE PCM → frame → per-frame energy (Σx², exact
    int64) and zero-crossing count (sign flips between consecutive
    samples WITHIN the frame). Vectorized numpy over the reshaped
    (n_frames, frame_samples) matrix; partial tail frames drop."""
    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {"file": [], "frame_idx": [],
                                     "frame_ts_ms": [], "sumsq": [],
                                     "zc": []}
            for file, content in zip(pdf["file"], pdf["content"]):
                rate, ch, pcm = codecs.decode_wav(bytes(content))
                if ch != 1:        # mono analytics path; mixdown at deploy
                    pcm = pcm[::ch]
                x = pcm.astype(np.int64)
                n = len(x) // frame_samples
                if n == 0:
                    continue
                fr = x[: n * frame_samples].reshape(n, frame_samples)
                sumsq = (fr * fr).sum(axis=1)
                neg = fr < 0
                zc = (neg[:, 1:] != neg[:, :-1]).sum(axis=1)
                rows["file"].extend([file] * n)
                rows["frame_idx"].extend(range(n))
                rows["frame_ts_ms"].extend(
                    i * frame_samples * 1000 // rate for i in range(n))
                rows["sumsq"].extend(sumsq.tolist())
                rows["zc"].extend(zc.tolist())
            out = pd.DataFrame(rows)
            out["frame_idx"] = out["frame_idx"].astype("int32")
            out["zc"] = out["zc"].astype("int32")
            yield out
    return extract


# ----------------------------------------------------------- biosignal

EDF_SAMPLES_SCHEMA = "record_id long, k long, amp double"


def edf_ecg_samples(label_prefix: str = "ECG"):
    """Decode EDF → explode the ECG channel's DIGITAL samples to
    (record_id, sample_idx, amplitude) rows — the raw-signal relation
    the r-peak detectors consume. record_id parses from the filename
    (``ecg_<id>.edf``); digital ints (not calibrated physical floats)
    keep the relation exact for the SQL oracle."""
    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for file, content in zip(pdf["file"], pdf["content"]):
                d = codecs.decode_edf(bytes(content))
                sig = next(s for s in d["signals"]
                           if s["label"].startswith(label_prefix))
                dig = sig["digital"]
                rid = int("".join(c for c in str(file) if c.isdigit()))
                frames.append(pd.DataFrame({
                    "record_id": np.full(len(dig), rid, dtype="int64"),
                    "k": np.arange(len(dig), dtype="int64"),
                    "amp": dig.astype(np.float64),
                }))
            yield (pd.concat(frames) if frames
                   else pd.DataFrame({"record_id": [], "k": [],
                                      "amp": []}))
    return explode
