"""Multimodal-column plumbing (SURVEY.md §2.11 `multimodal_table`):
opaque ``binary`` content + typed metadata struct in one table, decoded
feature-extraction as an Arrow-batched ``mapInPandas`` stage.

STUB NOTICE — the real decoders (image/audio/video libs) are not in
this container. ``fake_decode`` is a clearly-marked deterministic
stand-in that computes byte-level stats; the Spark-side contract
(schema, batch iteration, partitioning) is real and is what the tests
pin. Swap ``fake_decode`` for a Pillow/torchaudio call at deploy time.

Scale notes: binary payloads ride the scan as plain parquet BINARY —
no driver collect; Arrow moves whole batches to Python; decode
parallelism == partition count, so repartition by size before this
stage when payloads are skewed (e.g. video vs thumbnail mix).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

DECODED_SCHEMA = ("doc_id long, modality string, n_bytes long, "
                  "mean_byte double, head_hex string")


def fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in for a media decoder (see STUB NOTICE).

    Consumes (doc_id, modality, content[, ...]) batches; emits one row
    per input row with byte-level 'features'. Iterator-of-batches form
    so memory is bounded by the Arrow batch size, not the partition.
    """
    for pdf in batches:
        content = pdf["content"]
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"].values,
            "modality": pdf["modality"].values,
            "n_bytes": content.map(len).astype("int64"),
            "mean_byte": content.map(
                lambda b: float(sum(b)) / len(b) if len(b) else 0.0),
            "head_hex": content.map(lambda b: bytes(b[:8]).hex()),
        })


RESIZED_SCHEMA = ("doc_id long, out_w int, out_h int, content binary")

_RESIZE_W, _RESIZE_H = 8, 8


def fake_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in for an image resize (see STUB NOTICE).

    Interprets ``content`` as a row-major square grayscale 'image'
    (side = floor(sqrt(len))), block-averages it down to a fixed
    8x8 thumbnail, and re-emits the thumbnail as binary. A real
    deployment swaps the numpy block-average for Pillow's
    ``Image.resize``; everything around it — Arrow batching, binary
    in/binary out, metadata columns — is the production shape.
    """
    import numpy as np

    def resize_one(b: bytes) -> bytes:
        side = int(len(b) ** 0.5)
        if side == 0:
            return bytes(_RESIZE_W * _RESIZE_H)
        img = np.frombuffer(bytes(b)[: side * side],
                            dtype=np.uint8).reshape(side, side)
        ys = np.linspace(0, side, _RESIZE_H + 1).astype(int)
        xs = np.linspace(0, side, _RESIZE_W + 1).astype(int)
        out = np.empty((_RESIZE_H, _RESIZE_W), dtype=np.uint8)
        for i in range(_RESIZE_H):
            for j in range(_RESIZE_W):
                block = img[ys[i]:max(ys[i + 1], ys[i] + 1),
                            xs[j]:max(xs[j + 1], xs[j] + 1)]
                out[i, j] = int(block.mean())
        return out.tobytes()

    for pdf in batches:
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"].values,
            "out_w": _RESIZE_W,
            "out_h": _RESIZE_H,
            "content": pdf["content"].map(resize_one),
        })


FRAMES_SCHEMA = ("doc_id long, frame_idx int, frame_ts_ms long, "
                 "n_bytes int, frame_hex string")


def frame_sample(frame_bytes: int, every_nth: int, fps: float = 25.0):
    """Build a deterministic stand-in for video frame sampling (see
    STUB NOTICE): treat ``content`` as concatenated fixed-size frames
    and keep every ``every_nth`` one. One input row fans out to many
    output rows — the real cardinality shape of frame extraction,
    which is why this is mapInPandas (per-batch fan-out) rather than a
    scalar UDF. A real deployment replaces the byte-slicing with an
    av/ffmpeg keyframe iterator; schema and batching stay the same.
    """
    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [],
                                    "frame_ts_ms": [], "n_bytes": [],
                                    "frame_hex": []}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                b = bytes(content)
                for idx in range(0, len(b) // frame_bytes, every_nth):
                    frame = b[idx * frame_bytes:(idx + 1) * frame_bytes]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_ts_ms"].append(int(idx * 1000 / fps))
                    out["n_bytes"].append(len(frame))
                    out["frame_hex"].append(frame[:8].hex())
            yield pd.DataFrame(out)
    return sample


AUDIO_SCHEMA = ("doc_id long, frame_idx int, frame_ts_ms long, "
                "rms double, zcr double")


def audio_features(frame_samples: int = 256, sample_rate: int = 8000):
    """Build a deterministic stand-in for audio decode + framewise
    feature extraction (see STUB NOTICE): interpret ``content`` as
    little-endian int16 PCM, frame it, and emit per-frame RMS energy
    and zero-crossing rate — the canonical audio-featurization shape
    (one binary row → n_frames feature rows, executor-side fan-out,
    exactly like frame_sample). A real deployment replaces the
    ``np.frombuffer`` 'decode' with torchaudio/soundfile; the framing,
    vectorized per-frame math, Arrow batching, and schema are the
    production shape.
    """
    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [],
                                    "frame_ts_ms": [], "rms": [], "zcr": []}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                b = bytes(content)
                pcm = (np.frombuffer(b[: len(b) // 2 * 2], dtype="<i2")
                         .astype(np.float64) / 32768.0)
                n = len(pcm) // frame_samples
                if n == 0:
                    continue
                frames = pcm[: n * frame_samples].reshape(n, frame_samples)
                rms = np.sqrt((frames * frames).mean(axis=1))
                sign = np.signbit(frames)
                zcr = (sign[:, 1:] != sign[:, :-1]).mean(axis=1)
                out["doc_id"].extend([doc_id] * n)
                out["frame_idx"].extend(range(n))
                out["frame_ts_ms"].extend(
                    int(i * frame_samples * 1000 / sample_rate)
                    for i in range(n))
                out["rms"].extend(np.round(rms, 6))
                out["zcr"].extend(np.round(zcr, 6))
            yield pd.DataFrame(out)
    return extract


PHASH_SCHEMA = "doc_id long, phash long"


def average_hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Perceptual AVERAGE-HASH over the stub-decoded thumbnail (see
    STUB NOTICE): content → 8×8 block-averaged grayscale (the
    fake_resize kernel's interpretation) → 64 bits, bit i set iff
    block i is brighter than the thumbnail mean. A real deployment
    swaps the stub for Pillow decode + the identical bit rule (aHash);
    the Spark-side shape — Arrow batches in, one int64 signature per
    asset out — is the production contract. Packing uses Python ints
    (arbitrary precision) and wraps to signed int64 at the end, so
    bit 63 never overflows."""
    import numpy as np

    def one(b: bytes) -> int:
        side = int(len(b) ** 0.5)
        if side == 0:
            return 0
        img = np.frombuffer(bytes(b)[: side * side],
                            dtype=np.uint8).reshape(side, side)
        ys = np.linspace(0, side, 9).astype(int)
        xs = np.linspace(0, side, 9).astype(int)
        blocks = np.empty((8, 8), dtype=np.float64)
        for i in range(8):
            for j in range(8):
                blk = img[ys[i]:max(ys[i + 1], ys[i] + 1),
                          xs[j]:max(xs[j + 1], xs[j] + 1)]
                blocks[i, j] = blk.mean()
        bits = (blocks > blocks.mean()).reshape(-1)
        h = 0
        for k in range(64):
            if bits[k]:
                h |= 1 << k
        if h >= 1 << 63:
            h -= 1 << 64
        return h

    for pdf in batches:
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"].values,
            "phash": pdf["content"].map(one).astype("int64"),
        })
