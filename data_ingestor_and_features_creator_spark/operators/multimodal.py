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
