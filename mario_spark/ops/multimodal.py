"""Multimodal columns: opaque binary payloads + typed metadata.

The engine treats image/audio/video as `binary` columns with metadata
structs; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas UDFs over mapInPandas. The actual codec libraries
(PIL, torchaudio, ffmpeg) are NOT in this container, so the decode step
is STUBBED: `_decode_image` raises NotImplementedError unless a
deterministic fake is requested. Everything Spark-side — schema,
partition-preserving mapInPandas, UDF signature, Arrow batch shape — is
real and tested; swapping the fake for a real decoder changes one
function.

The synthetic payload is a little TLV blob built from the documents
table (deterministic per doc), so the sandbox exercises real binary
columns end-to-end and the DuckDB oracle can recompute the metadata
arithmetic.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = b"IMG0"

try:  # decoder gate: real codec libs are absent in this container
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except Exception:  # pragma: no cover
    HAVE_PIL = False


def synth_payload(documents: DataFrame) -> DataFrame:
    """documents -> (doc_id, payload binary).

    payload = "IMG0" || zero-padded 4-digit width || 4-digit height ||
    body, utf-8 encoded; width = 64 + (n_chars % 577), height =
    64 + (doc_id % 419), body = first 32 chars of text with non-ASCII
    forced to '?' (so byte values == codepoints and the DuckDB oracle
    can recompute the luma arithmetic exactly). Pure Catalyst, no UDF.
    """
    w = (F.lit(64) + F.col("n_chars") % 577).cast("int")
    h = (F.lit(64) + F.col("doc_id") % 419).cast("int")
    body = F.regexp_replace(F.substring("text", 1, 32), r"[^\x20-\x7e]", "?")
    payload = F.encode(
        F.concat(
            F.lit("IMG0"),
            F.lpad(w.cast("string"), 4, "0"),
            F.lpad(h.cast("string"), 4, "0"),
            body,
        ),
        "utf-8",
    )
    return documents.select("doc_id", payload.alias("payload"))


def _decode_image(buf: bytes, fake: bool = True) -> tuple[int, int, float]:
    """Decode one payload -> (width, height, mean_luma).

    Real decode is stubbed (codec libs not installed); the deterministic
    fake parses the TLV header and derives luma from the body bytes.
    """
    if not fake:
        if not HAVE_PIL:
            raise NotImplementedError(
                "real image decode requires PIL; container has no codec libs"
            )
    b = bytes(buf)
    if len(b) < 12 or b[:4] != MAGIC:
        return 0, 0, 0.0
    w, h = int(b[4:8]), int(b[8:12])
    body = np.frombuffer(b[12:], dtype=np.uint8)
    luma = float(body.mean()) if body.size else 0.0
    return int(w), int(h), luma


def decode_features(payloads: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """(doc_id, payload) -> (doc_id, width, height, mean_luma, n_bytes).

    mapInPandas keeps the input partitioning (no shuffle); each Arrow
    batch is decoded in one pass. This is the plumbing a real decoder
    plugs into.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            decoded = [_decode_image(b) for b in pdf["payload"]]
            w, h, luma = (np.array(x) for x in zip(*decoded))
            # round half-away-from-zero (SQL ROUND), not numpy's half-even
            luma4 = np.floor(luma.astype(np.float64) * 1e4 + 0.5) / 1e4
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(np.int64),
                    "width": w.astype(np.int32),
                    "height": h.astype(np.int32),
                    "mean_luma": luma4,
                    "n_bytes": pdf["payload"].map(len).to_numpy(np.int64),
                }
            )

    return payloads.mapInPandas(
        kernel,
        "doc_id long, width int, height int, mean_luma double, n_bytes long",
    )


VID_MAGIC = b"VID0"
FRAME_BYTES = 16


def synth_video_payload(documents: DataFrame) -> DataFrame:
    """documents -> (doc_id, payload binary) — a video-like TLV:
    "VID0" || 4-digit frame count || n_frames x 16-byte frame bodies
    (ascii-forced text, right-padded with 'x'). n_frames = 3 +
    doc_id % 5. Pure Catalyst; same oracle-recomputable design as the
    image payload."""
    nf = (F.lit(3) + F.col("doc_id") % 5).cast("int")
    body = F.rpad(
        F.regexp_replace(
            F.substring("text", 1, 8 * FRAME_BYTES), r"[^\x20-\x7e]", "?"
        ),
        nf * FRAME_BYTES,
        "x",
    )
    payload = F.encode(
        F.concat(
            F.lit("VID0"),
            F.lpad(nf.cast("string"), 4, "0"),
            F.substring(body, 1, nf * FRAME_BYTES),
        ),
        "utf-8",
    )
    return documents.select("doc_id", payload.alias("payload"))


def sample_frames(
    payloads: DataFrame, stride: int = 2
) -> DataFrame:
    """(doc_id, payload) -> (doc_id, frame_idx, luma): decode every
    `stride`-th frame. The one-row-to-many-frames explode happens
    INSIDE the Arrow kernel (a real video decoder emits exactly this
    shape), so batch boundaries and partitioning are preserved — no
    Spark-side explode of undecoded binary. Real frame decode is
    stubbed like _decode_image; the header/slicing plumbing is real.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids, fidx, lum = [], [], []
            for did, buf in zip(
                pdf["doc_id"].to_numpy(np.int64), pdf["payload"]
            ):
                b = bytes(buf)
                if len(b) < 8 or b[:4] != VID_MAGIC:
                    continue
                nf = int(b[4:8])
                frames = np.frombuffer(b[8:], dtype=np.uint8)
                for j in range(0, nf, stride):
                    fb = frames[j * FRAME_BYTES : (j + 1) * FRAME_BYTES]
                    if fb.size < FRAME_BYTES:
                        break
                    ids.append(did)
                    fidx.append(j)
                    lum.append(
                        float(
                            np.floor(fb.mean(dtype=np.float64) * 1e4 + 0.5)
                            / 1e4
                        )
                    )
            yield pd.DataFrame(
                {
                    "doc_id": np.asarray(ids, dtype=np.int64),
                    "frame_idx": np.asarray(fidx, dtype=np.int64),
                    "luma": np.asarray(lum, dtype=np.float64),
                }
            )

    return payloads.mapInPandas(
        kernel, "doc_id long, frame_idx long, luma double"
    )


def resize_fit(decoded: DataFrame, box: int = 224) -> DataFrame:
    """Aspect-preserving resize-to-fit metadata transform:
    (width, height) -> largest (out_w, out_h) fitting `box` x `box`
    with the same aspect ratio (floor semantics, upscale allowed) —
    the metadata half of an image-resize stage; the pixel resample is
    the stubbed decoder's job. Pure codegen arithmetic, no UDF.
    """
    scale = F.least(
        F.lit(float(box)) / F.col("width"), F.lit(float(box)) / F.col("height")
    )
    return decoded.select(
        "doc_id",
        "width",
        "height",
        F.floor(F.col("width") * scale).cast("int").alias("out_w"),
        F.floor(F.col("height") * scale).cast("int").alias("out_h"),
    )
