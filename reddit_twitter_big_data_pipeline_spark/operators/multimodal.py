"""Multimodal columns — image/audio/video as opaque binary + typed metadata
(BASELINE.json north-star).

The Spark-side plumbing is real and tested: binary payload column, typed
metadata struct (schemas.MEDIA), Arrow-batched ``mapInPandas`` feature
extraction with an explicit output schema, and partition sizing guidance for
large blobs. The actual codec work (JPEG decode, audio resample, video frame
sampling) is STUBBED — the image/audio libraries are not in this container —
behind two clearly-marked backends:

  * ``deterministic_fake`` (default): pure function of the payload bytes, so
    pipelines are testable end-to-end and idempotent;
  * ``real``: try-imports the codec libs per kind (PIL for image, soundfile
    for audio, PyAV for video) and decodes when present; raises
    NotImplementedError at the exact seam when the lib is absent (this
    container ships none of them — on a cluster image, installing the lib
    turns the path on with no code change).

Partitioning note (the part that matters at 100 TB): blobs make rows heavy —
size `spark.sql.files.maxPartitionBytes` so a task holds O(100) images, and
never groupBy on a frame carrying payloads; extract features FIRST (this
module), then drop/offload the payload column.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .._serde import register_self

MEDIA_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FEATURE_DIM = 8


def _fake_feature(payload: bytes) -> list[float]:
    """Deterministic stand-in for a decoded-content embedding: byte-histogram
    moments over FEATURE_DIM equal-width bucket ranges. numpy bincount —
    never a per-byte Python loop (payloads are the hot bytes at scale)."""
    if not payload:
        return [0.0] * FEATURE_DIM
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int32)
    buckets = np.bincount(arr * FEATURE_DIM // 256, minlength=FEATURE_DIM)
    return (buckets / float(len(payload))).tolist()


def _real_decode(payload: bytes, kind: str):
    """THE decode seam: decode `payload` with the real codec for `kind`,
    returning a 1-D float32 numpy array of content samples (grayscale
    pixels / audio samples / first-frame pixels). Each codec lib is
    try-imported per kind, so a cluster image with only PIL still decodes
    images; a missing lib raises NotImplementedError (use backend='fake'
    or install the codec)."""
    import io

    import numpy as np

    if kind == "image":
        try:
            from PIL import Image
        except ImportError as e:
            raise NotImplementedError(
                "image decode requires Pillow; pip install pillow on the "
                "cluster or use backend='fake'"
            ) from e
        img = Image.open(io.BytesIO(payload)).convert("L")
        return np.asarray(img, dtype=np.float32).ravel()
    if kind == "audio":
        try:
            import soundfile
        except ImportError as e:
            raise NotImplementedError(
                "audio decode requires soundfile; pip install soundfile on "
                "the cluster or use backend='fake'"
            ) from e
        data, _sr = soundfile.read(io.BytesIO(payload), dtype="float32")
        return np.asarray(data, dtype=np.float32).ravel()
    if kind == "video":
        try:
            import av
        except ImportError as e:
            raise NotImplementedError(
                "video decode requires PyAV; pip install av on the cluster "
                "or use backend='fake'"
            ) from e
        with av.open(io.BytesIO(payload)) as container:
            for frame in container.decode(video=0):
                return (
                    np.asarray(frame.to_image().convert("L"), dtype=np.float32).ravel()
                )
        return np.array([], dtype=np.float32)
    raise NotImplementedError(f"no codec registered for kind={kind!r}")


def _content_feature(samples) -> list[float]:
    """FEATURE_DIM-bucket normalized histogram over DECODED content samples
    (the real-backend analog of _fake_feature's byte histogram)."""
    import numpy as np

    s = np.asarray(samples, dtype=np.float64).ravel()
    if s.size == 0:
        return [0.0] * FEATURE_DIM
    lo, hi = float(s.min()), float(s.max())
    s = (s - lo) / (hi - lo) if hi > lo else np.zeros_like(s)
    b = np.clip((s * FEATURE_DIM).astype(np.int64), 0, FEATURE_DIM - 1)
    return (np.bincount(b, minlength=FEATURE_DIM) / s.size).tolist()


def extract_features(
    media: DataFrame, backend: str = "fake", batch_hint: int = 256
) -> DataFrame:
    """mapInPandas feature extraction: (media_id, kind, payload) →
    (media_id, kind, n_bytes, checksum, feature[FEATURE_DIM]).

    Arrow ships payload bytes in columnar batches; the UDF iterates batches,
    never materializing the whole partition. Output schema is explicit so
    downstream plans analyze without running Python.
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            feats = []
            sums = []
            for p, kind in zip(payloads, pdf["kind"]):
                raw = bytes(p) if p is not None else b""
                if backend == "real":
                    feats.append(_content_feature(_real_decode(raw, kind)))
                else:
                    feats.append(_fake_feature(raw))
                sums.append(hashlib.md5(raw).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda p: len(p) if p is not None else 0).astype(
                        "int32"
                    ),
                    "checksum": sums,
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, MEDIA_FEATURES_SCHEMA)


def extract_features_arrow(media: DataFrame, backend: str = "fake") -> DataFrame:
    """``mapInArrow`` twin of ``extract_features`` — identical output, but
    the UDF consumes raw ``pyarrow.RecordBatch``es instead of pandas
    frames. For blob-heavy rows this skips the Arrow→pandas conversion
    entirely (pandas wraps every payload in a Python bytes object and
    copies the column into a Series before the UDF sees it; Arrow hands
    over the original buffers), which is the dominant per-batch overhead
    when payloads are MBs and the per-row work is a cheap decode. The
    pandas variant stays the default — friendlier to extend — and the
    test suite pins the two paths equal."""
    import hashlib

    import pyarrow as pa

    def run(batches):
        for batch in batches:
            kinds = batch.column("kind")
            payloads = batch.column("payload")
            feats, sums, nbytes = [], [], []
            for i in range(batch.num_rows):
                p = payloads[i].as_py()
                raw = p if p is not None else b""
                k = kinds[i].as_py()
                if backend == "real":
                    feats.append(_content_feature(_real_decode(raw, k)))
                else:
                    feats.append(_fake_feature(raw))
                sums.append(hashlib.md5(raw).hexdigest())
                nbytes.append(len(raw))
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("media_id"),
                    kinds,
                    pa.array(nbytes, pa.int32()),
                    pa.array(sums, pa.string()),
                    pa.array(feats, pa.list_(pa.float32())),
                ],
                names=["media_id", "kind", "n_bytes", "checksum", "feature"],
            )

    return media.mapInArrow(run, MEDIA_FEATURES_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing: passes payload through a mapInPandas stage that
    would re-encode; fake backend tags the metadata struct instead (the
    schema/batching contract is what's under test)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": pdf["payload"],  # real impl: decoded→resized→re-encoded
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(run, out_schema)


def frame_sample_stub(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: fan-out one row per sampled frame.
    Fake backend derives frame count from payload size; the real impl reads
    container duration. Demonstrates the 1→N mapInPandas shape."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_payload", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(p) if p is not None else b""
                n_frames = max(1, min(4, len(raw) // 64))
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(raw[i * 64 : (i + 1) * 64])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": pd.array(idxs, dtype="int32"), "frame_payload": frames}
            )

    return media.mapInPandas(run, out_schema)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a media table from the documents corpus (payload = utf-8 bytes
    of the text — a deterministic opaque blob; kind cycles by doc_id). Lets
    every multimodal operator run on driver testdata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )


register_self(__name__)
