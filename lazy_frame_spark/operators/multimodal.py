"""Multimodal column support: images/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas UDFs.

The container has no image/audio codecs, so the decode step is STUBBED
(clearly marked): ``decode_image_features`` raises NotImplementedError on
the real path and ships a deterministic fake featureizer that exercises
the full Spark plumbing — schema, partition-preserving ``mapInPandas``,
Arrow batch shapes — so swapping in a real decoder (PIL/librosa/ffmpeg)
is a one-function change.

Design for 100 TB of media:
- payloads stay ``BinaryType`` end-to-end (Arrow zero-copy into the UDF);
- metadata is a typed struct column, filterable without touching bytes
  (Catalyst prunes the binary column away when only metadata is read);
- ``mapInPandas`` processes whole Arrow batches — decode cost amortizes,
  and ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: schema of the extracted features (what a real image decoder would emit)
IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("sha1_8", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Demo payload builder: treats each document's UTF-8 bytes as an
    opaque media blob + typed metadata struct (what an ingest job would
    produce for real images)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.octet_length(payload).alias("n_bytes"),
        F.lit("application/octet-stream").alias("mime"),
        F.md5(F.hex(payload)).alias("checksum"),
    )
    return df.select(F.col(id_col), payload.alias("payload"), meta.alias("meta"))


def _fake_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for image decoding: derives a fake (width,
    height) and an 8-dim feature from the payload digest."""
    d = hashlib.sha1(payload).digest()
    width = 64 + d[0] % 192
    height = 64 + d[1] % 192
    feature = [round(b / 255.0, 6) for b in d[2:10]]
    return width, height, feature


def decode_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    real_decoder: bool = False,
) -> DataFrame:
    """Extract per-image features with a partition-parallel Pandas UDF.

    ``real_decoder=True`` is the production path — NOT IMPLEMENTED in
    this container (no PIL/cv2); it documents exactly where a real decode
    plugs in. The default path runs the deterministic fake end-to-end.
    """
    if real_decoder:
        raise NotImplementedError(
            "real image decoding requires PIL/cv2, not present in this "
            "container; the Spark plumbing below is identical either way"
        )

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                blob = bytes(payload)
                width, height, feature = _fake_decode(blob)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "n_bytes": len(blob),
                        "sha1_8": hashlib.sha1(blob).hexdigest()[:8],
                        "width": width,
                        "height": height,
                        "feature": feature,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURE_SCHEMA])

    return df.select(id_col, payload_col).mapInPandas(extract, IMAGE_FEATURE_SCHEMA)


def frame_sample_plan(
    df: DataFrame,
    every_n: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Video-frame-sampling plumbing: deterministic every-nth selection by
    id (a real pipeline samples frames inside the decode UDF; the
    *selection* logic stays a pushdown-friendly JVM predicate)."""
    return df.filter(F.pmod(F.col(id_col), F.lit(every_n)) == 0)
