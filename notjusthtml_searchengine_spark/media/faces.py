"""Face detection kernel (U7) — plumbing real, model stubbed.

The reference runs dlib HOG/CNN detectors via go-face
(/root/reference/faceRecognition.go:21-55): per image, a list of
faces each with a 128-float descriptor, a bounding rectangle and
landmark points, stored to the Face table (database.go:134,
faceRecognition.go:13-19).

No face model ships in this environment, so the detector is a STUB —
but everything Spark-side is real and tested: the Arrow UDF
signature, the FACES schema (128-d descriptor array, rect struct,
landmark list), batch shape, explode into one row per face, and the
error split. Two stub modes:

  * ``detector="none"`` (default): no faces — mirrors running the
    reference without model files.
  * ``detector="fake"``: a deterministic synthetic detector (hash of
    the image bytes seeds descriptor/rect) so downstream queries
    (distance search, F16) have non-empty, reproducible input.

Swap in a real model by replacing ``_detect``.
"""

from __future__ import annotations

import hashlib
import struct

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FACE = T.StructType(
    [
        T.StructField("descriptor", T.ArrayType(T.FloatType()), False),
        T.StructField(
            "rectangle",
            T.StructType(
                [
                    T.StructField("x0", T.IntegerType(), False),
                    T.StructField("y0", T.IntegerType(), False),
                    T.StructField("x1", T.IntegerType(), False),
                    T.StructField("y1", T.IntegerType(), False),
                ]
            ),
            False,
        ),
        T.StructField(
            "shapes",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("x", T.IntegerType(), False),
                        T.StructField("y", T.IntegerType(), False),
                    ]
                )
            ),
            False,
        ),
    ]
)


def _detect(body: bytes, detector: str) -> list[dict]:
    if detector == "none":
        return []
    if detector == "fake":
        h = hashlib.sha256(body).digest()
        n_faces = h[0] % 3  # 0..2 deterministic faces
        faces = []
        for f in range(n_faces):
            seed = hashlib.sha256(body + bytes([f])).digest()
            desc = [
                struct.unpack("<h", seed[(2 * i) % 30 : (2 * i) % 30 + 2])[0] / 32768.0
                for i in range(128)
            ]
            x0, y0 = seed[0] % 100, seed[1] % 100
            faces.append(
                {
                    "descriptor": desc,
                    "rectangle": {"x0": x0, "y0": y0, "x1": x0 + 40, "y1": y0 + 40},
                    "shapes": [{"x": x0 + 10, "y": y0 + 15}, {"x": x0 + 30, "y": y0 + 15}],
                }
            )
        return faces
    raise NotImplementedError(
        f"face detector {detector!r}: no face model available in this "
        "environment — plug a real detector into media.faces._detect"
    )


def detect_faces(
    images: DataFrame,
    body_col: str = "html",
    id_col: str = "content_id",
    detector: str = "none",
) -> DataFrame:
    """images(id, body) → one row per detected face (FACES layout)."""
    out_schema = T.StructType(
        [images.schema[id_col], T.StructField("face", FACE, False)]
    )

    def gen(batches):
        for pdf in batches:
            ids, faces = [], []
            for i, body in zip(pdf[id_col], pdf[body_col]):
                for face in _detect(bytes(body), detector):
                    ids.append(i)
                    faces.append(face)
            # empty batches need explicit dtypes (a bare empty column
            # defaults to float64, which Arrow rejects for a struct)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="object"),
                    "face": pd.Series(faces, dtype="object"),
                }
            )

    flat = images.select(id_col, body_col).mapInPandas(gen, out_schema)
    return flat.select(
        id_col,
        F.col("face.descriptor").alias("descriptor"),
        F.col("face.rectangle").alias("rectangle"),
        F.col("face.shapes").alias("shapes"),
    )


def face_distance(a, b):
    """F16: euclidean distance between 128-d descriptors, built-ins
    only (faceRecognition capability, README line 7)."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double"),
        )
    )
