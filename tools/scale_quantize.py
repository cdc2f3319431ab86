"""Int8-quantization probe (q144's operator): measures the two claims the
docstring makes — the quantized corpus is ~4x smaller AT REST than
float32, and quantized-cosine scoring preserves exact-cosine retrieval.

Decorrelated replicas of the sf0.01 embeddings (vector r gets a seeded
elementwise perturbation so replicas aren't byte-identical), scaled by
argv:

    python tools/scale_quantize.py [replicas] [k]   # default 20 10

One JSON line: ``{"n_vectors": ..., "bytes_float32": ...,
"bytes_int8": ..., "size_ratio": ..., "recall_at_k": ...,
"wall_exact_sec": ..., "wall_quantized_sec": ...}``

Reading it: bytes are actual on-disk parquet sizes of the two stores
(the ratio is what a 100 TB ANN corpus pays to hold/ship vectors —
somewhat under 4x because parquet already compresses and the int8 store
carries a long norm + double scale per vector); recall is quantized-
cosine top-k agreement with exact float cosine over the probe's query
set. Wall at local[32] toy scale is dominated by the broadcast GEMM
either way — the size ratio and recall are what survive extrapolation.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    from albedo_spark.io import load_table
    from albedo_spark.operators.similarity import cosine_knn, quantize_int8, quantized_knn
    from albedo_spark.session import get_spark

    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    spark = get_spark("scale-quantize")
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    n_base = base.count()
    reps = spark.range(replicas).select(F.col("id").alias("r"))
    # decorrelate: replica r shifts each element by a tiny seeded delta so
    # the int8 codes differ across replicas (md5-derived, deterministic)
    corpus = (
        base.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("r") * n_base).alias("vec_id"),
            F.transform(
                F.col("embedding").cast("array<double>"),
                lambda x, i: x
                + (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat_ws(":", F.col("vec_id"), F.col("r"), i)
                            ),
                            1,
                            4,
                        ),
                        16,
                        10,
                    ).cast("double")
                    / F.lit(655360.0)
                    - F.lit(0.05)
                ),
            ).alias("embedding"),
        )
        .localCheckpoint()
    )
    n = corpus.count()

    tmp = f"/tmp/scale_quantize_{os.getpid()}"
    f32_path, i8_path = f"{tmp}/f32", f"{tmp}/i8"
    corpus.select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    ).write.mode("overwrite").parquet(f32_path)
    quantize_int8(corpus).select(
        "vec_id",
        F.transform(F.col("qvec"), lambda v: v.cast("byte")).alias("qvec"),
        "scale",
        "qnorm2",
    ).write.mode("overwrite").parquet(i8_path)
    b_f32, b_i8 = _dir_bytes(f32_path), _dir_bytes(i8_path)

    pred = F.col("vec_id") % 997 == 0
    queries = corpus.where(pred).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    t0 = time.time()
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_knn(corpus, queries, k=k).collect()
    }
    w_exact = time.time() - t0
    t0 = time.time()
    quant = {
        (r.query_id, r.neighbor_id)
        for r in quantized_knn(corpus, pred, k=k).collect()
    }
    w_quant = time.time() - t0

    print(
        json.dumps(
            {
                "n_vectors": n,
                "bytes_float32": b_f32,
                "bytes_int8": b_i8,
                "size_ratio": round(b_f32 / b_i8, 3),
                "recall_at_k": round(len(exact & quant) / max(len(exact), 1), 4),
                "k": k,
                "wall_exact_sec": round(w_exact, 2),
                "wall_quantized_sec": round(w_quant, 2),
            }
        )
    )
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
