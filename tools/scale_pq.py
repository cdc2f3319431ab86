"""PQ / IVF-PQ recall probe on a CLUSTERED embedding fixture (q150/q151's
operators): measures the claim the PQ literature makes — trained product
quantization holds high recall on clustered data — which the sf fixture's
near-random embeddings cannot show (recall ~0.2 there is the EXPECTED
behavior of any quantizer on isotropic noise, not a defect; Jégou et al.
2011 evaluate on SIFT/GIST, which are strongly clustered).

Fixture: an N-vector Gaussian mixture in dim 64 — G seeded centers, each
point = center + small isotropic noise (numpy, fixed seed, driver-built:
model-scale data, not corpus-scale). Ground truth is exact integer
squared-L2 top-k on the SAME integerized vectors both engines use.

    python tools/scale_pq.py [n] [g] [k]        # default 2000 32 10

One JSON line::

    {"n_vectors": ..., "g_clusters": ..., "k": ...,
     "curve": [{"m": ..., "ncodes": ..., "bytes_per_vec": ...,
                "compression_vs_f32": ..., "recall_flat_pq": ...,
                "recall_ivf_pq": ..., "recall_formula_pq": ...}, ...]}

Reading it: bytes_per_vec counts m code bytes (+8 for the IVF cell id at
m<=8 configs it's dominated by codes); compression is vs 64 float32 =
256 B. recall_formula_pq (untrained fixed codebooks) is the floor that
shows TRAINING is what buys recall, not the ADC mechanics.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

DIM = 64
SEED = 20260815


def make_mixture(spark, n: int, g: int):
    """Seeded Gaussian-mixture embeddings ``(vec_id, embedding)``:
    centers ~ U(-0.5, 0.5)·2, noise sigma = 0.04 — tight clusters, the
    SIFT-like shape PQ is designed for."""
    import numpy as np

    rng = np.random.RandomState(SEED)
    centers = rng.uniform(-1.0, 1.0, size=(g, DIM))
    assign = rng.randint(0, g, size=n)
    pts = centers[assign] + rng.normal(0.0, 0.04, size=(n, DIM))
    rows = [(int(i), [float(x) for x in pts[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def exact_topk(emb, query_pred, k: int) -> dict[int, list[int]]:
    """Ground truth: exact integer squared-L2 top-k over the integerized
    vectors (the same integerization every PQ path uses)."""
    from albedo_spark.operators.clustering import integerize_embeddings
    from albedo_spark.operators.topk import top_k_per_group

    v = integerize_embeddings(emb).localCheckpoint(eager=False)
    q = v.where(query_pred(F.col("vec_id"))).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qq")
    )
    dist = F.aggregate(
        F.zip_with("qq", "q", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    cand = q.crossJoin(v).where(F.col("vec_id") != F.col("query_id")).select(
        "query_id", F.col("vec_id").alias("neighbor_id"), dist.alias("d")
    )
    out: dict[int, list[int]] = {}
    for r in top_k_per_group(
        cand, ["query_id"], [F.col("d").asc(), F.col("neighbor_id").asc()], k
    ).collect():
        out.setdefault(r.query_id, []).append(r.neighbor_id)
    return out


def recall(approx_rows, truth: dict[int, list[int]], k: int) -> float:
    got: dict[int, set] = {}
    for r in approx_rows:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    if not truth:
        return 0.0
    return round(
        sum(len(got.get(q, set()) & set(t)) / len(t) for q, t in truth.items())
        / len(truth),
        4,
    )


def main() -> None:
    from albedo_spark.operators.pq import (
        formula_codebooks,
        ivf_pq_topk,
        pq_adc_topk,
        train_codebooks,
    )
    from albedo_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    g = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    spark = get_spark("scale-pq")
    spark.sparkContext.setLogLevel("ERROR")

    emb = make_mixture(spark, n, g).localCheckpoint()
    pred = lambda c: c % 100 == 0  # noqa: E731 — 1% of ids as queries
    truth = exact_topk(emb, pred, k)

    curve = []
    for m, ncodes in [(4, 16), (8, 16), (16, 16)]:
        subdim = DIM // m
        trained = train_codebooks(
            emb, m=m, ncodes=ncodes, subdim=subdim, rounds=3
        )
        flat = recall(
            pq_adc_topk(emb, pred, k=k, codebooks=trained, m=m, subdim=subdim)
            .collect(),
            truth,
            k,
        )
        ivf = recall(
            ivf_pq_topk(
                emb, pred, k=k, kc=16, nprobe=4, codebooks=trained,
                m=m, subdim=subdim,
            ).collect(),
            truth,
            k,
        )
        formula = recall(
            pq_adc_topk(
                emb, pred, k=k,
                codebooks=formula_codebooks(m=m, ncodes=ncodes, subdim=subdim),
                m=m, subdim=subdim,
            ).collect(),
            truth,
            k,
        )
        curve.append(
            {
                "m": m,
                "ncodes": ncodes,
                "bytes_per_vec": m,  # one byte per code at ncodes<=256
                "compression_vs_f32": round(DIM * 4 / m, 1),
                "recall_flat_pq": flat,
                "recall_ivf_pq": ivf,
                "recall_formula_pq": formula,
            }
        )
        print(json.dumps(curve[-1]), file=sys.stderr)

    print(
        json.dumps(
            {"n_vectors": n, "g_clusters": g, "k": k, "curve": curve}
        )
    )


if __name__ == "__main__":
    main()
