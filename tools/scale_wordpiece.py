"""WordPiece trainer scaling probe (round 12 — the q161 family).

Same harness as ``scale_bpe.py``: runs ``learn_wordpiece`` for N merges
over the replicated-and-perturbed sf0.1 documents corpus with per-round
instrumentation, and reports whether per-round cost TRACKS THE
AFFECTED-WORD COUNT — the pair-delta claim, which WordPiece inherits
from the BPE loop plus one extra delta stream (symbol counts). A flat
wall ratio ≈ 1 would mean the extra stream re-introduced a |vocab|-sized
per-round cost; falling wall (ratio well below 1) is the delta-update
signature.

    python tools/scale_wordpiece.py [n_merges] [n_copies]   # default: 120 30

Output: one JSON line per quartile of the merge sequence (mean per-round
wall, mean affected words) plus a summary line with the last/first
quartile wall ratio.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_bench import replicate  # noqa: E402


def main() -> None:
    from albedo_spark import io
    from albedo_spark.operators.bpe import word_frequencies
    from albedo_spark.operators.wordpiece import learn_wordpiece
    from albedo_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    n_copies = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    spark = get_spark("scale-wordpiece")
    spark.sparkContext.setLogLevel("ERROR")
    docs = (
        io.widen(
            replicate(
                io.load_table(spark, sf_dir, "documents").select(
                    "doc_id", "text"
                ),
                n_copies,
            )
        )
        .persist()
    )
    docs.count()
    vocab = word_frequencies(docs).count()

    rounds: list[dict] = []
    t0 = time.perf_counter()
    merges = learn_wordpiece(docs, n_merges=n_merges, round_stats=rounds)
    wall = round(time.perf_counter() - t0, 2)

    q = max(1, len(rounds) // 4)
    quartiles = [rounds[i : i + q] for i in range(0, len(rounds), q)][:4]
    for i, chunk in enumerate(quartiles):
        print(
            json.dumps(
                {
                    "phase": f"q{i + 1}",
                    "rounds": f"{chunk[0]['round']}-{chunk[-1]['round']}",
                    "mean_wall_sec": round(
                        statistics.mean(r["wall_sec"] for r in chunk), 4
                    ),
                    "mean_affected": round(
                        statistics.mean(r["n_affected"] for r in chunk)
                    ),
                }
            )
        )
    first = statistics.mean(r["wall_sec"] for r in quartiles[0])
    last = statistics.mean(r["wall_sec"] for r in quartiles[-1])
    print(
        json.dumps(
            {
                "n_merges": len(merges),
                "vocab": vocab,
                "wall_sec": wall,
                "first_quartile_mean_wall": round(first, 4),
                "last_quartile_mean_wall": round(last, 4),
                "wall_ratio_last_vs_first": round(last / first, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
