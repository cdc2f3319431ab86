"""jusText throughput scaling: the q181 claim measured — extraction is
one map pass plus ONE per-document exchange, linear in total blocks.

justext_classify (operators/extraction.py) segments, cleans and
featurizes blocks in map-only chained regex projections; the only
shuffle is the per-document hash partitioning that the block-index
row_number and all four neighbour windows share (plan-pinned in
tests/test_plans.py). Total cost should therefore scale linearly in
n_docs x blocks_per_doc and be indifferent to how the same block count
is distributed across documents (pages have tens of blocks; per-doc
window state is trivially bounded). This probe fabricates
deterministic pages (hash-derived word-soup paragraphs behind a nav
and a footer) and sweeps both axes, reporting blocks per second.

Measured on this host (local[32]):

    n_docs   blocks/doc   total_blocks   wall     blocks/s
    5000     14           70000          1.2s     59984
    20000    14           280000         1.2s     242548
    80000    14           1120000        2.9s     391198
    20000    50           1000000        3.2s     309141

— throughput rises to its plateau as task overhead amortizes (4x
blocks from 70k: flat wall), then wall tracks total blocks (4x blocks
from 280k: 2.4x wall), and ~1M blocks cost ~3s whether spread over
80k docs or packed 3.6x deeper into 20k (391k vs 309k blocks/s —
the per-doc exchange is not a hotspot; block regex work dominates).
At 100 TB the operator is one regex map stage plus one bounded-state
window pass per page.

Usage::

    python tools/scale_justext.py [n_docs ...]   # default: 5000 20000
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

WORDS = [
    "the", "report", "that", "you", "wanted", "is", "here", "plus",
    "some", "filler", "about", "office", "printer", "queue", "and",
    "status", "of", "it", "window", "garden", "school", "morning",
]


def pages(spark, n: int, blocks_per_doc: int):
    """Deterministic pages: a link-dense nav, ``blocks_per_doc``
    word-soup paragraphs (~25 hash-derived words each — stopword-dense
    enough to exercise the good/neargood rules), a © footer."""
    warr = F.array(*[F.lit(w) for w in WORDS])

    def para(b: F.Column) -> F.Column:
        words = F.transform(
            F.sequence(F.lit(0), F.lit(24)),
            lambda i: F.element_at(
                warr,
                (
                    F.abs(
                        F.hash(
                            F.concat_ws(
                                ":", F.col("id").cast("string"),
                                b.cast("string"), i.cast("string"),
                            )
                        )
                    )
                    % len(WORDS)
                ).cast("int")
                + 1,
            ),
        )
        return F.concat(F.lit("<p>"), F.array_join(words, " "), F.lit("</p>"))

    body = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(blocks_per_doc - 1)), para
        ),
        "",
    )
    html = F.concat(
        F.lit(
            '<div class="nav"><a href="/">Home</a> <a href="/a">About us'
            "</a></div>"
        ),
        body,
        F.lit("<div>&copy; Example all rights reserved</div>"),
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"), html.alias("html")
    )


def main() -> None:
    from albedo_spark.operators.extraction import justext_classify
    from albedo_spark.session import get_spark

    sizes = [int(a) for a in sys.argv[1:]] or [5_000, 20_000]
    spark = get_spark("scale-justext")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    runs = [(n, 12) for n in sizes] + [
        (4 * sizes[-1], 12),
        (sizes[-1], 48),  # same total blocks as the previous row
    ]
    for n, bpd in runs:
        docs = pages(spark, n, bpd).localCheckpoint()  # exclude gen cost
        justext_classify(docs).write.format("noop").mode("overwrite").save()
        t0 = time.perf_counter()
        justext_classify(docs).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        total = n * (bpd + 2)
        rows.append(
            {
                "n_docs": n,
                "blocks_per_doc": bpd + 2,
                "total_blocks": total,
                "wall_s": round(wall, 1),
                "blocks_per_s": int(total / wall),
            }
        )
        print(json.dumps(rows[-1]))
        docs.unpersist()
    print(json.dumps({"metric": "justext_scaling", "rows": rows}))


if __name__ == "__main__":
    main()
