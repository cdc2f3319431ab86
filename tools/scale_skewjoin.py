"""Skew-join probe: measures the claim (operators/skew.py, session.py)
that AQE's runtime skew-join splitting absorbs celebrity keys in
sort-merge joins, and that `salted_join` covers the residual case.

Builds a deliberately skewed fact table — `frac` of all rows carry ONE
key, the rest spread uniformly — joined to a uniform dimension:

    python tools/scale_skewjoin.py [n_rows] [hot_frac_pct]   # default 2000000 50

One JSON line per configuration:
``{"n_rows": ..., "hot_pct": ..., "aqe_on_sec": ..., "aqe_off_sec": ...,
"salted_sec": ..., "skew_factor": ...}``

Reading it: aqe_on should beat aqe_off on the skewed join (AQE splits
the hot partition into task-sized slices at runtime); salted_join is the
explicit fallback whose cost is the salt-replication of the small side.
The rows are identical in all three (asserted).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from albedo_spark.operators.skew import salted_join
    from albedo_spark.session import get_spark

    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    hot_pct = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    spark = get_spark("scale-skewjoin")
    spark.sparkContext.setLogLevel("ERROR")
    n_keys = 1000
    fact = spark.range(n_rows).select(
        F.when(
            (F.col("id") * 100) % n_rows < n_rows * hot_pct, F.lit(0)
        )
        .otherwise(F.col("id") % n_keys)
        .alias("k"),
        (F.col("id") % 97).alias("v"),
    ).persist()
    fact.count()
    dim = spark.range(n_keys).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("w")
    ).persist()
    dim.count()
    hot = fact.where("k = 0").count()
    skew_factor = round(hot / (n_rows / n_keys), 1)

    def timed_join(aqe: bool) -> tuple[float, int]:
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        # force the sort-merge path (broadcast would hide the skew)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
        )
        t0 = time.perf_counter()
        n = fact.join(dim, "k").groupBy().agg(F.sum(F.col("v") + F.col("w"))).first()[0]
        return round(time.perf_counter() - t0, 2), n

    # warm both code paths first (JIT + shuffle infra), then measure the
    # second run of each — first-run bias otherwise dominates the delta
    timed_join(True)
    timed_join(False)
    aqe_on, sum_on = timed_join(True)
    aqe_off, sum_off = timed_join(False)
    t0 = time.perf_counter()
    sum_salted = (
        salted_join(fact, dim, ["k"], num_salts=32)
        .groupBy()
        .agg(F.sum(F.col("v") + F.col("w")))
        .first()[0]
    )
    salted = round(time.perf_counter() - t0, 2)
    # restore session defaults
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    assert sum_on == sum_off == sum_salted, (sum_on, sum_off, sum_salted)
    print(
        json.dumps(
            {
                "n_rows": n_rows,
                "hot_pct": hot_pct,
                "skew_factor": skew_factor,
                "aqe_on_sec": aqe_on,
                "aqe_off_sec": aqe_off,
                "salted_sec": salted,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
