"""One-off: PQ index-build encode throughput, JVM exprs vs Arrow/numpy.

Run EXCLUSIVELY (see BENCH.md preamble).  Generates N synthetic 64-d
vectors JVM-side (deterministic hash-derived components — no Python in
the data source), trains one PQ model, then times each encoder
materializing the full (cid, cell, codes) index with a noop write —
per CLAUDE.md bench rules: a full-size warm-up pass per encoder
(absorbs Python-worker spin-up / codegen), then best of 3 timed
trials with clearCache between.

    python tools/pq_encode_bench.py [N]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from scheduler_spark.operators.similarity import (  # noqa: E402
    pq_encode,
    pq_encode_arrow,
    train_pq_model,
)
from scheduler_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark(app_name="pq-encode-bench", parallelism=16)
    dim = 64
    vecs = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                (F.pmod(F.xxhash64(F.col("id") * 64 + d), F.lit(2001)) - 1000.0)
                / 1000.0
                for d in range(dim)
            ]
        ).alias("embedding"),
    ).localCheckpoint()
    print(f"corpus: {vecs.count()} x {dim}")
    model = train_pq_model(vecs, n_lists=16, m_subspaces=8, n_codes=16)

    for label, built in (
        ("arrow", pq_encode_arrow(vecs, model)),
        ("jvm", pq_encode(vecs, model)),
    ):
        built.write.format("noop").mode("overwrite").save()  # warm-up
        trials = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            built.write.format("noop").mode("overwrite").save()
            trials.append(time.perf_counter() - t0)
        sec = min(trials)
        print(
            f"{label}: {sec:.2f}s  ({n / sec:,.0f} rows/s)  "
            f"trials={[round(t, 2) for t in trials]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
