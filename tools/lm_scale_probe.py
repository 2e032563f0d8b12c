"""N-gram LM train + score scaling probe — does the order-K pipeline
(one count table + one denormalized-context join per order) stay linear
in corpus size, and what does each extra ORDER cost at fixed size?

Trains and scores the stupid-backoff LM at the given corpus sizes and
orders over the dedup probe's deterministic synthetic docs (shared
generator, real zipf-ish token streams).  Train is the once-per-corpus
artifact build (counts + context denormalization per order); score is
the per-corpus recurring cost (one posexplode + one left join per
order into the noop sink).

Usage: python tools/lm_scale_probe.py [n_docs ...] [--orders 2,3,4,5]
Defaults: 100000 1000000 at orders 2 and 5.
Prints one JSON line:
{"cores": ..., "runs": [{"n": N, "order": K, "train_sec": ...,
"score_sec": ..., "rows": N}, ...]}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    orders = [2, 5]
    for a in sys.argv[1:]:
        if a.startswith("--orders"):
            orders = [int(x) for x in a.split("=", 1)[1].split(",")]
    sizes = [int(a) for a in args] or [100_000, 1_000_000]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 1))

    from dedup_scale_probe import synthetic_docs
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.operators.text import (
        score_lm,
        train_lm_model,
    )
    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.session import (
        get_spark,
    )

    spark = get_spark()
    runs = []
    for n in sizes:
        corpus_path = f"/tmp/lm_probe_corpus_{n}"
        if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
            synthetic_docs(spark, n).write.mode("overwrite").parquet(
                corpus_path
            )
        docs = spark.read.parquet(corpus_path)
        for order in orders:
            model = f"/tmp/lm_probe_model_{n}_o{order}"
            shutil.rmtree(model, ignore_errors=True)
            t0 = time.monotonic()
            train_lm_model(spark, docs, model, order=order)
            t_train = round(time.monotonic() - t0, 2)
            t0 = time.monotonic()
            out = score_lm(docs, spark, model, order=order)
            out.write.format("noop").mode("overwrite").save()
            t_score = round(time.monotonic() - t0, 2)
            runs.append(
                {
                    "n": n,
                    "order": order,
                    "train_sec": t_train,
                    "score_sec": t_score,
                }
            )
    print(json.dumps({"cores": cpus, "runs": runs}))


if __name__ == "__main__":
    main()
