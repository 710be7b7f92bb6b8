"""Regenerate the deterministic scale-fixture chain on a fresh host.

The sf1/sf10/sf100 fixtures live under <repo>/spark-warehouse/ and are
generated artifacts — a fresh host starts without them. This rebuilds
exactly what the round-10 scale re-measures need:

- sf1: all five fact tables (the sf1 value gate reads TPC-H too),
- sf10: all five (source for sf100; sf10 rows already measured),
- sf100: events/documents/embeddings only (gen_sf100's own scope).

Usage: python tools/regen_fixture_chain.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.gen_sf1 import build  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from etl_neptune_spark.session import get_spark

    spark = get_spark("regen_fixtures")
    wh = os.path.join(_REPO, "spark-warehouse")
    sf1 = os.path.join(wh, "sf1")
    sf10 = os.path.join(wh, "sf10")
    sf100 = os.path.join(wh, "sf100")

    for name, src, out, tables in (
        ("sf1", "/root/testdata/sf0.1", sf1, None),
        ("sf10", sf1, sf10, None),
        ("sf100", sf10, sf100, {"events", "documents", "embeddings"}),
    ):
        # Skip only when EVERY table that stage builds exists (ADVICE
        # r10: checking embeddings alone silently skipped a stage whose
        # earlier crash had left orders/lineitem — written last by
        # gen_sf1.build — missing, breaking the sf1 value gate and the
        # sf10 derivation).
        required = tables or {
            "events", "documents", "embeddings", "orders", "lineitem"
        }
        if all(
            os.path.isdir(os.path.join(out, f"{t}.parquet"))
            for t in required
        ):
            print(f"{name}: exists, skipping", flush=True)
            continue
        t0 = time.time()
        build(spark, src, out, tables=tables)
        # stand-alone dimension symlinks (gen_sf10.main does the same)
        for t in "region nation customer supplier part".split():
            dst = os.path.join(out, f"{t}.parquet")
            if not os.path.exists(dst):
                os.symlink(os.path.realpath(f"/root/testdata/sf0.1/{t}.parquet"), dst)
        print(f"{name}: built in {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
