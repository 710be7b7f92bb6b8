"""sf100 amplifier — the THIRD deterministic decade, LLM-pipeline
facts only (events/documents/embeddings → 100M / 5M / 2M rows).

Applies tools/gen_sf1.py's amplifier to the sf10 fixture, restricted
via ``build(tables=...)`` to the three tables the sf100 probe queries
actually read — 600M lineitem rows would dominate generation for
nothing (the relational heavy tail already carries two decades of
evidence in SCALING.md's sf10 section, and TPC-H at sf100-equivalent
is not this probe's question; the 100 TB posture under test here is
the training-data pipeline's).

Third-generation fixture effects (gen_sf1/gen_sf10 caveats compound):
exact-dup rate stays ~20% per generation with additive cluster growth;
generation-2 salt tokens ``zzsf<r>x<doc_id>`` (globally unique per
(doc, replica) since the r9 salt fix) are re-salted at mutated
positions, keeping mutated-shingle document frequency exactly 1, so
the inverted-index joins stay linear by construction — which is
exactly the property the probe measures end-to-end (pre-fix, the
doc_id%997 salt collided shingles across ~5k docs per salt value and
drove the prefix join past local disk; see SCALING.md's r9 fixture
note).

Output: <repo>/spark-warehouse/sf100/<table>.parquet (dims symlinked).
Usage: python tools/gen_sf100.py [src_sf10_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.gen_sf1 import build  # noqa: E402 — the SAME amplifier recipe

TABLES = {"events", "documents", "embeddings"}


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(repo, "spark-warehouse", "sf10")
    )
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(repo, "spark-warehouse", "sf100")
    )
    if not os.path.isdir(os.path.join(src, "events.parquet")):
        raise SystemExit("run tools/gen_sf10.py first")
    from etl_neptune_spark.session import get_spark

    spark = get_spark("gen_sf100")
    build(spark, src, out, tables=TABLES)
    print(f"sf100 fixture written to {out}")


if __name__ == "__main__":
    main()
