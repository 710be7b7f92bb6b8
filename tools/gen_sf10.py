"""sf10 amplifier — the second 10× step for the scale probe (VERDICT
r6 task 1: the 100× claim previously rested on ONE 10× step; sf10 gives
the heavy-tail queries a second decade so a hidden super-linear term
that first bends at ~10⁶ rows shows up).

Applies the SAME deterministic amplifier as tools/gen_sf1.py, with the
sf1 fixture as the source — every caveat documented there applies per
generation, plus the second-generation effects:

- exact-dup RATE stays ~20% per generation and identical-text cluster
  SIZE grows additively (~+1.5 members per decade, never
  multiplicatively — the first-draft OOM class gen_sf1 documents is
  still avoided because replicas r≥2 are new content);
- salted replacement tokens from generation 1 (``zzsf<r>x<doc_id>``,
  globally unique per (doc, replica) since the r9 salt fix) are
  re-replaced at mutated positions in generation 2, so mutated-shingle
  document frequency stays exactly 1 and the inverted-index self-joins
  stay linear;
- fact tables (events/documents/embeddings/orders/lineitem) reach
  10M / 500k / 200k / 15M / 60M rows; dimension tables still symlink
  to the originals (the fact-vs-dim scaling shape).

Output: <repo>/spark-warehouse/sf10/<table>.parquet
Usage: python tools/gen_sf10.py [src_sf1_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.gen_sf1 import build  # noqa: E402 — the SAME amplifier recipe


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(repo, "spark-warehouse", "sf1")
    )
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(repo, "spark-warehouse", "sf10")
    )
    from etl_neptune_spark.session import get_spark

    spark = get_spark("gen_sf10")
    if not os.path.isdir(os.path.join(src, "events.parquet")):
        from tools.gen_sf1 import build as build1

        build1(spark, "/root/testdata/sf0.1", src)
    build(spark, src, out)
    # dimension symlinks inside build() point at the sf1 dir's own
    # symlinks — resolve them so sf10 stands alone
    for t in "region nation customer supplier part".split():
        dst = os.path.join(out, f"{t}.parquet")
        if os.path.islink(dst):
            real = os.path.realpath(dst)
            os.unlink(dst)
            os.symlink(real, dst)
    print(f"sf10 fixture written to {out}")


if __name__ == "__main__":
    main()
