"""Zipfian-key fixture for skew-handling evidence (VERDICT r4 task 8).

Derives a DETERMINISTIC skewed copy of the sf tables:

- ``events.parquet``: user_id remapped so one hot user carries ~35% of
  all rows and a second ~15% (the chatty-service-pair shape the
  reference's flow table has) — content-hash routing, no randomness.
- ``documents.parquet``: ~30% of docs replaced with one of three hot
  boilerplate texts, so shingle/band keys skew the same way (the
  MinHash-LSH bucket-skew case the band caps defend against).
- ``customer.parquet``: ~30% of customers remapped onto ONE custkey,
  which collapses their derived coordinates into one grid cell — the
  hot-cell case for q_grid_join's spatial hash join and a hot probe
  key for any customer-keyed join (VERDICT r6 task 7).

Output: ``<repo>/spark-warehouse/skewfix/{events,documents}.parquet``
(directories; load_table reads them like the snapshot tables).
bench.py times the flagship + join + minhash queries against this dir
and records them as ``skew:<name>`` entries in BENCH.json.

Usage: python tools/gen_skew_fixture.py [src_sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOT_BOILERPLATE = [
    "terms of service apply to all content on this page please review the "
    "policy before continuing to use the site thank you for visiting",
    "copyright notice all rights reserved reproduction in whole or in part "
    "without permission is prohibited contact the administrator for details",
    "cookie banner we use cookies to improve your experience accept or "
    "decline tracking preferences in the settings menu at any time",
]


def build(spark, src_sf_dir: str, out_dir: str) -> None:
    from pyspark.sql import functions as F

    from etl_neptune_spark.sources import load_table

    ev = load_table(spark, src_sf_dir, "events")
    bucket = F.pmod(F.hash("event_id"), F.lit(100))
    skewed_ev = ev.withColumn(
        "user_id",
        F.when(bucket < 35, F.lit(0))
        .when(bucket < 50, F.lit(1))
        .otherwise(F.col("user_id")),
    )
    skewed_ev.write.mode("overwrite").parquet(
        os.path.join(out_dir, "events.parquet")
    )

    docs = load_table(spark, src_sf_dir, "documents")
    dbucket = F.pmod(F.hash("doc_id"), F.lit(100))
    hot = F.element_at(
        F.array(*[F.lit(t) for t in HOT_BOILERPLATE]),
        (F.pmod(F.hash("doc_id"), F.lit(3)) + 1).cast("int"),
    )
    skewed_docs = docs.withColumn(
        "text", F.when(dbucket < 30, hot).otherwise(F.col("text"))
    ).withColumn("n_chars", F.length("text").cast("bigint"))
    skewed_docs.write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )

    cust = load_table(spark, src_sf_dir, "customer")
    cbucket = F.pmod(F.hash("c_custkey"), F.lit(100))
    skewed_cust = cust.withColumn(
        "c_custkey",
        F.when(cbucket < 30, F.lit(7)).otherwise(F.col("c_custkey")),
    )
    cust_dst = os.path.join(out_dir, "customer.parquet")
    # a stale fixture may hold a SYMLINK to the read-only source table —
    # never let an overwrite follow it
    if os.path.islink(cust_dst):
        os.unlink(cust_dst)
    skewed_cust.write.mode("overwrite").parquet(cust_dst)

    # pass-through tables: queries resolve dims (nation, supplier, ...)
    # against the same dir — symlink the unskewed originals
    for t in (
        "region nation supplier part orders lineitem embeddings"
    ).split():
        dst = os.path.join(out_dir, f"{t}.parquet")
        src = os.path.join(src_sf_dir.rstrip("/"), f"{t}.parquet")
        if not os.path.exists(dst) and os.path.exists(src):
            os.symlink(src, dst)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(repo, "spark-warehouse", "skewfix")
    )
    from etl_neptune_spark.session import get_spark

    spark = get_spark("gen_skew_fixture")
    build(spark, src, out)
    print(f"skew fixture written to {out}")


if __name__ == "__main__":
    main()
