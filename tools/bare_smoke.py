"""Bare-session smoke: every registry query on a DRIVER-STYLE session.

The driver builds its own SparkSession with none of ``get_spark``'s
defensive confs; code that silently depends on them (nanosAsLong, UTC,
Arrow) passes the local suite and then breaks the round — the exact
failure class of round 2 (VERDICT r2 #1-3). This gate runs every
``queries()`` entry against a bare ``local[8]`` session at sf0.001 and
fails on ANY exception. Pre-snapshot checklist: check_oracle (values),
audit_plans (plan shapes), bare_smoke (driver-session safety).

Usage: python tools/bare_smoke.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main() -> int:
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    failures = []
    for name, fn in sorted(e.queries().items()):
        try:
            fn(spark, sf_dir).count()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: {type(exc).__name__}: {str(exc)[:200]}")
    print(f"\n{len(failures)} failed / {len(e.queries())} smoked (bare session)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
