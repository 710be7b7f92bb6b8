"""Tests for the web-crawl wave (plans/web.py: URL parse, HTML strip)
and the geospatial grid-join wave (plans/geo.py: radius join via 3×3
neighbor replication, geofence via box→covering-cell cover).

The gated oracles certify values; these tests pin the PROPERTIES the
oracles can't see — the grid join finds exactly the brute-force pair
set, the geofence cover never misses a cell, the stripped HTML contains
no markup, and the plans stay JVM-side (no Python eval in any of the
four)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_neptune_spark.plans import geo, web
from etl_neptune_spark.sources import load_table


def test_url_parse_fields(spark, sf_dir):
    out = {(r["site"], r["ref"]): r for r in web.q_url_parse(spark, sf_dir).collect()}
    # 5 langs × 2 ref tags; every site is a registrable 2-label domain
    assert len(out) == 10
    assert all(site.startswith("example.") for site, _ in out)
    assert {ref for _, ref in out} == {"crawl", "feed"}
    # path is always /docs/<bucket>/<id> → depth 3
    assert all(r["max_depth"] == 3 for r in out.values())


def test_html_strip_no_markup_left(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pages = docs.withColumn("html", F.expr(web.HTML_EXPR))
    clean = pages.withColumn(
        "clean",
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace("html", "<script[^>]*>.*?</script>", ""),
                "<!--.*?-->",
                "",
            ),
            "<[^>]*>",
            "",
        ),
    )
    leftovers = clean.filter(
        F.col("clean").contains("<") | F.col("clean").contains(">")
    ).count()
    assert leftovers == 0
    # script payload and comment text must not survive into clean text
    survived = clean.filter(
        F.col("clean").contains("var x=1") | F.col("clean").contains("crawl ")
    ).count()
    assert survived == 0


def test_grid_join_equals_brute_force(spark, sf_dir):
    """The 3×3 neighbor replication loses no pair and invents none:
    the grid plan's (customer, n_near, min_d2) must equal the
    brute-force cross-join ground truth."""
    grid = {
        r["c_custkey"]: (r["n_near"], r["min_d2"])
        for r in geo.q_grid_join(spark, sf_dir).collect()
    }
    cust = geo._customer_points(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (F.col("s_suppkey") * 16807 % geo.GEO_WORLD).alias("sx"),
        (F.col("s_suppkey") * 39916801 % geo.GEO_WORLD).alias("sy"),
    )
    cp = cust.collect()
    sp = supp.collect()
    brute: dict[int, tuple[int, int]] = {}
    for c in cp:
        best, n = None, 0
        for s in sp:
            d2 = (c["cx"] - s["sx"]) ** 2 + (c["cy"] - s["sy"]) ** 2
            if d2 <= geo.R2:
                n += 1
                best = d2 if best is None else min(best, d2)
        if n:
            brute[c["c_custkey"]] = (n, best)
    assert grid == brute


def test_geofence_cover_bound_and_exactness(spark, sf_dir):
    """Every point inside a box is found via the cover (no cell
    missed), and the cover explodes to at most 63 cells per box."""
    boxes = load_table(spark, sf_dir, "region").select(
        "r_name",
        (F.col("r_regionkey") * 48271 % 7 * 10000).alias("x0"),
        (F.col("r_regionkey") * 69621 % 6 * 10000).alias("y0"),
    ).collect()
    pts = geo._customer_points(spark, sf_dir).collect()
    expect = {}
    for b in boxes:
        n = sum(
            1
            for p in pts
            if b["x0"] <= p["cx"] < b["x0"] + geo.BOX_W
            and b["y0"] <= p["cy"] < b["y0"] + geo.BOX_H
        )
        if n:
            expect[b["r_name"]] = n
    got = {
        r["r_name"]: r["n_inside"]
        for r in geo.q_geofence(spark, sf_dir).collect()
    }
    assert got == expect
    cells_per_box = (geo.BOX_W // geo.CELL + 1) * (geo.BOX_H // geo.CELL + 1)
    assert cells_per_box <= 63


def test_wave_plans_stay_jvm_side(spark, sf_dir):
    for fn in (web.q_url_parse, web.q_html_strip, geo.q_grid_join, geo.q_geofence):
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_grid_join_exact_under_hot_cell(spark, sf_dir):
    """Clustered points are the grid join's skew case: one cell holds
    a third of one side. The plan must stay EXACT under the hot cell
    (AQE may split the straggler partition, but the pair set cannot
    change) — verified against brute force on a synthetic frame."""
    import random

    rnd = random.Random(7)
    cust = []
    for i in range(300):
        if i % 3 == 0:  # hot cluster: all inside one R-cell
            cust.append((i, 1000 + rnd.randrange(2000), 1000 + rnd.randrange(2000)))
        else:
            cust.append((i, rnd.randrange(geo.GEO_WORLD), rnd.randrange(geo.GEO_WORLD)))
    supp = [
        (j, rnd.randrange(geo.GEO_WORLD), rnd.randrange(geo.GEO_WORLD))
        for j in range(40)
    ] + [(100 + j, 1500 + j, 1500 + j) for j in range(10)]  # suppliers in the cluster
    cdf = spark.createDataFrame(cust, "c_custkey long, cx long, cy long")
    sdf = spark.createDataFrame(supp, "s_suppkey long, sx long, sy long")

    from pyspark.sql import functions as FF

    c = cdf.withColumn("gx", FF.floor(FF.col("cx") / geo.CELL)).withColumn(
        "gy", FF.floor(FF.col("cy") / geo.CELL)
    )
    rep = (
        sdf.withColumn("dx", FF.explode(FF.array(*[FF.lit(i) for i in (-1, 0, 1)])))
        .withColumn("dy", FF.explode(FF.array(*[FF.lit(i) for i in (-1, 0, 1)])))
        .select(
            "s_suppkey", "sx", "sy",
            (FF.floor(FF.col("sx") / geo.CELL) + FF.col("dx")).alias("gx"),
            (FF.floor(FF.col("sy") / geo.CELL) + FF.col("dy")).alias("gy"),
        )
    )
    d2 = (FF.col("cx") - FF.col("sx")) * (FF.col("cx") - FF.col("sx")) + (
        FF.col("cy") - FF.col("sy")
    ) * (FF.col("cy") - FF.col("sy"))
    got = {
        (r["c_custkey"], r["s_suppkey"])
        for r in c.join(rep, ["gx", "gy"]).withColumn("d2", d2)
        .filter(FF.col("d2") <= geo.R2)
        .select("c_custkey", "s_suppkey")
        .collect()
    }
    brute = {
        (i, j)
        for i, cx, cy in cust
        for j, sx, sy in supp
        if (cx - sx) ** 2 + (cy - sy) ** 2 <= geo.R2
    }
    assert got == brute
    # the hot cluster genuinely concentrates pairs (skew is real)
    hot = sum(1 for i, j in brute if i % 3 == 0)
    assert hot > len(brute) // 2
