"""Static lint over the plan modules: no module-level CONSTANT may be
assigned twice. A rebinding silently changes every call-time reader
ABOVE it while registered oracle SQL keeps the value frozen at
definition time — exactly how q_vocab's .limit() drifted to a later
module's VOCAB_TOP=1000 against its oracle's frozen 200 (caught by the
sf1 strict sweep; fixed by renaming to COVERAGE_VOCAB_TOP)."""

from __future__ import annotations

import ast
import glob
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_no_module_level_constant_rebinding():
    offenders = []
    for path in glob.glob(os.path.join(REPO, "etl_neptune_spark", "**", "*.py"),
                          recursive=True):
        tree = ast.parse(open(path).read())
        seen: set[str] = set()
        for node in tree.body:  # module level only
            targets = []
            if isinstance(node, ast.Assign):
                targets = [t for t in node.targets if isinstance(t, ast.Name)]
            elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
                targets = [node.target]
            for t in targets:
                name = t.id
                if not name.isupper() or name.startswith("_"):
                    continue
                if name in seen:
                    offenders.append(f"{os.path.relpath(path, REPO)}: {name}")
                seen.add(name)
    assert not offenders, f"module-level constants rebound: {offenders}"


def test_driver_collect_sites_carry_stated_bounds():
    """VERDICT r8 task 7: every `.collect()` / `.toPandas()` inside the
    package must sit next to an explicit `# bounded:` marker stating why
    the driver transfer is bounded by construction (cap guard, limit,
    dimension-sized table, single-row agg, ...). All 20 current sites
    are cap-guarded by inspection; this lint stops a future round from
    landing an unguarded row-scale collect unnoticed."""
    offenders = []
    for path in glob.glob(
        os.path.join(REPO, "etl_neptune_spark", "**", "*.py"), recursive=True
    ):
        src = open(path).read()
        lines = src.splitlines()
        for node in ast.walk(ast.parse(src)):
            if not (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr in ("collect", "toPandas")
            ):
                continue
            # The attribute's line is where `.collect()` appears in a
            # multi-line chain; accept a marker there or on the line
            # directly above (for call-lines too long to annotate).
            ln = node.func.end_lineno or node.func.lineno
            window = lines[max(0, ln - 2) : ln]
            if not any("# bounded:" in w for w in window):
                offenders.append(
                    f"{os.path.relpath(path, REPO)}:{ln} .{node.func.attr}()"
                )
    assert not offenders, (
        "driver collect without a stated `# bounded:` marker — state the "
        f"bound or distribute the step: {offenders}"
    )
