"""Generate docs/OPERATORS.md — the declared-query catalog — from the
live registry, so the coverage inventory can be line-checked against
what the code actually registers. Run: python scripts/gen_catalog.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hello_flink_spark import registry  # noqa: E402


def main() -> None:
    specs = registry._REGISTRY  # registration order, not driver-priority order
    registry._load()
    lines = [
        "# Declared-query catalog (generated — do not edit)",
        "",
        "Regenerate with `python scripts/gen_catalog.py`. One row per",
        "`queries()` entry; **O** = DuckDB-oracle hash-checked, **R** =",
        "rows-only at the gate (invariant-tested in pytest instead).",
        "Driver-facing order differs: `registry.all_specs()` puts",
        "never-driver-verified queries first (see registry.py).",
        "",
        "| # | query | module | gate | summary |",
        "|---|---|---|---|---|",
    ]
    for i, (name, spec) in enumerate(specs.items(), 1):
        module = spec.fn.__module__.rsplit(".", 1)[-1]
        gate = "O" if spec.oracle else "R"
        doc = (spec.fn.__doc__ or "").strip().splitlines()
        summary = doc[0].rstrip() if doc else ""
        lines.append(f"| {i} | `{name}` | {module} | {gate} | {summary} |")
    o = sum(1 for s in specs.values() if s.oracle)
    lines += [
        "",
        f"**Total: {len(specs)} declared queries — {o} oracle-checked (O), "
        f"{len(specs) - o} rows-only (R).**",
        "",
    ]
    out = Path(__file__).resolve().parent.parent / "docs" / "OPERATORS.md"
    out.write_text("\n".join(lines))
    print(f"wrote {out} ({len(specs)} queries, {o} O / {len(specs) - o} R)")


if __name__ == "__main__":
    main()
