"""Regenerate the catalog-derived docs from ``registry()`` so counts
can't drift from the code (VERDICT r2 #5).

- Rewrites the ``(N entries ...)`` counts in README.md.
- Writes CATALOG.md: the full generated entry list (name, oracle-backed
  or rows-only, first doc sentence).

``tests/test_docs_synced.py`` asserts both match the live registry.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from news_graph_rag_spark.queries import registry  # noqa: E402
from news_graph_rag_spark.queries.lineage import LINEAGE  # noqa: E402


def main() -> None:
    reg = registry()
    n = len(reg)
    n_oracle = sum(1 for q in reg.values() if q.oracle)

    # Append-only manifest guard FIRST, before any file is rewritten
    # (round-12 review: checking after the README/CATALOG writes left a
    # half-applied regeneration on exactly the error path the guard
    # exists for — docs regenerated from an order the tool rejects).
    manifest_path = os.path.join(REPO, "tests", "registry_order.txt")
    new_order = list(reg)
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            old_order = f.read().split()
        if new_order[: len(old_order)] != old_order:
            raise SystemExit(
                "refusing to regenerate: the new registry order does not "
                "extend the committed tests/registry_order.txt — that "
                "reorders driver-graded positions. If intentional, delete "
                "the manifest first and say so in the commit message."
            )

    readme_path = os.path.join(REPO, "README.md")
    with open(readme_path) as f:
        readme = f.read()
    readme = re.sub(
        r"the oracle-backed catalog \(\d+ entries",
        f"the oracle-backed catalog ({n} entries",
        readme,
    )
    readme = re.sub(
        r"`queries\(\)` \(\d+ catalog entries\), and `oracle_sql\(\)` \(\d+ of",
        f"`queries()` ({n} catalog entries), and `oracle_sql()` ({n_oracle} of",
        readme,
    )
    with open(readme_path, "w") as f:
        f.write(readme)

    lines = [
        "# CATALOG — generated from `registry()`",
        "",
        "Do not edit: run `python scripts/gen_catalog_docs.py` after",
        "adding/removing catalog entries (test_docs_synced.py enforces it).",
        "",
        f"**{n} entries, {n_oracle} oracle-backed** (value-exact DuckDB",
        "parity via the driver gate); the rest are rows-only (streaming /",
        "non-SQL-expressible) with unit or metamorphic tests.",
        "",
        "| entry | oracle | lineage | summary |",
        "|---|---|---|---|",
    ]
    for name, q in reg.items():
        first = (q.doc or "").split(". ")[0].strip().rstrip(".")
        first = first.replace("|", "\\|")
        kind = "sql" if q.oracle else "rows-only"
        lineage = LINEAGE.get(name, "?")
        lines.append(f"| `{name}` | {kind} | {lineage} | {first} |")
    with open(os.path.join(REPO, "CATALOG.md"), "w") as f:
        f.write("\n".join(lines) + "\n")

    # Full-order manifest (round 12): the complete registry order,
    # frozen in a committed file; the append-only guard above already
    # validated new_order against the committed manifest.
    with open(manifest_path, "w") as f:
        f.write("\n".join(new_order) + "\n")
    print(
        f"README.md counts -> {n}/{n_oracle}; CATALOG.md {n} rows; "
        f"registry_order.txt {len(new_order)} names"
    )


if __name__ == "__main__":
    main()
