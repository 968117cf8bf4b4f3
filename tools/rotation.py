"""DRIVER_PRIORITY rotation planner — turns the per-round manual rotation
into a computed artifact.

The external driver evaluates only the FIRST 50 entries of
``queries/__init__.py::DRIVER_PRIORITY`` each round, so every round the
order must rotate: queries with no driver row ever go first, then the
stalest rows, keeping one green representative per family. This tool
reads every CORRECTNESS_r*.json in the repo root, computes per-query
driver history, and prints the recommended next top-50 (plus the python
tuple to paste):

    python tools/rotation.py            # report + proposed rotation
    python tools/rotation.py --emit     # just the DRIVER_PRIORITY tuple body
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ROOT = Path(__file__).resolve().parent.parent
TOP_N = 50

# Queries force-included at the HEAD of the next rotation regardless of how
# fresh their last driver row is — used for red rows that must re-prove
# themselves (the tool would otherwise rank a just-failed query last because
# its row is the newest). Round 6: empty — q92/q93 (the repo's only red
# driver rows ever, red in r04 on the oracle HUGEINT cast) re-proved green
# in CORRECTNESS_r05, so their pins are cleared.
PINNED: tuple[str, ...] = ()


def _emittable(registry) -> list[str]:
    """Queries worth a driver slot: oracle-backed only. The four rows-only
    queries (sql=None — q42 HLL++, q74 t-digest, q16s approx deciles, q59
    iterative k-means) can only ever produce a `no_oracle` row, so a slot
    spent on them is a slot NOT spent refreshing a checkable query (r06
    burned one on q16s). Each has a green oracle-backed twin covering the
    same operator; their correctness evidence is pytest + the twin."""
    return [n for n, q in registry.items() if q.sql is not None]


def history(as_of: int | None = None) -> tuple[dict[str, int], int]:
    """{query: newest round with a driver row}, latest round seen.

    ``as_of`` restricts to CORRECTNESS files from rounds <= as_of, so the
    CI contract test can reproduce the rotation as it was computed when the
    current DRIVER_PRIORITY was pasted (a new driver round landing must not
    retro-redden the committed list)."""
    newest: dict[str, int] = {}
    latest = 0
    for f in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", f.name)
        if not m:
            continue
        rnd = int(m.group(1))
        if as_of is not None and rnd > as_of:
            continue
        latest = max(latest, rnd)
        for name in json.loads(f.read_text()):
            newest[name] = max(newest.get(name, 0), rnd)
    return newest, latest


def plan(as_of: int | None = None) -> tuple[list[str], dict]:
    from dataworks_audit_data_ingest_spark.queries import REGISTRY

    newest, latest = history(as_of)
    emittable = _emittable(REGISTRY)
    pinned = [n for n in PINNED if n in REGISTRY]
    never = [n for n in emittable if n not in newest and n not in pinned]
    staleness = sorted(
        ((newest[n], n) for n in emittable if n in newest and n not in pinned),
        key=lambda t: (t[0], t[1]),
    )
    # pinned first (must re-prove), then never-run (registration order
    # preserves family grouping), then stalest; ties alphabetical
    order = pinned + never + [n for _, n in staleness]
    top = order[:TOP_N]
    info = {
        "registered": len(REGISTRY),
        "never_run": len(never),
        "latest_round": latest,
        "stalest_in_top": staleness[0] if staleness else None,
        "dropped": order[TOP_N:],
    }
    return top, info


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--emit", action="store_true")
    ap.add_argument("--as-of", type=int, default=None)
    args = ap.parse_args()
    top, info = plan(args.as_of)
    if args.emit:
        for n in top:
            print(f'    "{n}",')
        return 0
    print(
        f"{info['registered']} registered; {info['never_run']} with no "
        f"driver row yet; latest driver round r{info['latest_round']:02d}"
    )
    print(f"\nproposed next top-{TOP_N}:")
    from dataworks_audit_data_ingest_spark.queries import REGISTRY  # noqa

    newest, _ = history(args.as_of)
    for i, n in enumerate(top, 1):
        tag = "NEVER" if n not in newest else f"r{newest[n]:02d}"
        if n in PINNED:
            tag += " PIN"
        print(f"  {i:2d}. {n:38s} [{tag}]")
    n_drop = len(info["dropped"])
    print(f"\n({n_drop} queries deferred to the following round — every one "
          "has local 3-scale oracle evidence via tools/check_oracle.py)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
