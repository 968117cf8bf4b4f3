"""Operator CLI — the engine's front door for a terminal user:

    python -m dataworks_audit_data_ingest_spark.operators               # list
    python -m ... list --tag dedup                                      # filter
    python -m ... run q01_pricing_summary [--sf DIR] [--limit N]        # execute
    python -m ... explain q51_dedup_minhash_lsh [--sf DIR]              # plan
    python -m ... sql q01_pricing_summary                               # oracle SQL
"""

from __future__ import annotations

import argparse
from collections import Counter

from . import all_queries

_DEFAULT_SF = "/root/testdata/sf0.001"


def _list(args) -> int:
    registry = all_queries()
    if args.tag:
        registry = {
            n: q for n, q in registry.items() if args.tag in q.tags
        }
    print(f"{len(registry)} registered operators "
          f"({sum(1 for q in registry.values() if q.sql)} with SQL oracle):\n")
    for name, q in sorted(registry.items()):
        oracle = "oracle" if q.sql else "rows-only"
        tags = ",".join(q.tags)
        first_line = (q.doc.splitlines() or [""])[0]
        print(f"  {name:34s} [{oracle:9s}] ({tags})\n      {first_line}")
    if not args.tag:
        print("\nby family:")
        fam = Counter(t for q in registry.values() for t in q.tags)
        for tag, n in fam.most_common():
            print(f"  {tag:16s} {n}")
    return 0


def _resolve(name: str):
    registry = all_queries()
    if name in registry:
        return registry[name]
    matches = sorted(n for n in registry if n.startswith(name))
    if len(matches) == 1:
        return registry[matches[0]]
    hint = f" (prefix matches: {matches[:5]})" if matches else ""
    raise SystemExit(f"unknown operator {name!r}{hint} — run `list`")


def _spark():
    from ..session import get_spark

    return get_spark("operator-cli")


def _run(args) -> int:
    q = _resolve(args.name)
    df = q.fn(_spark(), args.sf)
    df.show(args.limit, truncate=False)
    print(f"({q.name} @ {args.sf})")
    return 0


def _explain(args) -> int:
    from ..plans.inspect import formatted_plan

    q = _resolve(args.name)
    print(formatted_plan(q.fn(_spark(), args.sf)))
    return 0


def _sql(args) -> int:
    q = _resolve(args.name)
    if not q.sql:
        print(f"{q.name} is rows-only (no SQL oracle)")
        return 1
    print(q.sql.strip())
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m dataworks_audit_data_ingest_spark.operators"
    )
    sub = ap.add_subparsers(dest="cmd")
    p_list = sub.add_parser("list", help="list operators")
    p_list.add_argument("--tag", help="filter by family tag")
    for verb, fn in (("run", _run), ("explain", _explain), ("sql", _sql)):
        p = sub.add_parser(verb)
        p.add_argument("name", help="operator name (unique prefix ok)")
        if verb != "sql":
            p.add_argument("--sf", default=_DEFAULT_SF)
        if verb == "run":
            p.add_argument("--limit", type=int, default=20)
        p.set_defaults(func=fn)
    p_list.set_defaults(func=_list, tag=None)
    args = ap.parse_args(argv)
    if args.cmd is None:
        args.tag = None
        return _list(args)
    return args.func(args)


if __name__ == "__main__":
    raise SystemExit(main())
