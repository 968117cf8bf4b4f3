"""Operator inventory listing:  python -m dataworks_audit_data_ingest_spark.operators"""

from __future__ import annotations

from collections import Counter

from . import all_queries


def main() -> None:
    registry = all_queries()
    print(f"{len(registry)} registered operators "
          f"({sum(1 for q in registry.values() if q.sql)} with SQL oracle):\n")
    for name, q in sorted(registry.items()):
        oracle = "oracle" if q.sql else "rows-only"
        tags = ",".join(q.tags)
        first_line = (q.doc.splitlines() or [""])[0]
        print(f"  {name:34s} [{oracle:9s}] ({tags})\n      {first_line}")
    print("\nby family:")
    fam = Counter(t for q in registry.values() for t in q.tags)
    for tag, n in fam.most_common():
        print(f"  {tag:16s} {n}")


if __name__ == "__main__":
    main()
