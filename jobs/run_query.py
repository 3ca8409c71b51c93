"""Run any registered pipeline from the query registry, standalone.

Usage:
    python jobs/run_query.py <name> [--sf-dir DIR] [--out OUT.parquet]
    python jobs/run_query.py --list

Runs ``__ray_entry__.queries()[name](sf_dir)`` in its own Ray session
(the driver contract itself never calls ``ray.init``; this CLI owns one)
and prints the result — or writes it to Parquet with ``--out`` so a
pipeline run is resumable/consumable downstream.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("name", nargs="?", help="query name (see --list)")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01"),
    )
    ap.add_argument("--out", default=None, help="write result Parquet here")
    ap.add_argument("--list", action="store_true", help="list query names")
    args = ap.parse_args()

    import __ray_entry__ as entry

    names = sorted(entry.queries())
    if args.list or not args.name:
        print("\n".join(names))
        return 0
    if args.name not in names:
        print(f"unknown query {args.name!r}; see --list", file=sys.stderr)
        return 2

    import pandas as pd
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    try:
        res = entry.queries()[args.name](args.sf_dir)
        if not isinstance(res, pd.DataFrame):
            res = res.to_pandas()
        if args.out:
            res.to_parquet(args.out, index=False)
            print(f"{args.name}: {len(res)} rows -> {args.out}")
        else:
            with pd.option_context(
                "display.max_rows", 50, "display.width", 120
            ):
                print(res)
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
