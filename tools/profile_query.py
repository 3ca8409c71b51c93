"""Per-stage profiling for any driver query: wall time + Dataset stats.

    python tools/profile_query.py <query> [sf_dir] [--cpus N]

Runs ``queries()[name](sf_dir)`` once warm, then again capturing
``Dataset.stats()`` when the query returns a Dataset, and prints the
per-operator breakdown Ray Data records (task wall/CPU, block sizes,
output rows).  For pandas-returning queries only the wall time prints —
point this at the underlying pipeline function for stage stats.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    cpus = 32
    for a in sys.argv[1:]:
        if a.startswith("--cpus"):
            cpus = int(a.split("=", 1)[1])

    import ray

    ray.init(
        address="local",
        num_cpus=cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    fn = entrymod.queries()[name]
    fn(sf_dir)  # warm: worker spawn + page cache out of the measurement
    t0 = time.perf_counter()
    out = fn(sf_dir)
    wall = time.perf_counter() - t0
    print(f"== {name} @ {sf_dir} ({cpus} cpus): {wall:.3f}s warm ==")
    if isinstance(out, ray.data.Dataset):
        print(out.stats())
    else:
        print(f"(returns {type(out).__name__}; rows={len(out)})")
        print(
            "stage stats: call the pipeline function directly and print "
            ".stats() on its Dataset before materialization"
        )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
