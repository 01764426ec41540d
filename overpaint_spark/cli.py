"""CLI entry point — ``python -m overpaint_spark.cli [DATA_ROOT] [--exact]``.

Maps the reference's entry points (``listTables.tsx:503-529``):

- default run  → estimated profile (footer row counts, single-pass stats),
- ``--exact``  → adds the exact COUNT per table (:471-501), rendered with
  the ``rows (exact)`` header; per-table failures render ``error``,
- failure path → ``Failed to list tables: <err>`` on stderr, exit code 1
  (:526-529),
- config via env ``SPARK_GRAFT_SF_DIR`` (analog of DATABASE_URL/PG*
  envs, :184-201) or a positional path argument.
"""

from __future__ import annotations

import argparse
import os
import sys

from overpaint_spark.profiler import profile_data_root, render_tables
from overpaint_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="Profile every table under a Parquet data root.")
    parser.add_argument(
        "data_root",
        nargs="?",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    parser.add_argument("--exact", action="store_true", help="exact COUNT(*) per table")
    args = parser.parse_args(argv)

    try:
        # unreachable data root = unreachable database (listTables.tsx:526-529)
        if not os.path.isdir(args.data_root):
            raise FileNotFoundError(f"data root does not exist: {args.data_root}")
        spark = get_spark("overpaint-profile")
        try:
            profiles = profile_data_root(spark, args.data_root, exact=args.exact)
            mode = "exact" if args.exact else "estimated"
            sys.stdout.write(render_tables(profiles, mode))
        finally:
            spark.stop()
    except Exception as exc:  # top-level catch parity (:526-529)
        sys.stderr.write(f"Failed to list tables: {exc}\n")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
