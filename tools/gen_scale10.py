"""Generate the 10× scale-up of the sf0.1 fixture — thin wrapper over
the generalized tools/gen_scale.py (r11), kept so the standing scale
guard's auto-generation hook (tests/test_scale_guard.py) and every
SCALE.md recipe keep working unchanged. See gen_scale.py for the
replica-construction semantics (selectivity-preserving, dims 1×).

Usage: python tools/gen_scale10.py [outdir]   (default /tmp/scale_sf1)
"""

from __future__ import annotations

import sys
from pathlib import Path

import gen_scale


def main(out: Path) -> None:
    gen_scale.main(out, 10)


if __name__ == "__main__":
    main(Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/tmp/scale_sf1"))
