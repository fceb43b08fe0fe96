"""Optional matplotlib plotting for examples (the reference emits SVG/PNG
via plotters/image; here --plot saves PNGs next to the script)."""

import os
import sys


def enabled() -> bool:
    return "--plot" in sys.argv or os.environ.get("TOTSU_PLOT") == "1"


def save(fig, name: str):
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), name)
    fig.savefig(out, dpi=110, bbox_inches="tight")
    print(f"  plot saved: {out}")
