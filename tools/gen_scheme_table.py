"""Generate the per-scheme order table for PARITY.md from the SDE registry.

The table in PARITY.md ("SDE scheme registry" section) is THIS script's
output — regenerate and paste after any registry change:

    JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/gen_scheme_table.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from paddlexde_tpu.functional.sde_schemes.registry import (
        SDE_SCHEMES, canonical_sde_scheme_names,
    )

    rows = [
        "| scheme | noise | calculus | strong | weak | bm needs | adaptive "
        "exponent | knobs | event-capable | aliases |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for name in canonical_sde_scheme_names():
        s = SDE_SCHEMES[name]
        noise = s.noise + (" (additive)" if s.additive_only else "")
        weak = "—(pass order=)" if s.weak_order is None else f"{s.weak_order:g}"
        rows.append(
            f"| `{s.name}` | {noise} | {s.calculus} | {s.strong_order:g} "
            f"| {weak} | {s.levy} | {s.local_order:g} "
            f"| {', '.join(s.knobs) or '—'} "
            f"| {'yes' if s.pathwise else 'no'} "
            f"| {', '.join(s.aliases) or '—'} |"
        )
    print("\n".join(rows))


if __name__ == "__main__":
    main()
