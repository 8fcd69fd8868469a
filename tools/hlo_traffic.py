"""Attribute HBM traffic per instruction in a dumped HLO module.

Parses the ENTRY computation of ``compiled.as_text()`` (dump one with
``tools/ablate_d3stn.py --dump_hlo /tmp/x.txt``), sums operand+result bytes
per instruction, and prints totals by op type plus the top instructions.
This is the honest traffic number — ``cost_analysis()['bytes accessed']``
counts fusion internals ~4x (measured 78 GB reported vs 18.5 GB entry-level
for the same program).

Usage: python tools/hlo_traffic.py /tmp/d3stn_hlo.txt [top_n]
"""

import collections
import re
import sys

DT_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1,
            "u8": 1, "pred": 1, "f64": 8, "s64": 8, "u64": 8, "s16": 2,
            "u16": 2}
SHAPE_RE = re.compile(
    r"\b(f32|bf16|f16|f64|s64|u64|s32|u32|s16|u16|s8|u8|pred)\[([0-9,]*)\]"
)


def nbytes(dt, dims):
    n = DT_BYTES[dt]
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n


def main():
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    txt = open(path).read()
    m = re.search(r"^ENTRY [^{]+\{(.*?)^\}", txt, re.S | re.M)
    if not m:
        raise SystemExit("no ENTRY computation found")
    rows = []
    for line in m.group(1).splitlines():
        line = line.strip()
        mm = re.match(r"%?([\w.\-]+) = ", line)
        if not mm:
            continue
        opm = re.search(r"= (?:\([^)]*\)|[\w\[\]{},:()* ]+?) ([a-z][\w\-]*)\(",
                        line)
        op = opm.group(1) if opm else "?"
        km = re.search(r"kind=(\w+)", line)
        kind = (":" + km.group(1)) if km else ""
        total = sum(nbytes(dt, dims) for dt, dims in SHAPE_RE.findall(line))
        rows.append((total, op + kind, line[:150]))
    rows.sort(reverse=True)
    print(f"total approx bytes: {sum(r[0] for r in rows)/1e9:.1f} GB over "
          f"{len(rows)} instructions\n\n-- by op type --")
    by_op = collections.Counter()
    for t, op, _ in rows:
        by_op[op] += t
    for k, v in by_op.most_common(20):
        print(f"{v/1e9:8.2f} GB  {k}")
    print(f"\n-- top {top_n} instructions --")
    for t, op, line in rows[:top_n]:
        print(f"{t/1e6:9.1f} MB  {op:18s} {line}")


if __name__ == "__main__":
    main()
