"""Audit physical copy/transpose ops in the compiled train step's HLO.

Round-3 roadmap item: ViT-L under remat showed ~1.5 ms of layout copies
around the fused attention kernel's ``[D, 3, D]`` QKV weights (since restructured to ``[3, D, D]``)
(docs/BENCHMARKS.md "Saved-residual layout").  This tool compiles the
exact bench.py train step (no execution — AOT lower+compile only) and
tallies every ``copy``/``transpose`` instruction by shape and byte count,
so a layout change can be judged on evidence instead of HLO folklore.

Usage: python tools/layout_copies.py [batch] [model] [--no-remat]
       python tools/layout_copies.py --from-dump /path/to/hlo.txt
"""

from __future__ import annotations

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1, "pred": 1}

# e.g. `%transpose.503 = s32[64,32]{1,0:T(8,128)} transpose(%reshape.2654)`
# The layout braces can hold tiling specs with parens: {2,1,0:T(8,128)(2,1)}.
_SHAPE_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*(\w+)\[([\d,]*)\](?:\{[^{}]*\})?\s+(copy|transpose)\(")

# Async copies XLA schedules for overlap: the copy-start's output is a tuple
# whose FIRST element is the destination shape.  Count starts only (the
# paired copy-done moves no additional bytes) — without this, exactly the
# largest copies (the ones worth fixing) vanish from the tally.
_ASYNC_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*\((\w+)\[([\d,]*)\](?:\{[^{}]*\})?[,)].*\s(copy-start)\(")


def audit(hlo_text: str):
    """Return {(op, dtype, dims): (count, total_bytes)} for copy/transpose ops."""
    tally = defaultdict(lambda: [0, 0])
    for line in hlo_text.splitlines():
        m = _SHAPE_RE.match(line) or _ASYNC_RE.match(line)
        if not m:
            continue
        dtype, dims_s, op = m.groups()
        dims = tuple(int(d) for d in dims_s.split(",")) if dims_s else ()
        n = 1
        for d in dims:
            n *= d
        nbytes = n * _DTYPE_BYTES.get(dtype, 4)
        key = (op, dtype, dims)
        tally[key][0] += 1
        tally[key][1] += nbytes
    return tally


def main(batch_size: int, model_name: str, remat: bool):
    # The EXACT bench.py program (shared builder — the audited HLO must
    # never drift from the benched step).
    from bench import build_bench_step

    step_fn, state, images, tokens, _ = build_bench_step(batch_size, model_name, remat)

    print(f"compiling {model_name} batch={batch_size} remat={remat} ...", flush=True)
    compiled = step_fn.lower(state, images, tokens).compile()
    text = compiled.as_text()
    print(f"HLO chars: {len(text)}")
    dump = os.environ.get("FLYP_HLO_DUMP")
    if dump:
        with open(dump, "w") as f:
            f.write(text)
        print(f"HLO dumped to {dump}")

    report(text)


def report(text: str):
    tally = audit(text)
    rows = sorted(tally.items(), key=lambda kv: -kv[1][1])
    total = sum(b for _, (_, b) in rows)
    print(f"total copy/transpose traffic (write side): {total / 1e6:.1f} MB")
    print(f"{'op':<10} {'dtype':<6} {'shape':<24} {'count':>6} {'MB':>10}")
    for (op, dtype, dims), (count, nbytes) in rows[:25]:
        print(f"{op:<10} {dtype:<6} {str(dims):<24} {count:>6} {nbytes / 1e6:>10.2f}")


if __name__ == "__main__":
    if "--from-dump" in sys.argv:
        path = sys.argv[sys.argv.index("--from-dump") + 1]
        with open(path) as f:
            report(f.read())
        sys.exit(0)
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    bs = int(args[0]) if args else 64
    name = args[1] if len(args) > 1 else "ViT-L/14"
    remat = "--no-remat" not in sys.argv and name.startswith("ViT-L")
    main(bs, name, remat)
