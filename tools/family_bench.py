"""One-SESSION family re-bench: every headline training config, one process.

RN-family rows historically carried ~±5% between-session noise while
reproducing exactly within a session (docs/BENCHMARKS.md round-3b NOTE), so
round-4's verdict asked for the family table to be re-derived in a single
chip session with paired error bars on the conv-heavy rows.  This driver
runs the five headline configs sequentially in ONE process (one chip
connection), then closes with a self-paired RN50 `--ab` (A == B == RN50)
whose per-block σ quantifies the within-session noise floor the other rows
inherit.

    python tools/family_bench.py > /tmp/family_bench.jsonl 2>/tmp/family_bench.log

Each line of stdout is one bench JSON record (same schema as bench.py).
~40 min on the tunneled chip — compiles dominate.
"""

import json
import sys

sys.path.insert(0, ".")

import bench

FAMILY = [
    (256, "ViT-B/16"),
    (512, "ViT-B/32"),
    (64, "ViT-L/14"),
    (32, "ViT-L/14@336px"),
    (256, "RN50"),
]


def run():
    records = []
    for bs, name in FAMILY:
        print(f"=== {name} bs{bs} ===", file=sys.stderr, flush=True)
        rec = bench.main(batch_size=bs, model_name=name, remat=name.startswith("ViT-L"))
        records.append(rec)
    print("=== RN50 self-paired A/B (noise floor) ===", file=sys.stderr, flush=True)
    rec = bench.main_ab("RN50", "RN50", batch_size=256)
    records.append(rec)
    return records


if __name__ == "__main__":
    run()
