#!/usr/bin/env python
"""Compare the current BENCH_DETAIL.json against a recorded round's
driver bench (BENCH_rNN.json, parsed form) on their common query set:
per-query ratios + median drift. The round-9 comparability check —
cohort JVMs should hold the long-stable common set near its round-7
(pre-pressure) walls round over round.

    python scripts/bench_compare.py BENCH_r07.json [BENCH_DETAIL.json]
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    ref_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_r07.json"
    cur_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_DETAIL.json"
    ref = json.load(open(ref_path))
    ref_q = (ref.get("parsed") or ref)["queries"]
    cur_q = json.load(open(cur_path))["queries"]
    common = sorted(set(ref_q) & set(cur_q))
    ratios = {
        k: cur_q[k] / ref_q[k] for k in common if ref_q[k] and ref_q[k] > 0
    }
    med = statistics.median(ratios.values())
    drift = sorted(ratios.items(), key=lambda kv: kv[1])
    print(f"common set: {len(common)} queries vs {ref_path}")
    print(
        f"median ratio {med:.3f} (median drift {100 * (med - 1):+.1f}%); "
        f"ref total {sum(ref_q[k] for k in common):.1f}s -> "
        f"cur total {sum(cur_q[k] for k in common):.1f}s"
    )
    print("5 fastest-vs-ref:", [(k, round(v, 2)) for k, v in drift[:5]])
    print("5 slowest-vs-ref:", [(k, round(v, 2)) for k, v in drift[-5:]])


if __name__ == "__main__":
    main()
