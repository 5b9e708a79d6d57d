"""Round-5 lever campaign on the last two above-floor roofline buckets
(VERDICT r4 item 4): dX composites (11.56 vs ~9.8 ms floor) and FFN-bwd
(9.34 vs 7.1). Levers, each measured against a same-session baseline at the
headline config (erf gelu, batch 96, K=60 unroll=3):

  * ffn_save_dact — save post-act + analytic gelu' in fwd (shares the A&S
    erf chain's exp) so FFN-bwd's dpreact is a pure multiply; trades one
    extra [N,3072] bf16 HBM round-trip for the erf-chain recompute tail.
    Gradients bit-equal to default (tested on CPU).
  * batch 192 / 256 — amortize fixed VPU/reduce work per step over more
    rows (the r4 ask names this for the dX bucket; 144/192 were neutral at
    the r3 config, re-measured here at the current program).

Usage: python scripts/lever_r05.py [--json OUT]
"""
import argparse
import json
import sys

sys.path.insert(0, ".")

import bench


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    rows = []

    def point(label, batch=96, **over):
        rate = bench.measure(batch, **over)
        per_pair = rate if batch == 96 else rate  # pairs/s/chip already
        rows.append({"lever": label, "batch": batch,
                     "pairs_per_s": round(rate, 1)})
        print(f"# {label}: {rate:.1f} pairs/s", file=sys.stderr)
        return rate

    base = point("baseline_b96")
    point("ffn_save_dact", ffn_save_dact=True)
    point("batch_192", batch=192)
    point("batch_256", batch=256)

    out = {"levers": rows, "baseline_pairs_per_s": rows[0]["pairs_per_s"]}
    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
