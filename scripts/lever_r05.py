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
    # the BENCH headline config (bench.py main primary tuple): unrolled
    # layers, fused xent + fast dropout, erf gelu via the fast-erf path
    HEAD = dict(scan_layers=False, fused_mlm_xent=True, fast_dropout=True)

    def point(label, batch=96, **over):
        try:
            rate = bench.measure(batch, **{**HEAD, **over})
        except Exception as e:
            msg = str(e).splitlines()[0][:140]
            rows.append({"lever": label, "batch": batch, "error": msg})
            print(f"# {label}: ERROR {msg}", file=sys.stderr)
            return None
        rows.append({"lever": label, "batch": batch,
                     "pairs_per_s": round(rate, 1)})
        print(f"# {label}: {rate:.1f} pairs/s", file=sys.stderr)
        return rate

    point("baseline_b96")
    point("ffn_save_dact", ffn_save_dact=True)
    point("batch_192", batch=192)
    point("batch_192_remat", batch=192, remat=True)
    point("baseline_b96_again")  # same-session variance anchor

    out = {"levers": rows, "baseline_pairs_per_s": rows[0]["pairs_per_s"]}
    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
