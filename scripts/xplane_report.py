"""Per-op time accounting of a jax.profiler trace (thin CLI over
``visualbert_tpu.utils.profiling.xplane_op_summary``).

Usage: python scripts/xplane_report.py [logdir] [top_n]
"""

import sys

sys.path.insert(0, ".")

from visualbert_tpu.utils.profiling import xplane_op_summary


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jb_trace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    rows = xplane_op_summary(logdir, top_n=top_n)
    total = sum(ms for _, ms, _ in rows)
    print(f"top-{top_n} groups total {total:.1f} ms (excl. while wrappers)")
    for k, ms, n in rows:
        print(f"{ms:8.2f} ms {n:6d}  {k[:90]}")


if __name__ == "__main__":
    main()
