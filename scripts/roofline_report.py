"""Digest an xplane trace of the bench train step into the semantic roofline
buckets used in BASELINE.md — with NO unitemized remainder.

Usage: python scripts/roofline_report.py <logdir> [K_steps]
(K defaults to the k_steps.txt that profile_step.py writes into the logdir,
falling back to 10 for traces captured without it)

Maps every device op group (``xplane_op_summary``) onto a named bucket by
HLO-signature pattern; whatever matches nothing is listed explicitly under
"other (itemized)" so the table always sums to the trace's total device
time. Run after ``scripts/profile_step.py <logdir>`` (which captures K
steps of the bench configuration — it records its K in k_steps.txt).

The bucket patterns hard-code the bert-base bench geometry (H=768, F=3072,
QKV=2304): that is the program BASELINE.md itemizes. Profiling another
geometry still sums correctly — unmatched groups land in "other
(itemized)" — but the named buckets need their shapes extended.
"""

import re
import sys

sys.path.insert(0, ".")

from visualbert_tpu.utils.profiling import xplane_op_summary

# (bucket, regex over "prefix shape") — first match wins; \d+ wildcards keep
# these robust to batch/seq changes. Order matters: specific before general.
BUCKETS = [
    ("weight-grad matmuls (+fused per-tensor grad sumsq)", r"^%fusion \(f32\[\]"),
    ("attention bwd kernel (dQKV + db partials)", r"^%attention \(bf16\[\d+,\d+,2304\]"),
    ("attention bwd kernel (dQKV)", r"^%attention (bf16|f32)\["),
    ("attention fwd kernel (O + stats)", r"^%attention \("),
    ("QKV projection (fwd matmul, bias deferred)", r"^%fusion \(?bf16\[\d+,\d+,2304\]"),
    ("dX matmuls + dropout+LN-recompute composites", r"^%fusion \(f32\[\d+,\d+\]"),
    ("FFN bwd: db1 + dpreact (gelu' recompute)", r"^%fusion \(bf16\[\d{4}\]"),
    ("FFN fwd: W1 matmul + gelu epilogue", r"^%fusion \(?bf16\[\d+,\d+,(3072|\d{4})\]"),
    ("fwd matmul+dropout+LN composites (attn-out, W2)", r"^%fusion bf16\[\d+,\d+,768\]"),
    ("QKV projection (fwd matmul+bias)", r"^%convolution_add_fusion"),
    ("attn-out/W2 bwd dbias+convert epilogues", r"^%fusion \(bf16\[768\]"),
    ("QKV dbias reduce", r"^%reduce bf16\[2304\]"),
    ("LayerNorm dgamma/dbeta", r"^%fusion \(f32\[768\]"),
    ("MLM-xent Pallas kernels (fwd/bwd/decoder dW)", r"^%cls"),
    ("BertAdam fused updates (m,v,p (+nan-guard select))", r"^%multiply_add_fusion \(f32"),
    ("dropout mask kernels", r"^%_mask_impl"),
    ("residual adds / converts", r"^%(add_convert_fusion|convert_element_type)"),
    ("loss/metric + grad-norm reductions", r"^%(multiply_reduce_fusion|convert_reduce_fusion)"),
    ("layout copies + DMA waits", r"^%(copy|copy-done|slice-done|bitcast|pad|reshape)"),
    ("embedding grads (scatter/sort/take)", r"^%(sort|scatter|select_add_fusion|dynamic-update)"),
    ("PRNG", r"^%(rng-bit-generator|fusion \(u32|select_reduce_fusion \(u32)"),
]


def main():
    import os

    logdir = sys.argv[1]
    if len(sys.argv) > 2:
        k = int(sys.argv[2])
    else:
        try:
            with open(os.path.join(logdir, "k_steps.txt")) as f:
                k = int(f.read().strip())
        except OSError:
            k = 10
    rows = xplane_op_summary(logdir, top_n=100000)
    total = sum(ms for _, ms, _ in rows)
    bucket_ms = {b: 0.0 for b, _ in BUCKETS}
    bucket_n = {b: 0 for b, _ in BUCKETS}
    other = []
    for group, ms, n in rows:
        for b, pat in BUCKETS:
            if re.search(pat, group):
                bucket_ms[b] += ms
                bucket_n[b] += n
                break
        else:
            other.append((group, ms, n))
    print(f"| bucket | ms/step | ops/step |")
    print(f"|---|---|---|")
    shown = 0.0
    for b, _ in BUCKETS:
        if bucket_ms[b] == 0:
            continue
        print(f"| {b} | {bucket_ms[b]/k:.2f} | {bucket_n[b]//k} |")
        shown += bucket_ms[b]
    other_ms = sum(ms for _, ms, _ in other)
    print(f"| other (itemized below) | {other_ms/k:.2f} | {sum(n for _,_,n in other)//k} |")
    print(f"| **total device self-time** | **{total/k:.2f}** | |")
    print()
    other.sort(key=lambda r: -r[1])
    for group, ms, n in other[:15]:
        print(f"  other: {ms/k:6.3f} ms/step {n//k:4d}/step  {group[:80]}")
    rest = sum(ms for _, ms, _ in other[15:])
    if rest:
        print(f"  other: {rest/k:6.3f} ms/step       (tail of {len(other)-15} groups)")


if __name__ == "__main__":
    main()
