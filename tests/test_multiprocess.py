"""Real multi-host data path: a 2-process ``jax.distributed`` CPU launch
(localhost coordinator, gloo collectives) running the SAME production
``fit`` loop with per-host half-batches must reproduce the single-process
run — per-epoch train/val metrics equal to fp32-reduction tolerance, and
orbax checkpoints written collectively to one directory.

The reference's parallelism tops out at single-process DataParallel
(``visualbert/models/model_wrapper.py:146``); this is the TPU-pod analogue
tested without a pod (SURVEY.md §4)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multiproc_worker.py")


def _run(args, timeout=420):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    return subprocess.Popen(
        [sys.executable, WORKER, *args],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
    )


@pytest.mark.slow
def test_two_process_fit_matches_single(tmp_path):
    single_out = str(tmp_path / "single.json")
    multi_out = str(tmp_path / "multi.json")
    ckpt = str(tmp_path / "ckpt")

    p_single = _run(["single", "0", "0", single_out])
    port = "12973"
    p0 = _run(["multi", "0", port, multi_out, ckpt])
    p1 = _run(["multi", "1", port, multi_out, ckpt])
    logs = {}
    for name, p in (("single", p_single), ("multi0", p0), ("multi1", p1)):
        out, _ = p.communicate(timeout=420)
        logs[name] = out
        assert p.returncode == 0 and "WORKER_OK" in out, (name, out[-2000:])

    single = json.load(open(single_out))
    multi0 = json.load(open(multi_out + ".0"))
    multi1 = json.load(open(multi_out + ".1"))

    assert single["final_step"] == multi0["final_step"] == multi1["final_step"]
    for e, (s, m0, m1) in enumerate(
        zip(single["history"], multi0["history"], multi1["history"])
    ):
        assert s.keys() == m0.keys() == m1.keys()
        for k in s:
            # identical global program + global batches; only collective
            # reduction order differs → fp32 tolerance
            np.testing.assert_allclose(m0[k], s[k], rtol=0, atol=5e-6,
                                       err_msg=f"epoch {e} {k} (proc 0)")
            np.testing.assert_allclose(m1[k], s[k], rtol=0, atol=5e-6,
                                       err_msg=f"epoch {e} {k} (proc 1)")
        # accuracies are exact counts — must match bitwise
        assert m0["train_accuracy"] == s["train_accuracy"]
        assert m0["val_accuracy"] == s["val_accuracy"]

    # collective orbax checkpointing into ONE directory: numbered + best
    entries = set(os.listdir(ckpt))
    assert "best" in entries
    assert any(e.startswith("step_") for e in entries)
