"""Parse a jax profiler xplane.pb into per-op time tables (needs
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python)."""

import glob
import json
import sys


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vb_profile"
    xplanes = glob.glob(outdir + "/**/*.xplane.pb", recursive=True)
    assert xplanes, outdir
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    for tool in ("framework_op_stats", "op_profile", "hlo_stats"):
        try:
            data = raw_to_tool_data.xspace_to_tool_data(xplanes, tool, {})
            blob = data[0] if isinstance(data, tuple) else data
            if isinstance(blob, bytes):
                blob = blob.decode("utf-8", errors="replace")
            path = f"{outdir}/{tool}.json"
            with open(path, "w") as f:
                f.write(blob if isinstance(blob, str) else json.dumps(blob))
            print(f"wrote {path} ({len(blob)} bytes)")
        except Exception as e:
            print(f"{tool} failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
