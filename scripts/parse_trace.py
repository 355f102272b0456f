"""Aggregate a jax.profiler xplane trace (scripts/capture_trace.py) by op.

Reads the TPU device plane and prints total duration per op name (top N),
plus the device-busy total — the ground truth behind PERFORMANCE.md's
kernel-vs-glue decomposition (micro-benches can't see XLA's cross-op
fusion; this can).

Usage: python scripts/parse_trace.py /tmp/trace_full [topN]
"""

import glob
import re
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_full"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    paths = sorted(glob.glob(f"{root}/plugins/profile/*/*.xplane.pb"))
    assert paths, f"no xplane under {root}"
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())

    device = next((p for p in xs.planes if "TPU" in p.name and p.lines), None)
    assert device is not None, f"no TPU plane in {paths[-1]}"

    # events reference names via metadata ids
    names = {m.id: m.name for m in device.event_metadata.values()}

    def base_name(name: str) -> str:
        # '%fused_swin_block_cst.15 = bf16[...] custom-call(...)' ->
        # 'fused_swin_block_cst'; 'copy-start.606 = ...' -> 'copy-start'
        head = name.split(" = ")[0].lstrip("%")
        return re.sub(r"\.\d+$", "", head)

    for line in device.lines:
        if not line.events:
            continue
        per_op = defaultdict(lambda: [0.0, 0])
        total = 0.0
        for ev in line.events:
            ms = ev.duration_ps / 1e9
            b = base_name(names.get(ev.metadata_id, f"id{ev.metadata_id}"))
            per_op[b][0] += ms
            per_op[b][1] += 1
            total += ms
        print(f"\n== line {line.name!r}: {len(line.events)} events, "
              f"{total:.1f} ms summed (async lines overlap) ==")
        rows = sorted(per_op.items(), key=lambda kv: -kv[1][0])
        for name, (ms, n) in rows[:top_n]:
            print(f"  {ms:9.2f} ms  x{n:5d}  {name[:70]}")


if __name__ == "__main__":
    main()
