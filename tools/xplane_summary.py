"""Summarise a TPU xplane trace: per-op time, bucketed by HLO kind.

Parses the ``*.xplane.pb`` written by ``jax.profiler`` (e.g. via
``tools/trace_forward.py`` or ``tools/diagnose_vjp_anomaly.py --trace-dir``)
using the TF profiler protos available in this image, and prints

* total device XLA-op time per iteration,
* a bucket table (conv fusions, pure copies, reshapes/pads, Pallas
  custom-calls, reduces, other fusions),
* the largest individual ops and the largest pure layout copies.

The r3 copy audit (``docs/roofline.md``) used this to establish that layout
copies were 23 % of the flagship forward.

Usage: python tools/xplane_summary.py <path/to/*.xplane.pb> [iters]
"""

from __future__ import annotations

import collections
import re
import sys


def summarize(path: str, iters: float = 1.0, top: int = 25) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # TF baked in

    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if plane.name != "/device:TPU:0":
            continue
        ev_meta = plane.event_metadata
        stats: collections.Counter = collections.Counter()
        total = 0.0
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                dur = ev.duration_ps / 1e9 / iters  # ms
                stats[name] += dur
                total += dur

        def kind_of(name: str) -> str:
            rhs = name.split(" = ", 1)[1] if " = " in name else ""
            m = re.search(r"\}\s+([a-z\-_]+)\(", rhs)
            return m.group(1) if m else "?"

        buckets: collections.Counter = collections.Counter()
        for name, ms in stats.items():
            kind = kind_of(name)
            rhs = name.split(" = ", 1)[1] if " = " in name else ""
            if kind == "custom-call":
                b = "pallas-custom-call"
            elif kind in ("copy", "copy-start", "copy-done"):
                b = "copy"
            elif kind in ("reshape", "bitcast", "transpose", "pad", "slice"):
                b = "reshape/pad"
            elif kind == "fusion":
                # conv fusions are recognisable by a small-kernel weight operand
                if re.search(r"\b(bf16|f32)\[(\d,\d,\d|8,8,8),\d+,\d+\]", rhs) or \
                   re.search(r"\[(3,3,3|5,5,5|7,7,7|8,8,8),", rhs):
                    b = "conv-fusion"
                elif "reduce" in name.split(" = ")[0]:
                    b = "reduce-fusion"
                else:
                    b = "other-fusion"
            elif kind == "convolution":
                b = "conv-raw"
            else:
                b = "op:" + kind
            buckets[b] += ms

        print(f"total XLA-op time {total:.1f} ms/iter")
        for b, ms in buckets.most_common():
            print(f"  {ms:8.2f} ms  {b}")

        print("\nlargest ops:")
        for name, ms in stats.most_common(top):
            print(f"  {ms:8.2f} ms  {name[:140]}")

        print("\nlargest pure copies:")
        shown = 0
        for name, ms in stats.most_common(500):
            if kind_of(name) == "copy" and ms > 0.3:
                print(f"  {ms:7.2f} ms  {name[:130]}")
                shown += 1
                if shown >= top:
                    break


if __name__ == "__main__":
    summarize(sys.argv[1], float(sys.argv[2]) if len(sys.argv) > 2 else 1.0)
