"""Aggregate device-side op times from a jax.profiler xplane trace.

Usage: python profiling/parse_trace.py /tmp/prof_dir [top_n]
Prints total device time and the top ops by accumulated duration.
"""
import glob
import sys
from collections import defaultdict

try:
    from xprof.protobuf import xplane_pb2
except ImportError:  # this image ships the proto under tensorflow/tsl
    from tensorflow.tsl.profiler.protobuf import xplane_pb2


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    xspace = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    acc = defaultdict(lambda: [0.0, 0])
    total = 0.0
    for plane in xspace.planes:
        name = plane.name.lower()
        if not ("tpu" in name or "gpu" in name or "device" in name
                or "axon" in name):
            continue
        if "host" in name:
            continue
        ev_names = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            lname = line.name.lower()
            # only XLA op lines (skip step/annotation lines)
            if "xla op" not in lname and "ops" not in lname:
                continue
            for ev in line.events:
                n = ev_names.get(ev.metadata_id, "?")
                dur = ev.duration_ps / 1e9   # ms
                acc[n][0] += dur
                acc[n][1] += 1
                total += dur
    rows = sorted(acc.items(), key=lambda kv: -kv[1][0])
    print(f"total device op time: {total:.3f} ms over {len(rows)} distinct ops")
    for n, (dur, cnt) in rows[:top_n]:
        print(f"{dur:9.3f} ms  x{cnt:5d}  {n[:110]}")


if __name__ == "__main__":
    main()
