"""Aggregate XLA-op self-times from a jax.profiler xplane trace.

Groups the 'XLA Ops' line of the TPU device plane by op category and by
fusion name, printing the top entries — the op-level profile used by the
perf work (VERDICT round 1 item 1).

Usage: python scripts/parse_trace.py [/tmp/jax_trace] [-k 40]
"""
import collections
import glob
import re
import sys


def load_events(logdir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    path = sorted(glob.glob(f"{logdir}/plugins/profile/*/*.xplane.pb"))[-1]
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    plane = next(p for p in xs.planes if p.name == "/device:TPU:0")
    events = []
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            md = plane.event_metadata[ev.metadata_id]
            events.append((md.name, ev.duration_ps / 1e6))  # us
    return events


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace"
    k = 45
    events = load_events(logdir)
    tot = sum(d for _, d in events)
    by_name = collections.Counter()
    counts = collections.Counter()
    for name, d in events:
        by_name[name] += d
        counts[name] += 1
    print(f"total device op time: {tot/1e3:.2f} ms over {len(events)} events")
    print(f"{'ms':>9} {'%':>5} {'calls':>6}  op")
    for name, d in by_name.most_common(k):
        print(f"{d/1e3:9.3f} {100*d/tot:5.1f} {counts[name]:6d}  {name[:110]}")

    # rough category rollup from op-name prefixes
    cats = collections.Counter()
    for name, d in events:
        m = re.match(r"%?([a-zA-Z-]+)", name)
        cats[m.group(1) if m else "?"] += d
    print("\nby category:")
    for c, d in cats.most_common(20):
        print(f"{d/1e3:9.3f} {100*d/tot:5.1f}  {c}")


if __name__ == "__main__":
    main()
