"""Self-time (exclusive) XLA-op profile from a jax.profiler xplane trace.

The 'XLA Ops' line nests while-op events over their body ops; this computes
exclusive self-time per event via interval nesting, then aggregates by op
and by enclosing while-region, giving the true cost breakdown.

Usage: python scripts/parse_trace_self.py [/tmp/jax_trace]
"""
import collections
import glob
import sys


def load_line(logdir, line_name="XLA Ops"):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    path = sorted(glob.glob(f"{logdir}/plugins/profile/*/*.xplane.pb"))[-1]
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    plane = next(p for p in xs.planes if p.name == "/device:TPU:0")
    for line in plane.lines:
        if line.name == line_name:
            evs = []
            for ev in line.events:
                md = plane.event_metadata[ev.metadata_id]
                evs.append((ev.offset_ps, ev.duration_ps, md.name))
            return evs
    return []


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace"
    evs = load_line(logdir)
    evs.sort(key=lambda e: (e[0], -e[1]))

    self_t = collections.Counter()
    n_calls = collections.Counter()
    region = collections.Counter()   # self time grouped by innermost while
    stack = []                       # [end_ps, name, self_acc, enclosing]
    records = []
    for off, dur, name in evs:
        while stack and off >= stack[-1][0]:
            records.append(stack.pop())
        enc = tuple(n.split(" = ")[0] for _, n, _, _ in stack
                    if n.startswith("%while"))
        if name.startswith("%while"):
            enc = enc + (name.split(" = ")[0],)
        stack.append([off + dur, name, [dur], enc])
        if len(stack) > 1:
            stack[-2][2][0] -= dur
    while stack:
        records.append(stack.pop())

    for _, name, acc, enc in records:
        self_t[name] += acc[0]
        n_calls[name] += 1
        region[enc[-1] if enc else "(top)"] += acc[0]

    tot = sum(self_t.values())
    print(f"total self time: {tot/1e9:.2f} ms")
    print("\n== self time by innermost while region ==")
    for r, d in region.most_common(12):
        print(f"{d/1e9:9.2f} ms {100*d/tot:5.1f}%  {r}")
    print("\n== top ops by self time ==")
    print(f"{'ms':>9} {'%':>5} {'calls':>6}  op")
    for name, d in self_t.most_common(50):
        print(f"{d/1e9:9.3f} {100*d/tot:5.1f} {n_calls[name]:6d}  {name[:120]}")


if __name__ == "__main__":
    main()
