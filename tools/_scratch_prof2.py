import sys, glob, collections, re
sys.path.insert(0, "/root/repo/tools")
from tensorflow.tsl.profiler.protobuf import xplane_pb2

xs = xplane_pb2.XSpace()
with open(glob.glob("/tmp/jaxtrace/**/*.xplane.pb", recursive=True)[0], "rb") as f:
    xs.ParseFromString(f.read())
plane = [p for p in xs.planes if p.name.startswith("/device:TPU")][0]
emeta = {m.id: m.name for m in plane.event_metadata.values()}
agg, cnt, sample = collections.Counter(), collections.Counter(), {}
opre = re.compile(r"^%?([\w.\-]+) = \S+ (\w+)\(")
for line in plane.lines:
    if line.name != "XLA Ops":
        continue
    for ev in line.events:
        name = emeta.get(ev.metadata_id, "?")
        m = opre.match(name)
        if m is None: continue
        opname, opcode = m.group(1), m.group(2)
        if opcode in ("while", "call", "conditional"): continue
        key = opname  # full instruction name, instances aggregated
        agg[key] += ev.duration_ps / 1e9
        cnt[key] += 1
        sample[key] = name[:180]
for k, ms in agg.most_common(20):
    print(f"{ms:8.2f} ms n={cnt[k]:5d} {k}")
    print(f"          {sample[k][:170]}")
