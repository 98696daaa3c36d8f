import glob, sys, collections
sys.path.insert(0, "/opt/venv/lib/python3.12/site-packages")
from tensorflow.tsl.profiler.protobuf import xplane_pb2
paths = glob.glob("/tmp/kdt_trace/**/*.xplane.pb", recursive=True)
import os
xspace = xplane_pb2.XSpace()
with open(max(paths, key=os.path.getmtime), "rb") as f:
    xspace.ParseFromString(f.read())
for plane in xspace.planes:
    if "TPU" not in plane.name:
        continue
    ev_names = {m.id: m.name for m in plane.event_metadata.values()}
    # find events matching fusion.4195 style and print full metadata
    stats_meta = {m.id: m.name for m in plane.stat_metadata.values()}
    seen = set()
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            name = ev_names.get(ev.metadata_id, "")
            short = name.split(" = ")[0]
            if short in ("%fusion.4195", "%fusion.4200", "%multiply_add_fusion.110") and short not in seen:
                seen.add(short)
                print("=== ", name[:200])
                for st in ev.stats:
                    sname = stats_meta.get(st.metadata_id, "")
                    val = st.str_value or st.bytes_value
                    if sname in ("hlo_op", "tf_op", "hlo_module", "source_info", "name", "long_name", "hlo_category", "provenance"):
                        print("   ", sname, ":", str(val)[:300])
