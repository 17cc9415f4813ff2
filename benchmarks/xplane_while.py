"""Shared xplane helper: extract per-variant ``%while`` (lax.scan) durations.

Both kernel shootouts (conv_kernel_bench.py, gn_bwd_bench.py) time one scan
per variant and attribute trace ``%while`` ops to variants positionally (the
variants execute in order under one ``jax.profiler.trace``).  The fairness of
both verdicts rests on this attribution logic being identical, so it lives in
one place.
"""

import glob
import os


def extract_while_durations(outdir, expected_names):
    """Newest trace under ``outdir`` -> [(name, duration_s)] in execution order.

    Raises SystemExit unless exactly ``len(expected_names)`` ``%while`` ops are
    found (more would make positional attribution silently wrong — e.g. XLA
    emitting a nested while).
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(
        glob.glob(os.path.join(outdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise SystemExit(f"no .xplane.pb trace found under {outdir}")
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())
    whiles = []
    for plane in xspace.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                if name.startswith("%while"):
                    whiles.append((ev.offset_ps, name, ev.duration_ps / 1e12))
    whiles.sort()
    names = list(expected_names)
    if len(whiles) != len(names):
        raise SystemExit(
            f"expected {len(names)} %while ops (one per variant) in the trace, "
            f"found {len(whiles)} — positional attribution would be wrong: "
            + "; ".join(w[1].split(" = ")[0] for w in whiles)
        )
    return [(wname, dur) for (_off, wname, dur) in whiles]
