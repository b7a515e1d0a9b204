"""Device-trace profiling helpers (the perf-claim backbone).

Wraps ``jax.profiler.trace`` + ``jax.profiler.ProfileData`` to turn a traced
run into numbers a benchmark can print: per-module device time (what the
chip actually spent, independent of host/tunnel overhead — the axon
transport adds ~1.2 ms/dispatch and its ``block_until_ready`` does not
block, so wall-clock alone overstates device cost) and a per-op breakdown
for finding bottlenecks.

The reference measures wall-clock fps only (tools/analysis_tools/
benchmark.py:96-126); we report both wall-clock and profiler device time.
"""
from __future__ import annotations

import glob
import os
import re
import tempfile
from collections import defaultdict
from typing import Callable, Dict, Optional

import jax

_OP_RE = re.compile(r"^%([\w.\-]+)")


def trace_device(run: Callable[[], None], trace_dir: Optional[str] = None,
                 collapse: bool = True) -> Dict:
    """Run ``run()`` under a profiler trace and aggregate device activity.

    Returns a dict:
      modules: {module_name: [duration_ms, ...]} one entry per execution,
        in time order (module_name is the jit function name).
      ops: {op_short_name: total_ms} summed over the whole trace
        ("XLA Ops" line; async ops are counted on their sync line only).
      op_events: {op_short_name: count}.
      op_hlo: {op_short_name: full HLO event name} — only when
        ``collapse=False`` (keeps per-op identity: fusion.123 stays
        distinct; the HLO text carries shapes/layouts/operand names,
        which attribute the fused op back to model code — parameter
        names survive as e.g. %variables__params____img_encoder__...).
    """
    if trace_dir is None:
        tmp = tempfile.mkdtemp(prefix="dhd_trace_")
    else:
        tmp = trace_dir
        os.makedirs(tmp, exist_ok=True)
    with jax.profiler.trace(tmp):
        run()
    files = sorted(glob.glob(os.path.join(tmp, "**", "*.xplane.pb"),
                             recursive=True))
    if not files:
        raise RuntimeError(f"no xplane.pb produced under {tmp}")
    pd = jax.profiler.ProfileData.from_file(files[-1])

    modules: Dict[str, list] = defaultdict(list)
    ops: Dict[str, float] = defaultdict(float)
    op_events: Dict[str, int] = defaultdict(int)
    op_hlo: Dict[str, str] = {}
    for plane in pd.planes:
        if "/device:TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name == "XLA Modules":
                evs = sorted(line.events,
                             key=lambda e: dict(e.stats).get(
                                 "device_offset_ps", 0))
                for e in evs:
                    # strip the fingerprint: jit_step(123...) -> jit_step
                    name = e.name.split("(")[0]
                    modules[name].append(e.duration_ns / 1e6)
            elif line.name == "XLA Ops":
                for e in line.events:
                    m = _OP_RE.match(e.name)
                    key = m.group(1) if m else e.name[:40]
                    if collapse:
                        # collapse SSA numbering: fusion.123 -> fusion
                        key = re.sub(r"\.\d+$", "", key)
                    elif key not in op_hlo:
                        op_hlo[key] = e.name
                    ops[key] += e.duration_ns / 1e6
                    op_events[key] += 1
    return {"modules": dict(modules), "ops": dict(ops),
            "op_events": dict(op_events), "op_hlo": op_hlo,
            "trace_dir": tmp}


def module_ms(prof: Dict, name_substr: str, drop_first: int = 0
              ) -> Optional[float]:
    """Mean device ms/execution of the module whose name contains
    ``name_substr`` (e.g. 'step'), optionally dropping warmup runs."""
    for name, durs in prof["modules"].items():
        if name_substr in name:
            durs = durs[drop_first:] if len(durs) > drop_first else durs
            if durs:
                return sum(durs) / len(durs)
    return None


def top_ops(prof: Dict, n: int = 25):
    """[(op_name, total_ms, count)] sorted by total device time."""
    rows = [(k, v, prof["op_events"].get(k, 0))
            for k, v in prof["ops"].items()]
    rows.sort(key=lambda r: -r[1])
    return rows[:n]
