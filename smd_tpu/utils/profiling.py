"""TPU op-level profiling helpers.

Wraps ``jax.profiler`` trace capture plus an offline xplane parser so a
benchmark can answer "where does the step time go" without TensorBoard.
Used to drive the serving-path optimization in docs/DESIGN.md (op_profile
revealed the Pallas attention kernel and int8 quant/dequant passes as the
regressions). The reference has no profiling story at all; this is part of
the framework's observability layer (SURVEY.md §5).

Parsing needs the ``xprof`` package (bundled with tensorboard-plugin-profile)
and pure-python protobuf (set ``PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=
python`` before importing TF-adjacent modules if the fast proto runtime is
incompatible, as in this image).
"""
from __future__ import annotations

import contextlib
import glob
import json
import os

__all__ = ["trace", "op_profile", "format_op_profile"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Context manager: capture a jax profiler trace into ``log_dir``."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def _find_xplane(log_dir: str) -> str:
    paths = sorted(glob.glob(
        os.path.join(log_dir, "plugins/profile/*/*.xplane.pb")))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {log_dir}")
    return paths[-1]


def op_profile(log_dir: str, program_prefix: str = "jit_"):
    """Parse the latest trace under ``log_dir`` into a per-category table.

    Returns ``(total_ms, rows)`` where rows are dicts with ``category``,
    ``ms`` (device time for the traced span), ``occurrences``, and ``top``
    (the heaviest fusions inside the category). ``total_ms`` covers the
    largest traced program whose name starts with ``program_prefix``.
    """
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([_find_xplane(log_dir)],
                                      "op_profile", {})
    d = json.loads(data)
    programs = [c for c in d["byProgramExcludeIdle"]["children"]
                if c["name"].startswith(program_prefix)]
    if not programs:
        raise ValueError(
            f"no traced program starts with {program_prefix!r}; found "
            f"{[c['name'] for c in d['byProgramExcludeIdle']['children']]}")
    prog = max(programs, key=lambda c: c["metrics"]["rawTime"])
    total_ms = prog["metrics"]["rawTime"] / 1e9
    rows = []
    for c in sorted(prog["children"], key=lambda c: -c["metrics"]["rawTime"]):
        m = c["metrics"]
        rows.append({
            "category": c["name"],
            "ms": m["rawTime"] / 1e9,
            "occurrences": m.get("occurrences", 0),
            "top": [(cc["name"], cc["metrics"]["rawTime"] / 1e9)
                    for cc in sorted(c.get("children", []),
                                     key=lambda x: -x["metrics"]["rawTime"])
                    [:5]],
        })
    return total_ms, rows


def format_op_profile(total_ms: float, rows, steps: int = 1) -> str:
    """Human-readable table; pass ``steps`` to normalize per step."""
    lines = [f"total {total_ms / steps:.3f} ms/step"]
    for r in rows:
        if r["ms"] / steps < 1e-3:
            continue
        lines.append(f"  {r['ms'] / steps:8.3f} ms  "
                     f"x{r['occurrences'] / steps:5.1f}  {r['category']}")
        for name, ms in r["top"]:
            if ms / steps < 5e-3:
                continue
            lines.append(f"      {ms / steps:8.3f} ms  {name}")
    return "\n".join(lines)
