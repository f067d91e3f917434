"""Measured MSM engine parameters and routing crossovers.

Round-3 postmortem (VERDICT.md "What's weak" #3): the device window width
was a hardcoded `c = 8 if n < 2^18 else 16` guess, and the 2^18 family's
c=16 parameterization (t_rows=8, s_pad~1.05M) ran 3x SLOWER than the host.
This module replaces every such constant with a measured table:

  scripts/msm_autotune.py  measures, per padded shape family n:
      - device warm wall for each candidate window width c (8 and 16),
      - fresh-base preparation cost (native export + upload + sqrt ingest),
      - the host C++ Pippenger wall on the same inputs,
    and persists the winners to `ops/msm_tune.json` (committed, keyed by
    platform) — the same lifecycle as the AOT blobs (ops/aot.py).

  pick_params()            consults the table for the window width;
  HybridBackend routing    consults `route_to_device()` for the measured
                           device-vs-host crossover instead of 2^16/2^17
                           constants.

Role parity: arkworks' `VariableBaseMSM` picks its window from a fitted
size heuristic (ln-based); this is the TPU equivalent with the fit replaced
by on-hardware measurement (reference consumer: /root/reference/src/util.rs:19-22).
"""

from __future__ import annotations

import functools
import json
import os
import pathlib

__all__ = ["load_table", "tuned_c", "route_to_device", "record_entry",
           "table_path"]


def table_path() -> pathlib.Path:
    env = os.environ.get("CURDLEPROOFS_TUNE")
    if env:
        return pathlib.Path(env)
    return pathlib.Path(__file__).parent / "msm_tune.json"


def _platform() -> str:
    # resolved lazily: importing jax eagerly here would initialize the PJRT
    # stack in host-only processes
    import jax

    return jax.default_backend()


@functools.cache
def _load_raw() -> dict:
    p = table_path()
    if not p.is_file():
        return {}
    try:
        return json.loads(p.read_text())
    except (OSError, ValueError):
        return {}


def load_table() -> dict:
    """{n_pad(int): entry} for the current platform; {} when untuned.

    Entry fields: c, device_warm_ms, fresh_prep_ms, host_ms (floats, same
    inputs), plus the params echo (t_rows, s_pad) for the record.
    """
    raw = _load_raw().get(_platform(), {})
    return {int(k): v for k, v in raw.items()}


def tuned_c(n_pad: int) -> int | None:
    """Measured window width for this exact family, or None if untuned."""
    e = load_table().get(n_pad)
    return None if e is None else int(e["c"])


def _nearest(table: dict, n: int):
    if not table:
        return None
    key = min(table, key=lambda k: abs(k.bit_length() - n.bit_length())
              * (1 << 20) + abs(k - n))
    return key, table[key]


def route_to_device(n: int, resident: bool) -> bool | None:
    """Measured routing verdict for an n-point MSM, or None if untuned.

    Scales the nearest measured family's device/host walls linearly with n
    (both engines are ~linear in n within an octave) and compares:
        resident bases:  device_warm  vs  host
        fresh bases:     device_warm + fresh_prep  vs  host
    """
    hit = _nearest(load_table(), n)
    if hit is None:
        return None
    key, e = hit
    scale = n / key
    dev = e["device_warm_ms"] * scale
    if not resident:
        dev += e["fresh_prep_ms"] * scale
    return dev < e["host_ms"] * scale


#: Contention guard: a pass whose host wall disagrees with the committed
#: entry by more than this factor (either direction) is quarantined, not
#: written live.  The r04 postmortem (VERDICT weak #3): one contended
#: autotune pass rewrote the 2^16 host_ms 359 -> 964 ms (2.7x) and the
#: routing model snapped device_split_fraction to 1.0.
HOST_MS_GUARD = 1.5


def _agrees(a: float, b: float, factor: float = HOST_MS_GUARD) -> bool:
    if a <= 0 or b <= 0:
        return True
    r = a / b
    return 1.0 / factor <= r <= factor


def record_entry(n_pad: int, entry: dict, force: bool = False) -> str:
    """Persist one family's measurements (scripts/msm_autotune.py).

    Returns "written" or "quarantined".  A pass whose `host_ms` deviates
    >HOST_MS_GUARD x from the committed entry is stored under the committed
    entry's "pending" field instead of replacing it; a SECOND pass agreeing
    with the pending one (within the same factor) then overwrites — one
    contended pass can never corrupt the routing model alone.  `force=True`
    bypasses the guard (explicit operator intent).  Accepted passes append
    to a bounded `host_ms_history` spread so drift stays visible.
    """
    p = table_path()
    raw = {}
    if p.is_file():
        try:
            raw = json.loads(p.read_text())
        except (OSError, ValueError):
            raw = {}
    fam = raw.setdefault(_platform(), {})
    prev = fam.get(str(n_pad))
    status = "written"
    if (prev is not None and not force
            and not _agrees(entry["host_ms"], prev["host_ms"])):
        pending = prev.get("pending")
        if pending is not None and _agrees(entry["host_ms"],
                                           pending["host_ms"]):
            # two consecutive agreeing passes: the platform really moved
            entry = dict(entry)
            entry["host_ms_history"] = (
                prev.get("host_ms_history", [prev["host_ms"]])
                + [pending["host_ms"], entry["host_ms"]])[-6:]
            fam[str(n_pad)] = entry
        else:
            prev = dict(prev)
            prev["pending"] = {k: entry[k] for k in
                               ("host_ms", "device_warm_ms", "c")}
            fam[str(n_pad)] = prev
            status = "quarantined"
    else:
        entry = dict(entry)
        hist = [] if prev is None else prev.get("host_ms_history",
                                                [prev["host_ms"]])
        entry["host_ms_history"] = (hist + [entry["host_ms"]])[-6:]
        fam[str(n_pad)] = entry
    tmp = p.with_suffix(".tmp")
    tmp.write_text(json.dumps(raw, indent=1, sort_keys=True) + "\n")
    tmp.replace(p)
    _load_raw.cache_clear()
    return status
